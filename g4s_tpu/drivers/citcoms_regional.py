"""CLI entry point — the `CitcomSRegional <configfile>` equivalent
(citcoms/bin/Citcom.c:50-299 main): parse the flat config, run the
timestep loop with outputs/checkpoints, print per-step wall time.
SIGINT/SIGTERM request a graceful stop: finish the current step, write a
checkpoint, exit (lib/Interuption.c set_signal semantics).

Usage: python -m g4s_tpu.drivers.citcoms_regional <configfile>
           [--restart ckpt] [--f32]
"""

from __future__ import annotations

import argparse
import signal
import time

_STOP = {"flag": False}


def _graceful(sig, frame):
    print(f"# caught signal {sig}: stopping after this step", flush=True)
    _STOP["flag"] = True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--restart", default=None)
    ap.add_argument("--f32", action="store_true",
                    help="run in f32 (TPU throughput mode)")
    ap.add_argument("--steps", type=int, default=None)
    args = ap.parse_args()

    from g4s_tpu.utils.platform import honor_env_platforms
    import jax
    honor_env_platforms()
    if not args.f32:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from g4s_tpu.models.citcoms import CitcomModel, load_config

    cfg = load_config(args.config)
    print(f"# G4S-TPU CitcomSRegional: {cfg.nodex}x{cfg.nodey}x{cfg.nodez} "
          f"Ra={cfg.rayleigh} steps={cfg.maxstep}")
    model = CitcomModel(cfg, dtype=jnp.float32 if args.f32 else jnp.float64)
    signal.signal(signal.SIGINT, _graceful)
    signal.signal(signal.SIGTERM, _graceful)
    t0 = time.time()
    s, hist = model.run(args.steps, verbose=True, write_output=True,
                        checkpoint=True, restart_from=args.restart,
                        stop_flag=lambda: _STOP["flag"])
    total = time.time() - t0
    n = len(hist)
    print(f"# total time {total:.3f} s; {total / max(n,1):.4f} s/step "
          f"(incl. compile)")


if __name__ == "__main__":
    main()
