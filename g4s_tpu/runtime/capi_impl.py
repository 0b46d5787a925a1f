"""Python side of the C embedding API (see runtime/native/capi.c).

Kept dependency-light and stateless-per-call: handles index a module-level
registry; array traffic crosses the C boundary as raw bytes (f64/i32
little-endian), so the C side needs no numpy headers.
"""

from __future__ import annotations

import numpy as np

from g4s_tpu.utils.platform import honor_env_platforms

honor_env_platforms()      # the embedding host sets JAX_PLATFORMS

_POTS: list = []


def deeppot_load(path: str) -> int:
    from g4s_tpu.models.deepmd.infer import DeepPot
    _POTS.append(DeepPot(path))
    return len(_POTS) - 1


def deeppot_eval(handle: int, natoms: int, coord_b: bytes, box_b: bytes,
                 types_b: bytes):
    pot = _POTS[handle]
    coord = np.frombuffer(coord_b, np.float64).reshape(natoms, 3)
    box = np.frombuffer(box_b, np.float64).reshape(3, 3)
    types = np.frombuffer(types_b, np.int32)
    e, f, v = pot.eval(coord, box, types)
    return (float(np.asarray(e)),
            np.asarray(f, np.float64).tobytes(),
            np.asarray(v, np.float64).reshape(-1)[:9].tobytes())


def ignition_delay(mech_yaml: str, phase: str, T0: float, P0: float) -> float:
    import jax
    jax.config.update("jax_enable_x64", True)
    from g4s_tpu.models.cantera.mech import load_mechanism
    from g4s_tpu.models.cantera.reactor import IdealGasConstVolumeReactor
    from g4s_tpu.models.cantera.shock_tube import (ignition_delay as _idt,
                                                   stoich_mixture)
    mech = load_mechanism(mech_yaml, phase or None)
    r = IdealGasConstVolumeReactor(
        mech, real_gas="rk" in (phase or "").lower())
    X = stoich_mixture(mech, "c12h26") if "c12h26" in mech.species_names \
        else None
    if X is None:
        # default: stoichiometric H2/O2 if present
        X = np.zeros(mech.nspec)
        names = {n.upper(): i for i, n in enumerate(mech.species_names)}
        X[names["H2"]] = 2.0
        X[names["O2"]] = 1.0
        if "N2" in names:
            X[names["N2"]] = 3.76 if "AR" not in names else 0.0
        X = X / X.sum()
    tau, _ = _idt(r, T0, P0, X)
    return float(tau)
