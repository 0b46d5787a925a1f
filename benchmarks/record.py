#!/usr/bin/env python
"""Incremental RESULTS.json recorder.

`bench.py --what all` replaces benchmarks/RESULTS.json wholesale, which
loses everything if the chip tunnel drops mid-run. This wrapper runs the
named sections one at a time (each in a fresh subprocess, so a crashed
section cannot take the rest down) and MERGES each finished record into
RESULTS.json immediately.

    python benchmarks/record.py spgemm cookbook2_df64
    python benchmarks/record.py all

Sections: cookbook2 spmv spgemm mv shocktube dp ntc cookbook2_df64.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
OUT = os.path.join(REPO, "benchmarks", "RESULTS.json")
ALL = ["cookbook2", "spmv", "spgemm", "mv", "shocktube", "dp",
       "cookbook2_df64"]


def run_section(name: str, timeout: float = 5400):
    args = [sys.executable, os.path.join(REPO, "bench.py")]
    if name == "cookbook2_df64":
        args += ["--what", "cookbook2", "--dtype", "df64"]
    else:
        args += ["--what", name]
    t0 = time.time()
    sub = subprocess.run(args, capture_output=True, text=True,
                         timeout=timeout)
    if sub.returncode != 0:
        return {"error": sub.stderr.strip().splitlines()[-1]
                if sub.stderr.strip() else f"exit {sub.returncode}"}
    rec = json.loads(sub.stdout.strip().splitlines()[-1])
    rec["bench_wall_s"] = round(time.time() - t0, 1)
    return rec


def main():
    names = sys.argv[1:] or ["all"]
    if names == ["all"]:
        names = ALL
    results = json.load(open(OUT)) if os.path.exists(OUT) else {}
    for name in names:
        if name == "ntc":
            # bench_ntc_full writes NTC_SWEEP.json itself
            sub = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"),
                 "--what", "ntc"], capture_output=True, text=True,
                timeout=7200)
            print(f"# ntc: rc={sub.returncode}", file=sys.stderr)
            continue
        print(f"# running {name} ...", file=sys.stderr, flush=True)
        try:
            rec = run_section(name)
        except Exception as e:                      # timeout etc.
            rec = {"error": f"{type(e).__name__}: {e}"}
        print(f"# {name}: {json.dumps(rec)[:300]}", file=sys.stderr,
              flush=True)
        if "error" not in rec:
            results[name] = rec
            with open(OUT, "w") as f:
                json.dump(results, f, indent=1)
    print(json.dumps({k: v.get("value", v.get("error"))
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
