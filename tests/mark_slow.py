#!/usr/bin/env python
"""Smoke-tier helper: parse a `pytest --durations=N` report and list the
tests above a wall-clock threshold, as `file::Class::test` node ids plus
the per-file totals. Used to decide which tests carry the `slow` marker
(the <10-minute smoke tier is `-m "not slow and not isolated"`; the full
suite still runs everything).

Usage: python tests/mark_slow.py /tmp/test_full.log [threshold_s]
"""

import re
import sys
from collections import defaultdict


def main():
    path = sys.argv[1]
    thr = float(sys.argv[2]) if len(sys.argv) > 2 else 30.0
    rows = []
    for ln in open(path):
        m = re.match(r"\s*([\d.]+)s\s+(call|setup|teardown)\s+(\S+)", ln)
        if m:
            rows.append((float(m.group(1)), m.group(2), m.group(3)))
    rows.sort(reverse=True)
    per_file = defaultdict(float)
    total = 0.0
    print(f"# tests with {thr}s+ phases:")
    for secs, phase, node in rows:
        total += secs
        per_file[node.split("::")[0]] += secs
        if secs >= thr:
            print(f"{secs:8.1f}s {phase:8s} {node}")
    print("\n# per-file totals (reported phases only):")
    for f, s in sorted(per_file.items(), key=lambda kv: -kv[1]):
        print(f"{s:8.1f}s {f}")
    print(f"\n# reported total: {total/60:.1f} min")


if __name__ == "__main__":
    main()
