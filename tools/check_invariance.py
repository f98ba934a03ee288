"""Partition-layout invariance sweep: re-run the full oracle gate under
several shuffle-partition / core-count layouts. A query whose result
hash depends on partition count (unordered double summation crossing a
rounding boundary, approx sketches in hashed columns, driver-visible
partition iteration order) passes a single-layout check and then breaks
on the next cluster resize — this sweep is the cheap local proxy for
that failure mode.

Run: python tools/check_invariance.py [sf_dir]
"""

from __future__ import annotations

import os
import subprocess
import sys

LAYOUTS = [
    {"SPARK_GRAFT_SHUFFLE_PARTITIONS": "3", "SPARK_GRAFT_CPUS": "5"},
    {"SPARK_GRAFT_SHUFFLE_PARTITIONS": "7"},
    {"SPARK_GRAFT_SHUFFLE_PARTITIONS": "32"},
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    here = os.path.dirname(os.path.abspath(__file__))
    ok = True
    for layout in LAYOUTS:
        env = {**os.environ, **layout}
        r = subprocess.run(
            [sys.executable, os.path.join(here, "check_oracle.py"), sf_dir],
            env=env,
            capture_output=True,
            text=True,
        )
        tail = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "(no output)"
        print(f"{layout}: {tail}")
        ok = ok and r.returncode == 0 and "passed" in tail
    print("INVARIANT" if ok else "LAYOUT-DEPENDENT RESULTS — fix before shipping")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
