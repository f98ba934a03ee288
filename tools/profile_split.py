"""Per-query phase profiler: split build() (driver plan construction +
internal eager actions: commits, localCheckpoints, measurement collects)
from the final collect(), and count Spark jobs in each phase.

Usage:
  python tools/profile_split.py x103_zorder_skipping x151_merge_feed_view \
      [--sf-dir /root/testdata/sf0.1] [--runs 3]

Run ALONE (no concurrent Spark) — same rule as bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepcell_data_engineering_spark.session import get_spark  # noqa: E402


def median(xs: list[float]) -> float:
    s = sorted(xs)
    mid = len(s) // 2
    return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    unknown = [n for n in args.names if n not in qmap]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark(
        app_name="dde-spark-profile-split", master=f"local[{args.cpus}]"
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    from deepcell_data_engineering_spark.catalog import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, args.sf_dir, t).limit(1).collect()

    def jobs_in(group: str) -> int:
        tracker = sc._jsc.sc().statusTracker()
        return len(tracker.getJobIdsForGroup(group))

    out: dict[str, dict] = {}
    for n in args.names:
        # warm once
        qmap[n](spark, args.sf_dir).collect()
        builds, collects, bjobs, cjobs = [], [], [], []
        for i in range(args.runs):
            gb = f"build-{n}-{i}"
            sc.setJobGroup(gb, n)
            t0 = time.perf_counter()
            df = qmap[n](spark, args.sf_dir)
            t1 = time.perf_counter()
            gc = f"collect-{n}-{i}"
            sc.setJobGroup(gc, n)
            df.collect()
            t2 = time.perf_counter()
            sc.setJobGroup(None, None)
            builds.append(t1 - t0)
            collects.append(t2 - t1)
            bjobs.append(jobs_in(gb))
            cjobs.append(jobs_in(gc))
        out[n] = {
            "build_sec": round(median(builds), 4),
            "collect_sec": round(median(collects), 4),
            "build_jobs": bjobs[-1],
            "collect_jobs": cjobs[-1],
        }
        print(
            f"{n:36s} build {out[n]['build_sec']:7.3f}s/{out[n]['build_jobs']:3d} jobs   "
            f"collect {out[n]['collect_sec']:7.3f}s/{out[n]['collect_jobs']:3d} jobs",
            flush=True,
        )
    print(json.dumps({"sf_dir": args.sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
