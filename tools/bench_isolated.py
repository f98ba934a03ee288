"""Isolated re-bench of named queries: many runs, per-query medians.

The round-over-round bench compares ONE median-of-3 against another,
taken while the surface around it keeps growing (134 -> 176 registered
queries share the session) — a 1.3-1.7x "regression" on an untouched
query can be session-level overhead rather than a plan change. This
tool answers that question directly: run ONLY the suspects, in a fresh
session with nothing else scheduled, with enough samples for a stable
median, and print every sample so the spread is visible.

Usage:
  python tools/bench_isolated.py d35_approx_distinct x09_cosine_topk \
      [--runs 9] [--sf-dir /root/testdata/sf0.1]

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
    ap.add_argument("--runs", type=int, default=9)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    unknown = [n for n in args.names if n not in qmap]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark(
        app_name="dde-spark-bench-isolated", master=f"local[{args.cpus}]"
    )
    spark.sparkContext.setLogLevel("ERROR")

    from deepcell_data_engineering_spark.catalog import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, args.sf_dir, t).limit(1).collect()
    # warm each suspect once (codegen + shuffle-file page cache)
    for n in args.names:
        qmap[n](spark, args.sf_dir).collect()

    out: dict[str, dict] = {}
    for n in args.names:
        xs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            qmap[n](spark, args.sf_dir).collect()
            xs.append(round(time.perf_counter() - t0, 4))
        out[n] = {
            "median": round(median(xs), 4),
            "min": min(xs),
            "max": max(xs),
            "samples": xs,
        }
    print(json.dumps({"sf_dir": args.sf_dir, "runs": args.runs, "queries": out}))


if __name__ == "__main__":
    main()
