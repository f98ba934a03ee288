"""Executed-plan scan audit: run each registered query once (warm
session) and record how many parquet file-scan nodes its FINAL
(AQE-executed) plan contains, plus wall time. A query whose executed
plan carries more scans of the same table than its algorithm needs is
re-executing a subtree — typically a threshold/boundary aggregate
consumed through a broadcast, which AQE's stage reuse does not cover
(the r13 x103 lesson; r14: x160 executed 5 lineitem scans, x199 10
orders scans before the fix).

Usage: python tools/scan_count_sweep.py [--sf-dir DIR] [name ...]
Prints JSON {name: {"sec": s, "scans": n}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepcell_data_engineering_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    names = args.names or sorted(qmap)
    spark = get_spark(
        app_name="scan-count-sweep", master=f"local[{args.cpus}]"
    )
    spark.sparkContext.setLogLevel("ERROR")
    from deepcell_data_engineering_spark.catalog import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, args.sf_dir, t).limit(1).collect()

    out = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            df = qmap[name](spark, args.sf_dir)
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
            out[name] = {
                "sec": round(time.perf_counter() - t0, 3),
                "scans": plan.count("Scan parquet"),
                "bcast": plan.count("BroadcastExchange"),
                "reused": plan.count("ReusedExchange"),
            }
        except Exception as exc:  # record, keep sweeping
            out[name] = {"error": str(exc)[:120]}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
