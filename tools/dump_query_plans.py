"""Dump .explain('formatted') for named queries to files.

Usage: python tools/dump_query_plans.py --out plans/r13 --suffix _before \
           x80_pq_adc_topk x92_ivfpq_topk [--sf-dir /root/testdata/sf0.1]

Writes <out>/<name><suffix>.txt. Plan only — queries with eager build
phases (lifecycle commits) still run their builds.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepcell_data_engineering_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--out", default="plans/r13")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    unknown = [n for n in args.names if n not in qmap]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark(app_name="dump-query-plans", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for n in args.names:
        df = qmap[n](spark, args.sf_dir)
        txt = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(args.out, f"{n}{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
