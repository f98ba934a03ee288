"""Run every registered query against the DuckDB oracle at a given SF.

Usage: python tools/check_oracle.py [sf_dir] [--only name1,name2,...]
Mirrors the driver's t2 gate (row count + columns + value hash).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepcell_data_engineering_spark.oracle import compare, duckdb_connect
from deepcell_data_engineering_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="", help="comma-separated query names")
    ap.add_argument("--json", default="", help="write per-query results JSON here")
    args = ap.parse_args()
    sf_dir = args.sf_dir
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if args.only:
        keep = {n.strip() for n in args.only.split(",") if n.strip()}
        queries = {n: q for n, q in queries.items() if n in keep}
    spark = get_spark(app_name="check-oracle", master="local[8]", shuffle_partitions=16)
    con = duckdb_connect(sf_dir)
    failed = []
    record: dict[str, dict] = {}
    for name, build in sorted(queries.items()):
        t0 = time.time()
        df = build(spark, sf_dir)
        if name not in oracles:
            n = df.count()
            print(f"  {name:32s} rows-only  rows={n}  {time.time()-t0:.2f}s")
            record[name] = {"ok": True, "rows": n, "rows_only": True}
            continue
        res = compare(name, df, con, oracles[name])
        status = "OK " if res.ok else "FAIL"
        print(f"  {name:32s} {status} rows={res.spark_rows} {time.time()-t0:.2f}s {res.detail}")
        record[name] = {
            "ok": res.ok,
            "rows": res.spark_rows,
            "hash": res.spark_hash,
        }
        if not res.ok:
            failed.append(name)
    print(f"\n{len(queries) - len(failed)}/{len(queries)} passed at {sf_dir}")
    if args.json:
        import json

        with open(args.json, "w") as fh:
            json.dump({"sf_dir": sf_dir, "results": record}, fh, indent=1)
        print(f"wrote {args.json}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
