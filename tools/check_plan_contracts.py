"""Registry-wide plan-contract sweep: build EVERY registered query at
sf0.001, inspect its executed plan, and record per-query join
strategies, exchange counts, and the cartesian verdict into
PLANCHECK.json.

The blanket contract: NO CartesianProduct anywhere in the registry.
BroadcastNestedLoopJoin is allowed only as the 1-row composition
attach (mixture totals, decrement carriers, sketch estimates) — the
count is recorded per query so a regression that introduces a
data-sized nested loop is visible in the diff.

Usage: python tools/check_plan_contracts.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepcell_data_engineering_spark.plans import inspect as pi  # noqa: E402
from deepcell_data_engineering_spark.relational import QUERIES  # noqa: E402
from deepcell_data_engineering_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(
        app_name="plan-contracts", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    bad: list[str] = []
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name].build(spark, sf)
            plan = pi.executed_plan(df)
            s = pi.join_strategies(df)
            rec = {
                "cartesian": plan.count("CartesianProduct"),
                "bnlj": s["broadcast_nested_loop"],
                "broadcast_hash": s["broadcast_hash"],
                "sort_merge": s["sort_merge"],
                "exchanges": pi.count_exchanges(df),
            }
        except Exception as e:  # pragma: no cover - report, don't mask
            rec = {"error": f"{type(e).__name__}: {e}"[:300]}
            bad.append(name)
        out[name] = rec
        if rec.get("cartesian"):
            bad.append(name)
        print(
            f"  {name:32s} "
            + (
                f"cart={rec['cartesian']} bnlj={rec['bnlj']} "
                f"bhj={rec['broadcast_hash']} smj={rec['sort_merge']} "
                f"exch={rec['exchanges']}"
                if "error" not in rec
                else "ERROR " + rec["error"]
            ),
            flush=True,
        )
    payload = {
        "sf_dir": sf,
        "n_queries": len(out),
        "violations": sorted(set(bad)),
        "queries": out,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANCHECK.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(f"{len(out)} queries, {len(set(bad))} violations -> PLANCHECK.json")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
