"""Registry-wide plan-contract sweep: build EVERY registered query at
sf0.001, inspect its executed plan, and record per-query join
strategies, exchange counts, and the cartesian verdict into
PLANCHECK.json.

The blanket contract: NO CartesianProduct anywhere in the registry,
and every BroadcastNestedLoopJoin's BUILD side must be provably
bounded — a <=1-row subtree (global aggregate / limit 1 / joins
thereof: the 1-row composition attach) or a plan-time-constant leaf
(small literal Range / local rows). Queries whose BNLJ build is a
small-by-design but not plan-provable frame (a bounded query/probe
set, a constant-cardinality domain aggregate) DECLARE that count via
QuerySpec.bnlj_bounded with the bound documented in the docstring;
undeclared non-provable BNLJs are hard violations — a regression
that introduces a data-sized nested loop fails the sweep, it doesn't
wait for a human to read the diff (r9 verdict #3).

Second contract (r12 verdict #3): every UNPARTITIONED window
operator's input must be a provably bounded subtree (aggregate- or
limit-dominated, or plan-constant). Domain-bounded-but-not-provable
sites declare via QuerySpec.window_bounded; an undeclared raw-fact
global window (one task sorts the table at 100 TB) is a hard
violation.

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


def _table_widths(sf: str) -> dict[str, int]:
    import glob

    import pyarrow.parquet as pq

    widths = {}
    for p in glob.glob(os.path.join(sf, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        try:
            widths[name] = len(pq.read_schema(p).names)
        except Exception:
            pass
    return widths


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(
        app_name="plan-contracts", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    widths = _table_widths(sf)
    out: dict[str, dict] = {}
    bad: list[str] = []
    wide_scans: dict[str, list[str]] = {}
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name].build(spark, sf)
            plan = pi.executed_plan(df)
            s = pi.join_strategies(df)
            builds = pi.bnlj_build_sides_scalar(df)
            declared = QUERIES[name].bnlj_bounded
            non_scalar = sum(1 for ok in builds if not ok)
            gwin = pi.global_window_inputs_bounded(df)
            gwin_unbounded = sum(1 for ok in gwin if not ok)
            win_declared = QUERIES[name].window_bounded
            # column-pruning audit: per-scan read width vs table width.
            # Informational, not a violation — some queries legitimately
            # read everything (table profiling, full-row diff/dedup) —
            # but a full-width scan of a wide table is exactly what a
            # 100 TB reviewer wants surfaced per query, not per test.
            scans = []
            for sp in pi.scan_profiles(df):
                w = widths.get(sp["table"])
                scans.append(
                    {"table": sp["table"], "read": sp["n_read"], "width": w}
                )
                if w is not None and w >= 6 and sp["n_read"] >= w:
                    wide_scans.setdefault(name, []).append(sp["table"])
            rec = {
                "cartesian": plan.count("CartesianProduct"),
                "bnlj": s["broadcast_nested_loop"],
                "bnlj_non_scalar": non_scalar,
                "bnlj_declared_bounded": declared,
                "global_windows": len(gwin),
                "gwin_unbounded": gwin_unbounded,
                "window_declared_bounded": win_declared,
                "broadcast_hash": s["broadcast_hash"],
                "sort_merge": s["sort_merge"],
                "exchanges": pi.count_exchanges(df),
                "scans": scans,
            }
        except Exception as e:  # pragma: no cover - report, don't mask
            rec = {"error": f"{type(e).__name__}: {e}"[:300]}
            bad.append(name)
        out[name] = rec
        if rec.get("cartesian") or (
            rec.get("bnlj_non_scalar", 0)
            > rec.get("bnlj_declared_bounded", 0)
        ) or (
            rec.get("gwin_unbounded", 0)
            > rec.get("window_declared_bounded", 0)
        ):
            bad.append(name)
        print(
            f"  {name:32s} "
            + (
                f"cart={rec['cartesian']} bnlj={rec['bnlj']} "
                f"bnlj!1row={rec['bnlj_non_scalar']}"
                f"/decl={rec['bnlj_declared_bounded']} "
                f"gwin={rec['global_windows']} "
                f"gwin!bnd={rec['gwin_unbounded']}"
                f"/decl={rec['window_declared_bounded']} "
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
        "full_width_scans": {
            q: sorted(ts) for q, ts in sorted(wide_scans.items())
        },
        "queries": out,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANCHECK.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(f"{len(out)} queries, {len(set(bad))} violations -> PLANCHECK.json")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
