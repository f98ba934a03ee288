"""Physical-plan introspection helpers.

The engine's scale contract is checked, not assumed: tests assert that
star joins broadcast, that scans prune columns and push filters, and
that co-located joins don't shuffle. These helpers read the executed
plan the same way `.explain("formatted")` does, as strings the test
suite can assert on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle boundaries in the physical plan (AQE may later
    coalesce them, but a plan with zero Exchanges never shuffles)."""
    plan = executed_plan(df)
    return sum(
        line.count("Exchange") - line.count("BroadcastExchange")
        for line in plan.splitlines()
    )


def join_strategies(df: DataFrame) -> dict[str, int]:
    plan = executed_plan(df)
    return {
        "broadcast_hash": plan.count("BroadcastHashJoin"),
        "sort_merge": plan.count("SortMergeJoin"),
        "shuffled_hash": plan.count("ShuffledHashJoin"),
        "broadcast_nested_loop": plan.count("BroadcastNestedLoopJoin"),
    }


def pushed_filters(df: DataFrame) -> list[str]:
    """DataFilters/PushedFilters entries of every scan in the plan."""
    out = []
    for line in executed_plan(df).splitlines():
        for key in ("PushedFilters: [", "DataFilters: ["):
            if key in line:
                frag = line.split(key, 1)[1]
                out.append(frag.split("]", 1)[0])
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """ReadSchema column lists per scan — column pruning evidence."""
    cols = []
    for line in executed_plan(df).splitlines():
        if "ReadSchema: struct<" in line:
            frag = line.split("ReadSchema: struct<", 1)[1].rsplit(">", 1)[0]
            cols.append([c.split(":")[0] for c in frag.split(",") if c])
    return cols
