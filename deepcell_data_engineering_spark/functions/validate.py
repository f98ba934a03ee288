"""Declarative data-quality gates: a constraint suite evaluated in ONE
aggregation pass, reported as a table.

A 100 TB ingest without validation gates ships silent corruption into
training: null keys, duplicate ids, truncated text, orphaned embedding
rows. The Deequ/Great-Expectations move re-expressed Spark-first: every
constraint is an AGGREGATE counting its violations, so an arbitrarily
long suite costs exactly one scan + one map-side-combined aggregation
(Catalyst evaluates all the conditional sums in a single whole-stage-
codegen pass over the table — no per-check jobs, no driver loop). The
report is itself a DataFrame, so gates compose: persist it per batch,
join it across days, alert on regressions.

Two kinds of checks:

- ``check_constraints``: row-level predicates + table-level uniqueness
  on one table.
- ``check_reference``: referential integrity (every foreign key resolves)
  between two tables — a left-anti count, the one check that cannot be a
  single-table aggregate.

Both emit the same schema ``(check_name, violations, status)`` so
reports union cleanly. Deterministic by construction — counts only —
which is what lets the x65 oracle re-run the whole suite in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["violations", "unique", "check_constraints", "check_reference"]


def violations(predicate: Column) -> Column:
    """Aggregate counting rows where ``predicate`` (a row-level 'this is
    bad' condition) holds. NULL predicate results count as violations —
    a check that cannot evaluate must fail loudly, not vanish."""
    return F.sum(F.when(F.coalesce(predicate, F.lit(True)), 1).otherwise(0))


def unique(*cols: str) -> Column:
    """Aggregate counting duplicate rows over ``cols``:
    count(*) - count(distinct cols). 0 iff the columns form a key."""
    return F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols])


def check_constraints(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Evaluate named violation aggregates in one pass:
    (check_name, violations, status) per check, status = 'pass' iff
    violations == 0. ``checks`` maps name -> aggregate Column (built
    with ``violations()`` / ``unique()`` or any custom bigint agg)."""
    if not checks:
        raise ValueError("empty constraint suite")
    row = df.agg(
        *[F.coalesce(c.cast("bigint"), F.lit(0)).alias(n) for n, c in checks.items()]
    )
    names = list(checks)
    stack_args = ", ".join(f"'{n}', {n}" for n in names)
    return row.selectExpr(
        f"stack({len(names)}, {stack_args}) as (check_name, violations)"
    ).withColumn(
        "status",
        F.when(F.col("violations") == 0, F.lit("pass")).otherwise(F.lit("fail")),
    )


def check_reference(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    name: str | None = None,
) -> DataFrame:
    """Referential integrity: rows of ``child`` whose key has no match
    in ``parent`` (left-anti count; NULL keys are orphans too — they
    reference nothing). Same report schema as check_constraints."""
    orphans = child.join(
        parent.select(F.col(parent_key).alias("__pk")).distinct(),
        F.col(child_key).eqNullSafe(F.col("__pk")),
        "left_anti",
    )
    n = name or f"{child_key}_references_{parent_key}"
    return orphans.agg(F.count(F.lit(1)).alias("violations")).select(
        F.lit(n).alias("check_name"),
        F.col("violations"),
        F.when(F.col("violations") == 0, F.lit("pass"))
        .otherwise(F.lit("fail"))
        .alias("status"),
    )
