"""As-of join — a time-series operator Spark's DataFrame API lacks.

The reference's closest shape is frame-to-frame propagation ("the most
recent previous frame's labels", relabel.py:227-276); the general form —
for each left row, the latest right row at-or-before it per key — is the
standard as-of join of time-series engines (DuckDB/kdb/pandas
merge_asof).

Spark-native implementation: NO cross/range join. Both sides union into
one keyed stream tagged by side; ONE window sorted by (time, side)
carries the last-seen right payload forward; left rows then read their
carried match. Cost = one shuffle on the key + one sort — the same plan
shape as any windowed aggregate, linear at 100 TB, no candidate-pair
blow-up. (A range-join formulation would be O(left x right-per-key).)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_matched",
) -> DataFrame:
    """For every left row, attach the nearest right row per ``by`` key:
    at-or-before it (``backward``), at-or-after it (``forward``), or
    whichever side is closer (``nearest`` — ties break to the earlier,
    i.e. backward, row: pandas merge_asof semantics).

    ``value_cols``: right columns to carry (default: all non-key,
    non-time columns). The matched right timestamp is exposed as
    ``{on}{suffix}``; unmatched left rows keep nulls (left-join
    semantics). ``tolerance``: a Column/interval expression; matches
    further than it are nulled out (pandas merge_asof semantics) —
    for ``nearest`` each DIRECTION is nulled before the pick, so a
    too-far past match never shadows an in-range future one.

    Scale shape (all directions): ONE union + ONE shuffle on the
    ``by`` key with a single sort — ``nearest`` computes the backward
    carry and the forward carry as two window functions over the SAME
    sorted layout, never a second exchange and never a range join.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward' or 'nearest', "
            f"got {direction!r}"
        )
    from pyspark.sql.types import StructField, StructType

    by = [by] if isinstance(by, str) else list(by or [])
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in by + [on]]
    carried = [f"{c}{suffix}" for c in value_cols] + [f"{on}{suffix}"]

    # The matched right row travels as ONE struct so a single
    # last(ignorenulls=True) carries the whole tuple: a NULL inside a
    # matched row's value column is inherited as NULL (DuckDB/pandas
    # as-of semantics), never replaced by a stale value from an older
    # right row — which per-column carries would do.
    r_struct_t = StructType(
        [StructField(c, right.schema[c].dataType) for c in value_cols]
        + [StructField("__ts", right.schema[on].dataType)]
    )
    l_tag = left.select(
        *by, on,
        F.lit(None).cast(r_struct_t).alias("__r"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c not in by + [on]],
    )
    r_tag = right.select(
        *by, on,
        F.struct(
            *[F.col(c).alias(c) for c in value_cols], F.col(on).alias("__ts")
        ).alias("__r"),
        F.lit(0).alias("__side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in by + [on]
        ],
    )
    both = l_tag.unionByName(r_tag)

    if direction == "nearest":
        # one sorted layout, two carries: backward = last right row in
        # the preceding frame (right sorts before left at equal time,
        # so exact-time matches land on the backward side), forward =
        # first right row in the following frame (strictly later).
        order = [F.col(on).asc(), F.col("__side").asc()]
        wb = (
            Window.partitionBy(*by)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wf = (
            Window.partitionBy(*by)
            .orderBy(*order)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        cand = (
            both.withColumn("__mb", F.last("__r", ignorenulls=True).over(wb))
            .withColumn("__mf", F.first("__r", ignorenulls=True).over(wf))
            .where(F.col("__side") == 1)
        )
        gap_b = F.col(on) - F.col("__mb.__ts")
        gap_f = F.col("__mf.__ts") - F.col(on)
        if tolerance is not None:
            # null each direction independently BEFORE the pick
            cand = cand.withColumn(
                "__mb", F.when(gap_b <= tolerance, F.col("__mb"))
            ).withColumn("__mf", F.when(gap_f <= tolerance, F.col("__mf")))
        pick = (
            F.when(F.col("__mb").isNull(), F.col("__mf"))
            .when(F.col("__mf").isNull(), F.col("__mb"))
            # tie -> backward (the earlier row), pandas semantics
            .when(gap_b <= gap_f, F.col("__mb"))
            .otherwise(F.col("__mf"))
        )
        return cand.withColumn("__m", pick).select(
            *[
                c
                for c in both.columns
                if c not in ("__r", "__side")
            ],
            *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in value_cols],
            F.col("__m.__ts").alias(f"{on}{suffix}"),
        )

    # backward: sort ascending; right (side 0) sorts before left at equal
    # time, so an exact-time right row IS visible to the left row.
    # forward: same trick on the reversed time axis.
    if direction == "backward":
        order = [F.col(on).asc(), F.col("__side").asc()]
    else:
        order = [F.col(on).desc(), F.col("__side").asc()]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    out = (
        both.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
        .select(
            *[c for c in both.columns if c not in ("__r", "__side")],
            *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in value_cols],
            F.col("__m.__ts").alias(f"{on}{suffix}"),
        )
    )
    if tolerance is not None:
        gap = (
            F.col(on) - F.col(f"{on}{suffix}")
            if direction == "backward"
            else F.col(f"{on}{suffix}") - F.col(on)
        )
        keep = gap <= tolerance
        out = out.select(
            *[c for c in out.columns if c not in carried],
            *[F.when(keep, F.col(c)).alias(c) for c in carried],
        )
    return out


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket: int,
    extra_on=None,
) -> DataFrame:
    """All (left, right) pairs whose CLOSED integer intervals
    [l_start, l_end] and [r_start, r_end] overlap — the
    interval-interval generalization of the as-of join above, via
    BUCKET DECOMPOSITION instead of a range join.

    Why not ``l.join(r, overlap_predicate)``: a pure inequality join
    has no equi-key, so Spark plans BroadcastNestedLoopJoin /
    cartesian — O(|L| x |R|) at 100 TB. Here each interval explodes to
    the fixed-width buckets it covers (``sequence`` of integer bucket
    ids — a generator over the scan, fan-out = interval_len/bucket +
    1), the join is a plain hash EQUI-join on bucket id, and the true
    overlap predicate re-checks inside the bucket-matched candidates.
    Duplicate pairs (intervals sharing several buckets) are eliminated
    WITHOUT a distinct shuffle: a pair is kept only in the FIRST
    bucket where both intervals are live (bucket ==
    max(bucket_of(l_start), bucket_of(r_start))). Cost: one equi-join
    shuffle whose key cardinality the caller tunes via ``bucket``
    (bucket ~ typical interval length keeps fan-out ~2).

    Bounds are integer columns in the same unit (e.g. epoch micros);
    ``bucket`` is the width in that unit. ``extra_on``: optional list
    of column names to ALSO equi-join on (e.g. a tenant key), tagged
    onto the shuffle key for free.
    """
    from deepcell_data_engineering_spark.functions.layout import _int_div

    extra_on = list(extra_on or [])
    lb = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                _int_div(F.col(l_start), F.lit(bucket)),
                _int_div(F.col(l_end), F.lit(bucket)),
            )
        ),
    )
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                _int_div(F.col(r_start), F.lit(bucket)),
                _int_div(F.col(r_end), F.lit(bucket)),
            )
        ),
    )
    first_shared = F.greatest(
        _int_div(F.col(l_start), F.lit(bucket)),
        _int_div(F.col(r_start), F.lit(bucket)),
    )
    return (
        lb.join(rb, ["__bucket"] + extra_on)
        .where(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (F.col("__bucket") == first_shared)
        )
        .drop("__bucket")
    )
