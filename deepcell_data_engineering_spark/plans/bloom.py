"""Bloom-filter join pruning: shrink the shuffled side of a join with a
compact bitset of the other side's keys.

The 100 TB problem this solves: a fact⋈dim join where the dim side is
too large to broadcast EXACTLY (its key set is gigabytes) but selective
enough that most fact rows will not find a match. A sort-merge join
shuffles the entire fact table first and discards the misses after —
the discarded rows dominate the shuffle. A Bloom bitset of the dim keys
is orders of magnitude smaller than the key set itself (m bits total,
~10 bits/key for ~1% false positives), small enough to broadcast, and
probing it is a row-local bitwise expression — so fact rows that cannot
match are dropped BEFORE the shuffle. False positives only admit extra
rows that the exact join removes afterwards, so the composed result is
bit-identical to the plain join (that equivalence is the oracle check
of x58 and ``tests/test_plans.py``).

This is the engine-level form of what Spark's AQE runtime row-level
filtering does opportunistically (`spark.sql.optimizer.runtime.
bloomFilter.enabled`); making it a first-class operator lets a pipeline
BUILD the bitset once (e.g. the ids of contaminated / already-ingested
documents) and reuse it across many jobs, the same way the LSH band
index persists dedup state (sources of that pattern: `functions/
dedup.py`, `x53_incremental_lsh`).

Mechanics (all JVM-side, zero Python in the hot path):

- build: each key yields ``n_hashes`` positions via murmur3 with the
  hash index as a second argument (Kirsch–Mitzenmacher-style family);
  positions OR into 64-bit words (``bit_or`` aggregate), and the sparse
  words densify into ONE row holding ``array<bigint>`` of
  ``n_bits/64`` words. The build is a map-side explode + one small
  shuffle of at most ``n_bits/64`` rows per partition.
- probe: ``crossJoin(broadcast(one_row_bitset))`` attaches the array to
  every fact partition (BroadcastNestedLoopJoin over exactly one row),
  and the membership test is a ``forall`` over the same position
  expressions — whole-stage-codegen'd, no shuffle, no UDF.

Reference parity: the reference has no Bloom pruning (its joins are
pandas merges, e.g. `/root/reference/caliban_toolbox/utils/
pipeline_utils.py`); this operator exists for the scale target.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_probe", "bloom_prune", "bloom_pruned_join"]


def _positions_sql(col: str, n_bits: int, n_hashes: int) -> str:
    """SQL for the array of ``n_hashes`` bit positions of ``col``.

    ``hash(col, i)`` varies the murmur3 seed material per hash index, so
    the family is independent enough for the classic ~(0.6185)^(m/n)
    false-positive behavior; ``pmod`` keeps positions in [0, n_bits).
    The SAME expression text is used by build and probe — any drift
    between the two would silently break membership.
    """
    return (
        f"transform(sequence(0, {n_hashes - 1}), "
        f"i -> pmod(hash({col}, i), {n_bits}))"
    )


def bloom_build(
    keys: DataFrame, col: str, n_bits: int = 1 << 17, n_hashes: int = 5
) -> DataFrame:
    """One-row DataFrame with column ``bf``: the Bloom bitset of
    ``keys[col]`` as ``array<bigint>`` of ``n_bits/64`` words.

    Size the filter as ~10–12 bits per distinct key for ~1% false
    positives (k=5 is near-optimal there). The bitset is dense and
    fixed-size: n_bits=2**27 is a 16 MiB broadcast covering ~13M keys —
    the regime where the exact key set would already be too big to ship.
    """
    if n_bits % 64:
        raise ValueError(f"n_bits must be a multiple of 64, got {n_bits}")
    n_words = n_bits // 64
    words = (
        keys.select(F.explode(F.expr(_positions_sql(col, n_bits, n_hashes))).alias("pos"))
        .groupBy(F.shiftright("pos", 6).alias("w"))
        .agg(F.bit_or(F.expr("shiftleft(1L, cast(pmod(pos, 64) as int))")).alias("bits"))
    )
    # Densify the (at most n_words) sparse words into one array row.
    # collect_list here aggregates <= n_words tiny rows — driver-safe by
    # construction because the bitset was sized to be broadcastable.
    return words.agg(
        F.collect_list(F.struct(F.col("w"), F.col("bits"))).alias("kv")
    ).select(
        F.expr(
            f"transform(sequence(0, {n_words - 1}), "
            f"i -> coalesce(map_from_entries(kv)[i], 0L))"
        ).alias("bf")
    )


def bloom_probe(col: str, n_bits: int, n_hashes: int, bitset_col: str = "bf") -> Column:
    """Boolean membership test of ``col`` against the attached bitset
    column — true iff every hash position's bit is set. Pure row-local
    bitwise arithmetic inside whole-stage codegen; false-positive rate
    ~(1 - e^(-kn/m))^k, never a false negative."""
    return F.expr(
        f"forall({_positions_sql(col, n_bits, n_hashes)}, "
        f"p -> (element_at({bitset_col}, cast(p div 64 as int) + 1) "
        f"& shiftleft(1L, cast(pmod(p, 64) as int))) <> 0)"
    )


def bloom_prune(
    fact: DataFrame,
    fact_col: str,
    bitset: DataFrame,
    n_bits: int = 1 << 17,
    n_hashes: int = 5,
) -> DataFrame:
    """Drop fact rows whose key is definitely absent from the bitset.

    The bitset rides in on a broadcast of its single row, so the filter
    sits UNDER any later exchange — the shuffled volume is the surviving
    rows only (pinned in ``tests/test_plans.py``)."""
    return (
        fact.join(F.broadcast(bitset))
        .where(bloom_probe(fact_col, n_bits, n_hashes))
        .drop("bf")
    )


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_col: str,
    dim_col: str,
    n_bits: int = 1 << 17,
    n_hashes: int = 5,
    how: str = "inner",
) -> DataFrame:
    """``fact ⋈ dim`` with the fact side Bloom-pruned first.

    Exactly equal to the plain join for ``inner``/``left_semi`` (false
    positives are removed by the join itself); the filter build costs
    one pass over ``dim`` keys + an ``n_bits/64``-row aggregation.
    """
    if how not in ("inner", "left_semi", "semi", "leftsemi"):
        raise ValueError(
            f"bloom pruning preserves semantics only for inner/semi joins, got {how!r}"
        )
    bitset = bloom_build(dim.select(dim_col), dim_col, n_bits, n_hashes)
    pruned = bloom_prune(fact, fact_col, bitset, n_bits, n_hashes)
    return pruned.join(dim, pruned[fact_col] == dim[dim_col], how)
