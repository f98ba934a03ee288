"""Deterministic, engine-portable sampling for corpus construction.

`df.sample()` / `sampleBy()` draw from a partition-local RNG stream, so
results change under repartitioning and cannot be replayed by another
engine. Training-data pipelines instead sample by *hashing the key*:
keep a row iff h(seed, key) < threshold. That makes the sample (a) a
pure function of the data — stable across runs, partitionings, engines,
and incremental re-runs (a doc keeps its fate when the corpus grows),
(b) embarrassingly parallel (no shuffle, no RNG state), and (c)
oracle-checkable, since md5 is identical everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 28 bits of the md5 digest — fits comfortably in BIGINT in every
# engine (same trick as functions/dedup.py:_digest_chunks).
HASH_BITS = 28
HASH_SPACE = 1 << HASH_BITS


def hash_bucket(key: Column, seed: str = "s0") -> Column:
    """Deterministic uniform integer in [0, 2^28) from (seed, key)."""
    digest = F.md5(F.concat(F.lit(seed + ":"), key.cast("string")))
    return F.conv(F.substring(digest, 1, 7), 16, 10).cast("long")


def threshold(fraction: float) -> int:
    """Integer acceptance threshold for a sampling fraction — comparing
    BIGINT < BIGINT keeps the accept/reject decision exact (no float
    boundary can flip a row between engines)."""
    return int(fraction * HASH_SPACE)


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", seed: str = "s0"
) -> DataFrame:
    """Uniform deterministic sample: keep ~fraction of rows by key hash."""
    return df.where(
        hash_bucket(F.col(key_col), seed) < F.lit(threshold(fraction))
    )


def stratified_hash_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    seed: str = "s0",
) -> DataFrame:
    """Per-stratum deterministic sample (e.g. downsample the dominant
    language): each stratum gets its own acceptance threshold. Strata
    absent from ``fractions`` are dropped. Pure filter — no shuffle; the
    threshold lookup is a literal CASE, not a join."""
    thr: Column = F.lit(-1)
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(threshold(frac))
        ).otherwise(thr)
    return df.where(hash_bucket(F.col(key_col), seed) < thr)


def weighted_sample(
    df: DataFrame,
    key: Column,
    weight_col: str,
    k: int,
    strata: list[str] | tuple[str, ...] = (),
    seed: str = "w0",
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Weighted sampling without replacement, k rows per stratum
    (Efraimidis–Spirakis A-ES): each row draws u = deterministic
    uniform(0,1] from (seed, key) and the k largest u^(1/weight) win —
    inclusion probability proportional to weight, exactly the
    reservoir-free formulation that distributes as a plain top-k window.

    The same determinism contract as hash_sample: the draw is a pure
    function of (seed, key), so a document keeps its fate across runs,
    engines, and corpus growth — and the oracle can replay the draw in
    SQL (x61). Typical use: sample documents proportional to token
    count when planning a training mix (a 10k-token doc should be 10x
    likelier than a 1k-token one), per language.

    Rows with weight <= 0 are excluded (their inclusion probability is
    zero, and pow(u, 1/w) is undefined at w = 0). ``key`` must uniquely
    identify rows within a stratum: duplicate keys draw the same u, and
    the tie between them would be partition-order dependent.

    Scale shape: the unstratified path is sort+limit — Spark's
    TakeOrderedAndProject, a per-partition top-k fold into one k-row
    final heap (never a global sort of the input) — with the rank
    window applied AFTER the limit, over <= k rows (the r12 window
    contract: a global row_number directly over the raw frame would
    put the whole table through one task's sort at 100 TB). The
    stratified path stays a partitioned window."""
    from pyspark.sql import Window

    u = (hash_bucket(key, seed) + F.lit(1).cast("double")) / F.lit(HASH_SPACE).cast(
        "double"
    )
    skey = F.pow(u, F.lit(1.0) / F.col(weight_col))
    flt = df.where(F.col(weight_col) > 0)
    if not strata:
        kept = (
            flt.withColumn("__skey", skey)
            .orderBy(F.col("__skey").desc(), key)
            .limit(k)
        )
        w = Window.orderBy(F.col("__skey").desc(), key)
        return (
            kept.withColumn(rank_col, F.row_number().over(w))
            .drop("__skey")
        )
    w = Window.partitionBy(*strata).orderBy(skey.desc(), key)
    return (
        flt.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )


def deterministic_split(
    df: DataFrame,
    key_col: str,
    val_one_in: int = 10,
    seed: str = "s0",
    split_col: str = "split",
) -> DataFrame:
    """Train/val assignment as a pure function of the key: 'val' iff
    hash_bucket(key) % val_one_in == 0. Splitting by hash (not by
    position or RNG) keeps a row's fate stable as the corpus grows and
    — the property x84 audits — lets the key be a CLUSTER id rather
    than a row id, so every member of a near-duplicate cluster lands
    in the same split and the held-out set can't leak training
    near-copies."""
    b = hash_bucket(F.col(key_col), seed)
    return df.withColumn(
        split_col,
        F.when(F.pmod(b, val_one_in) == 0, F.lit("val")).otherwise(
            F.lit("train")
        ),
    )
