"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Design notes (100 TB posture):
- Everything is expressed with built-in Spark functions over exploded
  shingle/token tables — whole-stage codegen, map-side partial aggs, no
  Python in the hot path.
- Hashes are md5-derived and therefore IDENTICAL in any engine: each
  shingle is md5'd ONCE, two 28-bit chunks of the digest become integers,
  and the k MinHash functions are 2-universal hashes a_j*x1 + b_j*x2 + c_j
  mod (2^31 - 1) over those chunks — pure 64-bit-safe integer arithmetic
  that DuckDB reproduces bit-for-bit (no RNG, no engine-specific hash(),
  and k-1 fewer md5 evaluations per shingle than hashing per function).
- LSH banding turns O(n²) pair generation into a shuffle on band keys:
  only docs sharing a band hash are joined. Band count / rows-per-band
  trade recall vs candidate volume exactly as in the MinHash literature.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from deepcell_data_engineering_spark.functions.text import fingerprint


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group identical (canonicalized) texts: fingerprint -> keeper id +
    copy count. Dedup = semi-join df against keep_id."""
    return (
        df.groupBy(fingerprint(F.col(text_col)).alias("fp"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one row (min id) per identical text."""
    keepers = exact_dup_groups(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keepers, on=id_col, how="left_semi")


# ---------------------------------------------------------------------------
# shingling + MinHash + LSH
# ---------------------------------------------------------------------------


def shingles(df: DataFrame, k: int = 5, text_col: str = "text", id_col: str = "doc_id",
             distinct: bool = True, widen: bool = True) -> DataFrame:
    """Explode each doc into its character k-gram shingles. Docs shorter
    than k contribute their whole text once.

    ``distinct=False`` skips the per-doc dedup shuffle — correct for any
    duplicate-insensitive consumer (MinHash min-aggregation); set-based
    consumers (Jaccard) need the default. ``widen=False`` skips the
    pre-explode repartition for callers feeding bounded subsets."""
    from deepcell_data_engineering_spark.plans.layout import spread

    if widen:
        df = spread(df)  # the k-gram explode fans out ~len(text)x
    n = F.greatest(F.length(F.col(text_col)) - F.lit(k - 1), F.lit(1))
    out = df.select(
        id_col,
        F.explode(F.sequence(F.lit(1), n)).alias("pos"),
        F.col(text_col),
    ).select(id_col, F.col(text_col).substr(F.col("pos"), F.lit(k)).alias("shingle"))
    return out.distinct() if distinct else out


MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)


def _digest_chunks(col: Column, portable: bool) -> tuple[Column, Column]:
    """Two 28-bit non-negative integer chunks of a hash of ``col`` — the
    inputs to the 2-universal MinHash/winnow hash functions.

    ``portable=True`` derives them from md5, bit-identical in any engine
    (the oracle/cross-engine path). ``portable=False`` derives them from
    the JVM-native ``xxhash64`` — no hex-string round-trip; measured
    ~15-25% faster end-to-end on minhash/winnow at sf0.1 (the shuffle,
    not the hash, dominates these operators). The production default
    where cross-engine reproducibility of hash values is not required —
    near-dup QUALITY is unchanged, both are uniform hashes."""
    if portable:
        digest = F.md5(col)
        x1 = F.conv(F.substring(digest, 1, 7), 16, 10).cast("long")
        x2 = F.conv(F.substring(digest, 9, 7), 16, 10).cast("long")
    else:
        h = F.xxhash64(col)
        mask = F.lit((1 << 28) - 1)
        x1 = F.shiftright(h, 4).bitwiseAND(mask)
        x2 = F.shiftright(h, 32).bitwiseAND(mask)
    return x1, x2


def minhash_params(j: int) -> tuple[int, int, int]:
    """Deterministic 2-universal hash coefficients for hash function j —
    shared with the SQL oracle so both engines compute identical values."""
    a = (1_000_003 * (j + 1)) % MINHASH_P
    b = (998_244_353 * (j + 7)) % MINHASH_P
    c = (69_069 * (j + 13)) % MINHASH_P
    return a, b, c


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 4,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = True,
) -> DataFrame:
    """MinHash signature per doc: h_j = min over shingles of a 2-universal
    hash of the shingle's md5. ONE md5 per shingle (the j functions are
    integer arithmetic over two 28-bit digest chunks; every intermediate
    < 2^62, so ANSI-safe), and ONE wide shuffle: min() is duplicate-
    insensitive, so shingles skip their dedup shuffle, and the groupBy
    partial-aggs map-side (each task ships one row per (doc, j), not the
    shingles). The only other exchange is spread()'s cheap round-robin of
    the PRE-explode doc rows when the scan arrives too narrow."""
    sh = shingles(df, k=k, text_col=text_col, id_col=id_col, distinct=False)
    x1, x2 = _digest_chunks(F.col("shingle"), portable)
    chunked = sh.select(id_col, x1.alias("x1"), x2.alias("x2"))
    aggs = []
    for j in range(num_hashes):
        a, b, c = minhash_params(j)
        h = F.pmod(
            F.lit(a) * F.col("x1") + F.lit(b) * F.col("x2") + F.lit(c), F.lit(MINHASH_P)
        )
        aggs.append(F.min(h).alias(f"h{j}"))
    return chunked.groupBy(id_col).agg(*aggs)


def winnow_fingerprints(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = True,
) -> DataFrame:
    """MOSS-style winnowing fingerprints (Schleimer et al., SIGMOD 2003):
    hash every char k-gram with the j=0 2-universal hash of its md5
    chunks (engine-portable, like MinHash), slide a w-hash window over
    positions, keep each full window's minimum, and dedup — the selected
    minima are the doc's fingerprint set. Any substring match of length
    >= w + k - 1 between two docs is guaranteed to share a fingerprint.

    One explode + one window over (id, pos) — a single shuffle on the doc
    id; density is ~2/(w+1) of the k-gram count, so the fingerprint table
    is a fraction of the shingle table's size at 100 TB."""
    from pyspark.sql import Window

    from deepcell_data_engineering_spark.plans.layout import spread

    a, b, c = minhash_params(0)
    n = F.greatest(F.length(F.col(text_col)) - F.lit(k - 1), F.lit(1))
    grams = (
        spread(df)
        .select(
            id_col,
            n.alias("n_grams"),
            F.explode(F.sequence(F.lit(1), n)).alias("pos"),
            F.col(text_col),
        )
        .select(
            id_col,
            "n_grams",
            "pos",
            F.col(text_col).substr(F.col("pos"), F.lit(k)).alias("gram"),
        )
    )
    x1, x2 = _digest_chunks(F.col("gram"), portable)
    h = F.pmod(F.lit(a) * x1 + F.lit(b) * x2 + F.lit(c), F.lit(MINHASH_P))
    win = Window.partitionBy(id_col).orderBy("pos").rowsBetween(
        Window.currentRow, w - 1
    )
    return (
        grams.select(id_col, "n_grams", "pos", h.alias("h"))
        .select(id_col, "n_grams", "pos", F.min("h").over(win).alias("fp"))
        .where(F.col("pos") <= F.greatest(F.col("n_grams") - F.lit(w - 1), F.lit(1)))
        .select(id_col, "fp")
        .distinct()
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: list[list[str]] | None = None,
    id_col: str = "doc_id",
    portable: bool = True,
    max_band_size: int | None = None,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Candidate near-dup pairs: docs sharing any band hash.

    ``bands``: list of signature-column groups, e.g. [["h0","h1"],
    ["h2","h3"]]. Each band hashes the concat of its columns (md5 when
    ``portable``, else the prefixed tuple itself via xxhash64); an equi
    self-join per band, unioned and distinct'd.

    ``max_band_size`` is the production skew guard: a degenerate corpus
    (mass-duplicated boilerplate collapsing half the docs into one band)
    would otherwise generate a quadratic pair blow-up inside a single
    join task — AQE can split the task but not shrink the pair count.
    When set, bands holding more docs than the cap are DIVERTED from
    pair generation into a second DataFrame ``(band, doc_id)`` of
    known-duplicate clusters (every member of an over-cap band is a
    near-certain duplicate; downstream keeps one representative per
    cluster instead of scoring O(n^2) pairs). Per-band sizes come from
    one count window over the SAME band shuffle the self-join needs, so
    the guard adds no extra shuffle — both join sides reuse the
    exchange. Returns ``(pairs, clusters)`` when the cap is set.
    """
    hash_cols = [c for c in signatures.columns if c != id_col]
    if bands is None:
        bands = [[c] for c in hash_cols]

    def _band_key(i: int, band_cols: list[str]) -> Column:
        joined = F.concat_ws("-", *[F.col(c).cast("string") for c in band_cols])
        if portable:
            return F.md5(joined)  # matches the oracle SQL byte-for-byte
        return F.xxhash64(F.lit(i), joined).cast("string")

    # single pass: unpivot every band hash with one explode, then ONE
    # self-join on the band key (vs re-deriving signatures per band)
    band_exprs = F.array(
        *[_band_key(i, band_cols) for i, band_cols in enumerate(bands)]
    )
    banded = signatures.select(F.col(id_col), F.explode(band_exprs).alias("band"))
    hot = None
    if max_band_size is not None:
        sized = banded.withColumn(
            "__n", F.count(F.lit(1)).over(Window.partitionBy("band"))
        )
        banded = sized.where(F.col("__n") <= max_band_size).drop("__n")
        hot = (
            sized.where(F.col("__n") > max_band_size)
            .select("band", id_col)
            .distinct()
        )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, on="band")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    return pairs if hot is None else (pairs, hot)


def lsh_band_star_edges(
    signatures: DataFrame,
    bands: list[list[str]] | None = None,
    id_col: str = "doc_id",
    portable: bool = True,
) -> DataFrame:
    """Connectivity-preserving LSH edges for duplicate-cluster closure:
    ONE edge (member -> band minimum) per band membership instead of the
    C(n,2) clique pairs of lsh_candidate_pairs — a band's star spans
    exactly the same vertex set as its clique, so the connected
    components (and therefore every cluster assignment) are IDENTICAL,
    with O(docs x bands) edges instead of O(sum band_size^2).

    Measured at sf0.1: the same corpus yields 3.7M clique pairs but only
    ~10k star edges — on a boilerplate-heavy 100 TB corpus the clique
    form is quadratic in the largest duplicate class while this stays
    linear. Use this for clustering; pair-level SCORING (Jaccard
    verify, containment) still needs the explicit pairs.

    One shuffle: the banded unpivot reuses a single window min per band
    — no self-join at all. Returns (id_a, id_b) with id_a > id_b = the
    band min."""
    hash_cols = [c for c in signatures.columns if c != id_col]
    if bands is None:
        bands = [[c] for c in hash_cols]

    def _band_key(i: int, band_cols: list[str]) -> Column:
        joined = F.concat_ws("-", *[F.col(c).cast("string") for c in band_cols])
        if portable:
            return F.md5(joined)
        return F.xxhash64(F.lit(i), joined).cast("string")

    band_exprs = F.array(
        *[_band_key(i, band_cols) for i, band_cols in enumerate(bands)]
    )
    banded = signatures.select(F.col(id_col), F.explode(band_exprs).alias("band"))
    m = F.min(id_col).over(Window.partitionBy("band"))
    return (
        banded.withColumn("__m", m)
        .where(F.col(id_col) != F.col("__m"))
        .select(F.col(id_col).alias("id_a"), F.col("__m").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    candidate_pairs: DataFrame | None = None,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact shingle-set Jaccard per pair. With ``candidate_pairs`` (from
    LSH) the shingle join is restricted to candidates — the scale path;
    without it, all pairs sharing >=1 shingle are scored (verification /
    small-N path)."""
    # verification path: inputs are bounded candidate subsets, so the
    # pre-explode widen shuffle costs more than it spreads
    sh = shingles(df, k=k, text_col=text_col, id_col=id_col, widen=False)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    if candidate_pairs is not None:
        inter = inter.join(candidate_pairs, on=["id_a", "id_b"], how="left_semi")
    return (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(
    df: DataFrame,
    bits: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = True,
) -> DataFrame:
    """SimHash over whitespace tokens: token hash = 60 bits of md5 (or of
    xxhash64 when ``portable=False`` — the cheaper production path); per
    bit position, sum +1/-1 across the doc's distinct tokens; set the bit
    where the sum is positive."""
    from deepcell_data_engineering_spark.plans.layout import spread

    tokens = (
        spread(df)
        .select(
            id_col,
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
        )
        .distinct()
        .select(
            id_col,
            (
                F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint")
                if portable
                else F.shiftright(F.xxhash64("tok"), 4).bitwiseAND(
                    F.lit((1 << 60) - 1)
                )
            ).alias("h"),
        )
    )
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b")
    per_bit = (
        tokens.select(id_col, "h", bit)
        .select(
            id_col,
            "b",
            # shiftright/shiftleft builtins take a literal count; the
            # per-row bit index needs the SQL expression form
            F.when(F.expr("(h >> b) & 1") == 1, 1).otherwise(-1).alias("w"),
        )
        .groupBy(id_col, "b")
        .agg(F.sum("w").alias("s"))
    )
    return per_bit.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(0)
        ).alias("simhash")
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<double> columns — built-in
    higher-order functions only (zip_with + aggregate), JVM-side."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_rows: int | None = 100_000,
) -> DataFrame:
    """All pairs with cosine similarity above ``threshold``.

    Brute-force O(n²) formulation — the recall verifier for the bucketed
    paths (similarity.cluster_neardup_pairs / srp_buckets) and correct
    for small n. ``max_rows`` refuses inputs where the crossJoin would be
    a scale accident (100k rows is already 5e9 pairs); pass ``None`` to
    bypass when the quadratic cost is a deliberate choice.
    """
    if max_rows is not None:
        n = df.count()
        if n > max_rows:
            raise ValueError(
                f"embedding_neardup_pairs: {n} rows would form ~{n * n // 2:.0e}"
                f" pairs; this brute-force path is capped at max_rows="
                f"{max_rows} — use similarity.cluster_neardup_pairs (IVF"
                f" lists) at scale, or pass max_rows=None deliberately"
            )
    vecs = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    a = vecs.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"))
    b = vecs.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_expr(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .where(F.col("cosine") > threshold)
    )


def containment_pairs(
    df: DataFrame,
    min_share: float = 0.8,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-containment detection: directed pairs where most of doc A's
    winnowing fingerprints also appear in doc B — the quote/boilerplate/
    subset-duplicate case that symmetric Jaccard under-scores (a short
    doc fully quoted inside a long one has low Jaccard but containment
    ~1.0). share(A->B) = |fp(A) n fp(B)| / |fp(A)|; winnowing guarantees
    any shared substring of length >= w+k-1 contributes fingerprints.

    Shape: fingerprint table (~2/(w+1) density) self-joined on the
    fingerprint VALUE, then one count aggregate per directed pair and a
    rational division — all exact. ``max_bucket`` optionally drops
    fingerprints shared by more than that many docs (ubiquitous
    boilerplate shingles — the same bucket-cap hardening as
    lsh_candidate_pairs) before the quadratic join."""
    fps = winnow_fingerprints(df, k=k, w=w, text_col=text_col, id_col=id_col)
    if max_bucket is not None:
        from pyspark.sql import Window

        fps = fps.withColumn(
            "_bucket", F.count(F.lit(1)).over(Window.partitionBy("fp"))
        ).where(F.col("_bucket") <= max_bucket).drop("_bucket")
    sizes = fps.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_fp"))
    a, b = fps.alias("a"), fps.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(
            F.broadcast(sizes.withColumnRenamed(id_col, "id_a")), "id_a"
        )
        .select(
            "id_a",
            "id_b",
            F.round(F.col("n_inter") / F.col("n_fp"), 6).alias("share"),
        )
        .where(F.col("share") >= F.lit(min_share))
    )


def decontaminate(
    train: DataFrame,
    heldout: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Test-set decontamination: flag training documents sharing any
    winnowing fingerprint with a held-out evaluation set — winnowing
    guarantees any common substring of length >= w + k - 1 chars shares
    a fingerprint, so this catches verbatim eval leakage without an
    all-pairs comparison (the standard pre-training hygiene step).

    Scale shape: both sides reduce to (id, fp) fingerprint sets (one
    explode + one window each); the held-out fingerprint set is tiny
    relative to the corpus (eval sets are small) so the semi/anti join
    broadcasts. Returns (id, contaminated)."""
    tf = winnow_fingerprints(train, k, w, text_col, id_col)
    hf = F.broadcast(
        winnow_fingerprints(heldout, k, w, text_col, id_col)
        .select("fp")
        .distinct()
    )
    hits = tf.join(hf, on="fp", how="leftsemi").select(id_col).distinct()
    return (
        train.select(id_col)
        .join(hits.withColumn("__hit", F.lit(True)), on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("__hit", F.lit(False)).alias("contaminated"),
        )
    )


def lsh_band_index(
    signatures: DataFrame,
    bands: list[list[str]] | None = None,
    id_col: str = "doc_id",
    portable: bool = True,
) -> DataFrame:
    """Materializable LSH index: one (band, id) row per band membership
    — the persisted form of a corpus's dedup state. Write it bucketed
    on ``band`` (plans/layout.write_bucketed) and every future
    incremental batch joins against it without re-hashing or
    re-shuffling the corpus. Same band keys as lsh_candidate_pairs
    (md5 when ``portable``), so index-based and from-scratch candidate
    generation agree byte-for-byte."""
    hash_cols = [c for c in signatures.columns if c != id_col]
    if bands is None:
        bands = [[c] for c in hash_cols]

    def _band_key(i: int, band_cols: list[str]) -> Column:
        joined = F.concat_ws("-", *[F.col(c).cast("string") for c in band_cols])
        if portable:
            return F.md5(joined)
        return F.xxhash64(F.lit(i), joined).cast("string")

    band_exprs = F.array(*[_band_key(i, cols) for i, cols in enumerate(bands)])
    return signatures.select(F.col(id_col), F.explode(band_exprs).alias("band"))


def incremental_lsh_candidates(
    index: DataFrame,
    new_signatures: DataFrame,
    bands: list[list[str]] | None = None,
    id_col: str = "doc_id",
    portable: bool = True,
) -> DataFrame:
    """Candidate pairs introduced by a NEW batch against an existing
    corpus: new-vs-old plus new-vs-new, never old-vs-old — the
    incremental form of lsh_candidate_pairs for a growing corpus.

    ``index`` is the corpus's (band, id) table (lsh_band_index, ideally
    read back bucketed on band); ``new_signatures`` is the fresh
    batch's MinHash signature table. The equivalence contract — pinned
    in tests — is::

        pairs(old ∪ new) == pairs(old) ∪ incremental(index(old), new)

    Scale: the join probe side is the new batch's band table (a day's
    arrivals vs a 100 TB corpus); Spark broadcasts it when small, and
    the corpus side streams through partition-local lookups instead of
    the full self-join a recompute would pay. Output ids are normalized
    to (least, greatest) so they match the from-scratch convention.
    """
    new_banded = lsh_band_index(
        new_signatures, bands=bands, id_col=id_col, portable=portable
    )
    all_banded = index.select(id_col, "band").unionByName(new_banded)
    n = new_banded.select(F.col(id_col).alias("__new_id"), "band")
    pairs = (
        all_banded.join(n, "band")
        .where(F.col(id_col) != F.col("__new_id"))
        .select(
            F.least(id_col, "__new_id").alias("id_a"),
            F.greatest(id_col, "__new_id").alias("id_b"),
        )
        .distinct()
    )
    return pairs


def minhash_signatures_rowwise(
    df: DataFrame,
    num_hashes: int = 4,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = True,
) -> DataFrame:
    """MinHash signatures computed entirely WITHIN each row — the
    shingle set becomes an array column and each h_j is an
    array_min(transform(...)) — no explode, no aggregation, no shuffle.

    Values are identical to minhash_signatures (same md5 chunking and
    2-universal coefficients; min over the same shingle multiset —
    pinned by a parity test). Two uses: (1) STREAMING — a row-local
    projection is stateless, so signatures can be attached to an
    unbounded stream without watermarks or aggregation state;
    (2) wide-row batch pipelines that want the signature as just
    another column. The per-shingle md5 is evaluated once (the chunk
    array is a separate projection, so the j hash functions reuse it).
    Trade-off vs the exploded form: the whole doc's shingle hashing
    happens in one task, so a single giant document cannot be spread
    across the cluster — use the aggregated form for pathological row
    sizes."""
    if not df.isStreaming:
        from deepcell_data_engineering_spark.plans.layout import spread

        df = spread(df)  # narrow scans otherwise hash on one core
    n = F.greatest(F.length(F.col(text_col)) - F.lit(k - 1), F.lit(1))
    sh_arr = F.transform(
        F.sequence(F.lit(1), n),
        lambda p: F.col(text_col).substr(p, F.lit(k)),
    )

    def chunk_struct(s: Column) -> Column:
        x1, x2 = _digest_chunks(s, portable)
        return F.struct(x1.alias("x1"), x2.alias("x2"))

    chunked = df.select(
        "*", F.transform(sh_arr, chunk_struct).alias("__chunks")
    )
    def h_j(a: int, b: int, c: int):
        def inner(st: Column) -> Column:
            return F.pmod(
                F.lit(a) * st["x1"] + F.lit(b) * st["x2"] + F.lit(c),
                F.lit(MINHASH_P),
            )

        return inner

    cols = []
    for j in range(num_hashes):
        a, b, c = minhash_params(j)
        cols.append(
            F.array_min(F.transform(F.col("__chunks"), h_j(a, b, c))).alias(f"h{j}")
        )
    return chunked.select(id_col, *cols)


def stream_index_collisions(
    docs: DataFrame,
    index: DataFrame,
    bands: list[list[str]] | None = None,
    num_hashes: int = 6,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = True,
) -> DataFrame:
    """Flag arriving documents whose LSH band collides with a persisted
    corpus index — the STREAMING twin of incremental_lsh_candidates:
    an unbounded stream of new documents is screened against the
    corpus's dedup state in-flight, before it is ever written.

    Per-row signatures (minhash_signatures_rowwise: no aggregation
    state) -> band explode -> LEFT SEMI stream-static equi-join against
    the index's distinct bands. Output is one (id, band) row per
    colliding band membership; downstream either routes suspects to a
    quarantine sink or joins back for exact verification. Works
    identically on a batch DataFrame (the parity test runs both)."""
    sigs = minhash_signatures_rowwise(
        docs, num_hashes=num_hashes, k=k, text_col=text_col,
        id_col=id_col, portable=portable,
    )
    banded = lsh_band_index(sigs, bands=bands, id_col=id_col, portable=portable)
    return banded.join(index.select("band").distinct(), "band", "left_semi")


def similarity_join_prefix(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT token-set similarity self-join via prefix filtering (the
    PPJoin family): all pairs with Jaccard(tokens(a), tokens(b)) >=
    ``threshold``, with a NO-FALSE-NEGATIVES guarantee — the complement
    of the MinHash/LSH path (lsh_candidate_pairs), which trades recall
    for speed. Use LSH to dedup a corpus; use this when the answer must
    be complete (contractual dedup, eval-set contamination audits).

    Why it scales: two sets with Jaccard >= t must share a token among
    the first |s| - ceil(t*|s|) + 1 of EITHER set when both are sorted
    by the same global order (else the <= min(|s|,|r|) possible matches
    cannot reach the required overlap). Ordering tokens rarest-first
    makes those prefixes the most selective tokens, so the candidate
    equi-join on prefix tokens touches a tiny fraction of the all-pairs
    space; a length filter (|r| >= t*|s|) prunes further, and the exact
    Jaccard verify is a row-local array_intersect over the candidates
    only. One explode + one equi-join + one row-local verify — no
    quadratic stage, no sketch error.

    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard rounded
    to 4 dp. Deterministic: the global order is the (frequency, term)
    pair itself, carried as a struct sort key — no dense-rank
    materialization, so there is NO single-partition global window over
    the vocabulary (the scale-killer a row_number ordering would be);
    the order attaches to tokens by a plain distributed join."""
    toks = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
        .select(
            "id",
            F.explode(F.array_distinct(F.split(F.lower(F.trim(F.col("t"))), r"\s+"))).alias(
                "term"
            ),
        )
        .where(F.col("term") != "")
    )
    order = toks.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    ranked = toks.join(order, "term").select(
        "id", F.struct(F.col("tf"), F.col("term")).alias("tok")
    )
    docs = ranked.groupBy("id").agg(
        F.array_sort(F.collect_list("tok")).alias("arr")
    )
    n = F.size("arr")
    prefix_len = (n - F.ceil(F.lit(threshold) * n) + 1).cast("int")
    pre = docs.select(
        "id", n.alias("n"), F.explode(F.slice("arr", 1, prefix_len)).alias("p")
    )
    a, b = pre.alias("a"), pre.alias("b")
    # candidate DEDUP carries only the id pair (a pair sharing many
    # prefix tokens must not shuffle its token arrays once per token);
    # the arrays re-attach to the surviving distinct pairs by two joins.
    cand = (
        a.join(
            b,
            (F.col("a.p") == F.col("b.p"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.col("b.n") * F.lit(threshold) <= F.col("a.n"))
            & (F.col("a.n") * F.lit(threshold) <= F.col("b.n")),
        )
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .distinct()
    )
    da = docs.select(F.col("id").alias("doc_a"), F.col("arr").alias("arr_a"))
    db = docs.select(F.col("id").alias("doc_b"), F.col("arr").alias("arr_b"))
    pairs = cand.join(da, "doc_a").join(db, "doc_b")
    inter = F.size(F.array_intersect("arr_a", "arr_b"))
    jac = inter / (F.size("arr_a") + F.size("arr_b") - inter)
    return (
        pairs.withColumn("jaccard", F.round(jac + F.lit(0.0), 4))
        .where(jac >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def fastss1_variants(col: Column) -> Column:
    """Self + every single-character deletion of ``col``, distinct —
    the FastSS edit-distance<=1 deletion neighborhood (Bocek et al.,
    "Fast Similarity Search in Large Dictionaries", 2007):
    ed(a, b) <= 1 IFF a and b share a variant (deletion: b IS a
    deletion of a; insertion: symmetric; substitution: deleting
    position i from both yields the same string). Used as an equi-join
    blocking key with an exact levenshtein post-filter (the shared-
    variant test admits some ed=2 pairs). |col|+1 variants per value —
    the candidate space stays vocabulary-bounded."""
    one = F.lit(1)
    return F.array_distinct(
        F.concat(
            F.array(col),
            F.transform(
                F.sequence(one, F.greatest(F.length(col), one)),
                lambda i: F.concat(
                    col.substr(one, i - one),
                    col.substr(i + one, F.length(col)),
                ),
            ),
        )
    )


def fuzzy_name_pairs(
    df: DataFrame,
    name_col: str,
    block_key: Column | list[Column] | tuple[Column, ...],
    max_dist: int = 3,
    carry_cols: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """Entity-resolution fuzzy join: (name_a, name_b, dist[, carry_a/b
    ...]) over the DISTINCT values of ``name_col`` whose edit distance
    is at most ``max_dist``, candidate-paired only within equal
    blocking keys (plus a |length| band prune an edit-distance match
    must satisfy). ``carry_cols`` (e.g. a pre-aggregated row count)
    ride through the self-join as {col}_a/{col}_b so callers do not
    re-join the row table — ONE scan + ONE aggregation + the self-join.

    ``block_key`` takes one Column or a list for MULTI-PASS blocking
    (standard ER practice): each key is an independent pass, a pair is
    a candidate if it agrees on ANY pass's key, and cross-pass
    duplicates collapse before the distance evaluates. A pass's key
    may be ARRAY-typed — the pair is then a candidate if the two
    names' arrays share ANY element, which is how a FastSS deletion
    neighborhood (:func:`fastss1_variants`) plugs in as a pass:
    variant passes over the head and tail tokens make every pair with
    min(ed(head), ed(tail)) <= 1 a candidate, so a total edit budget
    of <= 3 that touches BOTH ends is still caught (both ends cannot
    each take >= 2 edits inside a 3-edit budget when the alignment
    respects the token boundaries). The remaining recall residual is
    pairs whose alignment restructures the end-token boundaries
    themselves (a space edit merging/splitting the head or tail
    token) AND whose end tokens each differ by >= 2 edits — callers
    needing those add a whole-string deletion-neighborhood pass.

    CONTRACT: every ``block_key`` must be a DETERMINISTIC function of
    ``name_col`` alone (soundex of the name, its first/last word, the
    deletion variants of either, a length bucket...). The vocabulary
    resolve groups by name and keeps ONE key value per pass via
    max(); a key derived from any other column can take several
    values per name, and all but the max are silently dropped —
    losing candidate pairs. Block on another column's value by
    concatenating it into ``name_col`` (making it part of the entity
    identity) instead.

    The scale discipline mirrors the dedup family: resolve distinct
    STRINGS, never rows — the entity vocabulary bounds the pair space
    at any corpus size. Blocking makes it per-block quadratic only
    (never all-pairs; P passes cost <= P x one pass, not a wider
    cross), and the length band removes pairs no levenshtein <=
    max_dist could ever accept before the O(len^2) distance evaluates.
    """
    from pyspark.sql.types import ArrayType

    keys = (
        list(block_key)
        if isinstance(block_key, (list, tuple))
        else [block_key]
    )
    bk_names = [f"bk_{i}" for i in range(len(keys))]
    raw = df.select(
        F.col(name_col).alias("name"),
        *[k.alias(bn) for k, bn in zip(keys, bk_names)],
        *carry_cols,
    ).where(F.col(name_col).isNotNull())
    # normalize every pass to array<string>: scalar keys become 1-elem
    # arrays, array keys (variant neighborhoods) pass through distinct
    names = raw.select(
        "name",
        *[
            (
                F.array_distinct(F.col(bn).cast("array<string>"))
                if isinstance(raw.schema[bn].dataType, ArrayType)
                else F.array(F.col(bn).cast("string"))
            ).alias(bn)
            for bn in bk_names
        ],
        *carry_cols,
    )
    # the blocking keys are deterministic functions of the name, so
    # grouping by name alone resolves the vocabulary; max() just picks
    # the (single) key/carry value per name
    agg_cols = bk_names + list(carry_cols)
    names = names.groupBy("name").agg(
        *[F.max(c).alias(c) for c in agg_cols]
    )
    # one (name, pass, bk) row per blocking pass AND per key element:
    # the self-join equates (pass, bk), so pass i only ever pairs
    # against pass i — P passes cost P independent block joins inside
    # ONE join, and a pair found by several passes (or several shared
    # variants) collapses in the dropDuplicates below (before the
    # quadratic-in-length distance ever evaluates for the copy)
    exploded = (
        names.select(
            "name",
            *carry_cols,
            F.posexplode(F.array(*bk_names)).alias("pass", "bks"),
        )
        .select("name", *carry_cols, "pass", F.explode("bks").alias("bk"))
        .where(F.col("bk").isNotNull())
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.pass") == F.col("b.pass"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.name") < F.col("b.name"))
            & (
                F.abs(F.length("a.name") - F.length("b.name"))
                <= F.lit(max_dist)
            ),
        )
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            *[F.col(f"a.{c}").alias(f"{c}_a") for c in carry_cols],
            *[F.col(f"b.{c}").alias(f"{c}_b") for c in carry_cols],
        )
        .dropDuplicates(["name_a", "name_b"])
    )
    return cand.withColumn(
        "dist", F.levenshtein("name_a", "name_b")
    ).where(F.col("dist") <= max_dist).select(
        "name_a",
        "name_b",
        "dist",
        *[f"{c}_a" for c in carry_cols],
        *[f"{c}_b" for c in carry_cols],
    )


def simhash_hamming_pairs(
    sig: DataFrame,
    sig_col: str = "simhash",
    n_bands: int = 4,
    band_bits: int = 15,
    max_hamming: int = 6,
) -> DataFrame:
    """Hamming-LSH candidate pairs between DISTINCT simhash values:
    (sig_a, sig_b, hamming) where the signatures share at least one of
    ``n_bands`` contiguous ``band_bits``-bit bands and their true
    Hamming distance is at most ``max_hamming``.

    Callers collapse identical signatures to one row with a group size
    BEFORE this join (near-identical templated corpora put most of the
    duplicate mass in exact-signature groups); doc-level pair counts
    then come from n_a*n_b arithmetic, never from enumerating the
    quadratic doc-pair set. By pigeonhole, any pair with hamming <
    n_bands is guaranteed to share a band; larger distances are
    best-effort recall (standard Hamming LSH)."""
    vals = sig.select(F.col(sig_col).alias("sh")).distinct()
    mask = (1 << band_bits) - 1
    bands = vals.select(
        "sh",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("b"),
    ).select("sh", "b", F.expr(f"(sh >> ({band_bits} * b)) & {mask}").alias("key"))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.sh") < F.col("b.sh")),
        )
        .select(F.col("a.sh").alias("sig_a"), F.col("b.sh").alias("sig_b"))
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))),
        )
        .where(F.col("hamming") <= max_hamming)
    )
