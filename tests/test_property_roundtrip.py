"""Property-based crop/slice round-trip invariants (SURVEY §5: the
engine's addition over the reference's fixed-size tests) + UDAF checks."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from deepcell_data_engineering_spark.operators.cropping import crop_images, stitch_crops
from deepcell_data_engineering_spark.operators.slicing import slice_images, stitch_slices
from deepcell_data_engineering_spark.sources.codecs import decode_y
from deepcell_data_engineering_spark.sources.images import images_df, rows_from_arrays


def _mask(height, width, seed):
    rng = np.random.RandomState(seed)
    y = np.zeros((height, width), dtype=np.int32)
    cell = 1
    for _ in range(rng.randint(1, 6)):
        r0, c0 = rng.randint(0, height - 4), rng.randint(0, width - 4)
        y[r0 : r0 + 4, c0 : c0 + 4] = cell
        cell += 1
    return y


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    crop=st.integers(min_value=12, max_value=40),
    overlap=st.sampled_from([0.0, 0.1, 0.25, 0.4]),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_crop_stitch_roundtrip_property(spark, crop, overlap, seed):
    import math

    y = _mask(50, 46, seed)
    images = images_df(spark, rows_from_arrays("fovP", None, y[None, ...]))
    cropped, log = crop_images(images, crop_size=(crop, crop), overlap_frac=overlap)
    restored = stitch_crops(cropped, log)
    r = restored.collect()[0]
    m = decode_y(r["y"], r["height"], r["width"])
    # invariant for ALL params (reshape_data_test.py:185-191): same support
    np.testing.assert_array_equal(m > 0, y > 0)
    # cell-identity preservation needs the overlap region to cover the
    # 4px cells — with less overlap a boundary-split cell legitimately
    # stitches into two ids (same as the reference, whose round-trip
    # tests always use overlap_frac=0.2 with cells smaller than overlap)
    if math.floor(crop * overlap) >= 4:
        assert len(np.unique(m)) == len(np.unique(y))


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    slice_len=st.integers(min_value=2, max_value=7),
    overlap=st.integers(min_value=0, max_value=1),
    stacks=st.integers(min_value=3, max_value=9),
)
def test_slice_stitch_roundtrip_property(spark, slice_len, overlap, stacks):
    ys = np.stack([_mask(20, 20, s) for s in range(stacks)])
    images = images_df(spark, rows_from_arrays("fovQ", None, ys))
    sliced, log = slice_images(images, slice_len=slice_len, slice_overlap=overlap)
    restored = stitch_slices(sliced, log)
    masks = {r["stack"]: decode_y(r["y"], r["height"], r["width"]) for r in restored.collect()}
    assert len(masks) == stacks
    for s in range(stacks):
        np.testing.assert_array_equal(masks[s], ys[s])


def test_hmean_and_exact_median_udafs(spark):
    from deepcell_data_engineering_spark.functions.udafs import exact_median, hmean

    df = spark.createDataFrame(
        [("a", 0.5), ("a", 1.0), ("b", 0.0), ("b", 1.0), ("c", 3.0)],
        "grp string, v double",
    )
    rows = {
        r["grp"]: (r["hm"], r["med"])
        for r in df.groupBy("grp")
        .agg(hmean(F.col("v")).alias("hm"), exact_median(F.col("v")).alias("med"))
        .collect()
    }
    # harmonic mean of (0.5, 1.0) = 2/3; zero value -> 0.0 (F1 contract)
    assert rows["a"][0] == pytest.approx(2 / 3)
    assert rows["b"][0] == 0.0
    assert rows["c"][0] == 3.0
    assert rows["a"][1] == pytest.approx(0.75)


# ---- round-2 operator properties: CDC, components, sampling ----


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_old=st.integers(min_value=0, max_value=40),
    n_new=st.integers(min_value=0, max_value=40),
)
def test_cdc_roundtrip_property(spark, seed, n_old, n_new):
    """apply(old, diff(old, new)) == new for arbitrary overlapping
    snapshots (adds, deletes, value changes, and NULL payloads)."""
    from deepcell_data_engineering_spark.operators.diff import (
        apply_changes,
        snapshot_diff_with_payload,
    )

    rng = np.random.RandomState(seed)

    def snap(n, offset):
        return [
            (
                int(k),
                None if rng.rand() < 0.15 else f"s{rng.randint(3)}",
                float(rng.randint(5)),
            )
            for k in rng.choice(np.arange(offset, offset + 60), n, replace=False)
        ]

    old_rows, new_rows = snap(n_old, 0), snap(n_new, 20)
    schema = "k long, s string, v double"
    old = spark.createDataFrame(old_rows, schema) if old_rows else spark.createDataFrame([], schema)
    new = spark.createDataFrame(new_rows, schema) if new_rows else spark.createDataFrame([], schema)
    feed = snapshot_diff_with_payload(old, new, ["k"])
    got = sorted(map(tuple, apply_changes(old, feed, ["k"]).collect()))
    assert got == sorted(map(tuple, new.collect()))


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_connected_components_property(spark, seed):
    from deepcell_data_engineering_spark.functions.graph import (
        connected_components,
    )

    rng = np.random.RandomState(seed)
    n_edges = rng.randint(1, 80)
    edges = [
        (int(a), int(b))
        for a, b in rng.randint(0, 60, size=(n_edges, 2))
        if a != b
    ]
    if not edges:
        return
    # driver-side union-find reference
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {x: find(x) for x in parent}
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(edges, "id_a long, id_b long")
        ).collect()
    }
    assert got == expected


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    f1=st.floats(min_value=0.0, max_value=1.0),
    f2=st.floats(min_value=0.0, max_value=1.0),
)
def test_hash_sample_nesting_property(spark, f1, f2):
    """For any two fractions, the smaller-fraction sample is a subset of
    the larger — the property that makes hash sampling resumable."""
    from deepcell_data_engineering_spark.functions.sampling import hash_sample

    lo, hi = sorted([f1, f2])
    docs = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    s_lo = {r["doc_id"] for r in hash_sample(docs, lo).collect()}
    s_hi = {r["doc_id"] for r in hash_sample(docs, hi).collect()}
    assert s_lo <= s_hi


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    chunk=st.integers(min_value=3, max_value=60),
    stride_frac=st.sampled_from([0.5, 0.75, 1.0]),
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=1,
            max_size=300,
        ),
        min_size=1,
        max_size=6,
    ),
)
def test_chunk_documents_property(spark, chunk, stride_frac, texts):
    """Every character covered; every chunk an exact substring at its
    declared offset; md5 consistent; stride == chunk means an exact
    partition (no overlap, lengths sum to doc length)."""
    import hashlib

    from deepcell_data_engineering_spark.functions.text import chunk_documents

    stride = max(int(chunk * stride_frac), 1)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    rows = chunk_documents(df, chunk_size=chunk, stride=stride).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(texts):
        got = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
        # dense chunk indices from zero
        assert [r["chunk_idx"] for r in got] == list(range(len(got)))
        for r in got:
            sub = t[r["chunk_idx"] * stride : r["chunk_idx"] * stride + chunk]
            assert r["chunk_len"] == len(sub)
            assert r["chunk_md5"] == hashlib.md5(sub.encode()).hexdigest()
        last = got[-1]
        assert last["chunk_idx"] * stride + last["chunk_len"] == len(t)
        if stride == chunk:
            assert sum(r["chunk_len"] for r in got) == len(t)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    budget=st.integers(min_value=1, max_value=200),
    n_docs=st.integers(min_value=1, max_value=60),
    seed=st.integers(min_value=0, max_value=9999),
)
def test_pack_sequences_property(spark, budget, n_docs, seed):
    """Pack ids: dense-from-zero per partition, monotone in doc order,
    and every doc's pack equals floor(preceding tokens / budget)."""
    from deepcell_data_engineering_spark.functions.text import pack_sequences

    rng = np.random.RandomState(seed)
    rows = [
        (i, ["a", "b"][i % 2], " ".join(["w"] * int(rng.randint(1, 40))))
        for i in range(n_docs)
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, lang STRING, text STRING")
    out = sorted(
        pack_sequences(df, budget=budget).collect(),
        key=lambda r: (r["lang"], r["doc_id"]),
    )
    for lang in {"a", "b"}:
        cum = 0
        prev_pack = 0
        for r in (x for x in out if x["lang"] == lang):
            assert r["pack_id"] == cum // budget >= prev_pack
            prev_pack = r["pack_id"]
            cum += r["n_tokens"]


@given(data=st.binary(max_size=4096))
@settings(max_examples=60, deadline=None)
def test_lzw_roundtrip_property(data):
    """TIFF-variant LZW is lossless for arbitrary byte strings (the
    codec underneath LZW-compressed microscope TIFFs)."""
    from deepcell_data_engineering_spark.sources.pycodecs import (
        _lzw_decode,
        _lzw_encode,
    )

    assert _lzw_decode(_lzw_encode(data)) == data


@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=1000),
    comp=st.sampled_from([1, 5, 8, 32773]),
    interlace=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_codec_roundtrip_property(h, w, seed, comp, interlace):
    """PNG (optionally Adam7) and TIFF (any compression) round-trip
    bit-exactly for arbitrary image shapes."""
    from deepcell_data_engineering_spark.sources.pycodecs import (
        decode_png,
        decode_tiff,
        encode_png,
        encode_tiff,
    )

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img, interlace=interlace)), img)
    assert np.array_equal(
        decode_tiff(encode_tiff(img, compression=comp, predictor=2 if comp != 1 else 1)),
        img,
    )
