"""Dataset build family: splits/tranches (determinism + nesting), subset,
reshape/tiling, clean, balance, summarize, benchmark."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from deepcell_data_engineering_spark.dataset.builder import (
    DATASET_SCHEMA,
    balance_dataset,
    clean_labels,
    reshape_dataset,
    resize_bilinear,
    resize_nearest,
    subset_dataset,
    summarize_dataset,
)
from deepcell_data_engineering_spark.dataset.benchmark import (
    benchmark,
    image_detection_stats,
)
from deepcell_data_engineering_spark.dataset.splitter import (
    split_tranches,
    train_val_test_split,
)
from deepcell_data_engineering_spark.sources.codecs import encode_x, encode_y


def _dataset(spark, specs):
    """specs: list of (tissue, platform, n_cells). One 40x40 image each."""
    rows = []
    for i, (tissue, platform, n_cells) in enumerate(specs):
        y = np.zeros((40, 40), dtype=np.int32)
        for c in range(n_cells):
            r0 = (c * 7) % 30
            c0 = (c * 11) % 30
            y[r0 : r0 + 4, c0 : c0 + 4] = c + 1
        x = np.random.default_rng(i).random((40, 40, 2)).astype(np.float32)
        rows.append(
            {
                "img_idx": i,
                "fov": f"fov{i}",
                "stack": 0,
                "crop": 0,
                "slice": 0,
                "height": 40,
                "width": 40,
                "channels": ["ch0", "ch1"],
                "X": encode_x(x),
                "compartment": "whole_cell",
                "y": encode_y(y),
                "tissue": tissue,
                "platform": platform,
            }
        )
    return spark.createDataFrame(rows, schema=DATASET_SCHEMA)


SPECS = [
    ("breast", "mibi", 3),
    ("breast", "vectra", 5),
    ("gi", "mibi", 2),
    ("gi", "vectra", 4),
    ("immune", "mibi", 6),
    ("breast", "mibi", 1),
    ("gi", "mibi", 3),
    ("immune", "vectra", 2),
]


def test_split_tranches_nested_and_seeded(spark):
    df = _dataset(spark, SPECS)
    out = split_tranches(df, split_counts=[2, 4, 8], seed=7)
    ids = {k: sorted(r["img_idx"] for r in v.select("img_idx").collect()) for k, v in out.items()}
    assert len(ids["2"]) == 2 and len(ids["4"]) == 4 and len(ids["8"]) == 8
    assert set(ids["2"]) <= set(ids["4"]) <= set(ids["8"])  # nested prefixes
    # numpy RNG parity: same permutation as the reference's RandomState call
    expected = list(np.random.RandomState(seed=7).permutation(np.arange(8))[:4])
    assert sorted(ids["4"]) == sorted(int(v) for v in expected)
    # determinism across invocations
    again = split_tranches(df, split_counts=[4], seed=7)
    assert sorted(r["img_idx"] for r in again["4"].select("img_idx").collect()) == ids["4"]


def test_split_tranches_duplication_and_validation(spark):
    df = _dataset(spark, SPECS[:3])
    out = split_tranches(df, split_counts=[2], min_size=5, seed=0)
    assert out["2"].count() == 5  # tiled up to min_size
    assert out["2"].select("img_idx").distinct().count() == 2
    with pytest.raises(ValueError):
        split_tranches(df, split_counts=[2], split_proportions=[0.5])
    with pytest.raises(ValueError):
        split_tranches(df, split_counts=[0, 2])
    with pytest.raises(ValueError):
        split_tranches(df, split_proportions=[0.5, 1.5])


def test_train_val_test_split_sizes_and_edges(spark):
    df = _dataset(spark, SPECS)
    out = train_val_test_split(df, (0.8, 0.1, 0.1), seed=1)
    sizes = {r["split"]: r["cnt"] for r in out.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    assert sum(sizes.values()) == 8
    assert sizes["train"] >= 6 and sizes["val"] >= 1 and sizes["test"] >= 1
    # disjoint
    assert out.select("img_idx").distinct().count() == 8
    # N=1 and N=2 edge cases
    with pytest.warns(UserWarning):
        s1 = train_val_test_split(_dataset(spark, SPECS[:1]), seed=0)
    assert {r["split"] for r in s1.collect()} == {"train"}
    with pytest.warns(UserWarning):
        s2 = train_val_test_split(_dataset(spark, SPECS[:2]), seed=0)
    assert {r["split"] for r in s2.collect()} == {"train", "val"}
    with pytest.raises(ValueError):
        train_val_test_split(df, (0.5, 0.2, 0.2))


def test_subset_dataset(spark):
    df = _dataset(spark, SPECS)
    out = subset_dataset(df, tissues=["breast"], platforms="all")
    assert out.count() == 3
    out = subset_dataset(df, tissues=["breast", "gi"], platforms=["vectra"])
    assert out.count() == 2
    with pytest.raises(ValueError):
        subset_dataset(df, tissues=["bogus"])
    with pytest.raises(ValueError):
        subset_dataset(df, tissues=["immune"], platforms=["bogus_platform"])


def test_resize_kernels():
    img = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
    up = resize_bilinear(img, 8, 8)
    assert up.shape == (8, 8, 1)
    assert abs(float(up.mean()) - float(img.mean())) < 0.5
    lab = np.array([[1, 2], [3, 4]], dtype=np.int32)
    up_l = resize_nearest(lab, 4, 4)
    assert set(np.unique(up_l)) == {1, 2, 3, 4}  # no interpolated labels
    assert up_l[0, 0] == 1 and up_l[3, 3] == 4


def test_reshape_dataset_tiles(spark):
    df = _dataset(spark, SPECS[:2])
    out = reshape_dataset(df, output_shape=(20, 20))
    # 40x40 -> 4 tiles of 20x20 per image
    assert out.count() == 8
    r = out.where("img_idx = 0").orderBy("crop").collect()
    assert [x["crop"] for x in r] == [0, 1, 2, 3]
    assert all((x["height"], x["width"]) == (20, 20) for x in r)
    # tiles inherit tissue/platform (R12)
    assert {x["tissue"] for x in r} == {"breast"}


def test_reshape_dataset_resize_by_tissue(spark):
    df = _dataset(spark, SPECS[:4])
    out = reshape_dataset(df, output_shape=(20, 20), resize="by_tissue", resize_target=100)
    assert out.count() >= 4  # runs end-to-end and yields tiles
    assert out.select("img_idx").distinct().count() == 4


def test_clean_labels_min_objects(spark):
    df = _dataset(spark, SPECS)
    out = clean_labels(df, min_objects=4)
    kept = sorted(r["img_idx"] for r in out.select("img_idx").collect())
    expected = [i for i, (_, _, n) in enumerate(SPECS) if n >= 4]
    assert kept == expected


def test_balance_dataset_exact_rng_parity(spark):
    df = _dataset(spark, SPECS)
    out = balance_dataset(df, seed=3, category="tissue")
    counts = {
        r["tissue"]: r["cnt"]
        for r in out.groupBy("tissue").agg(F.count("*").alias("cnt")).collect()
    }
    assert set(counts.values()) == {3}  # breast=3 is the max category
    # reproduce the reference's RNG calls exactly
    cats = np.array([s[0] for s in SPECS])
    uniq, cnts = np.unique(cats, return_counts=True)
    np.random.seed(3)
    expected_rows = 0
    for cat, cnt in zip(uniq, cnts):
        if cnt == cnts.max():
            expected_rows += cnt
        else:
            chosen = np.random.choice(range(cnt), size=int(cnts.max()), replace=True)
            expected_rows += len(chosen)
    assert out.count() == expected_rows


def test_summarize_dataset_grouping_sets(spark):
    df = _dataset(spark, SPECS)
    rows = {(r["tissue"], r["platform"]): (r["cell_num"], r["image_num"])
            for r in summarize_dataset(df).collect()}
    assert rows[("breast", "all")] == (9, 3)
    assert rows[("all", "mibi")] == (15, 5)
    assert rows[("all", "all")] == (26, 8)


def test_image_detection_stats_exact_match():
    y = np.zeros((30, 30), dtype=np.int32)
    y[0:10, 0:10] = 1
    y[20:28, 20:28] = 2
    n_true, n_pred, correct, pi, pu = image_detection_stats(y, y)
    assert (n_true, n_pred, correct) == (2, 2, 2)
    assert pi == pu
    # shifted prediction: cell 1 still matches, cell 2 replaced by non-overlap
    yp = np.zeros_like(y)
    yp[1:11, 1:11] = 5
    yp[0:4, 20:24] = 9
    n_true, n_pred, correct, _, _ = image_detection_stats(y, yp)
    assert (n_true, n_pred, correct) == (2, 2, 1)


def test_benchmark_rollup(spark):
    df = _dataset(spark, SPECS[:4])
    pred = df.select("img_idx", "height", "width", "y")  # perfect predictions
    out = benchmark(df, pred).collect()
    by_cat = {(r["category_type"], r["category"]): r for r in out}
    assert by_cat[("all", "all")]["recall"] == 1.0
    assert by_cat[("all", "all")]["f1"] == 1.0
    assert by_cat[("tissue", "breast")]["precision"] == 1.0
    assert by_cat[("platform", "mibi")]["jaccard"] == 1.0


def test_validate_output_shape():
    from deepcell_data_engineering_spark.dataset.builder import validate_output_shape

    assert validate_output_shape((20, 40)) == [(20, 40)] * 3
    assert validate_output_shape([(20, 20), (10, 10), (5, 5)]) == [
        (20, 20), (10, 10), (5, 5)]
    for bad in (20, (20,), [(20, 20), (10, 10)], "shape"):
        with pytest.raises(ValueError):
            validate_output_shape(bad)


def test_build_dataset_orchestration(spark):
    from deepcell_data_engineering_spark.dataset.builder import build_dataset

    splits = build_dataset(
        _dataset(spark, SPECS),
        output_shape=(20, 20),
        data_split=(0.5, 0.25, 0.25),
        seed=7,
        balance=True,
        cache=False,
    )
    assert set(splits) == {"train", "val", "test"}
    # 8 images at (.5,.25,.25) -> 4/2/2 images; each 40x40 tiles into 4
    # 20x20; balance upsamples train/val but NEVER test
    n = {k: v.count() for k, v in splits.items()}
    assert n["test"] == 8
    assert n["train"] >= 16 and n["val"] >= 8
    # every output row is tile-shaped
    for k in splits:
        dims = splits[k].select("height", "width").distinct().collect()
        assert [(d["height"], d["width"]) for d in dims] == [(20, 20)]
    # determinism: same seed -> same membership
    again = build_dataset(
        _dataset(spark, SPECS), output_shape=(20, 20),
        data_split=(0.5, 0.25, 0.25), seed=7, balance=True, cache=False,
    )
    for k in splits:
        a = sorted(r["img_idx"] for r in splits[k].select("img_idx").collect())
        b = sorted(r["img_idx"] for r in again[k].select("img_idx").collect())
        assert a == b
    # clean after tiling drops empty tiles (min_objects applies per tile)
    cleaned = build_dataset(
        _dataset(spark, SPECS), output_shape=(20, 20),
        data_split=(0.5, 0.25, 0.25), seed=7, min_objects=1, cache=False,
    )
    assert cleaned["train"].count() <= 16


def test_per_experiment_split(spark):
    from deepcell_data_engineering_spark.dataset.splitter import per_experiment_split

    # 3 experiments x 6 images each, keyed by tissue as the experiment col
    specs = [(f"exp{e}", "mibi", 2) for e in range(3) for _ in range(6)]
    df = _dataset(spark, specs)  # tissue column holds exp id
    out = per_experiment_split(df, exp_col="tissue", data_split=(0.5, 0.25, 0.25), seed=1)
    per = (
        out.groupBy("tissue", "split").count().collect()
    )
    counts = {(r["tissue"], r["split"]): r["count"] for r in per}
    # every experiment contributes to every split: 3/1/2 or similar per exp
    for e in range(3):
        assert counts[(f"exp{e}", "train")] == 3
        assert counts[(f"exp{e}", "val")] >= 1
        assert counts[(f"exp{e}", "test")] >= 1
        assert sum(counts[(f"exp{e}", s)] for s in ("train", "val", "test")) == 6
    # deterministic
    again = per_experiment_split(df, exp_col="tissue", data_split=(0.5, 0.25, 0.25), seed=1)
    a = sorted(map(tuple, out.select("img_idx", "split").collect()))
    b = sorted(map(tuple, again.select("img_idx", "split").collect()))
    assert a == b


def test_build_dataset_uniform_schema_small_n(spark):
    from deepcell_data_engineering_spark.dataset.builder import build_dataset

    with pytest.warns(UserWarning):
        splits = build_dataset(
            _dataset(spark, SPECS[:1]), output_shape=(20, 20), seed=0, cache=False
        )
    cols = {k: v.columns for k, v in splits.items()}
    assert cols["train"] == cols["val"] == cols["test"]
    # empty splits union cleanly with populated ones
    allrows = splits["train"].unionByName(splits["val"]).unionByName(splits["test"])
    assert allrows.count() == splits["train"].count()


def test_scale_mode_split_tranches_nested_no_driver_permutation(spark):
    """exact_parity=False: tranches still nest (prefixes of one hash
    order), sizes and duplication contracts hold, and the only collects
    during plan build are O(#partitions) ranking offsets."""
    df = _dataset(spark, SPECS)
    out = split_tranches(df, split_counts=[2, 4, 8], seed=7, exact_parity=False)
    ids = {
        k: sorted(r["img_idx"] for r in v.select("img_idx").collect())
        for k, v in out.items()
    }
    assert len(ids["2"]) == 2 and len(ids["4"]) == 4 and len(ids["8"]) == 8
    assert set(ids["2"]) <= set(ids["4"]) <= set(ids["8"])
    # seed-deterministic
    again = split_tranches(df, split_counts=[4], seed=7, exact_parity=False)
    assert sorted(r["img_idx"] for r in again["4"].select("img_idx").collect()) == ids["4"]
    # different seed -> (almost surely) different prefix
    other = split_tranches(df, split_counts=[4], seed=8, exact_parity=False)
    other_ids = sorted(r["img_idx"] for r in other["4"].select("img_idx").collect())
    assert len(other_ids) == 4
    # duplication up to min_size
    dup = split_tranches(df, split_counts=[2], min_size=5, seed=0, exact_parity=False)
    assert dup["2"].count() == 5
    assert dup["2"].select("img_idx").distinct().count() == 2


def test_scale_mode_train_val_test_split_contract(spark):
    df = _dataset(spark, SPECS)
    out = train_val_test_split(df, (0.5, 0.25, 0.25), seed=3, exact_parity=False)
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {"train": 4, "val": 2, "test": 2}
    # disjoint and total
    assert out.select("img_idx").distinct().count() == 8
    # deterministic per seed
    again = train_val_test_split(df, (0.5, 0.25, 0.25), seed=3, exact_parity=False)
    a = {(r["img_idx"], r["split"]) for r in out.select("img_idx", "split").collect()}
    b = {(r["img_idx"], r["split"]) for r in again.select("img_idx", "split").collect()}
    assert a == b


def test_scale_mode_balance_dataset_contract(spark):
    df = _dataset(spark, SPECS)  # breast:3, gi:3, immune:2
    out = balance_dataset(df, seed=1, category="tissue", exact_parity=False)
    counts = {
        r["tissue"]: r["n"]
        for r in out.groupBy("tissue").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(counts.values()) == {3}  # every category at the max
    # full categories keep each member exactly once
    breast = out.where(F.col("tissue") == "breast").select("img_idx").collect()
    assert sorted(r["img_idx"] for r in breast) == [0, 1, 5]
    # upsampled category draws only from its own members
    immune = {r["img_idx"] for r in out.where(F.col("tissue") == "immune").collect()}
    assert immune <= {4, 7}
    # (img_idx, copy) unique -> downstream row identity preserved
    assert out.select("img_idx", "copy").distinct().count() == out.count()
    # deterministic per seed
    again = balance_dataset(df, seed=1, category="tissue", exact_parity=False)
    assert sorted(
        (r["img_idx"], r["copy"]) for r in again.select("img_idx", "copy").collect()
    ) == sorted((r["img_idx"], r["copy"]) for r in out.select("img_idx", "copy").collect())


def test_per_experiment_split_scale_mode(spark):
    """exact_parity=False: same per-experiment size contract and
    determinism as the RNG-parity mode, but only one COUNT per
    experiment touches the driver (no id lists)."""
    from deepcell_data_engineering_spark.dataset.splitter import per_experiment_split

    specs = [(f"exp{e}", "mibi", 2) for e in range(3) for _ in range(6)]
    df = _dataset(spark, specs)
    out = per_experiment_split(
        df, exp_col="tissue", data_split=(0.5, 0.25, 0.25), seed=1,
        exact_parity=False,
    )
    counts = {
        (r["tissue"], r["split"]): r["count"]
        for r in out.groupBy("tissue", "split").count().collect()
    }
    for e in range(3):
        assert counts[(f"exp{e}", "train")] == 3
        assert counts[(f"exp{e}", "val")] >= 1
        assert counts[(f"exp{e}", "test")] >= 1
        assert sum(counts[(f"exp{e}", s)] for s in ("train", "val", "test")) == 6
    again = per_experiment_split(
        df, exp_col="tissue", data_split=(0.5, 0.25, 0.25), seed=1,
        exact_parity=False,
    )
    a = sorted(map(tuple, out.select("img_idx", "split").collect()))
    b = sorted(map(tuple, again.select("img_idx", "split").collect()))
    assert a == b
    # both modes agree on the SIZES (not the membership — different orders)
    parity = per_experiment_split(
        df, exp_col="tissue", data_split=(0.5, 0.25, 0.25), seed=1
    )
    pc = {
        (r["tissue"], r["split"]): r["count"]
        for r in parity.groupBy("tissue", "split").count().collect()
    }
    assert pc == counts

