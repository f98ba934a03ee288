"""Tests for the ontology loader (S1-S14), channel ops (P8-P11/F4), and
imaging scalar functions (F1/F2/F5)."""

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from deepcell_data_engineering_spark.functions import imaging
from deepcell_data_engineering_spark.operators import channels as ch
from deepcell_data_engineering_spark.sources import loader
from deepcell_data_engineering_spark.sources.codecs import decode_x, encode_x
from deepcell_data_engineering_spark.sources.images import blank_images


# ---------------------------------------------------------------------------
# OntologySpec / vocab / pruning
# ---------------------------------------------------------------------------


def test_vocab_canonicalization():
    spec = loader.OntologySpec(
        imaging_type=["Flourescent"], compartment=["nuc", "whole cell"],
        specimen_type=["tissue"],
    )
    assert spec._levels["imaging_type"] == ["fluo"]
    assert spec._levels["compartment"] == ["Nuclear", "WholeCell"]
    assert spec._levels["specimen_type"] == ["tissue"]


def test_wildcard_levels_and_predicates(spark):
    spec = loader.OntologySpec(imaging_type=["phase"], marker=["DNA", "Membrane"])
    wild = spec.wildcard_levels()
    assert "specimen_type" in wild and "imaging_type" not in wild and "marker" not in wild
    assert len(spec.predicates()) == 2


def test_compartment_required_unless_phase():
    with pytest.raises(ValueError):
        loader.OntologySpec(imaging_type=["fluo"], compartment=None)
    spec = loader.OntologySpec(imaging_type=["phase"], compartment=None)
    assert spec._levels["compartment"] is None


@pytest.fixture(scope="module")
def ontology_tree(spark, tmp_path_factory):
    """Partitioned parquet tree with 2 imaging types x 2 exp_ids."""
    root = str(tmp_path_factory.mktemp("onto"))
    rows = []
    for imtype in ("fluo", "phase"):
        for exp in ("exp1", "exp2"):
            for i in range(3):
                rows.append((imtype, "tissue", "Nuclear", "DNA", exp, f"f{i}", float(i)))
    df = spark.createDataFrame(
        rows,
        "imaging_type string, specimen_type string, compartment string, "
        "marker string, exp_id string, fname string, v double",
    )
    df.write.partitionBy(*loader.ONTOLOGY_LEVELS[:5]).parquet(root, mode="overwrite")
    return root


def test_ontology_pruned_scan(spark, ontology_tree):
    spec = loader.OntologySpec(imaging_type=["fluorescent"], exp_id=["exp1"])
    df = loader.read_ontology_tree(spark, ontology_tree, spec)
    rows = df.collect()
    assert len(rows) == 3
    assert {r["imaging_type"] for r in rows} == {"fluo"}
    # the pinned levels must appear as pushed partition filters in the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "imaging_type" in plan


def test_datasets_available_flags_sparse(spark, ontology_tree):
    df = loader.read_ontology_tree(spark, ontology_tree)
    avail = loader.datasets_available(df, min_files=1)
    # every leaf has 3 files -> nothing sparse
    assert avail.filter(F.col("sparse")).count() == 0
    assert avail.count() == 4


def test_check_compatibility(spark):
    ok = spark.createDataFrame(
        [(1024, 1024, 0.5, 20), (1024, 1024, 0.5, 20)],
        "dim_x int, dim_y int, pixel_size double, magnification int",
    )
    bad = spark.createDataFrame(
        [(1024, 1024, 0.5, 20), (512, 512, 0.5, 20)],
        "dim_x int, dim_y int, pixel_size double, magnification int",
    )
    assert loader.check_compatibility(ok) is True
    assert loader.check_compatibility(bad) is False


def test_load_metadata_array_join_and_dropna(spark, tmp_path):
    d = tmp_path / "meta"
    d.mkdir()
    (d / "a.json").write_text(json.dumps({"TYPE": ["static", "2d"], "EXP_ID": "e1"}))
    (d / "b.json").write_text(json.dumps({"TYPE": ["dynamic"], "EXP_ID": None}))
    meta = loader.load_metadata(spark, str(d / "*.json"))
    rows = meta.collect()
    assert len(rows) == 1  # b dropped by na.drop
    assert rows[0]["TYPE"] == "static 2d"
    assert rows[0]["metadata_path"].endswith("a.json")


def test_pad_ragged_stacks(spark):
    short = blank_images(spark, fovs=1, stacks=2, height=8, width=8)
    tall = blank_images(spark, fovs=1, stacks=4, height=8, width=8).withColumn(
        "fov", F.lit("fov9")
    )
    padded = loader.pad_ragged_stacks(short.unionByName(tall))
    counts = {r["fov"]: r["n"] for r in padded.groupBy("fov").agg(F.count("*").alias("n")).collect()}
    assert counts == {"fov1": 4, "fov9": 4}
    blanks = padded.filter(F.col("y").isNull())
    assert blanks.count() == 2
    assert {r["stack"] for r in blanks.collect()} == {2, 3}


def test_natural_sort(spark):
    names = ["img10", "img2", "img1", "other3", "other20"]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    out = [r["name"] for r in loader.natural_sorted(df, "name").collect()]
    assert out == ["img1", "img2", "img10", "other3", "other20"]


def test_zip_channel_files(spark):
    dapi = spark.createDataFrame([("d10.tif",), ("d2.tif",), ("d1.tif",)], "path string")
    phase = spark.createDataFrame([("p2.tif",), ("p1.tif",), ("p10.tif",)], "path string")
    zipped = loader.zip_channel_files({"DAPI": dapi, "Phase": phase}).collect()
    assert [r["DAPI"] for r in zipped] == ["d1.tif", "d2.tif", "d10.tif"]
    assert [r["Phase"] for r in zipped] == ["p1.tif", "p2.tif", "p10.tif"]


def test_resolve_saved_files(spark):
    ok = spark.createDataFrame(
        [("fov1", 0, "a.npz"), ("fov2", 0, "b.npz")], "fov string, crop int, path string"
    )
    res = loader.resolve_saved_files(ok, ["fov", "crop"])
    assert res.count() == 2
    dup = spark.createDataFrame(
        [("fov1", 0, "a.npz"), ("fov1", 0, "a_save_version_2.npz")],
        "fov string, crop int, path string",
    )
    with pytest.raises(ValueError, match="multiple save versions"):
        loader.resolve_saved_files(dup, ["fov", "crop"])


def test_decode_image_gated():
    with pytest.raises((NotImplementedError, Exception)):
        loader.decode_image(b"not-an-image", "tif")


# ---------------------------------------------------------------------------
# Channel operators
# ---------------------------------------------------------------------------


def _one_image_df(spark, planes: dict[str, np.ndarray]):
    names = list(planes)
    h, w = next(iter(planes.values())).shape
    x = np.stack([planes[n] for n in names], axis=-1).astype(np.float32)
    from deepcell_data_engineering_spark.sources.images import images_df, rows_from_arrays

    rows = rows_from_arrays("fov1", x[None, ...], np.zeros((1, h, w), np.int32), channels=names)
    return images_df(spark, rows)


def test_reorder_channels_permutes_and_blanks(spark):
    a = np.full((100, 100), 5.0, np.float32)
    b = np.full((100, 100), 7.0, np.float32)
    df = _one_image_df(spark, {"A": a, "B": b})
    out = ch.reorder_channels(df, ["B", "new", "A"], full_blank=True)
    r = out.collect()[0]
    assert r["channels"] == ["B", "new", "A"]
    x = decode_x(r["X"], 100, 100, 3)
    assert float(x[:, :, 0].mean()) == 7.0
    assert float(x[:, :, 2].mean()) == 5.0
    assert float(np.abs(x[:, :, 1]).sum()) == 0.0  # full blank


def test_reorder_channels_noise_fill_and_dup_error(spark):
    df = _one_image_df(spark, {"A": np.zeros((200, 200), np.float32)})
    out = ch.reorder_channels(df, ["A", "noise"], full_blank=False, seed=3)
    r = out.collect()[0]
    x = decode_x(r["X"], 200, 200, 2)
    nz = x[:, :, 1][x[:, :, 1] > 0]
    assert len(nz) == 4  # one sparse pixel per 100x100 box
    assert np.all((nz >= 1) & (nz <= 14))
    with pytest.raises(ValueError, match="duplicated"):
        ch.reorder_channels(df, ["A", "A"])


def test_set_channel_colors(spark):
    df = _one_image_df(
        spark, {"DNA": np.ones((100, 100), np.float32), "Mem": np.full((100, 100), 2.0, np.float32)}
    )
    out = ch.set_channel_colors(df, ["green", "red"])
    r = out.collect()[0]
    assert r["channels"][:3] == ["Mem", "DNA", "blue"]
    with pytest.raises(ValueError, match="not valid"):
        ch.set_channel_colors(df, ["chartreuse", "red"])
    with pytest.raises(ValueError, match="Mismatch"):
        ch.set_channel_colors(df, ["red"])


def test_lift_dims_and_blank_labels(spark):
    df = blank_images(spark, fovs=1, stacks=1, height=8, width=8).drop("crop", "slice")
    lifted = ch.lift_dims(df)
    assert {"crop", "slice"} <= set(lifted.columns)
    assert lifted.select("crop", "slice").first() == (0, 0)
    labeled = ch.make_blank_labels(lifted.select(*blank_images(spark, 1, 1, 8, 8).columns))
    r = labeled.first()
    assert r["compartment"] == "segmentation_label"
    from deepcell_data_engineering_spark.sources.codecs import decode_y

    assert decode_y(r["y"], 8, 8).sum() == 0


# ---------------------------------------------------------------------------
# Imaging kernels
# ---------------------------------------------------------------------------


def test_gaussian_blur_preserves_mean_and_smooths():
    rng = np.random.RandomState(0)
    img = rng.rand(64, 64)
    out = imaging.gaussian_blur(img, sigma=2.0)
    assert out.shape == img.shape
    assert abs(out.mean() - img.mean()) < 0.01
    assert out.std() < img.std()


def test_sobel_finds_edge():
    img = np.zeros((32, 32))
    img[:, 16:] = 1.0
    mag = imaging.sobel_magnitude(img)
    assert mag[:, 15:17].max() == pytest.approx(0.5 / np.sqrt(2))  # unit step response
    assert mag[:, :10].max() == 0.0


def test_rescale_and_gamma_and_invert():
    img = np.array([[0.0, 5.0], [10.0, 10.0]])
    scaled = imaging.rescale_intensity(img)
    assert scaled.min() == 0.0 and scaled.max() == 1.0
    g = imaging.adjust_gamma(img, 2.0)
    assert g[0, 1] == pytest.approx(0.25)
    inv = imaging.invert(img)
    assert inv[0, 0] == 10.0 and inv[1, 1] == 0.0


def test_equalize_hist_flattens():
    rng = np.random.RandomState(1)
    img = rng.exponential(1.0, (128, 128))
    eq = imaging.equalize_hist(img)
    # CDF mapping -> near-uniform: mean ~0.5, range [0,1]
    assert 0.45 < eq.mean() < 0.55
    assert eq.min() >= 0.0 and eq.max() <= 1.0


def test_adjust_image_pipeline_uint8():
    rng = np.random.RandomState(2)
    img = rng.rand(100, 100).astype(np.float32)
    out = imaging.adjust_image(
        img,
        {"blur": 1.0, "equalize_hist": False, "equalize_adapthist": True,
         "gamma_adjust": 0.8, "sobel_toggle": True, "sobel_factor": 10,
         "invert_img": False, "v_min": 10, "v_max": 240},
    )
    assert out.dtype == np.uint8
    assert out.min() == 0 and out.max() == 255
    with pytest.raises(ValueError):
        imaging.adjust_image(rng.rand(4, 4, 2), {})


def test_overlay_images_blend():
    a = np.zeros((100, 100)); b = np.full((100, 100), 255.0)
    out = imaging.overlay_images(a, b, prop_img_1=0.5)
    assert out.dtype == np.uint8 and out.shape == (100, 100)


def test_overlay_grid_lines():
    img = np.ones((20, 20))
    out = imaging.overlay_grid_lines(img, [5], [7], dot_period=2)
    assert out[5, 0] == 1.0 and out[5, 2] == 1.0  # dotted at peak (peak==1)
    img2 = np.arange(400, dtype=float).reshape(20, 20)
    out2 = imaging.overlay_grid_lines(img2, [5], [], dot_period=1)
    assert np.all(out2[5, :] == img2.max())


def test_adjust_images_dataframe(spark):
    rng = np.random.RandomState(3)
    df = _one_image_df(spark, {"A": rng.rand(64, 64).astype(np.float32) * 100})
    out = imaging.adjust_images(df, {"blur": 0.0, "gamma_adjust": 1.0})
    r = out.collect()[0]
    x = decode_x(r["X"], 64, 64, 1)
    assert x.min() >= 0.0 and x.max() <= 255.0


def test_overlay_channel_pair_dataframe(spark):
    df = _one_image_df(
        spark,
        {"A": np.zeros((100, 100), np.float32), "B": np.full((100, 100), 9.0, np.float32)},
    )
    out = imaging.overlay_channel_pair(df, "A", "B", prop_img_1=0.25)
    r = out.collect()[0]
    assert r["channels"] == ["overlay"]
    assert decode_x(r["X"], 100, 100, 1).shape == (100, 100, 1)


# ---------------------------------------------------------------------------
# Regression tests (code-review findings)
# ---------------------------------------------------------------------------


def test_natural_sort_multi_number(spark):
    names = ["d1_9.tif", "d1_10.tif", "d1_2.tif", "d2_1.tif"]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    out = [r["name"] for r in loader.natural_sorted(df, "name").collect()]
    assert out == ["d1_2.tif", "d1_9.tif", "d1_10.tif", "d2_1.tif"]


def test_phase_string_form_allows_none_compartment():
    spec = loader.OntologySpec(imaging_type="phase", compartment=None)
    assert spec._levels["compartment"] is None
    spec2 = loader.OntologySpec(imaging_type=["Phase"], compartment=None)
    assert spec2._levels["compartment"] is None


def test_pad_ragged_stacks_fills_interior_holes(spark):
    df = blank_images(spark, fovs=1, stacks=4, height=8, width=8)
    holey = df.filter(~F.col("stack").isin([1, 2]))  # keep stacks {0, 3}
    padded = loader.pad_ragged_stacks(holey)
    stacks = sorted(r["stack"] for r in padded.select("stack").collect())
    assert stacks == [0, 1, 2, 3]
    assert padded.filter(F.col("y").isNull()).count() == 2


def test_load_metadata_numeric_arrays(spark, tmp_path):
    d = tmp_path / "meta2"
    d.mkdir()
    (d / "a.json").write_text(json.dumps({"dims": [512, 512], "EXP_ID": "e1"}))
    meta = loader.load_metadata(spark, str(d / "*.json"))
    assert meta.collect()[0]["dims"] == "512 512"


def test_set_channel_colors_duplicate_colors_raise(spark):
    df = _one_image_df(
        spark, {"DNA": np.ones((100, 100), np.float32), "Mem": np.ones((100, 100), np.float32)}
    )
    with pytest.raises(ValueError, match="duplicates"):
        ch.set_channel_colors(df, ["red", "red"])
