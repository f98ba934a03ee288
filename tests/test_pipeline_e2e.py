"""End-to-end lifecycle tests mirroring SURVEY §3.

§3.1 pre-annotation: load -> contrast adjust (F1) -> channel reorder (P8)
-> crop (R3) -> slice (R6) -> NPZ unit sink with manifest (S13/S21).
§3.2 post-annotation: NPZ scan (S15) -> reconstruct (R8+R7 via recon log)
-> relabel (L2) -> QC (P2) -> summarize (A2 shape).

One synthetic 2-fov, 2-channel experiment flows through the whole thing;
the final masks must reproduce the originals' support and cell counts.
"""

import numpy as np
from pyspark.sql import functions as F

from deepcell_data_engineering_spark.functions.imaging import adjust_images
from deepcell_data_engineering_spark.operators.channels import reorder_channels
from deepcell_data_engineering_spark.operators.labels import cell_counts, find_sparse_images
from deepcell_data_engineering_spark.operators.reconstruct import (
    ReconLog,
    crop_and_slice,
    reconstruct_image_stack,
)
from deepcell_data_engineering_spark.operators.relabel import relabel_data
from deepcell_data_engineering_spark.sources.codecs import decode_y
from deepcell_data_engineering_spark.sources.images import (
    images_df,
    read_npz_units,
    rectangle_grid_labels,
    rows_from_arrays,
    write_npz_units,
)
from deepcell_data_engineering_spark.sources.manifests import create_upload_log


def _experiment(spark, fovs=2, stacks=4, h=60, w=60):
    rows = []
    masks = {}
    for f in range(fovs):
        ys = np.stack(
            [rectangle_grid_labels(h, w, pitch_r=20, pitch_c=20) for _ in range(stacks)]
        )
        xs = (
            np.random.RandomState(f)
            .rand(stacks, h, w, 2)
            .astype(np.float32)
            * 100.0
        )
        rows += rows_from_arrays(f"fov{f}", xs, ys, channels=["DAPI", "Membrane"])
        masks[f"fov{f}"] = ys
    return images_df(spark, rows), masks


def test_full_pipeline_roundtrip(spark, tmp_path):
    images, masks = _experiment(spark)

    # --- §3.1 pre-annotation -------------------------------------------
    adjusted = adjust_images(images, {"blur": 0.5, "gamma_adjust": 1.2}, channel="DAPI")
    reordered = reorder_channels(adjusted, ["Membrane", "DAPI"], full_blank=True)
    units, log = crop_and_slice(
        reordered, crop_size=(40, 40), overlap_frac=0.25, slice_len=2, slice_overlap=0
    )
    out_dir = str(tmp_path / "units")
    manifest_files = write_npz_units(units, out_dir, blank_labels="include")
    written = manifest_files.where(F.col("path").isNotNull())
    filenames = [r["path"].rsplit("/", 1)[-1] for r in written.collect()]
    assert len(filenames) > 0
    manifest = create_upload_log(
        spark, stage="stage_0", aws_folder="exp/e2e", filenames=filenames, job_id=1
    )
    assert manifest.count() == len(filenames)
    assert manifest.where(~F.col("project_url").contains("__stage_0__")).count() == 0

    # --- §3.2 post-annotation ------------------------------------------
    loaded = read_npz_units(spark, out_dir + "/*.npz")
    log2 = ReconLog.from_json(log.to_json())  # sidecar round trip
    restored = reconstruct_image_stack(loaded, log2)

    # channel metadata survived the NPZ hand-off as positional channels
    assert restored.count() == images.count()

    relabeled = relabel_data(restored, relabel_type="all_frames")
    for r in relabeled.collect():
        orig = masks[r["fov"]][r["stack"]]
        m = decode_y(r["y"], r["height"], r["width"])
        np.testing.assert_array_equal(m > 0, orig > 0)
        assert len(np.unique(m)) == len(np.unique(orig))
        # all_frames relabel: labels are dense 1..n per frame
        nz = np.unique(m[m > 0])
        assert nz.min() == 1 and nz.max() == len(nz)

    # --- QC + summary ---------------------------------------------------
    counts = cell_counts(relabeled)
    n_cells = {
        (r["fov"], r["stack"]): r["n_cells"] for r in counts.collect()
    }
    expected = len(np.unique(masks["fov0"][0])) - 1
    assert all(v == expected for v in n_cells.values())
    sparse = find_sparse_images(relabeled, cutoff=expected - 1)
    assert sparse.count() == relabeled.count()  # all images exceed cutoff-1
    assert find_sparse_images(relabeled, cutoff=expected).count() == 0


def test_pipeline_tolerates_missing_units(spark, tmp_path):
    """Delete one unit NPZ between the two pipeline halves: the stitch
    must still reconstruct every fov/stack, with the missing region blank
    (io_utils.py:215-218 tolerance)."""
    import glob
    import os

    images, masks = _experiment(spark, fovs=1, stacks=2)
    units, log = crop_and_slice(images, crop_size=(40, 40), overlap_frac=0.25)
    out_dir = str(tmp_path / "units")
    write_npz_units(units, out_dir).collect()
    victims = sorted(glob.glob(out_dir + "/*crop_3*.npz"))
    assert victims
    for v in victims:
        os.remove(v)
    loaded = read_npz_units(spark, out_dir + "/*.npz")
    restored = reconstruct_image_stack(loaded, ReconLog.from_json(log.to_json()))
    rows = restored.collect()
    assert len(rows) == 2  # both stacks reconstructed
    for r in rows:
        m = decode_y(r["y"], r["height"], r["width"])
        orig = masks["fov0"][r["stack"]]
        # support is a subset of the original (missing crop zeroed), and
        # the untouched upper-left region is intact
        assert set(map(tuple, np.argwhere(m > 0))) <= set(map(tuple, np.argwhere(orig > 0)))
        np.testing.assert_array_equal(m[:20, :20] > 0, orig[:20, :20] > 0)
