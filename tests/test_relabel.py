"""Relabel family semantics (relabel.py / relabel_test.py analogs)."""

import numpy as np
import pytest

from deepcell_data_engineering_spark.operators.relabel import (
    connected_component_relabel,
    connected_components_np,
    predict_next_frame,
    predict_relationships,
    relabel_all_frames,
    relabel_data,
    relabel_preserve,
    relabel_sequential_np,
    remove_small_objects,
)
from deepcell_data_engineering_spark.sources.codecs import decode_y
from deepcell_data_engineering_spark.sources.images import images_df, rows_from_arrays


def _masks(df):
    return {
        (r["fov"], r["stack"]): decode_y(r["y"], r["height"], r["width"]) for r in df.collect()
    }


def test_relabel_sequential_np():
    img = np.array([[0, 5, 5], [9, 0, 2]], dtype=np.int32)
    out = relabel_sequential_np(img, offset=1)
    assert out[0, 1] == 2 and out[1, 0] == 3 and out[1, 2] == 1 and out[0, 0] == 0
    out = relabel_sequential_np(img, offset=10)
    assert sorted(np.unique(out[out > 0])) == [10, 11, 12]


def test_connected_components_np():
    img = np.zeros((10, 10), dtype=np.int32)
    img[0:3, 0:3] = 5
    img[6:9, 6:9] = 5  # same value, disjoint -> separate components
    img[0, 9] = 7
    out = connected_components_np(img)
    assert len(np.unique(out)) == 4  # bg + 3 components
    assert len(np.unique(out[0:3, 0:3])) == 1
    assert out[0, 9] != out[0, 0] and out[6, 6] != out[0, 0]
    # diagonal touch merges under 8-connectivity
    img2 = np.zeros((4, 4), dtype=np.int32)
    img2[0, 0] = 1
    img2[1, 1] = 1
    assert len(np.unique(connected_components_np(img2))) == 2


def test_relabel_preserve_keeps_relationships(spark):
    ys = np.zeros((3, 20, 20), dtype=np.int32)
    ys[:, 0:5, 0:5] = 40  # cell 40 present in all frames
    ys[0, 10:15, 10:15] = 7
    ys[2, 10:15, 10:15] = 7
    images = images_df(spark, rows_from_arrays("fov1", None, ys))
    out = _masks(relabel_preserve(images, start_val=1))
    # 7 -> 1, 40 -> 2 everywhere (ascending order)
    for s in range(3):
        m = out[("fov1", s)]
        assert set(np.unique(m[ys[s] == 40])) == {2}
    assert set(np.unique(out[("fov1", 0)][ys[0] == 7])) == {1}
    assert set(np.unique(out[("fov1", 2)][ys[2] == 7])) == {1}


def test_relabel_all_frames_independent(spark):
    ys = np.zeros((2, 20, 20), dtype=np.int32)
    ys[0, 0:5, 0:5] = 11
    ys[0, 10:12, 10:12] = 30
    ys[1, 3:6, 3:6] = 99
    images = images_df(spark, rows_from_arrays("fov1", None, ys))
    out = _masks(relabel_all_frames(images, start_val=1))
    assert set(np.unique(out[("fov1", 0)])) == {0, 1, 2}
    assert set(np.unique(out[("fov1", 1)])) == {0, 1}


def test_predict_next_frame_matches_overlap():
    cur = np.zeros((20, 20), dtype=np.int64)
    cur[0:10, 0:10] = 1
    cur[12:18, 12:18] = 2
    nxt = np.zeros((20, 20), dtype=np.int64)
    nxt[1:11, 1:11] = 55  # overlaps cell 1 heavily
    nxt[12:18, 12:18] = 77  # exact overlap with cell 2
    nxt[0:2, 15:19] = 88  # no overlap -> fresh id
    out = predict_next_frame(cur, nxt)
    assert set(np.unique(out[nxt == 55])) == {1}
    assert set(np.unique(out[nxt == 77])) == {2}
    fresh = np.unique(out[nxt == 88])
    assert len(fresh) == 1 and fresh[0] > 2


def test_predict_relationships_stack(spark):
    ys = np.zeros((3, 20, 20), dtype=np.int32)
    ys[0, 0:8, 0:8] = 3
    ys[1, 1:9, 1:9] = 14  # drifts, same cell
    ys[2, 2:10, 2:10] = 9
    images = images_df(spark, rows_from_arrays("fov1", None, ys))
    out = _masks(predict_relationships(images))
    assert set(np.unique(out[("fov1", 0)][ys[0] == 3])) == {1}
    assert set(np.unique(out[("fov1", 1)][ys[1] == 14])) == {1}
    assert set(np.unique(out[("fov1", 2)][ys[2] == 9])) == {1}


def test_remove_small_objects(spark):
    y = np.zeros((1, 20, 20), dtype=np.int32)
    y[0, 0:10, 0:10] = 1  # area 100
    y[0, 15:17, 15:17] = 2  # area 4
    images = images_df(spark, rows_from_arrays("fov1", None, y))
    out = _masks(remove_small_objects(images, min_area=10))
    m = out[("fov1", 0)]
    assert (m[y[0] == 2] == 0).all() and set(np.unique(m[y[0] == 1])) == {1}


def test_relabel_data_dispatch(spark):
    y = np.zeros((1, 10, 10), dtype=np.int32)
    y[0, 0:3, 0:3] = 5
    images = images_df(spark, rows_from_arrays("fov1", None, y))
    assert relabel_data(images, "preserve").count() == 1
    assert relabel_data(images, "all_frames").count() == 1
    assert relabel_data(images, "predict").count() == 1
    with pytest.raises(ValueError):
        relabel_data(images, "bogus")


def test_connected_component_relabel_spark(spark):
    y = np.zeros((1, 20, 20), dtype=np.int32)
    y[0, 0:3, 0:3] = 8
    y[0, 10:13, 10:13] = 8  # same id, disjoint -> split into two cells
    images = images_df(spark, rows_from_arrays("fov1", None, y))
    m = _masks(connected_component_relabel(images))[("fov1", 0)]
    assert len(np.unique(m)) == 3

def test_relabel_preserve_distributed_parity(spark, monkeypatch):
    """Forced-distributed path (mapping joined, never collected) must be
    bit-identical to the broadcast path, and its only driver collects are
    O(#partitions) guards — never O(#cells)."""
    ys = np.zeros((2, 24, 24), dtype=np.int32)
    # 36 distinct ids per frame in 4x4 blocks, shifted between frames,
    # plus one huge sparse id: a dense LUT would allocate ~16 GB.
    v = 1
    for r in range(0, 24, 4):
        for c in range(0, 24, 4):
            ys[0, r : r + 4, c : c + 4] = v
            ys[1, r : r + 4, c : c + 4] = v + 100
            v += 1
    ys[1, 0:2, 0:2] = 2_000_000_000
    images = images_df(spark, rows_from_arrays("fov1", None, ys))

    base = _masks(relabel_preserve(images, distributed=False))

    sizes = []
    df_cls = type(images)  # the concrete (classic) DataFrame class
    orig = df_cls.collect

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(df_cls, "collect", spy)
    dist_df = relabel_preserve(images, distributed=True)
    monkeypatch.undo()
    # plan construction ran only tiny guard collects (unit assert +
    # per-range-partition offsets), never the 73-cell mapping
    assert sizes and max(sizes) <= 40
    dist = _masks(dist_df)

    assert base.keys() == dist.keys()
    for k in base:
        np.testing.assert_array_equal(base[k], dist[k])
    # dense and shared across frames: same physical cell -> same new id
    all_ids = np.unique(np.concatenate([m[m > 0] for m in dist.values()]))
    assert all_ids.min() == 1 and all_ids.max() == len(all_ids)


def test_relabel_dispatcher_streaming_twin_parity(spark, tmp_path):
    """relabel_data on one fixture, both ways: batch input runs
    predict_relationships, streaming input dispatches to the stateful
    fold (streaming/stateful.py) — identical relabeled masks."""
    from deepcell_data_engineering_spark.sources.codecs import encode_y

    ys = np.zeros((4, 24, 24), dtype=np.int32)
    for s in range(4):
        ys[s, s : s + 8, s : s + 8] = 42  # one drifting cell
        ys[s, 16:20, 16:20] = 5 if s < 2 else 0  # second cell dies at s=2
    images = images_df(spark, rows_from_arrays("fov1", None, ys))
    batch_out = _masks(relabel_data(images, relabel_type="predict"))

    rows = [
        {"fov": "fov1", "stack": s, "height": 24, "width": 24, "y": encode_y(ys[s])}
        for s in range(4)
    ]
    src = str(tmp_path / "disp_src")
    spark.createDataFrame(
        rows, "fov STRING, stack INT, height INT, width INT, y BINARY"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "fov STRING, stack INT, height INT, width INT, y BINARY"
    ).parquet(src)
    q = (
        relabel_data(stream, relabel_type="predict")
        .writeStream.format("memory")
        .queryName("disp_relabel")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "disp_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_out = _masks(spark.sql("SELECT * FROM disp_relabel"))
    assert set(stream_out) == set(batch_out)
    for k in batch_out:
        assert np.array_equal(stream_out[k], batch_out[k]), k
    # non-predict types are whole-stack folds: streams rejected
    with pytest.raises(ValueError, match="predict"):
        relabel_data(stream, relabel_type="preserve")
