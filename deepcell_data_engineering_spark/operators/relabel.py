"""Label algebra (SURVEY §2.7 L1–L7).

Semantics source: caliban_toolbox/relabel.py:31-311 and
dataset_builder.py:397-439. Implementations are numpy-only (this
environment has no skimage/scipy): relabel_sequential and 8-connectivity
connected components are re-derived from their public definitions.

Spark design:
- L1 (preserve): the label mapping is *relational* — a distributed
  dense rank over the distinct cell ids of ``labels_long`` — applied to
  pixel payloads either via a size-guarded broadcast or, above the
  guard, via a fully distributed cell_id join + per-image pair list
  (the mapping never touches the driver).
- L2 (all_frames): embarrassingly parallel per image — mapInPandas.
- L3/L4 (predict): inherently sequential along the stack (each frame's
  labels depend on the previous frame's output) — applyInPandas per
  (fov, crop, slice) group, parallel across groups, frames sorted
  in-group. The streaming twin is applyInPandasWithState (§2.6).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepcell_data_engineering_spark.operators.labels import labels_long
from deepcell_data_engineering_spark.sources.codecs import decode_y, encode_y
from deepcell_data_engineering_spark.sources.images import IMAGES_SCHEMA

_IMG_COLS = [f.name for f in IMAGES_SCHEMA.fields]


# ---------------------------------------------------------------------------
# numpy kernels
# ---------------------------------------------------------------------------


def relabel_sequential_np(img: np.ndarray, offset: int = 1) -> np.ndarray:
    """Map the distinct nonzero labels of ``img`` (ascending) to
    offset..offset+n-1 — skimage.segmentation.relabel_sequential semantics."""
    uniq = np.unique(img)
    uniq = uniq[uniq != 0]
    if uniq.size == 0:
        return img.astype(img.dtype, copy=True)
    lut = np.zeros(int(uniq.max()) + 1, dtype=np.int64)
    lut[uniq] = np.arange(offset, offset + uniq.size)
    return lut[img]


def connected_components_np(img: np.ndarray) -> np.ndarray:
    """8-connectivity connected-component labeling of same-valued nonzero
    regions (skimage.measure.label(connectivity=2) semantics), via
    union-find over adjacency edges."""
    h, w = img.shape
    idx = np.arange(h * w).reshape(h, w)
    parent = np.arange(h * w)

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union_pairs(a_idx: np.ndarray, b_idx: np.ndarray) -> None:
        for a, b in zip(a_idx.ravel(), b_idx.ravel()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra

    # neighbor offsets: right, down, down-right, down-left
    for dr, dc in ((0, 1), (1, 0), (1, 1), (1, -1)):
        r0 = slice(0, h - dr)
        r1 = slice(dr, h)
        if dc >= 0:
            c0, c1 = slice(0, w - dc), slice(dc, w)
        else:
            c0, c1 = slice(-dc, w), slice(0, w + dc)
        a, b = img[r0, c0], img[r1, c1]
        mask = (a != 0) & (a == b)
        if mask.any():
            union_pairs(idx[r0, c0][mask], idx[r1, c1][mask])

    flat = img.ravel()
    out = np.zeros(h * w, dtype=np.int64)
    roots = np.array([find(i) if flat[i] != 0 else -1 for i in range(h * w)])
    nz = roots >= 0
    _, inv = np.unique(roots[nz], return_inverse=True)
    out[nz] = inv + 1
    return out.reshape(h, w)


def _iou_matrix(current: np.ndarray, nxt: np.ndarray) -> np.ndarray:
    """IOU between every (current cell, next cell) pair — vectorized
    equivalent of the reference's per-pair loops (relabel.py:129-136)."""
    n_cur = int(current.max()) + 1
    n_nxt = int(nxt.max()) + 1
    inter = np.zeros((n_cur, n_nxt), dtype=np.int64)
    np.add.at(inter, (current.ravel(), nxt.ravel()), 1)
    area_cur = inter.sum(axis=1, keepdims=True)
    area_nxt = inter.sum(axis=0, keepdims=True)
    union = area_cur + area_nxt - inter
    iou = np.zeros((n_cur, n_nxt), dtype=np.float64)
    np.divide(inter, union, out=iou, where=union > 0)
    iou[0, :] = 0.0  # background pairs carry no signal
    iou[:, 0] = 0.0
    return iou


def predict_next_frame(current_img: np.ndarray, next_img: np.ndarray,
                       threshold: float = 0.1) -> np.ndarray:
    """Greedy IOU matching of next_img's cells onto current_img's ids
    (relabel.py:97-224 semantics, including tie-breaks and fresh-id
    assignment for unmatched cells)."""
    next_img = relabel_sequential_np(next_img)
    current_cells = np.unique(current_img[current_img > 0])
    next_cells = np.unique(next_img[next_img > 0])
    if len(current_cells) == 0 or len(next_cells) == 0:
        return next_img

    iou = _iou_matrix(current_img, next_img)
    relabeled = np.zeros(next_img.shape, dtype=np.int64)
    best_current_for = np.argmax(iou, axis=0)  # per next cell
    unmatched: list[int] = []
    used: set[int] = set()

    for next_cell, cur_match in enumerate(best_current_for):
        if cur_match != 0 and cur_match not in used:
            num_matches = int(np.sum(best_current_for == cur_match))
            if num_matches > 1:
                best_next_for = np.argmax(iou, axis=1)
                best_next = best_next_for[cur_match]
                if best_next == 0:
                    continue
                if next_cell != best_next:
                    unmatched.append(next_cell)
                    continue
                if iou[cur_match][next_cell] > threshold:
                    relabeled = np.where(next_img == next_cell, cur_match, relabeled)
                else:
                    unmatched.append(next_cell)
                used.add(int(cur_match))
            else:
                if iou[cur_match][next_cell] > threshold:
                    relabeled = np.where(next_img == next_cell, cur_match, relabeled)
                else:
                    unmatched.append(next_cell)
                used.add(int(cur_match))
        elif cur_match in used and next_cell != 0:
            unmatched.append(next_cell)
        if next_cell != 0 and cur_match == 0:
            unmatched.append(next_cell)

    current_max = int(max(current_img.max(), relabeled.max()))
    for i, cell in enumerate(unmatched):
        relabeled = np.where(next_img == cell, current_max + 1 + i, relabeled)
    return relabeled


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


def _assert_unit(df: DataFrame) -> None:
    """Relabeling happens before cropping/slicing or after reconstruction
    (relabel.py:47-51)."""
    n = df.select(
        F.countDistinct("crop").alias("nc"), F.countDistinct("slice").alias("ns")
    ).collect()[0]
    if n["nc"] > 1 or n["ns"] > 1:
        raise ValueError("relabeling requires un-cropped, un-sliced data")


def _global_dense_ids(cell_ids: DataFrame, start_val: int) -> DataFrame:
    """Distributed dense rank: distinct ``cell_id`` -> contiguous
    ``new_id`` starting at ``start_val`` (operators/ranking.py — driver
    traffic is O(#partitions), never O(#cells))."""
    from deepcell_data_engineering_spark.operators.ranking import global_dense_rank

    return global_dense_rank(
        cell_ids, "cell_id", out_col="new_id", start=start_val
    ).select("cell_id", "new_id")


def _remap_sparse(y: np.ndarray, olds: np.ndarray, news: np.ndarray) -> np.ndarray:
    """Rewrite nonzero labels via sorted-array lookup. Unlike a dense
    LUT of size max(id), memory is O(#mapped cells) — one huge sparse
    cell id cannot blow up the allocation."""
    out = np.zeros(y.shape, dtype=np.int64)
    nz = y != 0
    if nz.any() and olds.size:
        out[nz] = news[np.searchsorted(olds, y[nz])]
    return out


def relabel_preserve(
    df: DataFrame,
    start_val: int = 1,
    distributed: bool | None = None,
    max_broadcast_cells: int = 2_000_000,
) -> DataFrame:
    """L1: one dense mapping across the whole input — every instance of a
    cell id maps to the same new id in every frame/fov.

    Two physical strategies, identical semantics:

    - **broadcast** (small mappings): the {cell_id -> new_id} table is
      collected and broadcast; one narrow mapInPandas rewrites payloads.
    - **distributed** (default above ``max_broadcast_cells`` distinct
      cells, or forced with ``distributed=True``): the mapping NEVER
      touches the driver. Per-image cell rows join the mapping on
      cell_id (shuffle on cell_id), collapse to a per-image pair list
      (small: cells in ONE image), and join back onto the images by
      unit key; the rewrite reads each row's own pair list. Driver
      traffic is O(#range partitions), so billions of distinct cells
      are fine.

    At 100 TB call with a persisted ``df`` — both strategies derive the
    mapping from one labels_long pass and rewrite in a second.
    """
    _assert_unit(df)
    keys = ["fov", "stack", "crop", "slice"]
    img_cells = labels_long(df).select(*keys, "cell_id")
    cells = img_cells.select("cell_id").distinct()
    if distributed is None:
        distributed = cells.count() > max_broadcast_cells
    mapping_df = _global_dense_ids(cells, start_val)

    if not distributed:
        rows = mapping_df.collect()
        olds_g = np.array(sorted(r["cell_id"] for r in rows), dtype=np.int64)
        news_g = np.array(
            [n for _, n in sorted((r["cell_id"], r["new_id"]) for r in rows)],
            dtype=np.int64,
        )
        bc = df.sparkSession.sparkContext.broadcast((olds_g, news_g))

        def remap_bc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            olds, news = bc.value
            for pdf in batches:
                for i in pdf.index:
                    if pdf.at[i, "y"] is None:
                        continue
                    y = decode_y(
                        pdf.at[i, "y"], int(pdf.at[i, "height"]), int(pdf.at[i, "width"])
                    )
                    pdf.at[i, "y"] = encode_y(_remap_sparse(y, olds, news))
                yield pdf[_IMG_COLS]

        return df.mapInPandas(remap_bc, schema=IMAGES_SCHEMA)

    per_img = (
        img_cells.join(mapping_df, "cell_id")
        .groupBy(*keys)
        .agg(F.collect_list(F.struct("cell_id", "new_id")).alias("__map"))
    )
    joined = df.join(per_img, keys, "left")

    def remap_join(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for i in pdf.index:
                if pdf.at[i, "y"] is None:
                    continue
                y = decode_y(
                    pdf.at[i, "y"], int(pdf.at[i, "height"]), int(pdf.at[i, "width"])
                )
                pairs = pdf.at[i, "__map"]
                if pairs is not None and len(pairs):
                    olds = np.array([p["cell_id"] for p in pairs], dtype=np.int64)
                    news = np.array([p["new_id"] for p in pairs], dtype=np.int64)
                    order = np.argsort(olds)
                    y = _remap_sparse(y, olds[order], news[order])
                pdf.at[i, "y"] = encode_y(y)
            yield pdf[_IMG_COLS]

    return joined.mapInPandas(remap_join, schema=IMAGES_SCHEMA)


def relabel_all_frames(df: DataFrame, start_val: int = 1) -> DataFrame:
    """L2: each frame independently relabeled from start_val."""

    def remap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for i in pdf.index:
                if pdf.at[i, "y"] is None:
                    continue
                y = decode_y(pdf.at[i, "y"], int(pdf.at[i, "height"]), int(pdf.at[i, "width"]))
                pdf.at[i, "y"] = encode_y(relabel_sequential_np(y, start_val))
            yield pdf[_IMG_COLS]

    return df.mapInPandas(remap, schema=IMAGES_SCHEMA)


def predict_relationships(df: DataFrame, start_val: int = 1, threshold: float = 0.1) -> DataFrame:
    """L4: relabel frame 0 densely, then greedily propagate ids frame to
    frame along the stack. Sequential within (fov, crop, slice), parallel
    across groups."""
    _assert_unit(df)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("stack").reset_index(drop=True)
        h, w = int(pdf.at[0, "height"]), int(pdf.at[0, "width"])
        prev = None
        for i in pdf.index:
            y = decode_y(pdf.at[i, "y"], h, w)
            if prev is None:
                out = relabel_sequential_np(y, start_val)
            else:
                out = predict_next_frame(prev, y, threshold)
            pdf.at[i, "y"] = encode_y(out)
            prev = out
        return pdf[_IMG_COLS]

    return df.groupBy("fov", "crop", "slice").applyInPandas(fold, schema=IMAGES_SCHEMA)


def relabel_data(df: DataFrame, relabel_type: str = "preserve", start_val: int = 1,
                 threshold: float = 0.1) -> DataFrame:
    """L5 dispatcher (relabel.py:279-311).

    Streaming input + ``predict`` dispatches to the stateful twin
    (streaming/stateful.py:stateful_frame_relabel): the same
    frame-to-frame fold with the previous frame carried in the state
    store, so an unbounded stack relabels incrementally instead of
    buffering a whole (fov, crop, slice) group in one applyInPandas
    call — the scale path for live acquisition. The other relabel
    types are whole-stack by definition and reject streams."""
    if df.isStreaming:
        if relabel_type != "predict":
            raise ValueError(
                f"streaming relabel supports only relabel_type='predict' "
                f"(stateful frame fold); got {relabel_type!r}"
            )
        from deepcell_data_engineering_spark.streaming.stateful import (
            stateful_frame_relabel,
        )

        return stateful_frame_relabel(df, start_val, threshold)
    if relabel_type == "preserve":
        return relabel_preserve(df, start_val)
    if relabel_type == "all_frames":
        return relabel_all_frames(df, start_val)
    if relabel_type == "predict":
        return predict_relationships(df, start_val, threshold)
    raise ValueError(
        f"relabel_type must be one of [preserve, all_frames, predict]: got {relabel_type}"
    )


def connected_component_relabel(df: DataFrame) -> DataFrame:
    """L6: re-derive labels from mask connectivity, per image (components
    never span images — dataset_builder.py:417-428 loops per image)."""

    def remap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for i in pdf.index:
                if pdf.at[i, "y"] is None:
                    continue
                y = decode_y(pdf.at[i, "y"], int(pdf.at[i, "height"]), int(pdf.at[i, "width"]))
                pdf.at[i, "y"] = encode_y(connected_components_np(y))
            yield pdf[_IMG_COLS]

    return df.mapInPandas(remap, schema=IMAGES_SCHEMA)


def remove_small_objects(df: DataFrame, min_area: int) -> DataFrame:
    """L7: zero out cells with area < min_area."""

    def remap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for i in pdf.index:
                if pdf.at[i, "y"] is None:
                    continue
                y = decode_y(pdf.at[i, "y"], int(pdf.at[i, "height"]), int(pdf.at[i, "width"]))
                ids, counts = np.unique(y[y > 0], return_counts=True)
                small = ids[counts < min_area]
                if small.size:
                    y = np.where(np.isin(y, small), 0, y)
                pdf.at[i, "y"] = encode_y(y)
            yield pdf[_IMG_COLS]

    return df.mapInPandas(remap, schema=IMAGES_SCHEMA)
