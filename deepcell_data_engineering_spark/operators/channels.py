"""Channel projection operators — P8/P9/P10/P11 + F4 (SURVEY §2.2, §2.9).

The reference reorders the channel axis of a dense 4D tensor
(utils/data_utils.py:112-158); here channels live inside each row's packed
``X`` payload with names in the ``channels`` array column, so reorder is a
per-row Arrow-batched plane permutation (mapInPandas) — embarrassingly
parallel, no shuffle, and the channel metadata update is pure projection.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepcell_data_engineering_spark.sources.codecs import decode_x, encode_x
from deepcell_data_engineering_spark.sources.images import IMAGES_SCHEMA

CALIBAN_COLOR_ORDER = ["red", "green", "blue", "cyan", "magenta", "yellow"]


def create_blank_channel(
    height: int, width: int, rng: np.random.RandomState | None = None,
    full_blank: bool = False, dtype=np.float32,
) -> np.ndarray:
    """F4 `create_blank_channel` (utils/data_utils.py:81-109): a mostly
    blank plane with one random pixel of value 1..14 per 100x100 box
    (noise floor that keeps model training from dividing by zero), or all
    zeros when ``full_blank``."""
    blank = np.zeros((height, width), dtype=dtype)
    if full_blank:
        return blank
    rng = rng or np.random.RandomState()
    for r0 in range(height // 100):
        for c0 in range(width // 100):
            blank[r0 * 100 + rng.randint(0, 99), c0 * 100 + rng.randint(0, 99)] = rng.randint(1, 15)
    return blank


def reorder_channels(
    df: DataFrame,
    new_channel_order: list[str],
    full_blank: bool = True,
    seed: int | None = None,
) -> DataFrame:
    """P8 `reorder_channels` (utils/data_utils.py:112-158): project the
    channel planes of every image into ``new_channel_order``; channels the
    image lacks are filled with a blank plane (zeros, or sparse F4 noise
    when ``full_blank=False``). Duplicate names in the order are an error
    (utils/data_utils.py:128-133)."""
    seen: set[str] = set()
    dups = {c for c in new_channel_order if c in seen or seen.add(c)}
    if dups:
        raise ValueError(f"channels duplicated in new_channel_order: {sorted(dups)}")

    order = list(new_channel_order)

    def remap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rng = np.random.RandomState(seed)
            out_x, out_ch = [], []
            for _, r in pdf.iterrows():
                have = list(r["channels"]) if r["channels"] is not None else []
                h, w = int(r["height"]), int(r["width"])
                x = decode_x(r["X"], h, w, len(have)) if r["X"] is not None else None
                planes = []
                for name in order:
                    if x is not None and name in have:
                        planes.append(x[:, :, have.index(name)])
                    else:
                        planes.append(create_blank_channel(h, w, rng, full_blank))
                out_x.append(encode_x(np.stack(planes, axis=-1).astype(np.float32)))
                out_ch.append(order)
            pdf = pdf.copy()
            pdf["X"] = out_x
            pdf["channels"] = out_ch
            yield pdf[[f.name for f in IMAGES_SCHEMA.fields]]

    return df.mapInPandas(remap, schema=IMAGES_SCHEMA)


def set_channel_colors(df: DataFrame, plot_colors: list[str], n_channels: int | None = None) -> DataFrame:
    """P9 `set_channel_colors` (utils/plot_utils.py:137-179): assign each
    existing channel to its requested display color's fixed RGBCMY slot,
    then reorder (slots with no assigned channel keep the color name and
    come out blank)."""
    if not set(plot_colors) <= set(CALIBAN_COLOR_ORDER):
        raise ValueError(f"supplied plot_colors not valid, must be one of: {CALIBAN_COLOR_ORDER}")
    if len(set(plot_colors)) != len(plot_colors):
        raise ValueError("plot_colors contains duplicates; each channel needs its own color")
    first = df.select("channels").first()
    channel_names = list(first["channels"]) if first and first["channels"] else []
    if n_channels is None:
        n_channels = len(channel_names)
    if len(plot_colors) != n_channels:
        raise ValueError("Mismatch between number of imaging channels and supplied plot colors")
    final_order = list(CALIBAN_COLOR_ORDER)
    for idx, color in enumerate(plot_colors):
        final_order[CALIBAN_COLOR_ORDER.index(color)] = channel_names[idx]
    return reorder_channels(df, final_order, full_blank=True)


def lift_dims(df: DataFrame) -> DataFrame:
    """P10 `pad_xr_dims` (utils/data_utils.py:36-78): lift lower-rank data
    into the full unit-key scheme by adding the missing key columns as
    zeros — the relational analog of inserting size-1 dims. Order is
    validated by the fixed schema itself."""
    out = df
    for name, default in (("stack", 0), ("crop", 0), ("slice", 0)):
        if name not in out.columns:
            out = out.withColumn(name, F.lit(default))
    return out


def make_blank_labels(df: DataFrame, compartment: str = "segmentation_label") -> DataFrame:
    """P11 `make_blank_labels` (utils/data_utils.py:161-177): attach an
    all-zero label payload shaped like each image's X."""

    def blank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from deepcell_data_engineering_spark.sources.codecs import encode_y

        for pdf in batches:
            pdf = pdf.copy()
            pdf["y"] = [
                encode_y(np.zeros((int(h), int(w)), dtype=np.int32))
                for h, w in zip(pdf["height"], pdf["width"])
            ]
            pdf["compartment"] = compartment
            yield pdf[[f.name for f in IMAGES_SCHEMA.fields]]

    return df.mapInPandas(blank, schema=IMAGES_SCHEMA)
