"""Image contrast-adjustment scalar functions — F1/F2/F5 (SURVEY §2.9).

The reference composes skimage filters inside a widget callback
(utils/widget_utils.py:144-199 `adjust_image`, :236-263 `overlay_images`,
utils/plot_utils.py:35-134 grid overlays). skimage is not available in
this container, so each step is re-implemented as a small NumPy kernel
with the same semantics (separable gaussian, 3x3 sobel, histogram
equalization, min-max rescale); `equalize_adapthist` (CLAHE) is
approximated by clip-limited *global* equalization — the per-tile
interpolation detail is display-only in the reference.

Engine shape: every step is a pure ``np.ndarray -> np.ndarray`` kernel;
`adjust_images` maps the composed pipeline over the images table's packed
channel planes via Arrow-batched mapInPandas — per-row, shuffle-free,
scales linearly with partitions.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from deepcell_data_engineering_spark.sources.codecs import decode_x, encode_x
from deepcell_data_engineering_spark.sources.images import IMAGES_SCHEMA


# ---------------------------------------------------------------------------
# NumPy kernels (single 2D plane, float in / float or uint8 out)
# ---------------------------------------------------------------------------


def gaussian_blur(img: np.ndarray, sigma: float) -> np.ndarray:
    """Separable gaussian filter, edge-replicate padding (the skimage
    `filters.gaussian` default mode='nearest')."""
    if sigma <= 0:
        return img.astype(np.float64)
    radius = max(int(4.0 * sigma + 0.5), 1)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    kernel = np.exp(-0.5 * (x / sigma) ** 2)
    kernel /= kernel.sum()
    out = img.astype(np.float64)
    padded = np.pad(out, ((radius, radius), (0, 0)), mode="edge")
    out = np.apply_along_axis(lambda c: np.convolve(c, kernel, mode="valid"), 0, padded)
    padded = np.pad(out, ((0, 0), (radius, radius)), mode="edge")
    out = np.apply_along_axis(lambda r: np.convolve(r, kernel, mode="valid"), 1, padded)
    return out


def sobel_magnitude(img: np.ndarray) -> np.ndarray:
    """Gradient magnitude with the standard 3x3 sobel stencils,
    edge-replicate padding, normalized by sqrt(2) like skimage's
    `filters.sobel`."""
    p = np.pad(img.astype(np.float64), 1, mode="edge")
    gx = (
        (p[:-2, 2:] + 2 * p[1:-1, 2:] + p[2:, 2:])
        - (p[:-2, :-2] + 2 * p[1:-1, :-2] + p[2:, :-2])
    ) / 8.0
    gy = (
        (p[2:, :-2] + 2 * p[2:, 1:-1] + p[2:, 2:])
        - (p[:-2, :-2] + 2 * p[:-2, 1:-1] + p[:-2, 2:])
    ) / 8.0
    return np.sqrt(gx * gx + gy * gy) / np.sqrt(2.0)


def rescale_intensity(img: np.ndarray, in_range=None, out_range=(0.0, 1.0)) -> np.ndarray:
    """skimage `exposure.rescale_intensity` semantics: linear map of
    ``in_range`` (default: the image's own min/max) onto ``out_range``,
    clipping outside values."""
    lo, hi = (float(img.min()), float(img.max())) if in_range is None else map(float, in_range)
    olo, ohi = map(float, out_range)
    if hi <= lo:
        return np.full_like(img, olo, dtype=np.float64)
    out = (np.clip(img.astype(np.float64), lo, hi) - lo) / (hi - lo)
    return out * (ohi - olo) + olo


def adjust_gamma(img: np.ndarray, gamma: float, gain: float = 1.0) -> np.ndarray:
    """`exposure.adjust_gamma`: gain * img**gamma on the [0, 1]-scaled image."""
    scaled = rescale_intensity(img)
    return gain * np.power(scaled, gamma)


def invert(img: np.ndarray) -> np.ndarray:
    """`util.invert` for float images: max+min - img."""
    return img.max() + img.min() - img


def equalize_hist(img: np.ndarray, nbins: int = 256) -> np.ndarray:
    """`exposure.equalize_hist`: map each pixel to its CDF value."""
    flat = img.ravel()
    hist, bin_edges = np.histogram(flat, bins=nbins)
    cdf = hist.cumsum().astype(np.float64)
    cdf /= cdf[-1]
    centers = (bin_edges[:-1] + bin_edges[1:]) / 2.0
    return np.interp(flat, centers, cdf).reshape(img.shape)


def equalize_adapthist(img: np.ndarray, clip_limit: float = 0.01, nbins: int = 256) -> np.ndarray:
    """Clip-limited equalization (global approximation of CLAHE): the
    histogram is clipped at ``clip_limit * n_pixels`` and the excess
    redistributed uniformly before building the equalization CDF."""
    flat = rescale_intensity(img).ravel()
    hist, bin_edges = np.histogram(flat, bins=nbins, range=(0.0, 1.0))
    limit = max(clip_limit * flat.size, 1.0)
    excess = np.maximum(hist - limit, 0).sum()
    hist = np.minimum(hist, limit) + excess / nbins
    cdf = hist.cumsum()
    cdf /= cdf[-1]
    centers = (bin_edges[:-1] + bin_edges[1:]) / 2.0
    return np.interp(flat, centers, cdf).reshape(img.shape)


def adjust_image(image: np.ndarray, adjust_kwargs: dict) -> np.ndarray:
    """F1 `adjust_image` (utils/widget_utils.py:144-199), same step order:
    gaussian blur -> optional sobel edge add -> gamma -> optional invert ->
    optional hist equalize -> optional adaptive equalize -> rescale to
    uint8 -> brightness window [v_min, v_max]."""
    if image.ndim > 2:
        raise ValueError("adjust_image takes a single 2D channel plane")
    kw = adjust_kwargs
    img = gaussian_blur(image, kw.get("blur", 0.0))
    if kw.get("sobel_toggle", False):
        img = rescale_intensity(img)
        img = img + kw.get("sobel_factor", 1.0) * sobel_magnitude(img)
    img = adjust_gamma(img, kw.get("gamma_adjust", 1.0))
    if kw.get("invert_img", False):
        img = invert(img)
    if kw.get("equalize_hist", False):
        img = equalize_hist(img, nbins=256)
    if kw.get("equalize_adapthist", False):
        img = rescale_intensity(img)
        img = equalize_adapthist(img, clip_limit=0.01, nbins=256)
    img = rescale_intensity(img, out_range=(0, 255)).astype(np.uint8)
    return rescale_intensity(
        img, in_range=(kw.get("v_min", 0), kw.get("v_max", 255)), out_range=(0, 255)
    ).astype(np.uint8)


def overlay_images(img_1: np.ndarray, img_2: np.ndarray, prop_img_1: float,
                   v_min: float = 0, v_max: float = 255) -> np.ndarray:
    """F2 `overlay_images` (utils/widget_utils.py:236-263): weighted blend
    -> uint8 rescale -> adaptive equalize -> uint8 rescale -> brightness
    window."""
    mod = img_1 * prop_img_1 + img_2 * (1.0 - prop_img_1)
    mod = rescale_intensity(mod, out_range=(0, 255)).astype(np.uint8)
    mod = equalize_adapthist(mod, clip_limit=0.01, nbins=256)
    mod = rescale_intensity(mod, out_range=(0, 255)).astype(np.uint8)
    return rescale_intensity(mod, in_range=(v_min, v_max), out_range=(0, 255)).astype(np.uint8)


def overlay_grid_lines(img: np.ndarray, row_starts: list[int], col_starts: list[int],
                       dot_period: int = 2) -> np.ndarray:
    """F5 `overlay_grid_lines` (utils/plot_utils.py:35-95): paint dotted
    crop-boundary lines at the given starts, at the image's max value."""
    out = img.astype(np.float64).copy()
    peak = out.max() if out.size else 1.0
    for r in row_starts:
        if 0 <= r < out.shape[0]:
            out[r, ::dot_period] = peak
    for c in col_starts:
        if 0 <= c < out.shape[1]:
            out[::dot_period, c] = peak
    return out


# ---------------------------------------------------------------------------
# DataFrame wrappers
# ---------------------------------------------------------------------------


def adjust_images(df: DataFrame, adjust_kwargs: dict, channel: str | None = None) -> DataFrame:
    """Apply F1 to every row of the images table (each channel plane, or
    only ``channel``), Arrow-batched, no shuffle. Output planes are uint8
    re-packed as float32 payloads to keep the X codec uniform."""

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = []
            for _, r in pdf.iterrows():
                have = list(r["channels"]) if r["channels"] is not None else []
                h, w = int(r["height"]), int(r["width"])
                x = decode_x(r["X"], h, w, len(have))
                planes = []
                for i, name in enumerate(have):
                    plane = x[:, :, i]
                    if channel is None or name == channel:
                        plane = adjust_image(plane, adjust_kwargs).astype(np.float32)
                    planes.append(plane)
                out_payloads.append(encode_x(np.stack(planes, axis=-1).astype(np.float32)))
            pdf = pdf.copy()
            pdf["X"] = out_payloads
            yield pdf[[f.name for f in IMAGES_SCHEMA.fields]]

    return df.mapInPandas(go, schema=IMAGES_SCHEMA)


def overlay_channel_pair(df: DataFrame, channel_1: str, channel_2: str, prop_img_1: float,
                         v_min: float = 0, v_max: float = 255,
                         out_channel: str = "overlay") -> DataFrame:
    """Apply F2 to two named channels of every image; result is a
    single-channel images table."""

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, chans = [], []
            for _, r in pdf.iterrows():
                have = list(r["channels"]) if r["channels"] is not None else []
                h, w = int(r["height"]), int(r["width"])
                x = decode_x(r["X"], h, w, len(have))
                i1, i2 = have.index(channel_1), have.index(channel_2)
                blended = overlay_images(x[:, :, i1], x[:, :, i2], prop_img_1, v_min, v_max)
                payloads.append(encode_x(blended[:, :, None].astype(np.float32)))
                chans.append([out_channel])
            pdf = pdf.copy()
            pdf["X"] = payloads
            pdf["channels"] = chans
            yield pdf[[f.name for f in IMAGES_SCHEMA.fields]]

    return df.mapInPandas(go, schema=IMAGES_SCHEMA)
