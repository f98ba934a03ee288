"""Tensor payload codecs: numpy arrays <-> binary columns.

The engine's ``images`` table carries pixel data as C-order binary blobs
(X: float32 [h, w, n_channels]; y: int32 [h, w]) with shape metadata in
sibling columns. Binary payloads travel through Arrow batches untouched —
Spark never interprets them except inside pandas UDFs, which keeps all the
relational planning (pruning, partitioning) payload-agnostic and scales to
arbitrary image sizes without exploding row widths.

Semantics source: the reference stores the same pair as compressed NPZ
(caliban_toolbox/utils/io_utils.py:90-119) with X float32
(utils/misc_utils.py:47-48) and integer y (utils/data_utils.py:81,161).
"""

from __future__ import annotations

import io

import numpy as np

X_DTYPE = np.float32
Y_DTYPE = np.int32


def encode_x(arr: np.ndarray) -> bytes:
    """float [h, w, c] -> C-order float32 bytes."""
    return np.ascontiguousarray(arr, dtype=X_DTYPE).tobytes()


def decode_x(payload: bytes, height: int, width: int, n_channels: int) -> np.ndarray:
    return np.frombuffer(payload, dtype=X_DTYPE).reshape(height, width, n_channels)


def encode_y(arr: np.ndarray) -> bytes:
    """int label mask [h, w] (or [h, w, 1]) -> C-order int32 bytes."""
    a = np.asarray(arr)
    if a.ndim == 3:
        a = a[..., 0]
    return np.ascontiguousarray(a, dtype=Y_DTYPE).tobytes()


def decode_y(payload: bytes, height: int, width: int) -> np.ndarray:
    return np.frombuffer(payload, dtype=Y_DTYPE).reshape(height, width)


def encode_npz(x: np.ndarray | None, y: np.ndarray | None) -> bytes:
    """Pack an (X, y) pair as compressed NPZ bytes (io_utils.py:90 parity
    sink format for interop with the reference's files)."""
    buf = io.BytesIO()
    arrays = {}
    if x is not None:
        arrays["X"] = x
    if y is not None:
        arrays["y"] = y
    np.savez_compressed(buf, **arrays)
    return buf.getvalue()


def decode_npz(payload: bytes) -> dict[str, np.ndarray]:
    with np.load(io.BytesIO(payload)) as z:
        return {k: z[k] for k in z.files}
