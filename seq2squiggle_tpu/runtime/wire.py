"""Host-side decoder for the packed device->host wire formats.

The device ships narrow first-differences of the front-compacted int16
signal (int8, or 12-bit fields packed two-per-three-bytes) plus up to
WIRE_EXC_SLOTS[bits] exact (position, residual) exceptions per row (see
runtime/predict._pack_wire). Reconstruction is two vectorised passes:
scatter the residuals, then a row-wise cumulative sum.
"""

from __future__ import annotations

import numpy as np

from .predict import WIRE_EXC_SLOTS


def unpack_wire(stream: np.ndarray, exc_pos: np.ndarray, exc_val: np.ndarray,
                n_exc: np.ndarray, bits: int = 8) -> np.ndarray:
    """Narrow deltas + int16 exceptions -> (B,T) int16 signal.

    n_exc rows flagged by the device (slot overflow, or a residual outside
    int16) exceed WIRE_EXC_SLOTS[bits] and raise, so the caller downgrades
    the wire tier and recomputes that batch.
    """
    slots = WIRE_EXC_SLOTS[bits]
    max_exc = int(np.max(n_exc))
    if max_exc > slots:
        raise RuntimeError(
            f"wire-format exception overflow: a row produced {max_exc} "
            f"out-of-range deltas (> {slots} slots at {bits}-bit width)"
        )
    if bits == 8:
        B, T = stream.shape
        d = stream.astype(np.int64)
    elif bits == 12:
        B, W = stream.shape
        T = (W // 3) * 2
        s = stream.reshape(B, T // 2, 3).astype(np.uint32)
        u0 = s[..., 0] | ((s[..., 1] & 0xF) << 8)
        u1 = (s[..., 1] >> 4) | (s[..., 2] << 4)
        u = np.empty((B, T), np.int64)
        u[:, 0::2] = u0
        u[:, 1::2] = u1
        d = u - 2048
    else:
        raise ValueError(f"unsupported wire bits {bits}")
    if exc_val.any():
        flat_idx = (
            np.repeat(np.arange(B, dtype=np.int64), exc_pos.shape[1]) * T
            + exc_pos.reshape(-1).astype(np.int64)
        )
        corr = np.bincount(
            flat_idx, weights=exc_val.reshape(-1).astype(np.float64),
            minlength=B * T,
        ).astype(np.int64).reshape(B, T)
        d = d + corr
    return np.cumsum(d, axis=1).astype(np.int16)
