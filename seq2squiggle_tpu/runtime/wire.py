"""Host-side decoder for the packed device->host wire format.

The device ships int8 first-differences of the front-compacted int16 signal
plus up to WIRE_EXC_SLOTS exact (position, residual) exceptions per row
(see runtime/predict._pack_wire). Reconstruction is two vectorised passes:
scatter the residuals, then a row-wise cumulative sum.
"""

from __future__ import annotations

import numpy as np

from .predict import WIRE_EXC_SLOTS


def unpack_wire(lo: np.ndarray, exc_pos: np.ndarray, exc_val: np.ndarray,
                n_exc: np.ndarray) -> np.ndarray:
    """(B,T) int8 deltas + (B,E) exceptions -> (B,T) int16 signal."""
    max_exc = int(np.max(n_exc))
    if max_exc > WIRE_EXC_SLOTS:
        raise RuntimeError(
            f"wire-format exception overflow: a row produced {max_exc} "
            f"out-of-range deltas (> {WIRE_EXC_SLOTS} slots). This indicates "
            "an extreme signal; rerun with wire_packed=False."
        )
    B, T = lo.shape
    d = lo.astype(np.int64)
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
