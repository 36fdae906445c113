"""Sinusoid positional-encoding table.

Same table as the classic FastSpeech encoding used by the reference
(src/seq2squiggle/layers.py:145-165): angle(pos, i) = pos / 10000^(2*(i//2)/d),
sin on even dims, cos on odd dims. Angles are computed in float64 and cast to
float32 before sin/cos, matching the reference's python-float -> FloatTensor
pipeline bit-for-bit at float32 precision.
"""

from __future__ import annotations

import numpy as np


def sinusoid_encoding_table(n_position: int, d_hid: int) -> np.ndarray:
    positions = np.arange(n_position, dtype=np.float64)[:, None]  # (P, 1)
    dim_idx = np.arange(d_hid, dtype=np.float64)[None, :]  # (1, D)
    angles = positions / np.power(10000.0, 2.0 * np.floor(dim_idx / 2.0) / d_hid)
    table = angles.astype(np.float32)
    table[:, 0::2] = np.sin(table[:, 0::2])
    table[:, 1::2] = np.cos(table[:, 1::2])
    return table  # (n_position, d_hid) float32
