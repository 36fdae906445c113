"""Pins for bench.py helpers (the driver's per-round artifact builder).

bench.py itself needs the tunneled TPU, but its host-side helpers are
plain functions — keep them pinned so artifact fields stay trustworthy.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_sys_busy_seconds_monotonic_and_counts_cpu():
    v1 = bench._sys_busy_seconds()
    assert v1 is None or v1 > 0.0
    if v1 is None:  # non-Linux fallback: field is simply omitted
        return
    # burn ~0.05 s of CPU; system busy time must advance at least that much
    t0 = time.process_time()
    while time.process_time() - t0 < 0.05:
        pass
    v2 = bench._sys_busy_seconds()
    assert v2 >= v1 + 0.04


def test_wire_layout_row_bytes_stable():
    """The ULP tier's 127 B/row layout is a load-bearing perf constant
    (BASELINE.md: ~79 MB on the wire for the 10k run); fail loudly if a
    field edit changes the row size unnoticed."""
    import numpy as np

    from seq2squiggle_tpu.runtime.predict import wire_layout

    row = sum(n * np.dtype(dt).itemsize
              for _, dt, n in wire_layout(2, 250, 16))
    assert row == 127
