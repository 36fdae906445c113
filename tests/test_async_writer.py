"""AsyncWriter: background export thread correctness (order, flush, errors)."""

import time

import numpy as np
import pytest

from seq2squiggle_tpu.runtime.async_writer import AsyncWriter


class _SlowWriter:
    def __init__(self):
        self.batches = []
        self.closed = False
        self.filename = "fake.blow5"

    def write_batch(self, reads):
        time.sleep(0.01)
        self.batches.append(reads)

    def close(self):
        self.closed = True


class _FailingWriter(_SlowWriter):
    def write_batch(self, reads):
        raise IOError("disk full")


def test_order_preserved_and_flush_on_close():
    inner = _SlowWriter()
    w = AsyncWriter(inner)
    expected = []
    for i in range(10):
        batch = {f"read_{i}": np.full(5, i, np.int16)}
        expected.append(batch)
        w.write_batch(batch)
    w.close()
    assert inner.closed
    assert [list(b) for b in inner.batches] == [list(b) for b in expected]


def test_worker_error_propagates():
    w = AsyncWriter(_FailingWriter())
    w.write_batch({"r": np.zeros(3, np.int16)})
    with pytest.raises(IOError, match="disk full"):
        # error surfaces on a subsequent call (write_batch or close)
        for _ in range(100):
            w.write_batch({"r": np.zeros(3, np.int16)})
            time.sleep(0.005)


def test_close_propagates_pending_error():
    w = AsyncWriter(_FailingWriter())
    w.write_batch({"r": np.zeros(3, np.int16)})
    with pytest.raises(IOError, match="disk full"):
        w.close()


def test_backpressure_bounds_queue():
    inner = _SlowWriter()
    w = AsyncWriter(inner, max_queued_batches=2)
    t0 = time.perf_counter()
    for i in range(8):
        w.write_batch({f"r{i}": np.zeros(1, np.int16)})
    # 8 batches x 10 ms with queue depth 2 must block the producer for
    # roughly (8 - 2) x 10 ms; generous lower bound to avoid flakiness
    assert time.perf_counter() - t0 > 0.03
    w.close()
    assert len(inner.batches) == 8
