"""Packed device->host wire format: exact round-trip vs the raw path."""

import jax
import numpy as np
import pytest

from seq2squiggle_tpu.config import load_config
from seq2squiggle_tpu.models.fft_model import init_params
from seq2squiggle_tpu.runtime.predict import (
    PredictKnobs,
    WIRE_EXC_SLOTS,
    _pack_wire,
    make_predict_fn,
)
from seq2squiggle_tpu.runtime.wire import unpack_wire


def test_pack_unpack_roundtrip_random():
    rng = np.random.default_rng(0)
    B, T = 32, 250
    sig = rng.integers(-2000, 2000, (B, T)).astype(np.int16)  # hostile: most
    # deltas exceed int8... cap exceptions by smoothing most rows
    smooth = rng.integers(500, 520, (B, T)).astype(np.int16)
    jumpy_rows = rng.random(B) < 0.3
    sig = np.where(jumpy_rows[:, None], smooth, smooth)
    # inject boundary-style jumps (up to 16 per row)
    for b in range(B):
        for j in rng.integers(0, T, rng.integers(0, 16)):
            sig[b, j:] += rng.integers(-800, 800)
    counts = rng.integers(1, T + 1, B).astype(np.int32)
    sig = np.where(np.arange(T)[None] < counts[:, None], sig, 0).astype(np.int16)

    lo, pos, val, n_exc = jax.jit(_pack_wire)(sig, counts)
    assert int(np.max(np.asarray(n_exc))) <= WIRE_EXC_SLOTS
    out = unpack_wire(np.asarray(lo), np.asarray(pos), np.asarray(val),
                      np.asarray(n_exc))
    mask = np.arange(T)[None] < counts[:, None]
    np.testing.assert_array_equal(out[mask], sig[mask])


def test_overflow_detected():
    # every delta out of range -> overflow must be reported, not corrupted
    T = 250
    sig = (np.arange(T, dtype=np.int16) * 200).reshape(1, T)
    counts = np.array([T], np.int32)
    lo, pos, val, n_exc = jax.jit(_pack_wire)(sig, counts)
    assert int(np.max(np.asarray(n_exc))) > WIRE_EXC_SLOTS
    with pytest.raises(RuntimeError, match="exception overflow"):
        unpack_wire(np.asarray(lo), np.asarray(pos), np.asarray(val),
                    np.asarray(n_exc))


def test_packed_predict_matches_raw():
    cfg = load_config(None)
    cfg["compute_dtype"] = "float32"
    params = init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(1)
    B = 32
    codes = rng.integers(0, 5, (B, 16, 9)).astype(np.uint8)
    ridx = np.arange(B, dtype=np.int32) // 2
    coff = np.arange(B, dtype=np.int32) % 2
    key = jax.random.key(3)

    fn_raw = make_predict_fn(cfg, PredictKnobs(wire_packed=False))
    sig_raw, counts_raw = fn_raw(params, codes, ridx, coff, key)
    sig_raw, counts_raw = np.asarray(sig_raw), np.asarray(counts_raw)

    fn_packed = make_predict_fn(cfg, PredictKnobs(wire_packed=True))
    lo, pos, val, n_exc, counts_p = fn_packed(params, codes, ridx, coff, key)
    sig_packed = unpack_wire(np.asarray(lo), np.asarray(pos),
                             np.asarray(val), np.asarray(n_exc))
    np.testing.assert_array_equal(counts_raw, np.asarray(counts_p))
    mask = np.arange(250)[None] < counts_raw[:, None]
    np.testing.assert_array_equal(sig_packed[mask], sig_raw[mask])
