"""Microbenchmark of the host-side ULP wire decode (the direct-attach
throughput ceiling — VERDICT r2 next #1).

Builds realistic synthetic ULP-tier batches (B=2048, T=250, K=16, ~10
escapes/row as measured on the R10 demo checkpoint) and times the C++
ulp_event_wire_decode and threefry_normal_fill in isolation.

Usage: python scripts/bench_decode.py [n_batches]
"""

import ctypes
import sys
import time

import numpy as np


def make_ulp_batch(B=2048, T=250, K=16, esc_per_row=10.0, seed=0):
    rng = np.random.default_rng(seed)
    W = (T + 3) // 4
    # symbol mix approximating the trained checkpoint: mostly 0/+1/-1,
    # ~4% escapes
    p3 = esc_per_row / T
    p1 = p2 = 0.22
    p0 = 1.0 - p1 - p2 - p3
    sym = rng.choice(np.array([0, 1, 2, 3], np.uint8), size=(B, W * 4),
                     p=[p0, p1, p2, p3])
    stream = (
        sym[:, 0::4] | (sym[:, 1::4] << 2) | (sym[:, 2::4] << 4)
        | (sym[:, 3::4] << 6)
    ).astype(np.uint8)
    lvl0 = rng.integers(0x3E00, 0x3FA0, B).astype(np.uint16)
    lvl_d = rng.integers(-60, 61, (B, K)).astype(np.int8)
    lvl_esc = np.zeros(B, np.uint16)
    sigma_q = rng.integers(1, 60, (B, K)).astype(np.uint8)
    ends = np.cumsum(rng.integers(8, 24, (B, K)), axis=1)
    ends = np.minimum(ends, T).astype(np.uint8)
    n_esc = (sym[:, :T] == 3).sum(1)
    total = int(n_esc.sum())
    nibs = rng.integers(0, 16, total).astype(np.uint8)
    nibs[nibs == 8] = 9  # keep wides out of the common path
    nf = np.concatenate([nibs, np.zeros(total % 2, np.uint8)])
    esc = (nf[0::2] | (nf[1::2] << 4)).astype(np.uint8)
    wide_b = np.zeros(B, np.uint8)
    ridx = np.arange(B, dtype=np.int32)
    coff = np.zeros(B, np.int32)
    return (stream, lvl0, lvl_d, sigma_q, ends, esc, lvl_esc, wide_b,
            np.zeros(B, np.uint8)), ridx, coff


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    from seq2squiggle_tpu.io.native.build import load_native

    lib = load_native()
    assert lib is not None

    B, T, K = 2048, 250, 16
    outs, ridx, coff = make_ulp_batch(B, T, K)
    stream, lvl0, lvl_d, sigma_q, ends, esc, lvl_esc, wide_b, _ = outs
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    i8p = ctypes.POINTER(ctypes.c_int8)
    i16p = ctypes.POINTER(ctypes.c_int16)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)

    gauss = np.empty((B, T), np.float32)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        lib.threefry_normal_fill(1, 2, ridx.ctypes.data_as(i32p),
                                 coff.ctypes.data_as(i32p), B, T,
                                 gauss.ctypes.data_as(f32p))
    t_noise = (time.perf_counter() - t0) / n_batches

    flat = np.empty(B * T, np.int16)
    counts = np.empty(B, np.int32)

    def run():
        return lib.ulp_event_wire_decode(
            stream.ctypes.data_as(u8p), lvl0.ctypes.data_as(u16p),
            lvl_d.ctypes.data_as(i8p),
            sigma_q.ctypes.data_as(u8p), ends.ctypes.data_as(u8p),
            esc.ctypes.data_as(u8p), lvl_esc.ctypes.data_as(u16p),
            wide_b.ctypes.data_as(u8p),
            gauss.ctypes.data_as(f32p), ridx.ctypes.data_as(i32p),
            B, T, K, B, esc.size * 2, B // 4, B,
            2, ctypes.c_float(0.25 * 281.3 / 2048), ctypes.c_float(0.0),
            ctypes.c_float(1.0), ctypes.c_float(165.0),
            ctypes.c_float(2048.0), ctypes.c_float(281.345551),
            ctypes.c_float(-127.5655735),
            flat.ctypes.data_as(i16p), counts.ctypes.data_as(i32p))

    total = run()  # warm
    t0 = time.perf_counter()
    for _ in range(n_batches):
        run()
    t_dec = (time.perf_counter() - t0) / n_batches

    def run_fused():
        return lib.ulp_event_wire_decode_fused(
            stream.ctypes.data_as(u8p), lvl0.ctypes.data_as(u16p),
            lvl_d.ctypes.data_as(i8p),
            sigma_q.ctypes.data_as(u8p), ends.ctypes.data_as(u8p),
            esc.ctypes.data_as(u8p), lvl_esc.ctypes.data_as(u16p),
            wide_b.ctypes.data_as(u8p),
            1, 2, coff.ctypes.data_as(i32p), ridx.ctypes.data_as(i32p),
            B, T, K, B, esc.size * 2, B // 4, B,
            2, ctypes.c_float(0.25 * 281.3 / 2048), ctypes.c_float(0.0),
            ctypes.c_float(1.0), ctypes.c_float(165.0),
            ctypes.c_float(2048.0), ctypes.c_float(281.345551),
            ctypes.c_float(-127.5655735),
            flat.ctypes.data_as(i16p), counts.ctypes.data_as(i32p))

    total_f = run_fused()
    assert total_f == total
    t0 = time.perf_counter()
    for _ in range(n_batches):
        run_fused()
    t_fused = (time.perf_counter() - t0) / n_batches

    n = B * T
    print(f"samples/batch: {n}  kept: {total}")
    print(f"noise fill : {t_noise*1e3:7.2f} ms/batch  {t_noise/n*1e9:6.2f} ns/sample")
    print(f"ulp decode : {t_dec*1e3:7.2f} ms/batch  {t_dec/n*1e9:6.2f} ns/sample")
    print(f"fused      : {t_fused*1e3:7.2f} ms/batch  {t_fused/n*1e9:6.2f} ns/sample"
          f"  (vs split total {(t_dec+t_noise)/n*1e9:6.2f})")
    # 10k-read bench scale: ~620k rows of T=250
    rows_10k = 620_000
    print(f"projected 10k-read decode: split {(t_dec + t_noise) / B * rows_10k:5.2f} s"
          f"  fused {t_fused / B * rows_10k:5.2f} s")


if __name__ == "__main__":
    main()
