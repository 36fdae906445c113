"""Round-4 kernel decision: per-head loop vs head-PACKED vs two-block PAIR.

One process, interleaved rounds (tunnel drift ~7% makes cross-process
compares invalid — BASELINE.md), timing the FULL two-block decoder stack
(B=2048, L=250, D=64, 8 heads) for every variant:

  b4   sequential per-head loop, tile_b=4      (production default)
  e2   sequential head-packed,  tile_b=2
  e4   sequential head-packed,  tile_b=4
  p2   PAIR per-head loop,      tile_b=2
  q1   PAIR head-packed,        tile_b=1
  q2   PAIR head-packed,        tile_b=2

Decision rules (ops/pallas/fft_block.py):
  - if a packed variant beats b4 with ULP-scale diffs -> _packed_default
    returns L > 32 and _tile_b's packed branch gets the winning tile;
  - if a pair variant beats the best sequential -> 'pallas_pair' auto
    flips on in models/fft_model._pair_mode + _tile_b_pair gets the tile.

Run from the repo root: python scripts/profiling/profile_r4.py
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

import bench

cfg = bench._setup()
from seq2squiggle_tpu.profiles import update_config_for_profile
from seq2squiggle_tpu.runtime.simulate import resolve_weights
from seq2squiggle_tpu.ops.pallas.fft_block import (
    fused_fft_block,
    fused_fft_block_pair,
)

profile = 'dna-r10-prom'
config = update_config_for_profile(profile, cfg)
params, _ = resolve_weights(bench._weights(), config, 42, profile)
n_head = int(config['decoder_heads'])

VARIANTS = (
    ("b4", False, False, 4),
    ("e2", True, False, 2),
    ("e4", True, False, 4),
    ("p2", False, True, 2),
    ("q1", True, True, 1),
    ("q2", True, True, 2),
)

if __name__ == "__main__":
    dev = jax.devices()[0]
    P = jax.device_put(params, dev)
    blk0 = P['decoder']['blocks'][0]
    blk1 = P['decoder']['blocks'][1]
    B, T, D = 2048, 250, 64
    x0 = jax.device_put(jnp.asarray(
        np.random.default_rng(0).standard_normal((B, T, D)) * 0.1,
        jnp.bfloat16), dev)
    probe = jax.jit(lambda o: o[0, 0, 0])

    def make_fn(packed, pair, tb):
        if pair:
            return jax.jit(lambda x: fused_fft_block_pair(
                x, blk0, blk1, n_head, tile_b=tb, packed=packed))
        return jax.jit(lambda x: fused_fft_block(
            fused_fft_block(x, blk0, n_head, tile_b=tb, packed=packed),
            blk1, n_head, tile_b=tb, packed=packed))

    fns, outs = {}, {}
    for tag, packed, pair, tb in VARIANTS:
        f = make_fn(packed, pair, tb)
        try:
            outs[tag] = np.asarray(f(x0)[:8]).astype(np.float32)
            fns[tag] = f
            print(f'{tag} compiled', flush=True)
        except Exception:
            traceback.print_exc(limit=1)
            print(f'{tag} FAILED to compile', flush=True)
    for tag in fns:
        if tag == "b4" or "b4" not in outs:
            continue
        print(f'{tag} vs b4: max|diff|',
              float(np.max(np.abs(outs[tag] - outs["b4"]))),
              'max|b4|', float(np.max(np.abs(outs["b4"]))), flush=True)

    def t_of(f, n):
        t0 = time.perf_counter()
        x = x0
        for _ in range(n):
            x = f(x)
        np.asarray(probe(x))  # 1-byte D2H fetch = the only real sync
        return time.perf_counter() - t0

    res = {v: [] for v in fns}
    for rnd in range(4):
        for vtag, f in fns.items():
            t1 = t_of(f, 1)
            t17 = t_of(f, 17)
            res[vtag].append((t17 - t1) / 16 * 1e3)
    for vtag, times in res.items():
        ts = ", ".join(f"{t:.2f}" for t in times)
        print(f'{vtag}: min {min(times):.3f} ms/2blocks  (rounds: {ts})',
              flush=True)
