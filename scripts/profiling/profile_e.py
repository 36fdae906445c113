"""Interleaved kernel timing: per-head loop vs head-PACKED attention.

Drives the PRODUCTION fused_fft_block (ops/pallas/fft_block.py) with
packed=False (the per-head baseline, tile_b=4) and packed=True at
tile_b 2/4/8, on the real decoder block weights at the bench shape
(B=2048, L=250, D=64, 8 heads).

Rationale for the packed variant: the per-head loop's matmuls touch
only d_k=8 of the MXU's 128 lanes (~6% utilization; measured score
dots 6.2 ms + ctx 2.9 + den 0.5 of the 17.6 ms block), and the exact
row-max VPU pass costs another ~5 ms. Packing runs 8x the FLOPs at
full-lane contraction and replaces the row-max with a Cauchy-Schwarz
bound (see _attn_packed).

Prints numeric agreement vs the baseline first, then interleaved
per-round ms/block (take the min; tunnel drift ~7%).

Run from the repo root: python scripts/profiling/profile_e.py
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import time
import jax
import numpy as np
import jax.numpy as jnp
import bench

cfg = bench._setup()
from seq2squiggle_tpu.profiles import update_config_for_profile
from seq2squiggle_tpu.runtime.simulate import resolve_weights
from seq2squiggle_tpu.ops.pallas.fft_block import fused_fft_block

profile = 'dna-r10-prom'
config = update_config_for_profile(profile, cfg)
params, _ = resolve_weights(bench._weights(), config, 42, profile)
n_head = int(config['decoder_heads'])

if __name__ == "__main__":
    dev = jax.devices()[0]
    P = jax.device_put(params, dev)
    blk = P['decoder']['blocks'][0]
    B, T, D = 2048, 250, 64
    x0 = jax.device_put(jnp.asarray(
        np.random.default_rng(0).standard_normal((B, T, D)) * 0.1,
        jnp.bfloat16), dev)
    probe = jax.jit(lambda o: o[0, 0, 0])
    import traceback
    fns = {}
    outs = {}
    for packed, tb in ((False, 4), (True, 2), (True, 4), (True, 8)):
        tag = f"{'e' if packed else 'b'}{tb}"
        f = jax.jit(lambda x, p=packed, t=tb: fused_fft_block(
            x, blk, n_head, tile_b=t, packed=p))
        try:
            outs[tag] = np.asarray(f(x0)[:8]).astype(np.float32)
            fns[tag] = f
            print(f'{tag} compiled', flush=True)
        except Exception:
            traceback.print_exc(limit=1)
            print(f'{tag} FAILED to compile', flush=True)
    for tag in fns:
        if tag == "b4":
            continue
        print(f'{tag} vs b4: max|diff|',
              float(np.max(np.abs(outs[tag] - outs["b4"]))),
              'max|b4|', float(np.max(np.abs(outs["b4"]))), flush=True)

    def t_of(f, n):
        t0 = time.perf_counter()
        x = x0
        for _ in range(n):
            x = f(x)
        np.asarray(probe(x))
        return time.perf_counter() - t0

    res = {v: [] for v in fns}
    for rnd in range(4):
        for vtag, f in fns.items():
            t1 = t_of(f, 1)
            t33 = t_of(f, 33)
            res[vtag].append((t33 - t1) / 32 * 1e3)
    for vtag, times in res.items():
        ts = ", ".join(f"{t:.2f}" for t in times)
        print(f'{vtag}: min {min(times):.3f} ms/block  (rounds: {ts})',
              flush=True)
