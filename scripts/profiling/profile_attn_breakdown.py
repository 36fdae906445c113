"""Stage-cost breakdown of the head-packed decoder kernel (round 4).

After the packed flip the decoder stack costs ~13.2 ms/batch of the
16 ms predict step, with matmul FLOPs analytically ~3 ms of it — the
rest is elementwise/VPU work. This script times ABLATED variants of the
production fused block (ops/pallas/fft_block.py `ablate=` hooks, each
removing exactly one stage) interleaved in one process, so stage costs
fall out as differences against the full kernel:

  exp   = full - noexp      (the exp op itself on the (HL, L) scores)
  shift = full - noshift    (Cauchy-Schwarz bound machinery)
  mask  = full - nomask     (padded-key-column where)
  den   = full - noden      (den matmul + collapse + divide)
  ffn   = full - noffn      (dff=256 FFN + final LN)
  attn  = full - noattn     (everything between proj and fc)

Production shape: B=2048, L=250 (padded 256), D=64, H=8, two sequential
blocks, tile_b=4. Run from the repo root on hardware:
  python scripts/profiling/profile_attn_breakdown.py
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
from seq2squiggle_tpu.ops.pallas.fft_block import fused_fft_block

profile = 'dna-r10-prom'
config = update_config_for_profile(profile, cfg)
params, _ = resolve_weights(bench._weights(), config, 42, profile)
n_head = int(config['decoder_heads'])

ABLATIONS = ("", "noexp", "bf16exp", "noshift", "nomask", "noden",
             "noffn", "noattn", "thin16")

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

    def make_fn(ablate):
        return jax.jit(lambda x: fused_fft_block(
            fused_fft_block(x, blk0, n_head, packed=True, ablate=ablate),
            blk1, n_head, packed=True, ablate=ablate))

    fns = {}
    for tag in ABLATIONS:
        f = make_fn(tag)
        try:
            np.asarray(probe(f(x0)))
            fns[tag or "full"] = f
            print(f'{tag or "full"} compiled', flush=True)
        except Exception:
            traceback.print_exc(limit=1)
            print(f'{tag} FAILED to compile', flush=True)

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
    mins = {}
    for vtag, times in res.items():
        ts = ", ".join(f"{t:.2f}" for t in times)
        mins[vtag] = min(times)
        print(f'{vtag}: min {min(times):.3f} ms/2blocks  (rounds: {ts})',
              flush=True)
    full = mins.get("full")
    if full:
        print("\nstage costs (full - ablated), ms/2blocks:", flush=True)
        for vtag, m in mins.items():
            if vtag != "full":
                print(f'  {vtag:8s}: {full - m:+.3f}', flush=True)
