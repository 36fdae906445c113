"""Time the packed attention core's fwd and bwd kernels in isolation
(vs the whole decoder-block grad) to locate the residual train cost.

Run from the repo root on hardware:
  python scripts/profiling/profile_core_vjp.py [batch] [bwd_tile_b]
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import time

import jax
import jax.numpy as jnp
import numpy as np

import bench  # noqa: F401  (compile cache + logging setup)
bench._setup()

from seq2squiggle_tpu.ops.pallas.attn_core import (
    _core_bwd_call, _core_fwd_call,
)


def slope(fn, n=17, rounds=3):
    probe = jax.jit(lambda o: jax.tree_util.tree_leaves(o)[0].ravel()[0])
    np.asarray(probe(fn()))
    res = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        np.asarray(probe(fn()))
        t1 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        np.asarray(probe(out))
        t2 = time.perf_counter()
        res.append(((t2 - t1) - (t1 - t0)) / (n - 1))
    return min(res) * 1e3


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    bwd_tb = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    L, D, H = 250, 64, 8
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    q, k, v, g = (jax.device_put(
        jnp.asarray(rng.standard_normal((B, L, D)), jnp.bfloat16), dev)
        for _ in range(4))

    fwd = lambda: _core_fwd_call(q, k, v, H, 0, False)          # noqa: E731
    ms_f = slope(fwd)
    print(f"B={B} L={L}")
    print(f"  core fwd : {ms_f:6.2f} ms/block-call", flush=True)
    for tb in ([bwd_tb] if bwd_tb else [1, 2]):
        try:
            bwd = lambda: _core_bwd_call(q, k, v, g, H, tb, False)  # noqa
            ms_b = slope(bwd)
            print(f"  core bwd tile_b={tb}: {ms_b:6.2f} ms/block-call "
                  f"(2 blocks fwd+bwd ≈ {2*(ms_f+ms_b):.2f} ms)",
                  flush=True)
        except Exception as exc:
            print(f"  core bwd tile_b={tb}: FAILED {type(exc).__name__}",
                  flush=True)
