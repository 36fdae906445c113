"""TPU train-step throughput (round 4).

Times the production jitted train step (train/loop.make_train_step:
forward, three-term loss, grads, optimizer update, donated buffers) on
synthetic preprocessed chunks at the default model size, bf16 compute.
Slope method (t(17) - t(1)) / 16 like the predict profilers — the axon
backend's block_until_ready is a no-op, so a 1-element fetch is the sync.

Run from the repo root on hardware:
  python scripts/profiling/profile_train.py [batch_size ...]
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2] / "tests"))
import time

import jax
import numpy as np

import bench

cfg = bench._setup()
cfg["compute_dtype"] = "bfloat16"

from test_preprocess import make_events  # synthetic eventalign table

from seq2squiggle_tpu.models.fft_model import init_params, count_params
from seq2squiggle_tpu.train.loop import make_train_step
from seq2squiggle_tpu.train.optimizers import build_optimizer
from seq2squiggle_tpu.train.preprocess import build_chunkset

if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [256, 512, 1024]
    dev = jax.devices()[0]
    optimizer = build_optimizer(cfg, total_steps=10_000)
    step = make_train_step(cfg, optimizer)

    df = make_events(4096 * 16, seed=0, read_name="r0")
    data = build_chunkset(df, cfg, rna=False, partition_by=False)
    scale = cfg["scaling_max_value"]
    n = data["chunks"].shape[0]
    print(f"chunks available: {n}", flush=True)
    rng = np.random.default_rng(0)

    for B in sizes:
        idx = rng.integers(0, n, B)
        batch = {
            "chunks": data["chunks"][idx].astype(np.float32),
            "targets": (data["targets"][idx].astype(np.float32) / scale)[
                ..., None],
            "chunks_lengths": data["chunks_lengths"][idx].astype(np.int32),
            "targets_lengths": data["targets_lengths"][idx].astype(np.int32),
            "stdevs": data["stdevs"][idx].astype(np.float32) / scale,
        }
        batch = {k: jax.device_put(v, dev) for k, v in batch.items()}
        mask = jax.device_put(np.ones(B, np.float32), dev)
        key = jax.random.key(1)

        def t_of(n_steps, params, opt_state):
            t0 = time.perf_counter()
            for _ in range(n_steps):
                params, opt_state, metrics = step(params, opt_state, batch,
                                                  mask, key)
            np.asarray(metrics["total_loss"])  # 4-byte fetch = the sync
            return time.perf_counter() - t0, params, opt_state

        # fresh params per size: the step donates (params, opt_state)
        p = jax.device_put(init_params(cfg, jax.random.key(0)), dev)
        if B == sizes[0]:
            print(f"params: {count_params(p):,}", flush=True)
        o = jax.device_put(optimizer.init(p), dev)
        _, p, o = t_of(1, p, o)  # burn-in compile
        res = []
        for _ in range(3):
            t1, p, o = t_of(1, p, o)
            t17, p, o = t_of(17, p, o)
            res.append((t17 - t1) / 16 * 1e3)
        ms = min(res)
        print(f"B={B}: {ms:.2f} ms/step ({B / ms * 1e3:,.0f} chunks/s) "
              f"(rounds: {', '.join(f'{r:.2f}' for r in res)})", flush=True)
