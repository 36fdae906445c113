"""Where does the round-5 train step's time go? (35.3 ms at B=1024)

Times jitted value_and_grad of progressively-smaller slices of the
training computation, so stage costs fall out as differences:

  full step        — make_train_step (fwd + 3-term loss + grads + optax)
  loss_fn grad     — same minus the optimizer update
  signal-only grad — prediction path only (encoder+regulate+decoder+MSE)
  decoder grad     — decoder_forward alone on a precomputed expanded input
  encoder grad     — encoder_forward (+ heads) alone

Slope method like profile_train.py. Run from the repo root on hardware:
  python scripts/profiling/profile_train_breakdown.py [batch]
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2] / "tests"))
import time

import jax
import jax.numpy as jnp
import numpy as np

import bench

cfg = bench._setup()
cfg["compute_dtype"] = "bfloat16"

from test_preprocess import make_events

from seq2squiggle_tpu.models.fft_model import (
    decoder_forward, duration_gamma_params, encoder_forward, init_params,
    noise_head,
)
from seq2squiggle_tpu.ops.regulator import length_regulate
from seq2squiggle_tpu.train.loop import (
    loss_fn, make_train_step, model_forward_train,
)
from seq2squiggle_tpu.train.optimizers import build_optimizer
from seq2squiggle_tpu.train.preprocess import build_chunkset


def slope(fn, sync, n=17, rounds=3):
    fn()
    sync(fn())
    res = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        sync(fn())
        t1 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        sync(out)
        t2 = time.perf_counter()
        res.append(((t2 - t1) - (t1 - t0)) / (n - 1))
    return min(res) * 1e3


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    dev = jax.devices()[0]
    df = make_events(4096 * 8, seed=0, read_name="r0")
    data = build_chunkset(df, cfg, rna=False, partition_by=False)
    scale = cfg["scaling_max_value"]
    rng = np.random.default_rng(0)
    idx = rng.integers(0, data["chunks"].shape[0], B)
    batch = {
        "chunks": jax.device_put(data["chunks"][idx].astype(np.float32), dev),
        "targets": jax.device_put(
            (data["targets"][idx].astype(np.float32) / scale)[..., None], dev),
        "chunks_lengths": jax.device_put(
            data["chunks_lengths"][idx].astype(np.int32), dev),
        "stdevs": jax.device_put(
            data["stdevs"][idx].astype(np.float32) / scale, dev),
    }
    mask = jax.device_put(np.ones(B, np.float32), dev)
    key = jax.random.key(1)
    params = jax.device_put(init_params(cfg, jax.random.key(0)), dev)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]

    results = {}

    # full step (fresh state per call set is unnecessary for timing — the
    # step donates, so rebind params/opt per call via a stateful closure)
    optimizer = build_optimizer(cfg, total_steps=10_000)
    step = make_train_step(cfg, optimizer)
    state = {"p": params, "o": optimizer.init(params)}

    def full():
        state["p"], state["o"], m = step(state["p"], state["o"], batch,
                                         mask, key)
        return m["total_loss"]

    results["full_step"] = slope(full, lambda x: np.asarray(x))

    # loss_fn grad (no optimizer)
    g_loss = jax.jit(jax.grad(
        lambda p: loss_fn(p, batch, mask, cfg, key)[0]))
    results["loss_grad"] = slope(lambda: g_loss(state["p"]), sync)

    # signal-term-only grad
    def signal_only(p):
        pred, *_ = model_forward_train(p, batch, cfg, key)
        return jnp.mean(jnp.square(pred - batch["targets"]))

    g_sig = jax.jit(jax.grad(signal_only))
    results["signal_grad"] = slope(lambda: g_sig(state["p"]), sync)

    # decoder-only grad on a precomputed expanded input
    compute_dtype = jnp.bfloat16
    data2 = batch["chunks"].reshape(B, 16, -1).astype(compute_dtype)
    enc_out, emb = encoder_forward(state["p"], data2, cfg)
    expanded, _, _ = length_regulate(
        enc_out, batch["chunks_lengths"], cfg["max_signal_len"])
    expanded = jax.device_put(jax.lax.stop_gradient(expanded), dev)

    def dec_only(p):
        out = decoder_forward(p, expanded, cfg,
                              dropout_rng=jax.random.fold_in(key, 3))
        return jnp.mean(jnp.square(out.astype(jnp.float32)))

    g_dec = jax.jit(jax.grad(dec_only))
    results["decoder_grad"] = slope(lambda: g_dec(state["p"]), sync)

    # encoder+heads grad
    def enc_only(p):
        eo, em = encoder_forward(p, data2, cfg,
                                 dropout_rng=jax.random.fold_in(key, 1))
        emf = jax.lax.stop_gradient(em).astype(jnp.float32)
        np_ = noise_head(p, emf, cfg)
        c, r = duration_gamma_params(p, emf, cfg)
        return (jnp.mean(jnp.square(eo.astype(jnp.float32)))
                + jnp.mean(np_) + jnp.mean(c) + jnp.mean(r))

    g_enc = jax.jit(jax.grad(enc_only))
    results["encoder_heads_grad"] = slope(lambda: g_enc(state["p"]), sync)

    print(f"B={B}")
    for k, v in results.items():
        print(f"  {k:>20}: {v:7.2f} ms")
    print(f"  optimizer ≈ full-loss = "
          f"{results['full_step'] - results['loss_grad']:.2f} ms")
    print(f"  dur/noise terms ≈ loss-signal = "
          f"{results['loss_grad'] - results['signal_grad']:.2f} ms")
    print(f"  regulate+glue ≈ signal - decoder - encoder = "
          f"{results['signal_grad'] - results['decoder_grad'] - results['encoder_heads_grad']:.2f} ms")
