"""Multi-device sharding tests on the 8-virtual-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from seq2squiggle_tpu.config import load_config
from seq2squiggle_tpu.models.fft_model import init_params
from seq2squiggle_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    shard_params,
)


def _cfg():
    cfg = load_config(None)
    cfg["compute_dtype"] = "float32"
    return cfg


def test_mesh_shapes():
    mesh = make_mesh(n_dp=4, n_tp=2)
    assert dict(mesh.shape) == {"dp": 4, "tp": 2}
    mesh = make_mesh()  # all devices on dp
    assert dict(mesh.shape) == {"dp": 8, "tp": 1}


def test_param_shardings_tp_axes():
    cfg = _cfg()
    params = init_params(cfg, jax.random.key(0))
    mesh = make_mesh(n_dp=4, n_tp=2)
    sh = param_shardings(params, mesh)
    ffn0 = sh["encoder"]["blocks"][0]["ffn"]
    assert ffn0["w_1"]["kernel"].spec == jax.sharding.PartitionSpec(None, "tp")
    assert ffn0["w_2"]["kernel"].spec == jax.sharding.PartitionSpec("tp", None)
    assert sh["encoder"]["src_emb"]["kernel"].spec == jax.sharding.PartitionSpec()
    # sharded params actually fit the mesh
    sharded = shard_params(params, mesh)
    k = sharded["encoder"]["blocks"][0]["ffn"]["w_1"]["kernel"]
    assert k.sharding.spec == jax.sharding.PartitionSpec(None, "tp")


def test_dp_predict_matches_single_device():
    """Data-parallel predict over 8 devices must produce bit-identical
    output to single-device execution (per-chunk RNG keys)."""
    from seq2squiggle_tpu.runtime.predict import PredictKnobs, make_predict_fn

    cfg = _cfg()
    params = init_params(cfg, jax.random.key(0))
    knobs = PredictKnobs(wire_bits=16)
    fn = make_predict_fn(cfg, knobs)

    B = 64
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 5, (B, 16, 9)).astype(np.uint8)
    ridx = np.arange(B, dtype=np.int32) // 3
    coff = np.arange(B, dtype=np.int32) % 3
    key = jax.random.key(1)

    sig_single, counts_single = fn(params, codes, ridx, coff, key)

    mesh = make_mesh()  # 8-way dp
    bsh = batch_sharding(mesh)
    codes_sh = jax.device_put(codes, bsh)
    ridx_sh = jax.device_put(ridx, bsh)
    coff_sh = jax.device_put(coff, bsh)
    params_sh = shard_params(params, mesh)
    sig_dp, counts_dp = fn(params_sh, codes_sh, ridx_sh, coff_sh, key)

    np.testing.assert_array_equal(np.asarray(sig_single), np.asarray(sig_dp))
    np.testing.assert_array_equal(
        np.asarray(counts_single), np.asarray(counts_dp)
    )
    # the output really was computed sharded
    assert len(sig_dp.sharding.device_set) == 8


def test_tp_train_step_matches_replicated():
    """A TP=2-sharded train step must match the replicated one numerically."""
    from seq2squiggle_tpu.train.loop import make_train_step
    from seq2squiggle_tpu.train.optimizers import build_optimizer

    cfg = _cfg()
    cfg["train_batch_size"] = 8
    params = init_params(cfg, jax.random.key(0))
    opt = build_optimizer(dict(cfg, lr_schedule="constant"), 10)
    opt_state = opt.init(params)
    step_fn = make_train_step(cfg, opt)

    B, K, T = 8, 16, 250
    rng = np.random.default_rng(1)
    batch = {
        "chunks": rng.random((B, K, 45)).astype(np.float32),
        "targets": rng.random((B, T, 1)).astype(np.float32),
        "chunks_lengths": rng.integers(1, 15, (B, K)).astype(np.int32),
        "targets_lengths": rng.integers(1, T, (B,)).astype(np.int32),
        "stdevs": rng.random((B, K)).astype(np.float32),
    }
    mask = np.ones(B, np.float32)
    key = jax.random.key(2)

    # train_step donates params/opt_state; keep a host copy for run 2
    params_host = jax.tree_util.tree_map(np.asarray, params)
    p1, _, m1 = step_fn(params, opt_state, batch, mask, key)

    mesh = make_mesh(n_dp=4, n_tp=2)
    params_sh = shard_params(params_host, mesh)
    opt_state_sh = opt.init(params_sh)
    bsh = batch_sharding(mesh)
    batch_sh = {k: jax.device_put(v, bsh) for k, v in batch.items()}
    mask_sh = jax.device_put(mask, bsh)
    with mesh:
        p2, _, m2 = step_fn(params_sh, opt_state_sh, batch_sh, mask_sh, key)

    np.testing.assert_allclose(
        float(m1["total_loss"]), float(m2["total_loss"]), rtol=1e-5
    )
    k1 = np.asarray(p1["encoder"]["blocks"][0]["ffn"]["w_1"]["kernel"])
    k2 = np.asarray(p2["encoder"]["blocks"][0]["ffn"]["w_1"]["kernel"])
    np.testing.assert_allclose(k1, k2, rtol=1e-4, atol=1e-6)
