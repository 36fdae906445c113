"""Torch-checkpoint import: state_dict name mapping and native round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seq2squiggle_tpu.config import load_config
from seq2squiggle_tpu.models.fft_model import encoder_forward, init_params
from seq2squiggle_tpu.models.torch_import import (
    load_native_checkpoint,
    params_from_state_dict,
    save_native_checkpoint,
)


def _fake_state_dict(cfg, rng):
    """Build a reference-shaped state_dict with random values (torch layout:
    Linear weights are (out, in))."""
    d = cfg["dmodel"]
    dff = cfg["dff"]
    vocab = len(cfg["allowed_chars"]) * cfg["seq_kmer"]
    sd = {}

    def lin(name, i, o):
        sd[f"{name}.weight"] = rng.standard_normal((o, i)).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(o).astype(np.float32)

    def ln(name):
        sd[f"{name}.weight"] = rng.standard_normal(d).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(d).astype(np.float32)

    def block(prefix):
        for w in ("w_qs", "w_ks", "w_vs", "fc"):
            lin(f"{prefix}.slf_attn.{w}", d, d)
        ln(f"{prefix}.slf_attn.layer_norm")
        lin(f"{prefix}.pos_ffn.w_1", d, dff)
        lin(f"{prefix}.pos_ffn.w_2", dff, d)
        ln(f"{prefix}.pos_ffn.layer_norm")

    lin("encoders.src_emb", vocab, d)
    for i in range(cfg["pre_layers"]):
        lin(f"encoders.pre_net_stack.{i}", d, d)
    sd["encoders.position_enc"] = rng.standard_normal(
        (1, cfg["max_dna_len"], d)
    ).astype(np.float32)
    for i in range(cfg["encoder_layers"]):
        block(f"encoders.layer_stack.{i}")
    sd["decoders.position_enc"] = rng.standard_normal(
        (1, cfg["max_signal_len"], d)
    ).astype(np.float32)
    for i in range(cfg["decoder_layers"]):
        block(f"decoders.layer_stack_FFT.{i}")
    lin("decoders.out_linear", d, 1)
    for head in ("noise_sampler.stdv_layer",
                 "length_regulator.duration_sampler.conc_layer",
                 "length_regulator.duration_sampler.rate_layer"):
        lin(f"{head}.0", d, d)
        lin(f"{head}.3", d, 1)
    return sd


def test_state_dict_mapping_shapes_and_values():
    cfg = load_config(None)
    rng = np.random.default_rng(0)
    sd = _fake_state_dict(cfg, rng)
    params = params_from_state_dict(sd, cfg)
    # kernel = weight.T
    np.testing.assert_array_equal(
        params["encoder"]["src_emb"]["kernel"], sd["encoders.src_emb.weight"].T
    )
    np.testing.assert_array_equal(
        params["decoder"]["out_linear"]["bias"], sd["decoders.out_linear.bias"]
    )
    np.testing.assert_array_equal(
        params["encoder"]["pos_enc"], sd["encoders.position_enc"][0]
    )
    np.testing.assert_array_equal(
        params["duration_sampler"]["rate"]["fc2"]["kernel"],
        sd["length_regulator.duration_sampler.rate_layer.3.weight"].T,
    )
    # imported params drive the forward pass without shape errors
    cfg2 = dict(cfg, compute_dtype="float32")
    one_hot = jnp.zeros((2, 16, 45), jnp.float32)
    enc, emb = encoder_forward(params, one_hot, cfg2)
    assert enc.shape == (2, 16, 64)


def test_native_checkpoint_roundtrip(tmp_path):
    cfg = load_config(None)
    params = init_params(cfg, jax.random.key(0))
    path = str(tmp_path / "model.npz")
    save_native_checkpoint(path, params, cfg)
    params2, cfg2 = load_native_checkpoint(path)
    assert cfg2["seq_kmer"] == cfg["seq_kmer"]
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(params2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lightning_ckpt_import(tmp_path):
    """Full .ckpt path: a Lightning-style checkpoint saved with torch."""
    torch = pytest.importorskip("torch")
    cfg = load_config(None)
    rng = np.random.default_rng(1)
    sd = _fake_state_dict(cfg, rng)
    ckpt = {
        "state_dict": {k: torch.from_numpy(v) for k, v in sd.items()},
        "hyper_parameters": {"config": dict(cfg)},
    }
    path = str(tmp_path / "ref.ckpt")
    torch.save(ckpt, path)

    from seq2squiggle_tpu.models.torch_import import load_torch_checkpoint

    params, ckpt_cfg = load_torch_checkpoint(path)
    assert ckpt_cfg["seq_kmer"] == cfg["seq_kmer"]
    np.testing.assert_array_equal(
        params["encoder"]["src_emb"]["kernel"], sd["encoders.src_emb.weight"].T
    )
