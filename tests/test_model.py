"""Model forward parity against the independent NumPy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seq2squiggle_tpu.config import load_config
from seq2squiggle_tpu.models.fft_model import (
    count_params,
    decoder_forward,
    duration_gamma_params,
    encoder_forward,
    init_params,
    noise_head,
)

from numpy_reference import (
    np_decoder,
    np_encoder,
    np_length_regulate,
    np_mlp_head,
)


@pytest.fixture(scope="module")
def cfg():
    config = load_config(None)
    config["compute_dtype"] = "float32"
    return config


@pytest.fixture(scope="module")
def params(cfg):
    return init_params(cfg, jax.random.key(0))


def _np_params(params):
    return jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), params)


def test_param_count_matches_reference(cfg, params):
    # The reference reports ~220k trainable params with the default config.
    assert count_params(params) == 219_780


def test_encoder_matches_numpy(cfg, params):
    rng = np.random.default_rng(0)
    B = 4
    one_hot = rng.random((B, 16, 45)).astype(np.float32)
    enc_j, emb_j = encoder_forward(params, jnp.asarray(one_hot), cfg)
    enc_n, emb_n = np_encoder(_np_params(params), one_hot.astype(np.float64), cfg)
    np.testing.assert_allclose(np.asarray(enc_j), enc_n, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(emb_j), emb_n, rtol=2e-4, atol=2e-5)


def test_decoder_matches_numpy(cfg, params):
    rng = np.random.default_rng(1)
    B = 2
    x = rng.standard_normal((B, 250, 64)).astype(np.float32)
    out_j = decoder_forward(params, jnp.asarray(x), cfg)
    out_n = np_decoder(_np_params(params), x.astype(np.float64), cfg)
    np.testing.assert_allclose(np.asarray(out_j), out_n, rtol=2e-4, atol=2e-5)


def test_heads_match_numpy(cfg, params):
    rng = np.random.default_rng(2)
    emb = rng.standard_normal((3, 16, 64)).astype(np.float32)
    npp = _np_params(params)
    stdev_j = noise_head(params, jnp.asarray(emb), cfg)
    stdev_n = np_mlp_head(npp["noise_sampler"], emb.astype(np.float64))
    np.testing.assert_allclose(np.asarray(stdev_j), stdev_n, rtol=2e-4, atol=2e-5)

    conc_j, rate_j = duration_gamma_params(params, jnp.asarray(emb), cfg)
    conc_n = np.maximum(np_mlp_head(npp["duration_sampler"]["conc"],
                                    emb.astype(np.float64)), 1e-8)
    rate_n = np.maximum(np_mlp_head(npp["duration_sampler"]["rate"],
                                    emb.astype(np.float64)), 1e-8)
    np.testing.assert_allclose(np.asarray(conc_j), conc_n, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(rate_j), rate_n, rtol=2e-4, atol=2e-5)


def test_length_regulator_matches_reference_algorithm(cfg):
    from seq2squiggle_tpu.ops.regulator import length_regulate

    rng = np.random.default_rng(3)
    B, K, D, T = 5, 16, 8, 250
    x = rng.standard_normal((B, K, D)).astype(np.float32)
    durations = rng.integers(1, 20, (B, K)).astype(np.int32)
    out_j, _, valid = length_regulate(jnp.asarray(x), jnp.asarray(durations), T)
    out_n = np_length_regulate(x.astype(np.float64), durations, T)
    np.testing.assert_allclose(np.asarray(out_j), out_n, rtol=1e-5, atol=1e-6)
    totals = durations.sum(1)
    np.testing.assert_array_equal(
        np.asarray(valid), np.arange(T)[None, :] < totals[:, None]
    )


def test_length_regulator_truncates_beyond_max(cfg):
    """Total duration > T must truncate exactly like the reference's
    negative F.pad (modules.py:384-388)."""
    from seq2squiggle_tpu.ops.regulator import length_regulate

    rng = np.random.default_rng(4)
    B, K, D, T = 3, 16, 4, 250
    x = rng.standard_normal((B, K, D)).astype(np.float32)
    durations = rng.integers(20, 40, (B, K)).astype(np.int32)  # sums to ~480
    assert durations.sum(1).min() > T
    out_j, _, _ = length_regulate(jnp.asarray(x), jnp.asarray(durations), T)
    out_n = np_length_regulate(x.astype(np.float64), durations, T)
    np.testing.assert_allclose(np.asarray(out_j), out_n, rtol=1e-5, atol=1e-6)


def test_zero_duration_tail_is_zero(cfg):
    from seq2squiggle_tpu.ops.regulator import length_regulate

    x = np.ones((1, 16, 4), np.float32)
    durations = np.full((1, 16), 2, np.int32)  # total 32 << 250
    out, _, valid = length_regulate(jnp.asarray(x), jnp.asarray(durations), 250)
    out = np.asarray(out)
    assert np.all(out[0, 32:] == 0)
    assert np.all(out[0, :32] == 1)
