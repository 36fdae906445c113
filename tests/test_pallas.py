"""Fused Pallas FFT block vs the XLA implementation (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seq2squiggle_tpu.config import load_config
from seq2squiggle_tpu.models.fft_model import init_params
from seq2squiggle_tpu.ops.attention import fft_block
from seq2squiggle_tpu.ops.pallas.fft_block import fused_fft_block


@pytest.fixture(scope="module")
def setup():
    cfg = load_config(None)
    cfg["compute_dtype"] = "float32"
    params = init_params(cfg, jax.random.key(0))
    return cfg, params


@pytest.mark.parametrize("L,tile_b,B", [(16, 8, 24), (250, 4, 8)])
def test_fused_block_matches_xla(setup, L, tile_b, B):
    cfg, params = setup
    block = params["encoder"]["blocks"][0]
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, L, 64)).astype(np.float32)

    ref = fft_block(block, jnp.asarray(x), n_head=8)
    fused = fused_fft_block(
        jnp.asarray(x), block, n_head=8, interpret=True, tile_b=tile_b
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), rtol=2e-3, atol=2e-4
    )


def test_fused_block_pads_ragged_batch(setup):
    cfg, params = setup
    block = params["encoder"]["blocks"][0]
    rng = np.random.default_rng(1)
    x = rng.standard_normal((5, 16, 64)).astype(np.float32)  # 5 % tile != 0
    ref = fft_block(block, jnp.asarray(x), n_head=8)
    fused = fused_fft_block(jnp.asarray(x), block, n_head=8, interpret=True,
                            tile_b=4)
    assert fused.shape == (5, 16, 64)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), rtol=2e-3, atol=2e-4
    )
