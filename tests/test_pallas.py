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


@pytest.mark.parametrize(
    "L,tile_b,B,packed",
    [(16, 8, 24, False), (250, 4, 8, False), (250, 2, 8, True)],
)
def test_fused_block_matches_xla(setup, L, tile_b, B, packed):
    cfg, params = setup
    block = params["encoder"]["blocks"][0]
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, L, 64)).astype(np.float32)

    ref = fft_block(block, jnp.asarray(x), n_head=8)
    fused = fused_fft_block(
        jnp.asarray(x), block, n_head=8, interpret=True, tile_b=tile_b,
        packed=packed,
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), rtol=2e-3, atol=2e-4
    )


@pytest.mark.parametrize("packed", [False, True])
def test_fused_block_bf16_ulp_agreement(setup, packed):
    """Production dtype: the fused kernel tracks XLA within a few bf16 ULPs.

    The kernel reorders the softmax (post-context divide, denominator
    summed from compute-dtype exps on the MXU), so bf16 outputs are not
    bit-identical to the XLA path — but must stay within ULP-scale noise
    of it (1 bf16 ULP is 2^-8 relative ~ 0.39%).
    """
    cfg, params = setup
    block = params["encoder"]["blocks"][0]
    rng = np.random.default_rng(2)
    x = rng.standard_normal((8, 250, 64)).astype(np.float32)
    xb = jnp.asarray(x, jnp.bfloat16)

    ref = np.asarray(fft_block(block, xb, n_head=8)).astype(np.float32)
    fused = np.asarray(
        fused_fft_block(xb, block, n_head=8, interpret=True, tile_b=4,
                        packed=packed)
    ).astype(np.float32)
    # <= 4 bf16 ULPs relative to the largest activation in the tensor
    # (values are LayerNorm outputs, so the scale is O(1) everywhere).
    tol = 4 * 2.0 ** -8 * max(1.0, float(np.max(np.abs(ref))))
    assert float(np.max(np.abs(fused - ref))) <= tol


@pytest.mark.parametrize("dtype,packed", [
    ("float32", False), ("bfloat16", False), ("bfloat16", True),
])
def test_fused_pair_matches_sequential(setup, dtype, packed):
    """fused_fft_block_pair must be BIT-equal to two sequential
    fused_fft_block calls: the inter-block HBM store/load in compute
    dtype is replaced by the same cast in VMEM, so no tolerance."""
    from seq2squiggle_tpu.ops.pallas.fft_block import fused_fft_block_pair

    cfg, params = setup
    b0 = params["encoder"]["blocks"][0]
    b1 = params["decoder"]["blocks"][0]
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((4, 250, 64)), dtype)

    seq = fused_fft_block(
        fused_fft_block(x, b0, n_head=8, interpret=True, tile_b=2,
                        packed=packed),
        b1, n_head=8, interpret=True, tile_b=2, packed=packed,
    )
    pair = fused_fft_block_pair(x, b0, b1, n_head=8, interpret=True,
                                tile_b=2, packed=packed)
    np.testing.assert_array_equal(
        np.asarray(seq).astype(np.float32), np.asarray(pair).astype(np.float32)
    )


def test_fused_pair_pads_ragged_batch(setup):
    from seq2squiggle_tpu.ops.pallas.fft_block import fused_fft_block_pair

    cfg, params = setup
    b0 = params["decoder"]["blocks"][0]
    b1 = params["decoder"]["blocks"][1]
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((3, 16, 64)), jnp.float32)
    seq = fused_fft_block(fused_fft_block(x, b0, n_head=8, interpret=True,
                                          tile_b=2),
                          b1, n_head=8, interpret=True, tile_b=2)
    pair = fused_fft_block_pair(x, b0, b1, n_head=8, interpret=True, tile_b=2)
    assert pair.shape == (3, 16, 64)
    np.testing.assert_array_equal(np.asarray(seq), np.asarray(pair))


def test_packed_underflow_degrades_to_zero_not_nan(setup):
    """Out-of-distribution guard for the head-packed variant.

    The packed softmax shifts by the per-head Cauchy–Schwarz bound
    ||q_t||·max_s||k_s|| instead of the exact row max; when the bound
    overshoots the true max score by > ~88 nats, every exp in the row
    underflows to f32 zero and the context divide would be 0/0 -> NaN.
    Crafted inputs: activations with huge norms but near-orthogonal
    q/k projections (the block projections are near-identity-scale at
    init, so huge x -> huge ||q||·||k|| with modest q·k). The kernel
    must stay finite (denominator clamp), like the exact-max head loop.
    """
    cfg, params = setup
    block = params["encoder"]["blocks"][0]
    rng = np.random.default_rng(3)
    # Alternate rows between two orthogonal directions, scaled so the
    # per-head bound ||q||*||k||/sqrt(d_k) overshoots typical scores by
    # far more than 88 nats.
    d = np.zeros((2, 64), np.float32)
    d[0, ::2] = 1.0
    d[1, 1::2] = 1.0
    x = (d[np.tile([0, 1], 125)] * 3e3
         + rng.standard_normal((250, 64)) * 1e-2)
    x = np.broadcast_to(x, (2, 250, 64)).astype(np.float32)
    out = fused_fft_block(jnp.asarray(x), block, n_head=8, interpret=True,
                          tile_b=2, packed=True)
    assert np.isfinite(np.asarray(out)).all()


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
