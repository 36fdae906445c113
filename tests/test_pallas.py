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


# ---------------------------------------------------------------------------
# Training path: head-packed attention core with custom VJP (attn_core.py)
# ---------------------------------------------------------------------------


def _xla_attention_core(q, k, v, n_head):
    """The einsum/softmax core exactly as ops/attention.multi_head_attention
    computes it (the oracle the packed kernels must match)."""
    B, L, D = q.shape
    d_k = D // n_head
    qh = q.reshape(B, L, n_head, d_k).transpose(0, 2, 1, 3)
    kh = k.reshape(B, L, n_head, d_k).transpose(0, 2, 1, 3)
    vh = v.reshape(B, L, n_head, d_k).transpose(0, 2, 1, 3)
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32,
                   precision=prec) / jnp.sqrt(jnp.float32(d_k))
    a = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", a, vh,
                   preferred_element_type=jnp.float32, precision=prec)
    return o.astype(q.dtype).transpose(0, 2, 1, 3).reshape(B, L, D)


def _core_qkv(dtype, B=3, L=37, D=64, seed=7):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((B, L, D)), dtype)  # noqa
    return mk(), mk(), mk(), mk()  # q, k, v, cotangent weights


def test_packed_core_fwd_matches_xla_f32():
    from seq2squiggle_tpu.ops.pallas.attn_core import packed_attention_core

    q, k, v, _ = _core_qkv(jnp.float32)  # L=37 exercises the 37->40 pad
    ref = _xla_attention_core(q, k, v, 8)
    out = packed_attention_core(q, k, v, 8)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_core_grads_match_xla_f32():
    """The hand-written backward kernel vs jax.grad through the XLA core:
    all three input grads tight in f32."""
    from seq2squiggle_tpu.ops.pallas.attn_core import packed_attention_core

    q, k, v, w = _core_qkv(jnp.float32)
    gref = jax.grad(lambda a, b, c: jnp.sum(_xla_attention_core(a, b, c, 8)
                                            * w), argnums=(0, 1, 2))(q, k, v)
    gout = jax.grad(lambda a, b, c: jnp.sum(packed_attention_core(a, b, c, 8)
                                            * w), argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gref, gout):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5, err_msg=f"grad_{name}")


def test_packed_core_grads_bf16_ulp_band():
    """Production dtype: grads within a few bf16 ULPs of the XLA path
    (the kernels reorder accumulations, so bit-equality is not expected)."""
    from seq2squiggle_tpu.ops.pallas.attn_core import packed_attention_core

    q, k, v, w = _core_qkv(jnp.bfloat16, B=2, L=50)
    wf = w.astype(jnp.float32)
    gref = jax.grad(
        lambda a, b, c: jnp.sum(_xla_attention_core(a, b, c, 8)
                                .astype(jnp.float32) * wf),
        argnums=(0, 1, 2))(q, k, v)
    gout = jax.grad(
        lambda a, b, c: jnp.sum(packed_attention_core(a, b, c, 8)
                                .astype(jnp.float32) * wf),
        argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gref, gout):
        af = np.asarray(a, np.float32)
        bf = np.asarray(b, np.float32)
        tol = 8 * 2.0 ** -8 * max(1.0, float(np.max(np.abs(af))))
        assert float(np.max(np.abs(af - bf))) <= tol, (
            f"grad_{name}: {float(np.max(np.abs(af - bf)))} > {tol}")


def test_fft_block_packed_core_matches_plain(setup):
    """fft_block(packed_core=True) — the training fast path — vs the plain
    XLA block, values AND grads, with dropout ON to pin that the RNG
    stream (projection->dropout->LN ordering) is identical across the
    two attention cores."""
    cfg, params = setup
    block = params["decoder"]["blocks"][0]
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 60, 64)), jnp.float32)
    key = jax.random.key(3)

    def run(pc):
        return fft_block(block, x, n_head=8, dropout_rate=0.2,
                         dropout_rng=key, packed_core=pc)

    np.testing.assert_allclose(np.asarray(run(True)), np.asarray(run(False)),
                               rtol=1e-4, atol=1e-5)

    def loss(p, pc):
        out = fft_block(p, x, n_head=8, dropout_rate=0.2, dropout_rng=key,
                        packed_core=pc)
        return jnp.sum(out * out)

    gref = jax.grad(lambda p: loss(p, False))(block)
    gout = jax.grad(lambda p: loss(p, True))(block)
    flat_ref = jax.tree_util.tree_leaves_with_path(gref)
    flat_out = dict(
        (jax.tree_util.keystr(kp), leaf)
        for kp, leaf in jax.tree_util.tree_leaves_with_path(gout))
    for kp, ref_leaf in flat_ref:
        name = jax.tree_util.keystr(kp)
        np.testing.assert_allclose(
            np.asarray(flat_out[name]), np.asarray(ref_leaf),
            rtol=5e-4, atol=1e-4, err_msg=name)


@pytest.mark.parametrize("mode", ["core", True])
def test_train_forward_pallas_modes_match_xla(mode):
    """model_forward_train with config pallas_train forced (interpret
    mode on CPU) vs the default XLA path: same dropout stream, same loss
    to within kernel numerics — the whole-train-step integration check
    for BOTH Pallas rungs ("core" = attention-core VJP, True = whole
    fused block)."""
    from seq2squiggle_tpu.config import load_config
    from seq2squiggle_tpu.models.fft_model import init_params
    from seq2squiggle_tpu.train.loop import loss_fn

    cfg = load_config(None)
    cfg["compute_dtype"] = "float32"
    cfg["max_signal_len"] = 50  # keep interpret-mode runtime sane
    cfg["max_dna_len"] = 16
    params = init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(5)
    B, K = 2, 16
    k = cfg["seq_kmer"]
    batch = {
        "chunks": jnp.asarray(
            rng.integers(0, 2, (B, K, k * 5)), jnp.float32),
        "chunks_lengths": jnp.asarray(
            rng.integers(1, 4, (B, K)), jnp.float32),
        "targets": jnp.asarray(rng.standard_normal((B, 50, 1)), jnp.float32),
        "stdevs": jnp.asarray(
            np.abs(rng.standard_normal((B, K))), jnp.float32),
    }
    mask = jnp.ones((B,), jnp.float32)
    key = jax.random.key(9)

    ref_loss, ref_m = loss_fn(params, batch, mask, cfg, key)
    cfg_core = dict(cfg, pallas_train=mode)
    out_loss, out_m = loss_fn(params, batch, mask, cfg_core, key)
    np.testing.assert_allclose(float(out_loss), float(ref_loss),
                               rtol=1e-4, atol=1e-5)

    gref = jax.grad(lambda p: loss_fn(p, batch, mask, cfg, key)[0])(params)
    gout = jax.grad(
        lambda p: loss_fn(p, batch, mask, cfg_core, key)[0])(params)
    ref_leaves = jax.tree_util.tree_leaves_with_path(gref)
    out_leaves = dict(
        (jax.tree_util.keystr(kp), leaf)
        for kp, leaf in jax.tree_util.tree_leaves_with_path(gout))
    for kp, ref_leaf in ref_leaves:
        name = jax.tree_util.keystr(kp)
        np.testing.assert_allclose(
            np.asarray(out_leaves[name]), np.asarray(ref_leaf),
            rtol=2e-3, atol=2e-4, err_msg=name)


def test_packed_core_grads_match_finite_differences():
    """Numerical ground truth (not just the XLA path): jax.test_util
    check_grads runs central finite differences through the custom VJP."""
    from jax.test_util import check_grads

    from seq2squiggle_tpu.ops.pallas.attn_core import packed_attention_core

    rng = np.random.default_rng(3)
    q, k, v = (jnp.asarray(rng.standard_normal((2, 10, 16)), jnp.float32)
               for _ in range(3))

    def f(q, k, v):
        return packed_attention_core(q, k, v, 2)  # H=2, d_k=8

    check_grads(f, (q, k, v), order=1, modes=["rev"], atol=2e-2, rtol=2e-2)


# ---------------------------------------------------------------------------
# Whole-block training kernels (block_train.py)
# ---------------------------------------------------------------------------


def test_fused_block_train_matches_xla_with_dropout(setup):
    """fused_block_train (whole-block fwd+bwd kernels, dropout scales
    in-kernel) vs the XLA block under jax.grad: values AND every weight
    grad, dropout ON with the identical RNG stream."""
    from seq2squiggle_tpu.ops.pallas.block_train import (
        fused_block_train, make_dropout_scales,
    )

    cfg, params = setup
    block = params["decoder"]["blocks"][0]
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.standard_normal((3, 37, 64)), jnp.float32)
    key = jax.random.key(5)
    rate = 0.2
    ra, rf = jax.random.split(key)
    s_a = make_dropout_scales(ra, rate, x.shape, x.dtype)
    s_f = make_dropout_scales(rf, rate, x.shape, x.dtype)

    ref = fft_block(block, x, n_head=8, dropout_rate=rate, dropout_rng=key)
    out = fused_block_train(x, block, s_a, s_f, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss_ref(p, xx):
        return jnp.sum(jnp.square(
            fft_block(p, xx, n_head=8, dropout_rate=rate, dropout_rng=key)))

    def loss_new(p, xx):
        return jnp.sum(jnp.square(fused_block_train(xx, p, s_a, s_f, 8)))

    gp_r, gx_r = jax.grad(loss_ref, argnums=(0, 1))(block, x)
    gp_n, gx_n = jax.grad(loss_new, argnums=(0, 1))(block, x)
    np.testing.assert_allclose(np.asarray(gx_n), np.asarray(gx_r),
                               rtol=1e-3, atol=1e-5, err_msg="gx")
    ref_leaves = jax.tree_util.tree_leaves_with_path(gp_r)
    new_leaves = dict(
        (jax.tree_util.keystr(kp), leaf)
        for kp, leaf in jax.tree_util.tree_leaves_with_path(gp_n))
    for kp, ref_leaf in ref_leaves:
        name = jax.tree_util.keystr(kp)
        # tolerances: LN-adjacent grads are near-cancelling sums, so the
        # atol floor carries them; everything else is rtol-tight
        np.testing.assert_allclose(
            np.asarray(new_leaves[name]), np.asarray(ref_leaf),
            rtol=2e-3, atol=1e-4 * max(1.0, float(
                np.max(np.abs(np.asarray(ref_leaf))))),
            err_msg=name)


def test_fused_block_train_no_dropout_and_bf16(setup):
    """No-dropout path (scales=None) and the production bf16 dtype."""
    from seq2squiggle_tpu.ops.pallas.block_train import fused_block_train

    cfg, params = setup
    block = params["decoder"]["blocks"][1]
    rng = np.random.default_rng(22)
    xf = rng.standard_normal((2, 50, 64)).astype(np.float32)

    ref = fft_block(block, jnp.asarray(xf), n_head=8)
    out = fused_block_train(jnp.asarray(xf), block, None, None, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    xb = jnp.asarray(xf, jnp.bfloat16)
    refb = np.asarray(fft_block(block, xb, n_head=8)).astype(np.float32)
    outb = np.asarray(
        fused_block_train(xb, block, None, None, 8)).astype(np.float32)
    tol = 8 * 2.0 ** -8 * max(1.0, float(np.max(np.abs(refb))))
    assert float(np.max(np.abs(outb - refb))) <= tol


def test_fused_block_train_grads_match_finite_differences(setup):
    """Numerical ground truth for the whole-block backward kernel."""
    from jax.test_util import check_grads

    from seq2squiggle_tpu.ops.pallas.block_train import (
        fused_block_train, make_dropout_scales,
    )

    cfg, params = setup
    block = params["decoder"]["blocks"][0]
    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.standard_normal((1, 10, 64)), jnp.float32)
    ra, rf = jax.random.split(jax.random.key(2))
    s_a = make_dropout_scales(ra, 0.2, x.shape, x.dtype)
    s_f = make_dropout_scales(rf, 0.2, x.shape, x.dtype)

    def f(x, p):
        return fused_block_train(x, p, s_a, s_f, 8)

    check_grads(f, (x, block), order=1, modes=["rev"], atol=5e-2, rtol=5e-2)
