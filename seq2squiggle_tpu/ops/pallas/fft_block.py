"""Fused FFT-block Pallas kernel: post-LN multi-head self-attention + FFN
in one VMEM-resident pass.

The model's sequences are tiny (16 k-mer frames for the encoder, 250 signal
frames for the decoder) and d_model=64, so a whole transformer block for a
batch tile — q/k/v projections, per-head attention, output projection, both
LayerNorms, and the dff=256 FFN — fits comfortably in VMEM. XLA's op-by-op
lowering writes every matmul result back to HBM (~8 round trips of the
activation tensor per block); this kernel reads the tile once and writes it
once.

Numerics match ops/attention.fft_block in bfloat16 compute mode: MXU
matmuls accumulate in float32 (preferred_element_type), LayerNorm/softmax
statistics in float32. The kernel is the bfloat16 fast path; float32
fidelity mode keeps the XLA path with Precision.HIGHEST (see
ops/attention.matmul_precision).

Grid: 1-D over batch tiles (TILE_B x L x D blocks); heads are a static
python loop so per-head (TILE_B, L, L) score tensors never coexist.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Weight order passed to the kernel (flattened from the block param dict).
_WEIGHT_FIELDS: Tuple[Tuple[str, ...], ...] = (
    ("attn", "w_qs", "kernel"), ("attn", "w_qs", "bias"),
    ("attn", "w_ks", "kernel"), ("attn", "w_ks", "bias"),
    ("attn", "w_vs", "kernel"), ("attn", "w_vs", "bias"),
    ("attn", "fc", "kernel"), ("attn", "fc", "bias"),
    ("attn", "ln", "scale"), ("attn", "ln", "bias"),
    ("ffn", "w_1", "kernel"), ("ffn", "w_1", "bias"),
    ("ffn", "w_2", "kernel"), ("ffn", "w_2", "bias"),
    ("ffn", "ln", "scale"), ("ffn", "ln", "bias"),
)


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _layer_norm(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return normed * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _block_kernel(
    x_ref,
    wq, bq, wk, bk, wv, bv, wf, bf, ln1s, ln1b,
    w1, b1, w2, b2, ln2s, ln2b,
    out_ref,
    *,
    n_head: int,
    compute_dtype,
):
    TB, L, D = x_ref.shape
    d_k = D // n_head
    inv_temp = 1.0 / (d_k ** 0.5)

    x = x_ref[:].astype(compute_dtype)
    x2 = x.reshape(TB * L, D)

    def proj(w_ref, b_ref):
        y = jnp.dot(x2, w_ref[:].astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        return (y + b_ref[:].astype(jnp.float32)).astype(compute_dtype)

    # Keep tensors <= 3D and reshape only on the leading (sublane) dim —
    # Mosaic does not lower minor-dim shape casts like (TB*L,D)->(TB,L,H,dk).
    q = proj(wq, bq)  # (TB*L, D)
    k = proj(wk, bk)
    v = proj(wv, bv)

    # Softmax is restructured to minimise VPU passes over the (TB, L, L)
    # score tensor — the decoder's measured hot spot (L=250: each
    # elementwise pass costs ~1 ms/block at B=2048 while every matmul is
    # MXU-cheap). Un-tempered scores come straight off the MXU; ONE fused
    # elementwise pass applies (s - max)·inv_temp and exp and casts to
    # bf16; the row-sum rides the MXU as a dot against a ones vector; the
    # softmax divide happens after the ctx matmul on (TB, L, d_k) — 31x
    # fewer elements than dividing the (TB, L, L) probabilities.
    # Numerics: same max-subtracted exp, denominators accumulate the
    # compute-dtype exps in f32 (MXU) instead of f32 exps. In float32 mode
    # this matches the XLA path to rtol=2e-3 (tests/test_pallas.py); in
    # bfloat16 mode the reordered accumulation lands within a few bf16
    # ULPs of it (pinned by test_fused_block_bf16_ulp_agreement).
    ones_v = jnp.ones((TB, L, 1), compute_dtype)
    ctx_heads = []
    for h in range(n_head):
        sl = slice(h * d_k, (h + 1) * d_k)
        qh = q[:, sl].reshape(TB, L, d_k)
        kh = k[:, sl].reshape(TB, L, d_k)
        vh = v[:, sl].reshape(TB, L, d_k)
        scores = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (TB, L, L) f32, un-tempered
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp((scores - m) * inv_temp).astype(compute_dtype)
        num = jax.lax.dot_general(
            e, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (TB, L, d_k) f32 unnormalised context
        den = jax.lax.dot_general(
            e, ones_v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (TB, L, 1) f32 softmax denominator
        ctx_h = (num / den).astype(compute_dtype)
        ctx_heads.append(ctx_h.reshape(TB * L, d_k))
    ctx = jnp.concatenate(ctx_heads, axis=-1)  # (TB*L, D)

    o = jnp.dot(ctx, wf[:].astype(compute_dtype),
                preferred_element_type=jnp.float32)
    o = o + bf[:].astype(jnp.float32)
    h1 = _layer_norm(o + x2.astype(jnp.float32), ln1s[:], ln1b[:])
    h1c = h1.astype(compute_dtype)

    f = jnp.dot(h1c, w1[:].astype(compute_dtype),
                preferred_element_type=jnp.float32)
    f = jax.nn.relu(f + b1[:].astype(jnp.float32)).astype(compute_dtype)
    f = jnp.dot(f, w2[:].astype(compute_dtype),
                preferred_element_type=jnp.float32)
    f = f + b2[:].astype(jnp.float32)
    out = _layer_norm(f + h1, ln2s[:], ln2b[:]).astype(out_ref.dtype)
    out_ref[:] = out.reshape(TB, L, D)


def _tile_b(L: int) -> int:
    # Sized against the 16 MB VMEM scoped-allocation limit. Mosaic stack-
    # allocates the unrolled per-head score/prob buffers rather than reusing
    # one, so the decoder tile (L=250) must keep 8 heads' (TB, L, L) f32
    # scores simultaneously: TB=4 -> 8 MB + FFN/LN temporaries.
    return 64 if L <= 32 else 4


@functools.partial(
    jax.jit, static_argnames=("n_head", "interpret", "tile_b")
)
def fused_fft_block(
    x: jnp.ndarray,
    block_params: dict,
    n_head: int,
    interpret: bool = False,
    tile_b: int = 0,
) -> jnp.ndarray:
    """Apply one post-LN attention+FFN block via the fused kernel.

    x: (B, L, D); B is padded to a multiple of the batch tile internally.
    """
    B, L, D = x.shape
    TB = tile_b or _tile_b(L)
    pad = (-B) % TB
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, L, D), x.dtype)], axis=0)
    Bp = B + pad

    weights = [_get(block_params, path) for path in _WEIGHT_FIELDS]
    kernel = functools.partial(
        _block_kernel, n_head=n_head, compute_dtype=x.dtype
    )

    grid = (Bp // TB,)
    w_specs = [
        pl.BlockSpec(w.shape, lambda i, s=w.shape: (0,) * len(s),
                     memory_space=pltpu.VMEM)
        for w in weights
    ]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, L, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((TB, L, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, L, D), x.dtype),
        interpret=interpret,
    )(x, *weights)
    return out[:B] if pad else out
