"""Feed-forward-transformer (FFT) block: post-LN multi-head self-attention +
position-wise FFN.

Numerics match the reference block (src/seq2squiggle/layers.py:11-142):
  - explicit q/k/v linear projections with bias
  - scaled dot-product with temperature sqrt(d_k)
  - output projection, residual add, then LayerNorm (post-LN)
  - FFN: Linear(d->dff) -> ReLU -> Linear(dff->d), residual, post-LN
Dropout is inference-off / training-on, handled by the caller via `dropout_rng`.

TPU notes: sequence lengths here are tiny (16 for the encoder, 250 for the
decoder) and d_model=64, so the win is batching and fusion, not tiling; all
matmuls use preferred_element_type=float32 so the MXU accumulates in fp32
even when activations are bfloat16.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def matmul_precision(dtype) -> jax.lax.Precision:
    """float32 activations request HIGHEST precision: the default precision
    runs f32 matmuls with bf16 passes on TPU (and in this stack even on the
    CPU backend), which breaks checkpoint-fidelity guarantees. bfloat16
    activations use the native bf16 x bf16 -> f32 MXU path (DEFAULT)."""
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def linear(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Dense layer; p = {"kernel": (in, out), "bias": (out,)}."""
    y = jnp.dot(
        x,
        p["kernel"].astype(x.dtype),
        preferred_element_type=jnp.float32,
        precision=matmul_precision(x.dtype),
    )
    return (y + p["bias"].astype(jnp.float32)).astype(x.dtype)


def layer_norm(p: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last axis (torch nn.LayerNorm semantics).

    Statistics in float32 regardless of activation dtype.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = normed * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def _maybe_dropout(
    x: jnp.ndarray, rate: float, rng: Optional[jax.Array]
) -> jnp.ndarray:
    if rng is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def multi_head_attention(
    p: dict,
    x: jnp.ndarray,
    n_head: int,
    mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    packed_core: bool = False,
) -> jnp.ndarray:
    """Self-attention with post-LN residual. x: (B, L, D).

    packed_core=True swaps the einsum/softmax core for the head-packed
    Pallas kernel pair with a custom VJP (ops/pallas/attn_core.py) — the
    training fast path. Projections, dropout (same jax.random calls and
    key order), and LayerNorm are identical in both branches, so the RNG
    stream and every non-core tensor are bit-equal across them."""
    B, L, D = x.shape
    d_k = D // n_head
    residual = x

    if packed_core and mask is None:
        from .pallas.attn_core import packed_attention_core

        q = linear(p["w_qs"], x)
        k = linear(p["w_ks"], x)
        v = linear(p["w_vs"], x)
        out = packed_attention_core(q, k, v, n_head)
    else:
        q = linear(p["w_qs"], x).reshape(B, L, n_head, d_k)
        k = linear(p["w_ks"], x).reshape(B, L, n_head, d_k)
        v = linear(p["w_vs"], x).reshape(B, L, n_head, d_k)

        # (B, H, L, d_k)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        attn = jnp.einsum(
            "bhqd,bhkd->bhqk",
            q,
            k,
            preferred_element_type=jnp.float32,
            precision=matmul_precision(x.dtype),
        )
        attn = attn / jnp.sqrt(jnp.float32(d_k))
        if mask is not None:
            # mask: (B, L_k) True = padding position to hide from all queries
            attn = jnp.where(mask[:, None, None, :], -jnp.inf, attn)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)

        out = jnp.einsum(
            "bhqk,bhkd->bhqd",
            attn,
            v,
            preferred_element_type=jnp.float32,
            precision=matmul_precision(x.dtype),
        )
        out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(B, L, D)

    out = linear(p["fc"], out)
    out = _maybe_dropout(out, dropout_rate, dropout_rng)
    return layer_norm(p["ln"], out + residual)


def positionwise_ffn(
    p: dict,
    x: jnp.ndarray,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    residual = x
    h = jax.nn.relu(linear(p["w_1"], x))
    out = linear(p["w_2"], h)
    out = _maybe_dropout(out, dropout_rate, dropout_rng)
    return layer_norm(p["ln"], out + residual)


def fft_block(
    p: dict,
    x: jnp.ndarray,
    n_head: int,
    mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    packed_core: bool = False,
) -> jnp.ndarray:
    rng_a = rng_f = None
    if dropout_rng is not None:
        rng_a, rng_f = jax.random.split(dropout_rng)
    x = multi_head_attention(
        p["attn"], x, n_head, mask=mask, dropout_rate=dropout_rate,
        dropout_rng=rng_a, packed_core=packed_core,
    )
    x = positionwise_ffn(p["ffn"], x, dropout_rate=dropout_rate, dropout_rng=rng_f)
    return x
