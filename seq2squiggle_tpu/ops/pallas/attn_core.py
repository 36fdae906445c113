"""Head-packed attention core with a custom VJP: the TRAINING fast path.

Inference fuses whole FFT blocks into one Pallas kernel
(ops/pallas/fft_block.py), but that kernel has no backward, so training
previously ran the XLA block path end to end — 77.8 ms/step at B=1024
(BASELINE.md round 4), dominated by per-head attention matmuls that use
d_k=8 of the MXU's 128 lanes. This module gives the ATTENTION CORE
(q, k, v) -> softmax(q·kᵀ/√d_k)·v a hand-written forward AND backward
Pallas kernel in the head-packed layout, wrapped in jax.custom_vjp.

Scope is deliberately the core only, not the whole block:
  - the projections / LayerNorms / FFN around it are full-lane matmuls and
    elementwise ops that XLA already fuses well, and they stay exactly as
    written in ops/attention.py — so autodiff handles them, and
  - dropout stays OUTSIDE the kernel in ops/attention._maybe_dropout with
    the same jax.random calls and key folding as the pure-XLA path, so
    train-path RNG is bit-identical whichever attention core runs.

Forward reuses the inference kernel's packed attention body
(fft_block._attn_packed: one matmul per stage across all heads,
Cauchy–Schwarz shift instead of an exact row max, softmax denominator
riding a ones-column of the value matmul). The backward recomputes e and
den from (q, k, v) — flash-attention style, nothing from the forward is
saved except the primals — and packs every gradient contraction the same
way:

  ghat  (TB, HL, D) = g tiled H× down sublanes, head-channel masked
  g_a   (TB, HL, L) = ghat @ v³ᵀ          (head h's dL/da in row block h)
  r     (TB, HL, 1) = Σ_d ghat·ctx        (softmax-jacobian row dot)
  dS    = e ∘ (g_a − r)/den · τ           (dL/d(scores), shift is
                                           constant w.r.t. the softmax)
  g_q   = collapse(dS @ k³)               (contract L)
  g_k   = dSᵀ @ qhat                      (contract HL — 8L full lanes)
  g_v   = (e/den)ᵀ @ ghat                 (contract HL)

Reference semantics: src/seq2squiggle/layers.py:11-142 (the torch
ScaledDotProductAttention the reference trains through, model.py:65-105).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fft_block import _attn_packed, _cs_shift


def _auto_interpret(interpret: bool | None) -> bool:
    """interpret=None resolves to True on the CPU backend (where Mosaic
    cannot compile) — lets pallas_train=True work everywhere, tests run
    the identical code path, and TPU gets the compiled kernel."""
    if interpret is None:
        return jax.default_backend() == "cpu"
    return interpret


def _pad_qkv(x, Lp, TB):
    B, L, D = x.shape
    if Lp != L:
        x = jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0)))
    pad = (-B) % TB
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, Lp, D), x.dtype)], axis=0)
    return x


def _fwd_kernel(q_ref, k_ref, v_ref, out_ref, *, n_head, L_real):
    TB, L, D = q_ref.shape
    cd = q_ref.dtype
    d_k = D // n_head
    inv_temp = 1.0 / (d_k ** 0.5)
    q = q_ref[:].reshape(TB * L, D)
    k = k_ref[:].reshape(TB * L, D)
    v = v_ref[:].reshape(TB * L, D)
    ctx = _attn_packed(q, k, v, TB, L, d_k, n_head, inv_temp, cd, L_real)
    out_ref[:] = ctx.reshape(TB, L, D).astype(out_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, gq_ref, gk_ref, gv_ref, *,
                n_head, L_real):
    """Recompute e/den (bit-matching the forward: same _cs_shift, same
    masking) and run the packed gradient contractions above."""
    TB, L, D = q_ref.shape
    cd = q_ref.dtype
    H = n_head
    d_k = D // H
    inv_temp = 1.0 / (d_k ** 0.5)
    q3 = q_ref[:]
    k3 = k_ref[:]
    v3 = v_ref[:]
    g3 = g_ref[:]

    ch = jax.lax.broadcasted_iota(jnp.int32, (D, H), 0) // d_k
    hh = jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
    hmask_f = (ch == hh).astype(jnp.float32)            # (D, H)
    rowh = jax.lax.broadcasted_iota(jnp.int32, (H * L, D), 0) // L
    colh = jax.lax.broadcasted_iota(jnp.int32, (H * L, D), 1) // d_k
    qmask = (rowh == colh).astype(cd)                   # (HL, D)
    qhat = jnp.concatenate([q3] * H, axis=1) * qmask    # (TB, HL, D)
    ghat = jnp.concatenate([g3] * H, axis=1) * qmask    # (TB, HL, D)

    shift = _cs_shift(q3.reshape(TB * L, D), k3.reshape(TB * L, D),
                      TB, L, H, inv_temp, hmask_f, L_real)
    scores = jax.lax.dot_general(
        qhat, k3, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (TB, HL, L) f32
    # e goes straight to compute dtype: the FORWARD's num matmul consumed
    # bf16 e, so the jacobian of the computed function wants the same
    # values here — and it halves the largest recompute buffer.
    if L_real != L:
        kcol = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2)
        e = jnp.where(
            kcol < L_real, jnp.exp(scores * inv_temp - shift),
            jnp.float32(0),
        ).astype(cd)
    else:
        e = jnp.exp(scores * inv_temp - shift).astype(cd)

    # num/den in one matmul (ones column at lane D), exactly as forward.
    EXT = max(128, ((D + 1 + 127) // 128) * 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, L, EXT - D), 2)
    ones_col = (lane == 0).astype(cd)
    v_ext = jnp.concatenate([v3, ones_col], axis=2)     # (TB, L, EXT)
    num_ext = jax.lax.dot_general(
        e, v_ext, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (TB, HL, EXT): lanes [0,D) = num (den·ctx), lane D = den
    den = jnp.maximum(num_ext[:, :, D:D + 1], jnp.float32(1e-30))

    # 1/den folds into ghat — a (HL, D)-sized pass — so no (HL, L)-sized
    # tensor is ever divided: g_a_n = (ghat/den)@v³ᵀ carries the division
    # through the matmul (den is constant along the contraction), r_n
    # likewise, and gv contracts e directly against ghat/den, eliminating
    # the e_n = e/den buffer and its full-size pass entirely.
    ghat_n = (ghat.astype(jnp.float32) / den).astype(cd)  # (TB, HL, D)
    g_a_n = jax.lax.dot_general(
        ghat_n, v3, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (TB, HL, L): dL/da / den for head h in row block h
    # softmax-jacobian row dot Σ_d g∘ctx/den = Σ_d (ghat_n∘num)/den —
    # ctx = num/den needs a second 1/den beyond ghat_n's; it lands on the
    # (HL, 1) row-dot, never on an (HL, L) tensor. num_ext comes in
    # directly so ctx is never materialised; ghat's channel mask zeroes
    # its cross-head lanes.
    r_n = jnp.sum(ghat_n.astype(jnp.float32) * num_ext[:, :, :D],
                  axis=-1, keepdims=True) / den
    # dL/dS = e ∘ (g_a − r)/den · τ — one fused elementwise chain over
    # the (HL, L) tensor, straight to compute dtype for the matmuls.
    dS = (e * ((g_a_n - r_n) * inv_temp)).astype(cd)

    g_qhat = jax.lax.dot_general(
        dS, k3, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (TB, HL, D)
    gq = jnp.zeros((TB, L, D), jnp.float32)
    for h in range(H):
        gq = gq + (g_qhat[:, h * L:(h + 1) * L, :]
                   * hmask_f[:, h].reshape(1, 1, D))
    gk = jax.lax.dot_general(
        dS, qhat, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (TB, L, D) — qhat's channel mask kills cross-head terms
    gv = jax.lax.dot_general(
        e, ghat_n, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (TB, L, D): a_h^T @ g = (e/den)^T @ ghat with 1/den on ghat
    gq_ref[:] = gq.astype(gq_ref.dtype)
    gk_ref[:] = gk.astype(gk_ref.dtype)
    gv_ref[:] = gv.astype(gv_ref.dtype)


def _spec(TB, Lp, D):
    return pl.BlockSpec((TB, Lp, D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit,
                   static_argnames=("n_head", "tile_b", "interpret"))
def _core_fwd_call(q, k, v, n_head, tile_b, interpret):
    B, L, D = q.shape
    Lp = ((L + 7) // 8) * 8
    # Forward buffers match the inference kernel's attention stage;
    # TB=4 is the hardware-fastest there (BASELINE.md round 4).
    TB = tile_b or 4
    qp, kp, vp = (_pad_qkv(x, Lp, TB) for x in (q, k, v))
    Bp = qp.shape[0]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n_head=n_head, L_real=L),
        grid=(Bp // TB,),
        in_specs=[_spec(TB, Lp, D)] * 3,
        out_specs=_spec(TB, Lp, D),
        out_shape=jax.ShapeDtypeStruct((Bp, Lp, D), q.dtype),
        interpret=_auto_interpret(interpret),
    )(qp, kp, vp)
    return out[:B, :L] if (Bp != B or Lp != L) else out


@functools.partial(jax.jit,
                   static_argnames=("n_head", "tile_b", "interpret"))
def _core_bwd_call(q, k, v, g, n_head, tile_b, interpret):
    B, L, D = q.shape
    Lp = ((L + 7) // 8) * 8
    # The backward holds ~2x the forward's live f32 (HL, L) buffers
    # (e, g_a, dS) — TB=1 keeps the tile ≈ 13 MB inside the 16 MB VMEM
    # scoped budget at L=256, H=8, D=64.
    TB = tile_b or 1
    qp, kp, vp, gp = (_pad_qkv(x, Lp, TB) for x in (q, k, v, g))
    Bp = qp.shape[0]
    shape = jax.ShapeDtypeStruct((Bp, Lp, D), q.dtype)
    gq, gk, gv = pl.pallas_call(
        functools.partial(_bwd_kernel, n_head=n_head, L_real=L),
        grid=(Bp // TB,),
        in_specs=[_spec(TB, Lp, D)] * 4,
        out_specs=(_spec(TB, Lp, D),) * 3,
        out_shape=(shape, shape, shape),
        interpret=_auto_interpret(interpret),
    )(qp, kp, vp, gp)
    if Bp != B or Lp != L:
        gq, gk, gv = gq[:B, :L], gk[:B, :L], gv[:B, :L]
    return gq, gk, gv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def packed_attention_core(q, k, v, n_head: int, tile_b: int = 0,
                          bwd_tile_b: int = 0,
                          interpret: bool | None = None):
    """softmax(q·kᵀ/√d_k)·v per head; q, k, v, out all (B, L, D) with
    heads packed along D. Differentiable via hand-written Pallas
    forward/backward kernels (flash-style recompute, no saved
    activations beyond the primals)."""
    return _core_fwd_call(q, k, v, n_head, tile_b, interpret)


def _vjp_fwd(q, k, v, n_head, tile_b, bwd_tile_b, interpret):
    return _core_fwd_call(q, k, v, n_head, tile_b, interpret), (q, k, v)


def _vjp_bwd(n_head, tile_b, bwd_tile_b, interpret, res, g):
    q, k, v = res
    return _core_bwd_call(q, k, v, g.astype(q.dtype), n_head, bwd_tile_b,
                          interpret)


packed_attention_core.defvjp(_vjp_fwd, _vjp_bwd)


def probe_core(L: int, D: int, n_head: int, dtype=jnp.bfloat16) -> None:
    """Compile-and-run check of the fwd AND bwd kernels at the real
    sequence length (tiny batch). train_run calls this once before the
    loop so an unlowerable kernel downgrades to the XLA path instead of
    failing mid-epoch (mirrors the predict-side first-batch ladder,
    runtime/simulate.py)."""
    q = jnp.ones((2, L, D), dtype)
    k = jnp.ones((2, L, D), dtype) * 0.5
    v = jnp.ones((2, L, D), dtype) * 0.25

    def f(q, k, v):
        return jnp.sum(
            packed_attention_core(q, k, v, n_head).astype(jnp.float32))

    out, grads = jax.value_and_grad(f, argnums=(0, 1, 2))(q, k, v)
    jax.block_until_ready((out, grads))
