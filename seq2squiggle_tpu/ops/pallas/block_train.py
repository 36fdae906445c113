"""Whole-FFT-block training kernels: fused forward AND backward.

Round-5's attention-core VJP (attn_core.py) left the block's projections,
LayerNorms, FFN, and dropout in XLA — measured ~14 ms/step of glue at
B=1024 (scripts/profiling/profile_train_breakdown.py) because every one
of those ops round-trips the (B, L, D) activation through HBM in both
passes. This module fuses the ENTIRE post-LN block (reference semantics:
src/seq2squiggle/layers.py:11-142) into one Pallas kernel per direction:

  forward:  q/k/v proj -> packed attention -> fc -> dropout·s_a ->
            LN1(o+x) -> FFN(relu) -> dropout·s_f -> LN2(f+h1)
  backward: recompute everything from (x, weights, scales) —
            flash-style, no saved activations — then walk the chain in
            reverse inside VMEM, accumulating the 16 weight grads across
            batch tiles into revisited output blocks (the TPU grid is
            sequential, so += accumulation is race-free).

Dropout is a pre-sampled SCALE tensor (values 0 or 1/keep) generated
outside with the exact jax.random calls the XLA path makes
(ops/attention._maybe_dropout), so the training RNG stream is
bit-identical whichever path runs; in-kernel it is a plain multiply.

Numerics: MXU matmuls accumulate f32, LN stats and the whole backward
chain in f32, inter-stage activations in compute dtype — the same
contract as the inference kernel (fft_block.py), pinned against XLA
autodiff in tests/test_pallas.py (f32 tight, bf16 ULP band).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fft_block import _WEIGHT_FIELDS, _attn_packed, _cs_shift, _get

# weight-grad output index in _WEIGHT_FIELDS order; biases/LN vectors are
# emitted as (1, D)/(1, dff) rows (TPU outputs want >= 2 dims)
_W_SHAPES = None  # resolved per call from the weight list


def _auto_interpret(interpret):
    if interpret is None:
        return jax.default_backend() == "cpu"
    return interpret


def _ln_fwd(z):
    """f32 LayerNorm statistics. Returns (zhat, inv_sigma)."""
    mu = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(z - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + 1e-5)
    return (z - mu) * inv, inv


def _ln_bwd(gy, zhat, inv, scale):
    """Backward of y = zhat*scale + bias. Returns (gz, dscale (1, D),
    dbias (1, D)) — vector grads keep a leading sublane dim (Mosaic
    avoids 1-D intermediates)."""
    gyh = gy * scale.astype(jnp.float32)
    gz = (gyh - jnp.mean(gyh, axis=-1, keepdims=True)
          - zhat * jnp.mean(gyh * zhat, axis=-1, keepdims=True)) * inv
    dscale = jnp.sum(gy * zhat, axis=0, keepdims=True)
    dbias = jnp.sum(gy, axis=0, keepdims=True)
    return gz, dscale, dbias


def _attn_core_fwd_parts(q, k, v, TB, L, d_k, n_head, inv_temp, cd, L_real):
    """Packed attention recompute shared by the backward kernel: returns
    (ctx (TB*L, D) cd, e (TB,HL,L) cd, num_ext, den, qhat, hmask_f,
    qmask). Mirrors attn_core._bwd_kernel's recompute."""
    D = d_k * n_head
    H = n_head
    q3 = q.reshape(TB, L, D)
    k3 = k.reshape(TB, L, D)
    v3 = v.reshape(TB, L, D)
    ch = jax.lax.broadcasted_iota(jnp.int32, (D, H), 0) // d_k
    hh = jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
    hmask_f = (ch == hh).astype(jnp.float32)
    rowh = jax.lax.broadcasted_iota(jnp.int32, (H * L, D), 0) // L
    colh = jax.lax.broadcasted_iota(jnp.int32, (H * L, D), 1) // d_k
    qmask = (rowh == colh).astype(cd)
    qhat = jnp.concatenate([q3] * H, axis=1) * qmask
    shift = _cs_shift(q, k, TB, L, H, inv_temp, hmask_f, L_real)
    scores = jax.lax.dot_general(
        qhat, k3, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    if L_real != L:
        kcol = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2)
        e = jnp.where(kcol < L_real, jnp.exp(scores * inv_temp - shift),
                      jnp.float32(0)).astype(cd)
    else:
        e = jnp.exp(scores * inv_temp - shift).astype(cd)
    EXT = max(128, ((D + 1 + 127) // 128) * 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, L, EXT - D), 2)
    ones_col = (lane == 0).astype(cd)
    v_ext = jnp.concatenate([v3, ones_col], axis=2)
    num_ext = jax.lax.dot_general(
        e, v_ext, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    den = jnp.maximum(num_ext[:, :, D:D + 1], jnp.float32(1e-30))
    num_c = jnp.zeros((TB, L, D), jnp.float32)
    den_c = jnp.zeros((TB, L, D), jnp.float32)
    for h in range(H):
        hm = hmask_f[:, h].reshape(1, 1, D)
        nm = num_ext[:, h * L:(h + 1) * L, :]
        num_c = num_c + nm[:, :, :D] * hm
        den_c = den_c + nm[:, :, D:D + 1] * hm
    den_c = jnp.maximum(den_c, jnp.float32(1e-30))
    ctx = (num_c / den_c).astype(cd).reshape(TB * L, D)
    return ctx, e, num_ext, den, qhat, hmask_f, qmask


def _fwd_kernel(x_ref, *refs, n_head, cd, L_real, dropout: bool):
    """Forward: refs = 16 weights [+ s_a, s_f] + out_ref."""
    out_ref = refs[-1]
    w = refs[:16]
    (wq, bq, wk, bk, wv, bv, wf, bf, ln1s, ln1b,
     w1, b1, w2, b2, ln2s, ln2b) = w
    TB, L, D = x_ref.shape
    d_k = D // n_head
    inv_temp = 1.0 / (d_k ** 0.5)
    x2 = x_ref[:].astype(cd).reshape(TB * L, D)

    def proj(wr, br):
        y = jnp.dot(x2, wr[:].astype(cd), preferred_element_type=jnp.float32)
        return (y + br[:].astype(jnp.float32)).astype(cd)

    q = proj(wq, bq)
    k = proj(wk, bk)
    v = proj(wv, bv)
    ctx = _attn_packed(q, k, v, TB, L, d_k, n_head, inv_temp, cd, L_real)
    o = jnp.dot(ctx, wf[:].astype(cd), preferred_element_type=jnp.float32)
    o = o + bf[:].astype(jnp.float32)
    if dropout:
        o = o * refs[16][:].astype(jnp.float32).reshape(TB * L, D)
    zhat1, _ = _ln_fwd(o + x2.astype(jnp.float32))
    h1 = zhat1 * ln1s[:].astype(jnp.float32) + ln1b[:].astype(jnp.float32)
    h1c = h1.astype(cd)
    f = jnp.dot(h1c, w1[:].astype(cd), preferred_element_type=jnp.float32)
    f1 = jax.nn.relu(f + b1[:].astype(jnp.float32)).astype(cd)
    f2 = jnp.dot(f1, w2[:].astype(cd), preferred_element_type=jnp.float32)
    f2 = f2 + b2[:].astype(jnp.float32)
    if dropout:
        f2 = f2 * refs[17][:].astype(jnp.float32).reshape(TB * L, D)
    zhat2, _ = _ln_fwd(f2 + h1)
    y = zhat2 * ln2s[:].astype(jnp.float32) + ln2b[:].astype(jnp.float32)
    out_ref[:] = y.astype(out_ref.dtype).reshape(TB, L, D)


def _bwd_kernel(x_ref, *refs, n_head, cd, L_real, dropout: bool):
    """Backward: inputs = x, 16 weights, [s_a, s_f,] g;
    outputs = gx + 16 weight grads (f32, accumulated across the grid)."""
    n_in = 16 + (2 if dropout else 0)
    w = refs[:16]
    g_ref = refs[n_in]
    gx_ref = refs[n_in + 1]
    gw = refs[n_in + 2:n_in + 18]
    (wq, bq, wk, bk, wv, bv, wf, bf, ln1s, ln1b,
     w1, b1, w2, b2, ln2s, ln2b) = w
    TB, L, D = x_ref.shape
    H = n_head
    d_k = D // H
    inv_temp = 1.0 / (d_k ** 0.5)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in gw:
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    x2 = x_ref[:].astype(cd).reshape(TB * L, D)
    x2f = x2.astype(jnp.float32)

    def proj(wr, br):
        y = jnp.dot(x2, wr[:].astype(cd), preferred_element_type=jnp.float32)
        return (y + br[:].astype(jnp.float32)).astype(cd)

    q = proj(wq, bq)
    k = proj(wk, bk)
    v = proj(wv, bv)
    ctx, e, num_ext, den, qhat, hmask_f, qmask = _attn_core_fwd_parts(
        q, k, v, TB, L, d_k, H, inv_temp, cd, L_real)
    o = jnp.dot(ctx, wf[:].astype(cd), preferred_element_type=jnp.float32)
    o = o + bf[:].astype(jnp.float32)
    if dropout:
        s_a = refs[16][:].astype(jnp.float32).reshape(TB * L, D)
        s_f = refs[17][:].astype(jnp.float32).reshape(TB * L, D)
        o = o * s_a
    zhat1, inv1 = _ln_fwd(o + x2f)
    h1 = zhat1 * ln1s[:].astype(jnp.float32) + ln1b[:].astype(jnp.float32)
    h1c = h1.astype(cd)
    pre = jnp.dot(h1c, w1[:].astype(cd), preferred_element_type=jnp.float32)
    pre = pre + b1[:].astype(jnp.float32)
    f1 = jax.nn.relu(pre).astype(cd)
    f2 = jnp.dot(f1, w2[:].astype(cd), preferred_element_type=jnp.float32)
    f2 = f2 + b2[:].astype(jnp.float32)
    if dropout:
        f2 = f2 * s_f
    zhat2, inv2 = _ln_fwd(f2 + h1)

    # ---- backward chain (f32) ----
    gy = g_ref[:].astype(jnp.float32).reshape(TB * L, D)
    gz2, dg2, db2_ln = _ln_bwd(gy, zhat2, inv2, ln2s[:])
    gw[15][...] += db2_ln.reshape(gw[15].shape)          # ln2 bias
    gw[14][...] += dg2.reshape(gw[14].shape)             # ln2 scale
    gf2 = gz2 * s_f if dropout else gz2
    gf2c = gf2.astype(cd)
    gw[13][...] += jnp.sum(gf2, axis=0, keepdims=True).reshape(
        gw[13].shape)                                     # b2
    gw[12][...] += jax.lax.dot_general(                   # W2 (dff, D)
        f1, gf2c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    gf1 = jax.lax.dot_general(
        gf2c, w2[:].astype(cd), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    gf1 = jnp.where(pre > 0, gf1, jnp.float32(0))
    gf1c = gf1.astype(cd)
    gw[11][...] += jnp.sum(gf1, axis=0, keepdims=True).reshape(
        gw[11].shape)                                     # b1
    gw[10][...] += jax.lax.dot_general(                   # W1 (D, dff)
        h1c, gf1c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    gh1 = gz2 + jax.lax.dot_general(
        gf1c, w1[:].astype(cd), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    gz1, dg1, db1_ln = _ln_bwd(gh1, zhat1, inv1, ln1s[:])
    gw[9][...] += db1_ln.reshape(gw[9].shape)             # ln1 bias
    gw[8][...] += dg1.reshape(gw[8].shape)                # ln1 scale
    go = gz1 * s_a if dropout else gz1
    goc = go.astype(cd)
    gw[7][...] += jnp.sum(go, axis=0, keepdims=True).reshape(
        gw[7].shape)                                      # bf
    gw[6][...] += jax.lax.dot_general(                    # Wf (D, D)
        ctx, goc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    gctx = jax.lax.dot_general(
        goc, wf[:].astype(cd), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cd)

    # ---- attention backward (packed; see attn_core._bwd_kernel) ----
    g3 = gctx.reshape(TB, L, D)
    k3 = k.reshape(TB, L, D)
    ghat = jnp.concatenate([g3] * H, axis=1) * qmask      # (TB, HL, D)
    # 1/den folded into ghat (a (HL, D)-sized pass) — see
    # attn_core._bwd_kernel: no (HL, L)-sized divide, no e_n buffer.
    ghat_n = (ghat.astype(jnp.float32) / den).astype(cd)
    g_a_n = jax.lax.dot_general(
        ghat_n, v.reshape(TB, L, D), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    r_n = jnp.sum(ghat_n.astype(jnp.float32) * num_ext[:, :, :D],
                  axis=-1, keepdims=True) / den
    dS = (e * ((g_a_n - r_n) * inv_temp)).astype(cd)
    g_qhat = jax.lax.dot_general(
        dS, k3, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    gq = jnp.zeros((TB, L, D), jnp.float32)
    for h in range(H):
        gq = gq + (g_qhat[:, h * L:(h + 1) * L, :]
                   * hmask_f[:, h].reshape(1, 1, D))
    gk = jax.lax.dot_general(
        dS, qhat, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    gv = jax.lax.dot_general(
        e, ghat_n, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    gq2 = gq.reshape(TB * L, D)
    gk2 = gk.reshape(TB * L, D)
    gv2 = gv.reshape(TB * L, D)

    gx = gz1
    for slot, gp in ((0, gq2), (2, gk2), (4, gv2)):
        gpc = gp.astype(cd)
        gw[slot + 1][...] += jnp.sum(
            gp, axis=0, keepdims=True).reshape(gw[slot + 1].shape)
        gw[slot][...] += jax.lax.dot_general(
            x2, gpc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        gx = gx + jax.lax.dot_general(
            gpc, w[slot][:].astype(cd), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    gx_ref[:] = gx.astype(gx_ref.dtype).reshape(TB, L, D)


def _pad3(x, Lp, TB):
    B, L, D = x.shape
    if Lp != L:
        x = jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0)))
    pad = (-B) % TB
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, Lp, D), x.dtype)], axis=0)
    return x


def _wgrad_shape(wshape) -> Tuple[int, ...]:
    return wshape if len(wshape) > 1 else (1,) + tuple(wshape)


@functools.partial(
    jax.jit, static_argnames=("n_head", "tile_b", "interpret"))
def _block_fwd_call(x, weights, s_a, s_f, n_head, tile_b, interpret):
    B, L, D = x.shape
    Lp = ((L + 7) // 8) * 8
    TB = tile_b or 4
    dropout = s_a is not None
    xp = _pad3(x, Lp, TB)
    extra = []
    if dropout:
        extra = [_pad3(s_a, Lp, TB), _pad3(s_f, Lp, TB)]
    Bp = xp.shape[0]
    tile = pl.BlockSpec((TB, Lp, D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    w_specs = [
        pl.BlockSpec(w.shape, lambda i, s=w.shape: (0,) * len(s),
                     memory_space=pltpu.VMEM)
        for w in weights
    ]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n_head=n_head, cd=x.dtype,
                          L_real=L, dropout=dropout),
        grid=(Bp // TB,),
        in_specs=[tile, *w_specs] + [tile] * len(extra),
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((Bp, Lp, D), x.dtype),
        interpret=_auto_interpret(interpret),
    )(xp, *weights, *extra)
    return out[:B, :L] if (Bp != B or Lp != L) else out


@functools.partial(
    jax.jit, static_argnames=("n_head", "tile_b", "interpret"))
def _block_bwd_call(x, weights, s_a, s_f, g, n_head, tile_b, interpret):
    B, L, D = x.shape
    Lp = ((L + 7) // 8) * 8
    # backward holds the full attention recompute + FFN chain; TB=2 needs
    # the raised vmem_limit_bytes below and is the measured fastest
    # (B=1024 step: TB=1 30.0 ms, TB=2 27.7, TB=4 28.4 — hardware,
    # round 5). S2S_BLOCK_BWD_TILE overrides for profiling A/Bs.
    import os

    TB = tile_b or int(os.environ.get("S2S_BLOCK_BWD_TILE", 0)) or 2
    dropout = s_a is not None
    xp = _pad3(x, Lp, TB)
    gp = _pad3(g, Lp, TB)
    extra = []
    if dropout:
        extra = [_pad3(s_a, Lp, TB), _pad3(s_f, Lp, TB)]
    Bp = xp.shape[0]
    tile = pl.BlockSpec((TB, Lp, D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    w_specs = [
        pl.BlockSpec(w.shape, lambda i, s=w.shape: (0,) * len(s),
                     memory_space=pltpu.VMEM)
        for w in weights
    ]
    gw_shapes = [jax.ShapeDtypeStruct(_wgrad_shape(w.shape), jnp.float32)
                 for w in weights]
    gw_specs = [
        pl.BlockSpec(s.shape, lambda i, sh=s.shape: (0,) * len(sh),
                     memory_space=pltpu.VMEM)
        for s in gw_shapes
    ]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, n_head=n_head, cd=x.dtype,
                          L_real=L, dropout=dropout),
        grid=(Bp // TB,),
        in_specs=[tile, *w_specs] + [tile] * len(extra) + [tile],
        out_specs=(tile, *gw_specs),
        out_shape=(jax.ShapeDtypeStruct((Bp, Lp, D), x.dtype), *gw_shapes),
        interpret=_auto_interpret(interpret),
        # the backward's live set exceeds Mosaic's default scoped budget
        # at TB>1; raise the cap so larger batch tiles can be profiled
        # (S2S_BLOCK_BWD_TILE) — harmless at TB=1
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, *weights, *extra, gp)
    gx = outs[0]
    if Bp != B or Lp != L:
        gx = gx[:B, :L]
    gws = [gw.reshape(w.shape).astype(w.dtype)
           for gw, w in zip(outs[1:], weights)]
    return gx, gws


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_block_train(x, block_params, s_a, s_f, n_head: int,
                      tile_b: int = 0, bwd_tile_b: int = 0,
                      interpret: bool | None = None):
    """One post-LN attention+FFN block, fully fused, differentiable.

    x: (B, L, D); block_params: the block's weight dict (fft_block
    pytree); s_a/s_f: dropout SCALE tensors (0 or 1/keep) for the
    attention-out and FFN-out dropouts, or None for no dropout. The
    scales must be drawn exactly like ops/attention._maybe_dropout does
    so the RNG stream matches the XLA path (see make_dropout_scales).
    """
    weights = [_get(block_params, path) for path in _WEIGHT_FIELDS]
    return _block_fwd_call(x, weights, s_a, s_f, n_head, tile_b, interpret)


def _vjp_fwd(x, block_params, s_a, s_f, n_head, tile_b, bwd_tile_b,
             interpret):
    out = fused_block_train(x, block_params, s_a, s_f, n_head, tile_b,
                            bwd_tile_b, interpret)
    return out, (x, block_params, s_a, s_f)


def _vjp_bwd(n_head, tile_b, bwd_tile_b, interpret, res, g):
    x, block_params, s_a, s_f = res
    weights = [_get(block_params, path) for path in _WEIGHT_FIELDS]
    gx, gws = _block_bwd_call(x, weights, s_a, s_f, g.astype(x.dtype),
                              n_head, bwd_tile_b, interpret)
    # rebuild the grad pytree in _WEIGHT_FIELDS order
    gtree = {}
    for path, gw in zip(_WEIGHT_FIELDS, gws):
        node = gtree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = gw
    zs_a = None if s_a is None else jnp.zeros_like(s_a)
    zs_f = None if s_f is None else jnp.zeros_like(s_f)
    return gx, gtree, zs_a, zs_f


fused_block_train.defvjp(_vjp_fwd, _vjp_bwd)


def make_dropout_scales(rng, rate: float, shape, dtype):
    """The exact dropout draw ops/attention._maybe_dropout makes, as a
    scale tensor: bernoulli(rng, 1-rate, shape) -> {1/keep, 0}."""
    if rng is None or rate <= 0.0:
        return None
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, jnp.asarray(1.0 / keep, jnp.float32),
                     jnp.asarray(0.0, jnp.float32)).astype(dtype)


def probe_block(L: int, D: int, n_head: int, dtype=jnp.bfloat16) -> None:
    """Compile-and-run check of the fused block's fwd AND bwd kernels at
    the real sequence length (tiny batch, dropout scales engaged).
    train_run calls this once before the loop (see the probe ladder
    there)."""
    x = jnp.ones((2, L, D), dtype)
    from ...models.fft_model import _init_block

    block = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a), _init_block(jax.random.key(0), D, 4 * D))
    key = jax.random.key(1)
    ra, rf = jax.random.split(key)
    s_a = make_dropout_scales(ra, 0.2, x.shape, dtype)
    s_f = make_dropout_scales(rf, 0.2, x.shape, dtype)

    def f(x, p):
        return jnp.sum(
            fused_block_train(x, p, s_a, s_f, n_head).astype(jnp.float32))

    out, grads = jax.value_and_grad(f, argnums=(0, 1))(x, block)
    jax.block_until_ready((out, grads))
