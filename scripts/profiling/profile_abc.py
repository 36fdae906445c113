"""Interleaved A/B/C block-kernel timing in ONE process.

A = pre-restructure softmax (softmax then ctx matmul)
B = restructured (fused exp pass, MXU row-sum den, post-ctx divide) = HEAD
C = B with the den folded into the ctx matmul as a ones column (one dot)

Interleaving cancels slow drift in the tunnel/device state that makes
cross-process comparisons noisy (observed ~7% between sessions).
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import time, functools, jax, numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import bench
cfg = bench._setup()
from seq2squiggle_tpu.profiles import get_profile, update_config_for_profile
from seq2squiggle_tpu.runtime.simulate import resolve_weights
from seq2squiggle_tpu.ops.pallas.fft_block import (_WEIGHT_FIELDS, _get,
                                                   _layer_norm)

profile = 'dna-r10-prom'
config = update_config_for_profile(profile, cfg)
params, _ = resolve_weights(bench._weights(), config, 42, profile)
n_head = int(config['decoder_heads'])


def _attn_a(q, k, v, TB, L, d_k, n_head, inv_temp, compute_dtype):
    ctx_heads = []
    for h in range(n_head):
        sl = slice(h * d_k, (h + 1) * d_k)
        qh = q[:, sl].reshape(TB, L, d_k)
        kh = k[:, sl].reshape(TB, L, d_k)
        vh = v[:, sl].reshape(TB, L, d_k)
        scores = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * inv_temp
        probs = jax.nn.softmax(scores, axis=-1).astype(compute_dtype)
        ctx_h = jax.lax.dot_general(
            probs, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(compute_dtype)
        ctx_heads.append(ctx_h.reshape(TB * L, d_k))
    return jnp.concatenate(ctx_heads, axis=-1)


def _attn_b(q, k, v, TB, L, d_k, n_head, inv_temp, compute_dtype):
    ones_v = jnp.ones((TB, L, 1), compute_dtype)
    ctx_heads = []
    for h in range(n_head):
        sl = slice(h * d_k, (h + 1) * d_k)
        qh = q[:, sl].reshape(TB, L, d_k)
        kh = k[:, sl].reshape(TB, L, d_k)
        vh = v[:, sl].reshape(TB, L, d_k)
        scores = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp((scores - m) * inv_temp).astype(compute_dtype)
        num = jax.lax.dot_general(
            e, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        den = jax.lax.dot_general(
            e, ones_v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ctx_h = (num / den).astype(compute_dtype)
        ctx_heads.append(ctx_h.reshape(TB * L, d_k))
    return jnp.concatenate(ctx_heads, axis=-1)


def _attn_c(q, k, v, TB, L, d_k, n_head, inv_temp, compute_dtype):
    ones_col = jnp.ones((TB, L, 1), compute_dtype)
    ctx_heads = []
    for h in range(n_head):
        sl = slice(h * d_k, (h + 1) * d_k)
        qh = q[:, sl].reshape(TB, L, d_k)
        kh = k[:, sl].reshape(TB, L, d_k)
        vh = v[:, sl].reshape(TB, L, d_k)
        va = jnp.concatenate([vh, ones_col], axis=-1)
        scores = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp((scores - m) * inv_temp).astype(compute_dtype)
        nd = jax.lax.dot_general(
            e, va, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ctx_h = (nd[:, :, :d_k] / nd[:, :, d_k:]).astype(compute_dtype)
        ctx_heads.append(ctx_h.reshape(TB * L, d_k))
    return jnp.concatenate(ctx_heads, axis=-1)


_ATTN = {"a": _attn_a, "b": _attn_b, "c": _attn_c}


def _kernel(x_ref, wq, bq, wk, bk, wv, bv, wf, bf_, ln1s, ln1b,
            w1, b1, w2, b2, ln2s, ln2b, out_ref, *, n_head, compute_dtype,
            variant):
    TB, L, Dm = x_ref.shape
    d_k = Dm // n_head
    inv_temp = 1.0 / (d_k ** 0.5)
    x = x_ref[:].astype(compute_dtype)
    x2 = x.reshape(TB * L, Dm)

    def proj(w_ref, b_ref):
        y = jnp.dot(x2, w_ref[:].astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        return (y + b_ref[:].astype(jnp.float32)).astype(compute_dtype)

    q = proj(wq, bq)
    k = proj(wk, bk)
    v = proj(wv, bv)
    ctx = _ATTN[variant](q, k, v, TB, L, d_k, n_head, inv_temp, compute_dtype)
    o = jnp.dot(ctx, wf[:].astype(compute_dtype),
                preferred_element_type=jnp.float32)
    o = o + bf_[:].astype(jnp.float32)
    h1 = _layer_norm(o + x2.astype(jnp.float32), ln1s[:], ln1b[:])
    h1c = h1.astype(compute_dtype)
    f = jnp.dot(h1c, w1[:].astype(compute_dtype),
                preferred_element_type=jnp.float32)
    f = jax.nn.relu(f + b1[:].astype(jnp.float32)).astype(compute_dtype)
    f = jnp.dot(f, w2[:].astype(compute_dtype),
                preferred_element_type=jnp.float32)
    f = f + b2[:].astype(jnp.float32)
    out = _layer_norm(f + h1, ln2s[:], ln2b[:]).astype(out_ref.dtype)
    out_ref[:] = out.reshape(TB, L, Dm)


@functools.partial(jax.jit, static_argnames=("n_head", "tile_b", "variant"))
def fused(x, block_params, n_head, tile_b=4, variant="b"):
    Bx, L, Dm = x.shape
    TB = tile_b
    pad = (-Bx) % TB
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, L, Dm), x.dtype)], axis=0)
    Bp = Bx + pad
    weights = [_get(block_params, pth) for pth in _WEIGHT_FIELDS]
    kern = functools.partial(_kernel, n_head=n_head, compute_dtype=x.dtype,
                             variant=variant)
    w_specs = [pl.BlockSpec(w.shape, lambda i, s=w.shape: (0,) * len(s),
                            memory_space=pltpu.VMEM) for w in weights]
    out = pl.pallas_call(
        kern, grid=(Bp // TB,),
        in_specs=[pl.BlockSpec((TB, L, Dm), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM), *w_specs],
        out_specs=pl.BlockSpec((TB, L, Dm), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, L, Dm), x.dtype),
    )(x, *weights)
    return out[:Bx] if pad else out


if __name__ == "__main__":
    dev = jax.devices()[0]
    P = jax.device_put(params, dev)
    blk = P['decoder']['blocks'][0]
    B, T, D = 2048, 250, 64
    x0 = jax.device_put(jnp.asarray(
        np.random.default_rng(0).standard_normal((B, T, D)) * 0.1,
        jnp.bfloat16), dev)
    probe = jax.jit(lambda o: o[0, 0, 0])
    fns = {}
    outs = {}
    for vtag in ("a", "b", "c"):
        f = jax.jit(lambda x, v=vtag: fused(x, blk, n_head, variant=v))
        outs[vtag] = np.asarray(f(x0)[:4]).astype(np.float32)
        fns[vtag] = f
    for vtag in ("b", "c"):
        print(f'{vtag} vs a: max|diff|',
              float(np.max(np.abs(outs[vtag] - outs["a"]))),
              'max|a|', float(np.max(np.abs(outs["a"]))), flush=True)

    def t_of(f, n):
        t0 = time.perf_counter()
        x = x0
        for _ in range(n):
            x = f(x)
        np.asarray(probe(x))
        return time.perf_counter() - t0

    res = {v: [] for v in fns}
    for rnd in range(4):
        for vtag, f in fns.items():
            t1 = t_of(f, 1)
            t33 = t_of(f, 33)
            res[vtag].append((t33 - t1) / 32 * 1e3)
    for vtag, times in res.items():
        ts = ", ".join(f"{t:.2f}" for t in times)
        print(f'{vtag}: min {min(times):.3f} ms/block  (rounds: {ts})',
              flush=True)
