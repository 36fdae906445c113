"""Cumulative-stage timing of the fused block internals.

Builds partial kernels that stop after successive stages (projections,
score dots, +max, +exp, +ctx dot, +den dot, full block) and times each on
the TPU; consecutive differences give the per-stage cost. Each partial
kernel folds what it computed into the output via a cheap reduction so
nothing is dead-code-eliminated.
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

STAGES = ("proj", "scores", "max", "exp", "ctx", "den", "full")


def _kernel(x_ref, wq, bq, wk, bk, wv, bv, wf, bf_, ln1s, ln1b,
            w1, b1, w2, b2, ln2s, ln2b, out_ref, *, n_head, compute_dtype,
            stage):
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
    if stage == "proj":
        out_ref[:] = (q + k + v).reshape(TB, L, Dm).astype(out_ref.dtype)
        return

    ones_v = jnp.ones((TB, L, 1), compute_dtype)
    acc = jnp.zeros((TB * L, d_k), jnp.float32)
    ctx_heads = []
    for h in range(n_head):
        sl = slice(h * d_k, (h + 1) * d_k)
        qh = q[:, sl].reshape(TB, L, d_k)
        kh = k[:, sl].reshape(TB, L, d_k)
        vh = v[:, sl].reshape(TB, L, d_k)
        scores = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        if stage == "scores":
            # cheapest possible sink: one row of the score tensor
            acc = acc + scores[:, :, :d_k].reshape(TB * L, d_k)
            continue
        m = jnp.max(scores, axis=-1, keepdims=True)
        if stage == "max":
            acc = acc + (scores[:, :, :d_k] + m).reshape(TB * L, d_k)
            continue
        e = jnp.exp((scores - m) * inv_temp).astype(compute_dtype)
        if stage == "exp":
            acc = acc + e[:, :, :d_k].astype(jnp.float32).reshape(TB * L, d_k)
            continue
        num = jax.lax.dot_general(
            e, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        if stage == "ctx":
            acc = acc + num.reshape(TB * L, d_k)
            continue
        den = jax.lax.dot_general(
            e, ones_v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ctx_h = (num / den).astype(compute_dtype)
        if stage == "den":
            acc = acc + ctx_h.astype(jnp.float32).reshape(TB * L, d_k)
            continue
        ctx_heads.append(ctx_h.reshape(TB * L, d_k))
    if stage in ("scores", "max", "exp", "ctx", "den"):
        out = jnp.concatenate([acc.astype(out_ref.dtype)] * n_head, axis=-1)
        out_ref[:] = out.reshape(TB, L, Dm)
        return
    ctx = jnp.concatenate(ctx_heads, axis=-1)
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


@functools.partial(jax.jit, static_argnames=("n_head", "tile_b", "stage"))
def fused(x, block_params, n_head, tile_b=4, stage="full"):
    Bx, L, Dm = x.shape
    TB = tile_b
    pad = (-Bx) % TB
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, L, Dm), x.dtype)], axis=0)
    Bp = Bx + pad
    weights = [_get(block_params, pth) for pth in _WEIGHT_FIELDS]
    kern = functools.partial(_kernel, n_head=n_head, compute_dtype=x.dtype,
                             stage=stage)
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
    for st in STAGES:
        f = jax.jit(lambda x, s=st: fused(x, blk, n_head, stage=s))
        np.asarray(probe(f(x0)))  # compile
        fns[st] = f

    def t_of(f, n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = f(x0)
        np.asarray(probe(out))
        return time.perf_counter() - t0

    res = {s: [] for s in STAGES}
    for rnd in range(3):
        for st, f in fns.items():
            t1 = t_of(f, 1)
            t33 = t_of(f, 33)
            res[st].append((t33 - t1) / 32 * 1e3)
    prev = 0.0
    for st in STAGES:
        t = min(res[st])
        print(f'{st:7s}: {t:7.3f} ms  (+{t - prev:6.3f})', flush=True)
        prev = t
