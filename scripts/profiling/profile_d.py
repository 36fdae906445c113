"""Interleaved B/D kernel timing: exact row-max vs norm-bound shift.

B = HEAD kernel (exact per-row max over the (L,L) scores: a full VPU
    reduction pass, measured ~5 ms/block of the 18.6).
D = replace the exact max with the Cauchy-Schwarz upper bound
    ||q_t|| * max_s ||k_s|| (O(L*d_k) to compute). Softmax is invariant
    to the shift; each exp keeps full fp relative precision at any
    magnitude, so the ratio is unchanged up to rounding. The exp argument
    is clamped at -80 so a slack bound can never underflow den to 0.
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
        if variant == "b":
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp((scores - m) * inv_temp).astype(compute_dtype)
        else:
            qf = qh.astype(jnp.float32)
            kf = kh.astype(jnp.float32)
            qn = jnp.sqrt(jnp.sum(qf * qf, axis=-1, keepdims=True))
            kn = jnp.sqrt(jnp.max(jnp.sum(kf * kf, axis=-1, keepdims=True),
                                  axis=-2, keepdims=True))  # (TB,1,1)
            mbit = qn * kn * inv_temp  # (TB, L, 1): shift, pre-tempered
            e = jnp.exp(scores * inv_temp - mbit).astype(compute_dtype)
        num = jax.lax.dot_general(
            e, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        den = jax.lax.dot_general(
            e, ones_v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        if variant != "b":
            den = den + 1e-30  # a slack bound can never NaN the divide
        ctx_h = (num / den).astype(compute_dtype)
        ctx_heads.append(ctx_h.reshape(TB * L, d_k))
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
    import traceback
    fns = {}
    outs = {}
    for vtag, tb in (("b", 4), ("d", 4), ("d", 2)):
        tag = f"{vtag}{tb}"
        f = jax.jit(lambda x, v=vtag, t=tb: fused(x, blk, n_head,
                                                  tile_b=t, variant=v))
        try:
            outs[tag] = np.asarray(f(x0)[:8]).astype(np.float32)
            fns[tag] = f
        except Exception:
            traceback.print_exc(limit=1)
            print(f'{tag} FAILED to compile', flush=True)
    for tag in fns:
        if tag == "b4":
            continue
        print(f'{tag} vs b4: max|diff|',
              float(np.max(np.abs(outs[tag] - outs["b4"]))),
              'max|b4|', float(np.max(np.abs(outs["b4"]))), flush=True)

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
