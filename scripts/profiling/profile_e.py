"""Interleaved B/E kernel timing: per-head loop vs head-PACKED attention.

B = HEAD kernel (static python loop over 8 heads; each head's score /
    ctx / den matmul contracts or outputs only d_k=8 of the MXU's 128
    lanes -> ~6% utilization; measured score dots 6.2 ms + ctx 2.9 +
    den 0.5 of the 17.6 ms block at B=2048).
E = pack all heads into ONE matmul per stage:
      qhat (TB, 8L, 64) = q tiled 8x down the sublane dim, masked so
          row block h keeps only head h's 8 channels;
      S2   (TB, 8L, L)  = qhat @ k^T        (contraction 64, not 8)
      e2   = exp(S2*inv_temp - shift)        shift = Cauchy-Schwarz
          per-head norm bound (softmax is shift-invariant; a true upper
          bound keeps every exp <= 1 with full relative precision)
      num2 (TB, 8L, 64) = e2 @ v             (output 64 lanes, not 8)
      den2 (TB, 8L, 1)  = e2 @ ones
      collapse: ctx[b,t,c] = num2[b, (c//d_k)*L + t, c] / den2[...] via
          8 static sublane slices + head-channel masks (no 4D, no
          minor-dim reshapes - Mosaic-safe).
    FLOPs are 8x the head-loop's useful count, but land at ~50% MXU
    utilization instead of ~6%, and the exact row-max VPU pass over the
    (TB,L,L)x8 scores is gone entirely.

Run from the repo root. Prints numeric agreement vs B first, then
interleaved per-round ms/block (take the min; tunnel drift ~7%).
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


def _attn_e(q, k, v, TB, L, d_k, n_head, inv_temp, compute_dtype):
    D = d_k * n_head
    q3 = q.reshape(TB, L, D)
    k3 = k.reshape(TB, L, D)
    v3 = v.reshape(TB, L, D)

    # head-channel mask (D, n_head): col h selects head h's channels
    ch = jax.lax.broadcasted_iota(jnp.int32, (D, n_head), 0) // d_k
    hh = jax.lax.broadcasted_iota(jnp.int32, (D, n_head), 1)
    hmask = (ch == hh).astype(compute_dtype)          # (D, H)
    hmask_f = hmask.astype(jnp.float32)

    # qhat: tile q down the sublane dim, zero other heads' channels
    rowh = jax.lax.broadcasted_iota(jnp.int32, (n_head * L, D), 0) // L
    colh = jax.lax.broadcasted_iota(jnp.int32, (n_head * L, D), 1) // d_k
    qmask = (rowh == colh).astype(compute_dtype)      # (8L, D)
    qhat = jnp.concatenate([q3] * n_head, axis=1) * qmask  # (TB, 8L, D)

    # Cauchy-Schwarz shift: per-head ||q_t|| * max_s ||k_s||, pre-tempered
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    qn2 = jnp.dot(qf * qf, hmask_f,
                  preferred_element_type=jnp.float32)   # (TB*L, H)
    kn2 = jnp.dot(kf * kf, hmask_f,
                  preferred_element_type=jnp.float32)   # (TB*L, H)
    kn2m = jnp.max(kn2.reshape(TB, L, n_head), axis=1, keepdims=True)
    qn = jnp.sqrt(qn2).reshape(TB, L, n_head)
    kn = jnp.sqrt(kn2m)                                  # (TB, 1, H)
    shift = jnp.concatenate(
        [qn[:, :, h:h + 1] * kn[:, :, h:h + 1] for h in range(n_head)],
        axis=1) * inv_temp                               # (TB, 8L, 1)

    S2 = jax.lax.dot_general(
        qhat, k3, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (TB, 8L, L)
    e2 = jnp.exp(S2 * inv_temp - shift).astype(compute_dtype)
    num2 = jax.lax.dot_general(
        e2, v3, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (TB, 8L, D)
    ones_v = jnp.ones((TB, L, 1), compute_dtype)
    den2 = jax.lax.dot_general(
        e2, ones_v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (TB, 8L, 1)

    num_c = jnp.zeros((TB, L, D), jnp.float32)
    den_c = jnp.zeros((TB, L, D), jnp.float32)
    for h in range(n_head):
        hm = hmask_f[:, h].reshape(1, 1, D)              # (1,1,D)
        num_c = num_c + num2[:, h * L:(h + 1) * L, :] * hm
        den_c = den_c + den2[:, h * L:(h + 1) * L, :] * hm
    ctx = (num_c / den_c).astype(compute_dtype)
    return ctx.reshape(TB * L, D)


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
    attn = _attn_b if variant == "b" else _attn_e
    ctx = attn(q, k, v, TB, L, d_k, n_head, inv_temp, compute_dtype)
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
    for vtag, tb in (("b", 4), ("e", 2), ("e", 4), ("e", 8)):
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
