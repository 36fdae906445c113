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


def _attn_headloop(q, k, v, TB, L, d_k, n_head, inv_temp, compute_dtype):
    """Per-head attention: static python loop, exact row-max softmax.

    Softmax is restructured to minimise VPU passes over the (TB, L, L)
    score tensor — the decoder's measured hot spot (L=250: each
    elementwise pass costs ~1 ms/block at B=2048 while every matmul is
    MXU-cheap). Un-tempered scores come straight off the MXU; ONE fused
    elementwise pass applies (s - max)·inv_temp and exp and casts to
    bf16; the row-sum rides the MXU as a dot against a ones vector; the
    softmax divide happens after the ctx matmul on (TB, L, d_k) — 31x
    fewer elements than dividing the (TB, L, L) probabilities.
    Numerics: same max-subtracted exp, denominators accumulate the
    compute-dtype exps in f32 (MXU) instead of f32 exps. In float32 mode
    this matches the XLA path to rtol=2e-3 (tests/test_pallas.py); in
    bfloat16 mode the reordered accumulation lands within a few bf16
    ULPs of it (pinned by test_fused_block_bf16_ulp_agreement).
    """
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
    return jnp.concatenate(ctx_heads, axis=-1)  # (TB*L, D)


def _cs_shift(q, k, TB, L, n_head, inv_temp, hmask_f, L_real):
    """Per-row Cauchy–Schwarz softmax shift for the head-packed layout.

    q, k: (TB*L, D) compute dtype. Returns (TB, HL, 1) f32 where row
    (h, t) holds ‖q_ht‖ · max_s ‖k_hs‖ · inv_temp — a true upper bound
    on head h's tempered score for query t, so exp(score·τ − shift) ≤ 1.
    Shared by the inference kernel (_attn_packed) and the training
    core's forward/backward kernels (attn_core.py) so e/den match
    bit-for-bit across all three."""
    L_dim = TB * L  # noqa: F841  (documentation of q's leading dim)
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    qn2 = jnp.dot(qf * qf, hmask_f,
                  preferred_element_type=jnp.float32)   # (TB*L, H)
    kn2 = jnp.dot(kf * kf, hmask_f,
                  preferred_element_type=jnp.float32)   # (TB*L, H)
    kn2r = kn2.reshape(TB, L, n_head)
    if L_real != L:
        # padded key rows must not inflate the per-head ‖k‖ max
        krow = jax.lax.broadcasted_iota(jnp.int32, (1, L, 1), 1)
        kn2r = jnp.where(krow < L_real, kn2r, jnp.float32(0))
    kn2m = jnp.max(kn2r, axis=1, keepdims=True)
    qn = jnp.sqrt(qn2).reshape(TB, L, n_head)
    kn = jnp.sqrt(kn2m)                                 # (TB, 1, H)
    qk = qn * kn * inv_temp                             # (TB, L, H)
    # fold (TB, L, H) -> (TB, HL, 1): tile H× down sublanes (identical
    # pieces share layout offsets), keep head h's lane in row block h,
    # lane-reduce. Replaces the offset-mismatched 1-lane concat.
    qk_t = jnp.concatenate([qk] * n_head, axis=1)       # (TB, HL, H)
    rh = jax.lax.broadcasted_iota(jnp.int32,
                                  (n_head * L, n_head), 0) // L
    rc = jax.lax.broadcasted_iota(jnp.int32, (n_head * L, n_head), 1)
    rsel = (rh == rc).astype(jnp.float32)               # (HL, H)
    return jnp.sum(qk_t * rsel, axis=-1, keepdims=True)  # (TB, HL, 1)


def _attn_packed(q, k, v, TB, L, d_k, n_head, inv_temp, compute_dtype,
                 L_real, ablate: str = ""):
    """Head-PACKED attention: all heads ride one matmul per stage.

    The per-head loop's matmuls contract (scores) or output (ctx) only
    d_k=8 of the MXU's 128 lanes — ~6% utilization on the measured
    decoder hot spot. Packing every head into one matmul per stage runs
    n_head× the FLOPs but at full-lane contraction/output, and replaces
    the exact row-max VPU pass (the single most expensive elementwise
    stage at L=250) with a per-head Cauchy–Schwarz bound computed by two
    tiny MXU dots:

      qhat (TB, HL, D): q tiled H× down the sublane dim, row block h
          masked to keep only head h's channels;
      S    (TB, HL, L) = qhat @ k³ᵀ   — head h's scores land in rows
          [hL, (h+1)L) because the masked qhat zeroes cross-head terms;
      e    = exp(S·inv_temp − shift)  — shift_th = ‖q_t‖·max_s‖k_s‖
          per head, a true upper bound on the tempered score, so every
          exp ≤ 1 (softmax is shift-invariant; precision is preserved
          because exp(x−bound) keeps full relative accuracy);
      num  (TB, HL, D) = e @ v³ ;  den (TB, HL, 1) = e @ 1
      collapse: H static sublane slices + head-channel masks re-fold
          (TB, HL, ·) to (TB, L, D) — no 4D tensors, no minor-dim
          reshapes (Mosaic-safe).

    Mosaic layout constraints (learned from a real-chip compile failure,
    round 4): tpu.concatenate requires every input to share sublane/lane
    offsets on the NON-concat dims, so (a) L must be a multiple of the
    8-row sublane tile — callers pad L 250→256 and pass the true length
    as L_real; padded key rows are masked out of e and of the ‖k‖ max,
    padded q rows produce garbage that the caller slices off — and
    (b) the per-row shift must NOT be assembled by concatenating 1-lane
    slices qn[:, :, h:h+1] (each lives at lane offset h ⇒ offset
    mismatch); instead the full (TB, L, H) norm product is tile-
    concatenated H× down the sublane dim (identical pieces ⇒ identical
    offsets), the off-head lanes are zeroed by a row-block mask, and a
    lane-reduction folds it to (TB, HL, 1).

    Numerics: same max(ish)-shifted exp/divide-after-ctx structure as
    the head loop; agreement pinned by tests/test_pallas.py (f32 ≤1e-7,
    bf16 within ULP noise of the loop).
    """
    D = d_k * n_head
    q3 = q.reshape(TB, L, D)
    k3 = k.reshape(TB, L, D)
    v3 = v.reshape(TB, L, D)

    # head-channel mask (D, n_head): column h selects head h's channels
    ch = jax.lax.broadcasted_iota(jnp.int32, (D, n_head), 0) // d_k
    hh = jax.lax.broadcasted_iota(jnp.int32, (D, n_head), 1)
    hmask_f = (ch == hh).astype(jnp.float32)            # (D, H)

    # qhat: tile q down the sublane dim, zero other heads' channels
    rowh = jax.lax.broadcasted_iota(jnp.int32, (n_head * L, D), 0) // L
    colh = jax.lax.broadcasted_iota(jnp.int32, (n_head * L, D), 1) // d_k
    qmask = (rowh == colh).astype(compute_dtype)        # (HL, D)
    qhat = jnp.concatenate([q3] * n_head, axis=1) * qmask  # (TB, HL, D)

    # Cauchy–Schwarz shift: per-head ‖q_t‖ · max_s ‖k_s‖, pre-tempered.
    # (An alternative fold — per-row norms straight off qhat via an f32
    # square + lane-reduce and a per-sample global k max — measured
    # 13.3 ms/2blocks vs this fold's 11.1 on hardware: the (HL, D) f32
    # cast + reduce passes cost more than the (L, H)-sized machinery
    # below, so the tile-concat fold stays.)
    if ablate == "noshift":  # profiling-only: cost of the shift machinery
        shift = jnp.float32(0.0)
    else:
        shift = _cs_shift(q, k, TB, L, n_head, inv_temp, hmask_f, L_real)

    if ablate == "thin16":
        # profiling-only: the score matmul contracting 16 lanes instead
        # of 64. If this times the SAME as the full kernel, the score
        # stage is MXU output-tile-bound (any contraction <= 128 lanes is
        # one pass per output tile), which closes the ROADMAP block-1
        # low-rank factorisation idea: the factorised form still
        # materialises the same (HL, L) f32 score tensor, so it cannot
        # save MXU time — only add gather/thin-matmul overhead.
        scores = jax.lax.dot_general(
            qhat[:, :, :16], k3[:, :, :16], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    else:
        scores = jax.lax.dot_general(
            qhat, k3, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (TB, HL, L) f32, un-tempered
    if ablate == "noexp":  # profiling-only: cost of the exp itself
        e = scores * inv_temp - shift
    elif ablate == "bf16exp":  # profiling-only: exp at compute dtype
        e = jnp.exp((scores * inv_temp - shift).astype(compute_dtype))
    else:
        e = jnp.exp(scores * inv_temp - shift)
    if L_real != L and ablate != "nomask":
        # zero padded key columns (their k rows are zeros in block 1 but
        # LN output in later fused blocks — mask unconditionally)
        kcol = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2)
        e = jnp.where(kcol < L_real, e, jnp.float32(0))
    e = e.astype(compute_dtype)
    # num and den ride ONE matmul: the value operand is padded to a full
    # 128-lane MXU output tile with a ones column at lane D, so the
    # softmax denominator (e @ 1) lands in that lane of the same product.
    # A separate den = e @ ones_(L,1) dot used 1 of 128 output lanes and
    # measured 3.6 ms/2blocks on hardware (profile_attn_breakdown.py) —
    # the padded dot costs the same MXU passes as the D=64 num dot alone.
    # f32 accumulation order over L is unchanged, so den is bit-identical.
    EXT = max(128, ((D + 1 + 127) // 128) * 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, L, EXT - D), 2)
    ones_col = (lane == 0).astype(compute_dtype)
    v_ext = jnp.concatenate([v3, ones_col], axis=2)     # (TB, L, EXT)
    num_ext = jax.lax.dot_general(
        e, v_ext, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (TB, HL, EXT): lanes [0,D) = num, lane D = den

    num_c = jnp.zeros((TB, L, D), jnp.float32)
    den_c = jnp.zeros((TB, L, D), jnp.float32)
    for h in range(n_head):
        hm = hmask_f[:, h].reshape(1, 1, D)
        nm = num_ext[:, h * L:(h + 1) * L, :]
        num_c = num_c + nm[:, :, :D] * hm
        den_c = den_c + nm[:, :, D:D + 1] * hm
    if ablate == "noden":  # profiling-only: cost of den collapse + divide
        return num_c.astype(compute_dtype).reshape(TB * L, D)
    # The Cauchy–Schwarz bound can exceed the true row max; if it does by
    # > ~88 nats (f32 exp underflow) every exp in the row flushes to 0 and
    # the divide would be 0/0. Clamp the denominator so that (out-of-
    # distribution) regime degrades to ctx=0 instead of NaN — the exact-max
    # head loop cannot hit this, so the packed path must not either.
    den_c = jnp.maximum(den_c, jnp.float32(1e-30))
    ctx = (num_c / den_c).astype(compute_dtype)
    return ctx.reshape(TB * L, D)


def _apply_block(
    x2,
    w,
    TB: int,
    L: int,
    n_head: int,
    compute_dtype,
    packed: bool,
    L_real: int,
    ablate: str = "",
):
    """One post-LN attention+FFN block on a VMEM-resident (TB*L, D) tile.

    x2 is in compute dtype; returns the block output in FLOAT32 (the
    final LayerNorm's natural dtype) so callers choose the cast — the
    single-block kernel casts to the output ref dtype, the multi-block
    kernel casts to compute dtype between blocks (bit-equal to the HBM
    round trip it replaces, where the activation is stored in compute
    dtype between pallas_calls)."""
    (wq, bq, wk, bk, wv, bv, wf, bf, ln1s, ln1b,
     w1, b1, w2, b2, ln2s, ln2b) = w
    D = x2.shape[-1]
    d_k = D // n_head
    inv_temp = 1.0 / (d_k ** 0.5)

    def proj(w_ref, b_ref):
        y = jnp.dot(x2, w_ref[:].astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        return (y + b_ref[:].astype(jnp.float32)).astype(compute_dtype)

    # Keep tensors <= 3D and reshape only on the leading (sublane) dim —
    # Mosaic does not lower minor-dim shape casts like (TB*L,D)->(TB,L,H,dk).
    q = proj(wq, bq)  # (TB*L, D)
    k = proj(wk, bk)
    v = proj(wv, bv)

    if ablate == "noattn":  # profiling-only: proj + FFN + LN floor
        ctx = q
    elif packed:
        ctx = _attn_packed(q, k, v, TB, L, d_k, n_head, inv_temp,
                           compute_dtype, L_real, ablate)
    else:
        ctx = _attn_headloop(q, k, v, TB, L, d_k, n_head, inv_temp,
                             compute_dtype)

    o = jnp.dot(ctx, wf[:].astype(compute_dtype),
                preferred_element_type=jnp.float32)
    o = o + bf[:].astype(jnp.float32)
    h1 = _layer_norm(o + x2.astype(jnp.float32), ln1s[:], ln1b[:])
    if ablate == "noffn":  # profiling-only: cost of the FFN stack
        return h1
    h1c = h1.astype(compute_dtype)

    f = jnp.dot(h1c, w1[:].astype(compute_dtype),
                preferred_element_type=jnp.float32)
    f = jax.nn.relu(f + b1[:].astype(jnp.float32)).astype(compute_dtype)
    f = jnp.dot(f, w2[:].astype(compute_dtype),
                preferred_element_type=jnp.float32)
    f = f + b2[:].astype(jnp.float32)
    return _layer_norm(f + h1, ln2s[:], ln2b[:])


def _block_kernel(
    x_ref,
    *refs,
    n_head: int,
    compute_dtype,
    packed: bool,
    n_blocks: int = 1,
    L_real: int = 0,
    ablate: str = "",
):
    """Run n_blocks sequential FFT blocks on one VMEM tile.

    refs: n_blocks * 16 weight refs (in _WEIGHT_FIELDS order per block)
    followed by out_ref. With n_blocks=2 the (TB, L, D) activation makes
    ONE HBM round trip for the whole decoder stack instead of two.
    L_real: true sequence length when the packed path padded L up to a
    sublane multiple (padded rows flow through LN/FFN — rows are
    independent there — and are masked out of attention)."""
    out_ref = refs[-1]
    TB, L, D = x_ref.shape
    lr = L_real or L
    x2 = x_ref[:].astype(compute_dtype).reshape(TB * L, D)
    for b in range(n_blocks):
        w = refs[b * 16:(b + 1) * 16]
        h = _apply_block(x2, w, TB, L, n_head, compute_dtype, packed, lr,
                         ablate)
        x2 = h.astype(compute_dtype)  # inter-block cast = the HBM round trip
    out_ref[:] = h.astype(out_ref.dtype).reshape(TB, L, D)


def _packed_default(L: int) -> bool:
    # Head-packing pays off when the (L, L) score stage dominates and the
    # per-head matmuls waste MXU lanes — the decoder's L=250. The encoder's
    # L=16 scores are trivial and the head loop is already fast there.
    # ON for long sequences since round 4's hardware timing
    # (scripts/profiling/profile_r4.py on a v5e chip, B=2048 decoder
    # shape): head-loop 37.0 ms/2blocks vs packed tile_b=4 13.6 ms —
    # 2.7x, bf16 diffs within ULP noise (max 0.0156 on |x|<=4.16).
    return L > 32


def _tile_b(L: int, packed: bool) -> int:
    # Sized against the 16 MB VMEM scoped-allocation limit. Head loop:
    # Mosaic stack-allocates the unrolled per-head score/prob buffers
    # rather than reusing one, so the decoder tile (L=250) must keep 8
    # heads' (TB, L, L) f32 scores simultaneously: TB=4 -> 8 MB + FFN/LN
    # temporaries. Packed: one (TB, 8Lp, Lp) f32 score + bf16 exp buffer
    # at Lp=256 (TB=4 -> 12 MB + (TB, 8Lp, D) num ~ 2 MB — right at the
    # budget, compiles and is the measured fastest: 13.6 ms/2blocks vs
    # 15.1 at TB=2 on hardware).
    if L <= 32:
        return 64
    return 4


def _tile_b_pair(L: int, packed: bool) -> int:
    # Two blocks unroll in one kernel and Mosaic does NOT reuse buffers
    # across the unrolled program, so the scoped budget is ~2x a single
    # block's: halve the batch tile vs _tile_b. Packed pair at TB=1
    # keeps 2 x ((1, 8L, L) f32 + bf16) ~ 6 MB; head-loop pair at TB=2
    # keeps 2 x 8 x (2, L, L) f32 = 8 MB at L=250.
    if L <= 32:
        return 32
    return 1 if packed else 2


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "interpret", "tile_b", "packed", "ablate"),
)
def fused_fft_block(
    x: jnp.ndarray,
    block_params: dict,
    n_head: int,
    interpret: bool = False,
    tile_b: int = 0,
    packed: bool | None = None,
    ablate: str = "",
) -> jnp.ndarray:
    """Apply one post-LN attention+FFN block via the fused kernel.

    x: (B, L, D); B is padded to a multiple of the batch tile internally.
    packed=None defers to _packed_default(L) — the policy switch for the
    head-packed attention variant (see its comment for the current
    default and the hardware-timing gate behind it).
    """
    B, L, D = x.shape
    if packed is None:
        packed = _packed_default(L)
    TB = tile_b or _tile_b(L, packed)
    # Packed attention tile-concats down the sublane dim, which Mosaic
    # only lowers when every piece shares layout offsets — pad L to the
    # 8-row sublane tile (250 -> 256); padded rows are masked inside the
    # kernel and sliced off here.
    Lp = ((L + 7) // 8) * 8 if packed else L
    if Lp != L:
        x = jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0)))
    pad = (-B) % TB
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, Lp, D), x.dtype)], axis=0)
    Bp = B + pad

    weights = [_get(block_params, path) for path in _WEIGHT_FIELDS]
    kernel = functools.partial(
        _block_kernel, n_head=n_head, compute_dtype=x.dtype, packed=packed,
        L_real=L, ablate=ablate,
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
            pl.BlockSpec((TB, Lp, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((TB, Lp, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Lp, D), x.dtype),
        interpret=interpret,
    )(x, *weights)
    return out[:B, :L] if (pad or Lp != L) else out


@functools.partial(
    jax.jit, static_argnames=("n_head", "interpret", "tile_b", "packed")
)
def fused_fft_block_pair(
    x: jnp.ndarray,
    block0: dict,
    block1: dict,
    n_head: int,
    interpret: bool = False,
    tile_b: int = 0,
    packed: bool | None = None,
) -> jnp.ndarray:
    """BOTH decoder FFT blocks in ONE pallas_call.

    The per-block kernel reads and writes the (B, L, D) activation from
    HBM once per block; fusing the decoder's two blocks halves that to
    one round trip for the stack — the remaining HBM traffic on the
    decoder's measured hot path (reference stack: modules.py:92-142,
    two FFTBlocks back to back). Numerics are bit-equal to two
    sequential fused_fft_block calls: the inter-block HBM store/load in
    compute dtype is replaced by the same cast in VMEM (pinned by
    tests/test_pallas.py::test_fused_pair_matches_sequential).

    Gated like the packed variant: production use is behind the
    'pallas_pair' config knob, OFF until timed on hardware.
    """
    B, L, D = x.shape
    if packed is None:
        packed = _packed_default(L)
    TB = tile_b or _tile_b_pair(L, packed)
    Lp = ((L + 7) // 8) * 8 if packed else L  # see fused_fft_block
    if Lp != L:
        x = jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0)))
    pad = (-B) % TB
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, Lp, D), x.dtype)], axis=0)
    Bp = B + pad

    weights = [
        _get(bp, path) for bp in (block0, block1) for path in _WEIGHT_FIELDS
    ]
    kernel = functools.partial(
        _block_kernel, n_head=n_head, compute_dtype=x.dtype, packed=packed,
        n_blocks=2, L_real=L,
    )
    w_specs = [
        pl.BlockSpec(w.shape, lambda i, s=w.shape: (0,) * len(s),
                     memory_space=pltpu.VMEM)
        for w in weights
    ]
    out = pl.pallas_call(
        kernel,
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((TB, Lp, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((TB, Lp, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Lp, D), x.dtype),
        interpret=interpret,
    )(x, *weights)
    return out[:B, :L] if (pad or Lp != L) else out
