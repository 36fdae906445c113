"""FastSpeech-style feed-forward transformer for squiggle simulation.

Architecture (capability parity with the reference model, re-expressed as
pure JAX functions over a parameter pytree):

  one-hot k-mers (B, K, k*5)
    -> src_emb Linear -> ReLU -> pre_layers x (Linear -> ReLU)   [= emb_out]
    -> + sinusoid PE -> encoder_layers x FFTBlock                 [= enc_out]
  noise head (on emb_out):    Linear -> ReLU -> Linear -> Softplus -> stdev/kmer
  duration head (on emb_out): two Softplus MLPs -> Gamma(concentration, rate)
  length regulator: durations -> alignment -> expand enc_out to (B, T, D)
  decoder: + sinusoid PE -> decoder_layers x FFTBlock -> Linear(D->1) -> ReLU

Reference structure: src/seq2squiggle/modules.py:17-142 (encoder/decoder),
modules.py:145-278 (duration/noise heads), model.py:195-251 (predict path).

The parameter pytree is a nested dict keyed to mirror the reference's torch
state_dict names (see models/torch_import.py), which makes importing
pretrained reference checkpoints a pure reshape/transpose mapping.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import fft_block, linear
from ..ops.positional import sinusoid_encoding_table


def _use_pallas_blocks(config: dict, x, mask, dropout_rng) -> bool:
    """Fused Pallas blocks are the bfloat16 inference fast path; training
    (dropout), masking, float32 fidelity mode, and CPU fall back to XLA."""
    if dropout_rng is not None or mask is not None:
        return False
    mode = config.get("use_pallas", "auto")
    if mode is True:
        return True
    if mode == "auto":
        import jax as _jax

        return x.dtype == jnp.bfloat16 and _jax.default_backend() != "cpu"
    return False


def _train_kernel_mode(config: dict, x, mask) -> str:
    """Training-path Pallas dispatch (inference prefers the fully fused
    inference kernel via _use_pallas_blocks, which wins when dropout is
    off). Returns one of:

      "block" — whole-block fused fwd+bwd kernels with in-kernel dropout
                scales (ops/pallas/block_train), the fastest path
      "core"  — attention-core-only custom VJP (ops/pallas/attn_core),
                projections/FFN/LN/dropout in XLA
      "xla"   — pure XLA blocks

    config 'pallas_train': "auto"/True -> block, "core" -> core,
    False -> xla. train_run's pre-loop probe downgrades auto one rung at
    a time if a kernel cannot lower on the backend.

    Gated to xla for: explicit masks (no user-mask support in the
    kernels), float32 fidelity mode (kept on the Precision.HIGHEST XLA
    path), short sequences (the encoder's L=16 scores are trivial), CPU
    (Mosaic can't compile; interpret mode would be pure overhead), and
    tensor-parallel runs (pjit cannot shard heads THROUGH a pallas_call —
    the XLA einsums shard cleanly instead)."""
    if mask is not None or x.shape[1] <= 32:
        return "xla"
    mode = config.get("pallas_train", "auto")
    if mode is True or mode == "block":
        return "block"
    if mode == "core":
        return "core"
    if mode == "auto":
        import jax as _jax

        if (
            x.dtype == jnp.bfloat16
            and _jax.default_backend() != "cpu"
            and int(config.get("tensor_parallel", 1)) == 1
        ):
            return "block"
    return "xla"


def _use_packed_core(config: dict, x, mask) -> bool:
    """Back-compat boolean view of _train_kernel_mode (attention-core
    rung or better engages the packed core inside fft_block)."""
    return _train_kernel_mode(config, x, mask) == "core"


def _packed_mode(config: dict):
    """config 'pallas_packed' -> fused_fft_block's packed arg (None = auto
    by sequence length; see ops/pallas/fft_block._packed_default)."""
    mode = config.get("pallas_packed", "auto")
    if mode == "auto":
        return None
    return bool(mode)


def _pair_mode(config: dict) -> bool:
    """config 'pallas_pair' -> fuse the decoder's two FFT blocks into one
    pallas_call. 'auto' means OFF: round-4 hardware timing
    (scripts/profiling/profile_r4.py) measured the pair fusion within
    noise of sequential calls (head-loop 36.8 vs 37.0 ms/2blocks) and
    SLOWER in the packed regime (median 14.5 vs 13.6 — the halved batch
    tile costs more than the saved HBM round trip), so the knob stays a
    manual override."""
    mode = config.get("pallas_pair", "auto")
    if mode == "auto":
        return False
    return bool(mode)


# ---------------------------------------------------------------------------
# Initialisation
# ---------------------------------------------------------------------------


def _init_linear(rng: jax.Array, d_in: int, d_out: int) -> dict:
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    k_rng, b_rng = jax.random.split(rng)
    bound = 1.0 / np.sqrt(d_in)
    return {
        "kernel": jax.random.uniform(
            k_rng, (d_in, d_out), jnp.float32, -bound, bound
        ),
        "bias": jax.random.uniform(b_rng, (d_out,), jnp.float32, -bound, bound),
    }


def _init_ln(d: int) -> dict:
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def _init_block(rng: jax.Array, d_model: int, d_inner: int) -> dict:
    rngs = jax.random.split(rng, 6)
    return {
        "attn": {
            "w_qs": _init_linear(rngs[0], d_model, d_model),
            "w_ks": _init_linear(rngs[1], d_model, d_model),
            "w_vs": _init_linear(rngs[2], d_model, d_model),
            "fc": _init_linear(rngs[3], d_model, d_model),
            "ln": _init_ln(d_model),
        },
        "ffn": {
            "w_1": _init_linear(rngs[4], d_model, d_inner),
            "w_2": _init_linear(rngs[5], d_inner, d_model),
            "ln": _init_ln(d_model),
        },
    }


def _init_mlp_head(rng: jax.Array, d: int) -> dict:
    r1, r2 = jax.random.split(rng)
    return {"fc1": _init_linear(r1, d, d), "fc2": _init_linear(r2, d, 1)}


def init_params(config: dict, rng: jax.Array) -> dict:
    """Initialise the full parameter pytree for a fresh model."""
    d = config["dmodel"]
    dff = config["dff"]
    k = config["seq_kmer"]
    n_vocab = len(config["allowed_chars"]) * k
    rngs = jax.random.split(rng, 16)

    encoder = {
        "src_emb": _init_linear(rngs[0], n_vocab, d),
        "pre_net": [
            _init_linear(rngs[1 + i], d, d) for i in range(config["pre_layers"])
        ],
        "pos_enc": jnp.asarray(sinusoid_encoding_table(config["max_dna_len"], d)),
        "blocks": [
            _init_block(rngs[5 + i], d, dff) for i in range(config["encoder_layers"])
        ],
    }
    decoder = {
        "pos_enc": jnp.asarray(sinusoid_encoding_table(config["max_signal_len"], d)),
        "blocks": [
            _init_block(rngs[9 + i], d, dff) for i in range(config["decoder_layers"])
        ],
        "out_linear": _init_linear(rngs[13], d, 1),
    }
    noise = _init_mlp_head(rngs[14], d)
    dur_rngs = jax.random.split(rngs[15])
    duration = {
        "conc": _init_mlp_head(dur_rngs[0], d),
        "rate": _init_mlp_head(dur_rngs[1], d),
    }
    return {
        "encoder": encoder,
        "decoder": decoder,
        "noise_sampler": noise,
        "duration_sampler": duration,
    }


def count_params(params: dict) -> int:
    """Number of trainable scalars (positional tables excluded, as in the
    reference where they are requires_grad=False)."""
    leaves = {
        jax.tree_util.keystr(kp): leaf
        for kp, leaf in jax.tree_util.tree_leaves_with_path(params)
    }
    return int(
        sum(np.prod(v.shape) for k, v in leaves.items() if "pos_enc" not in k)
    )


# ---------------------------------------------------------------------------
# Forward passes (pure functions; dropout only when dropout_rng is provided)
# ---------------------------------------------------------------------------


def encoder_forward(
    params: dict,
    one_hot: jnp.ndarray,
    config: dict,
    mask: Optional[jnp.ndarray] = None,
    dropout_rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """one_hot: (B, K, k*5). Returns (enc_out, emb_out), both (B, K, D).

    emb_out is the pre-positional-encoding embedding that feeds the noise and
    duration heads (reference taps it at modules.py:80,89).
    """
    enc = params["encoder"]
    x = jax.nn.relu(linear(enc["src_emb"], one_hot))
    for pre in enc["pre_net"]:
        x = jax.nn.relu(linear(pre, x))
    emb_out = x
    h = x + enc["pos_enc"][None, : x.shape[1]].astype(x.dtype)
    if _use_pallas_blocks(config, h, mask, dropout_rng):
        from ..ops.pallas.fft_block import fused_fft_block

        packed = _packed_mode(config)
        for block in enc["blocks"]:
            h = fused_fft_block(h, block, config["encoder_heads"],
                                packed=packed)
        return h, emb_out
    rate = config["encoder_dropout"] if dropout_rng is not None else 0.0
    # encoder sequences are short (L=16 default) so the length gate keeps
    # this on XLA; with longer k-mer budgets the packed core engages.
    use_core = _train_kernel_mode(config, h, mask) in ("core", "block")
    for i, block in enumerate(enc["blocks"]):
        rng_i = jax.random.fold_in(dropout_rng, i) if dropout_rng is not None else None
        h = fft_block(
            block, h, config["encoder_heads"], mask=mask,
            dropout_rate=rate, dropout_rng=rng_i, packed_core=use_core,
        )
    return h, emb_out


def decoder_forward(
    params: dict,
    x: jnp.ndarray,
    config: dict,
    mask: Optional[jnp.ndarray] = None,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """x: (B, T, D) length-regulated frames. Returns (B, T, 1) current (>=0)."""
    dec = params["decoder"]
    h = x + dec["pos_enc"][None, : x.shape[1]].astype(x.dtype)
    if _use_pallas_blocks(config, h, mask, dropout_rng):
        from ..ops.pallas.fft_block import fused_fft_block, fused_fft_block_pair

        packed = _packed_mode(config)
        if _pair_mode(config) and len(dec["blocks"]) == 2:
            # One pallas_call for the whole stack: one HBM round trip of
            # the (B, T, D) activation instead of two (bit-equal to the
            # sequential calls; see fused_fft_block_pair).
            h = fused_fft_block_pair(h, dec["blocks"][0], dec["blocks"][1],
                                     config["decoder_heads"], packed=packed)
        else:
            for block in dec["blocks"]:
                h = fused_fft_block(h, block, config["decoder_heads"],
                                    packed=packed)
        out = linear(dec["out_linear"], h)
        return jax.nn.relu(out)
    rate = config["decoder_dropout"] if dropout_rng is not None else 0.0
    kmode = _train_kernel_mode(config, h, mask)
    if kmode == "block":
        # Whole-block fused fwd+bwd kernels; dropout scales drawn OUTSIDE
        # with the same key folding/splitting as the XLA path below, so
        # the training RNG stream is bit-identical across kernel modes.
        from ..ops.pallas.block_train import (
            fused_block_train, make_dropout_scales,
        )

        for i, block in enumerate(dec["blocks"]):
            s_a = s_f = None
            if dropout_rng is not None and rate > 0.0:
                rng_i = jax.random.fold_in(dropout_rng, i)
                rng_a, rng_f = jax.random.split(rng_i)
                s_a = make_dropout_scales(rng_a, rate, h.shape, h.dtype)
                s_f = make_dropout_scales(rng_f, rate, h.shape, h.dtype)
            h = fused_block_train(h, block, s_a, s_f,
                                  config["decoder_heads"])
        out = linear(dec["out_linear"], h)
        return jax.nn.relu(out)
    use_core = kmode == "core"
    for i, block in enumerate(dec["blocks"]):
        rng_i = jax.random.fold_in(dropout_rng, i) if dropout_rng is not None else None
        h = fft_block(
            block, h, config["decoder_heads"], mask=mask,
            dropout_rate=rate, dropout_rng=rng_i, packed_core=use_core,
        )
    out = linear(dec["out_linear"], h)
    return jax.nn.relu(out)


def _mlp_head(
    p: dict,
    x: jnp.ndarray,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Linear -> ReLU -> (Dropout) -> Linear -> Softplus, squeezed to (B, K)."""
    h = jax.nn.relu(linear(p["fc1"], x))
    if dropout_rng is not None and dropout_rate > 0.0:
        keep = 1.0 - dropout_rate
        mask = jax.random.bernoulli(dropout_rng, keep, h.shape)
        h = jnp.where(mask, h / keep, 0.0).astype(h.dtype)
    out = jax.nn.softplus(linear(p["fc2"], h).astype(jnp.float32))
    return out[..., 0]


def noise_head(
    params: dict,
    emb_out: jnp.ndarray,
    config: dict,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Per-k-mer amplitude-noise stdev prediction, (B, K) float32."""
    rate = config["duration_dropout"] if dropout_rng is not None else 0.0
    return _mlp_head(
        params["noise_sampler"], emb_out, dropout_rate=rate, dropout_rng=dropout_rng
    )


def duration_gamma_params(
    params: dict,
    emb_out: jnp.ndarray,
    config: dict,
    dropout_rng: Optional[jax.Array] = None,
    epsilon: float = 1e-8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gamma (concentration, rate) per k-mer, each (B, K) float32, clamped to
    epsilon for positivity (reference: modules.py:214-219)."""
    dur = params["duration_sampler"]
    rate_drop = config["duration_dropout"] if dropout_rng is not None else 0.0
    r1 = r2 = None
    if dropout_rng is not None:
        r1, r2 = jax.random.split(dropout_rng)
    conc = _mlp_head(dur["conc"], emb_out, dropout_rate=rate_drop, dropout_rng=r1)
    rate = _mlp_head(dur["rate"], emb_out, dropout_rate=rate_drop, dropout_rng=r2)
    return jnp.maximum(conc, epsilon), jnp.maximum(rate, epsilon)
