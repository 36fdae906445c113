"""The jitted squiggle-simulation inner loop.

One XLA program per knob configuration covers the reference's whole
predict_step (src/seq2squiggle/model.py:195-251) plus digitisation
(signal_io.py:134-138):

  int8 k-mer codes -> one-hot -> encoder -> noise head
    -> duration draw (Gamma head sample | static normal | constant)
    -> alignment-matrix length regulation (MXU einsum)
    -> decoder -> x scaling_max_value -> amplitude noise on non-zero frames
    -> clamp >= 0 -> int16 digitisation + non-zero mask

Everything is static-shaped: (B, K=16) chunks in, (B, T=250) samples out.
Inference knobs (sampling toggles, dwell/noise statistics) are baked into
the compiled program as constants - they are fixed for a simulation run, and
constant-folding them lets XLA fuse the noise/digitisation epilogue.

Host <-> device traffic per batch is B*16*k int8 in (k-mer codes; one-hot
happens on device) and, out, either B*250 int16 front-compacted samples +
per-row counts, or the packed int8-delta wire format (see _pack_wire).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..models.fft_model import (
    decoder_forward,
    duration_gamma_params,
    encoder_forward,
    noise_head,
)
from ..ops.regulator import regulate_from_seg, segment_map
from ..sampling import per_chunk_keys, sample_gamma_durations, sample_normal


@dataclasses.dataclass(frozen=True)
class PredictKnobs:
    """Inference-time controls (reference CLI: --dwell-mean/std, --noise-std,
    --noise-sampler/--duration-sampler, --min_noise, --min_duration)."""

    dwell_mean: float = 12.5
    dwell_std: float = 0.0
    noise_std: float = 2.0
    noise_sampling: bool = True
    duration_sampling: bool = True
    min_noise: float = 0.0
    min_duration: int = 3
    scaling_max_value: float = 165.0
    # digitisation (from the chemistry profile)
    digitisation: float = 2048.0
    signal_range: float = 281.345551
    offset_mean: float = -127.5655735
    # Device->host wire width: 16 = raw int16 rows, 8 = int8 deltas
    # (330 B/row vs 504 raw, 1.53x), 12 = 12-bit deltas packed
    # two-per-three-bytes (395 B/row, 1.28x), 4 = the event tier
    # (~229 B/row, 2.2x): per-event levels/stdevs/boundaries + 4-bit CLEAN
    # within-event deltas; the host regenerates the Gaussian noise from
    # the same threefry keys (see _pack_event_wire). 2 = the ULP event
    # tier (~127 B/row, 4.0x): bf16 event levels + 2-bit ULP deltas with
    # batch-flat escape buffers (see _pack_event_wire_ulp; requires
    # bfloat16 compute). The D2H link is the measured loop bottleneck, so
    # fewer bytes = faster runs.
    # Which tier is lossless depends on the amplitude-noise scale the
    # weights predict: delta sigma in ADC counts is
    # sqrt(2) * noise_stdev_pA * digitisation/range. int8 covers ~4 sigma
    # of 2-3 pA noise (typical trained models); 12-bit covers +-2047, i.e.
    # >13 sigma of even the 15 pA the round-1 demo weights predict.
    # simulate_run starts at 8 and downgrades 8 -> 12 -> 16 on the first
    # per-row exception overflow (recomputing the affected batch raw), so
    # every run settles on the narrowest lossless format by itself.
    wire_bits: int = 16


# Exception slots per row for the packed wire formats. For int8 deltas,
# k-mer boundaries (<=15 per chunk) plus the first sample are the only
# structural out-of-range producers; 24 leaves noise headroom. For 12-bit
# deltas +-2047 exceeds any physical signal jump, so 4 slots is pure
# paranoia. For the event tier (4-bit CLEAN deltas; boundaries are carried
# by per-event levels, not exceptions) trained weights measure ~1% of
# within-event deltas outside +-7 (~2 per row); 12 slots put the Poisson
# overflow odds per row below 1e-7. The kernel reports the true per-row
# count so the host can verify losslessness and downgrade tiers when
# exceeded. (The ULP tier has no per-row slots at all — see
# WIRE_ESC_NIB_PER_ROW below.)
WIRE_EXC_SLOTS = {4: 12, 8: 24, 12: 4}

# ULP-tier escape budget, in 4-bit nibbles per row of BATCH-FLAT buffer.
# Trained weights measure ~4-8% of within-event ULP deltas outside
# {0, +-1}: the R10 demo checkpoint averages ~9.7 escapes/row through the
# Pallas decoder on TPU (per-row max 45 over 180k rows), the R9 demo
# ~16.3/row. The escape buffer is shared across the batch with per-row
# offsets, so only the BATCH TOTAL matters: at B=2048 a 20-nibble/row cap
# leaves >30 sigma of Poisson headroom over both demos, and a single row
# may hold hundreds of escapes without overflowing anything. A model
# whose decoder is rougher than ~8% escapes consistently overflows and
# the run downgrades to the 4-bit event tier — detected exactly, never a
# correctness risk.
WIRE_ESC_NIB_PER_ROW = 20


def _compute_durations(
    params: dict,
    emb_out: jnp.ndarray,
    keys: jax.Array,
    knobs: PredictKnobs,
    config: dict,
) -> jnp.ndarray:
    """Integer dwell counts per k-mer, (B, K) int32."""
    B, K = emb_out.shape[:2]
    if knobs.duration_sampling:
        conc, rate = duration_gamma_params(params, emb_out, config)
        dur = sample_gamma_durations(keys, conc, rate)
        dur = jnp.maximum(dur, 1.0)  # reference: modules.py:223
        dur = jnp.maximum(dur, float(knobs.min_duration))  # modules.py:414
    elif knobs.dwell_std > 0:
        noise = sample_normal(keys, (K,))
        dur = knobs.dwell_mean + knobs.dwell_std * noise
        dur = jnp.maximum(dur, float(knobs.min_duration))
    else:
        dur = jnp.full((B, K), knobs.dwell_mean, jnp.float32)
    # reference rounds sampled durations to int (modules.py:437-439);
    # jnp.round is round-half-to-even, same as torch.round.
    return jnp.round(dur).astype(jnp.int32)


def predict_step(
    params: dict,
    codes: jnp.ndarray,  # (B, K, k) k-mer codes, or (B, K+k-1) base windows
    read_idx: jnp.ndarray,  # (B,) int32 global read index (-1 = padding row)
    chunk_off: jnp.ndarray,  # (B,) int32 chunk offset within the read
    base_key: jax.Array,
    n_kmers: jnp.ndarray = None,  # (B,) valid k-mers per windowed row
    *,
    config: dict,
    knobs: PredictKnobs,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (signal_compact (B, T) int16, counts (B,) int32).

    Samples to export are those whose final (noise-added, clamped) current
    is non-zero — identical to the reference's export-side
    `tensor[tensor.nonzero()]` stripping (model.py:286). The kept samples
    are stably compacted to the FRONT of each row on device (order
    preserved), so the host only slices `row[:count]` — this halves
    device->host bytes vs shipping a boolean mask and removes host-side
    boolean indexing (the D2H link is the measured bottleneck on a
    tunneled chip).
    """
    compute_dtype = jnp.bfloat16 if config.get("compute_dtype") == "bfloat16" else jnp.float32
    if codes.ndim == 2:
        # Windowed base codes (B, K+k-1): rebuild the K overlapping k-mer
        # windows with k static slices (free under XLA) and mask k-mers
        # beyond the row's valid count to the all-'_' padding k-mer —
        # byte-identical to the host-side materialisation the reference
        # does (utils.py:334-356), at 1/6 the host->device bytes.
        k = int(config["seq_kmer"])
        K = codes.shape[1] - k + 1
        kmers = jnp.stack([codes[:, j : j + K] for j in range(k)], axis=-1)
        if n_kmers is not None:
            valid = (
                jnp.arange(K, dtype=jnp.int32)[None, :]
                < n_kmers.astype(jnp.int32)[:, None]
            )
            kmers = jnp.where(valid[..., None], kmers, 0)
        codes = kmers
    B, K, k = codes.shape
    T = config["max_signal_len"]
    n_chars = len(config["allowed_chars"])

    # One-hot on device: code n_chars (unknown base) maps to the all-zero row,
    # matching the reference host-side one_hot_encode (utils.py:56-89) which
    # leaves unmapped characters as zeros.
    one_hot = jax.nn.one_hot(codes, n_chars, dtype=compute_dtype)
    one_hot = one_hot.reshape(B, K, k * n_chars)

    enc_out, emb_out = encoder_forward(params, one_hot, config)

    # Heads run on the pre-PE embedding in float32 (softplus epilogues).
    emb32 = emb_out.astype(jnp.float32)
    noise_stdev = noise_head(params, emb32, config)  # (B, K)

    # Per-chunk keys from (read index, chunk offset): output is invariant to
    # batch size and to any read sharding across processes/chips.
    read_keys = per_chunk_keys(base_key, read_idx)
    chunk_keys = jax.vmap(jax.random.fold_in)(read_keys, chunk_off)
    dur_keys = jax.vmap(lambda c: jax.random.fold_in(c, 1))(chunk_keys)
    durations = _compute_durations(params, emb32, dur_keys, knobs, config)

    # One segment map serves the regulator AND the event wire packers.
    seg_parts = segment_map(durations, T)
    expanded, noise_ext = regulate_from_seg(
        enc_out, seg_parts[2], x_noise=noise_stdev[..., None]
    )

    dec = decoder_forward(params, expanded, config)[..., 0]  # (B, T)
    pred = dec.astype(jnp.float32) * knobs.scaling_max_value  # (B, T) pA

    if knobs.wire_bits == 2:
        # ULP event tier: the decoder output is exactly bfloat16-valued, so
        # within-event variation is almost always 0 or +-1 bf16 ULP. Ship
        # the raw bf16 BITS of each event's first frame plus 2-bit ULP
        # deltas; the host reconstructs the clean signal bit-exactly and
        # regenerates the noise (see _pack_event_wire_ulp).
        return _pack_event_wire_ulp(dec, seg_parts, noise_stdev, read_idx,
                                    knobs)
    if knobs.wire_bits == 4:
        # Event tier: ship the CLEAN signal's sufficient statistics (4-bit
        # within-event deltas + per-event levels/stdevs/boundaries); the
        # host regenerates the Gaussian amplitude noise from the same
        # per-chunk threefry keys. The noise is the incompressible part of
        # the sample stream - not shipping it at all beats any delta width.
        return _pack_event_wire(pred, seg_parts, noise_stdev, read_idx, knobs)

    if knobs.noise_std > 0:
        non_zero = pred != 0.0
        noise_keys = jax.vmap(lambda c: jax.random.fold_in(c, 2))(chunk_keys)
        gauss = sample_normal(noise_keys, (T,))
        if knobs.noise_sampling:
            std_ext = jnp.maximum(noise_ext[..., 0], knobs.min_noise)
            std = std_ext * knobs.noise_std * knobs.scaling_max_value
        else:
            std = knobs.noise_std
        pred = jnp.where(non_zero, pred + gauss * std, pred)
    pred = jnp.maximum(pred, 0.0)

    # Digitisation (signal_io.py:134-138): round(sig * dig / range - offset),
    # round-half-to-even, int16. Uses the profile *mean* offset, matching the
    # reference (the per-read sampled offset only lands in file metadata).
    # Saturate at the int16 edges instead of wrapping — the same contract as
    # the host decoders (wire.saturate_i16 / the C++ paths), so all three
    # produce identical samples even for out-of-range predictions.
    signal_raw = jnp.clip(
        jnp.round(
            pred * knobs.digitisation / knobs.signal_range - knobs.offset_mean
        ),
        -32768.0, 32767.0,
    ).astype(jnp.int16)

    keep = pred != 0.0
    # Padding rows (read_idx < 0) contribute nothing.
    keep = keep & (read_idx[:, None] >= 0)

    # Stable partition: kept samples first, original order preserved.
    drop_key = (~keep).astype(jnp.int8)
    _, signal_compact = jax.lax.sort(
        (drop_key, signal_raw), dimension=-1, is_stable=True, num_keys=1
    )
    counts = jnp.sum(keep, axis=1).astype(jnp.int32)
    if knobs.wire_bits == 16:
        return signal_compact, counts
    return _pack_wire(signal_compact, counts, knobs.wire_bits) + (counts,)


def _pack_event_wire(
    pred: jnp.ndarray,  # (B, T) f32 CLEAN signal in pA (no noise)
    seg_parts: tuple,  # (ends, starts_ext, seg, is_start) from segment_map
    noise_stdev: jnp.ndarray,  # (B, K) f32 per-k-mer stdev (model units)
    read_idx: jnp.ndarray,  # (B,) int32, -1 = padding row
    knobs: PredictKnobs,
):
    """Pack the clean signal as per-event statistics + 4-bit residual deltas.

    Wire contents per row (T=250, K=16: 229 B vs 330 at the 8-bit tier and
    504 raw):
      stream  (T/2,)  u8   two 4-bit biased within-event deltas per byte
      levels  (K+1,)  i16  digitised clean value at each event's first
                           frame (+1 tail segment past the last boundary)
      sigma_q (K,)    u8   per-event noise stdev, ADC counts in 1/4 units
      ends    (K,)    u8   capped cumulative event boundaries (needs T<256)
      exc_pos/exc_val/n_exc  as the other tiers (delta residuals)

    The host (runtime/wire.unpack_event_wire) rebuilds the clean signal
    exactly (levels + per-segment cumsum + exception residuals), then adds
    Gaussian noise drawn from the SAME fold_in(chunk_key, 2) threefry
    stream the device path uses, so output is deterministic and invariant
    to batch size/sharding. Values may differ from the raw tier by at most
    1 ADC count (the clean signal is quantised to integer counts BEFORE
    noise instead of after). Zero-stripping matches the raw tier except in
    the astronomically rare case of a noisy sample sitting exactly at the
    0-clamp boundary: the sigma quantisation (and, on the native path,
    ~1e-5 threefry float rounding) can then flip a keep/drop decision,
    changing that read's sample count by one. n_exc
    carries overflow flags (slot overflow, sigma > 63.75 counts, level
    outside int16) so the run downgrades to a bit-lossless tier instead of
    ever shipping a lossy batch.
    """
    B, T = pred.shape
    ends, starts_ext, seg, is_start = seg_parts
    K = ends.shape[1]
    assert T % 2 == 0 and T <= 255, "event tier needs even T < 256"
    cpr = knobs.digitisation / knobs.signal_range  # ADC counts per pA
    E = WIRE_EXC_SLOTS[4]

    # Digitised clean signal, no offset: integer counts, and the reference's
    # zero/non-zero export distinction (model.py:286) kept EXACT by flooring
    # non-zero predictions at 1 count.
    clean_q = jnp.where(
        pred > 0.0,
        jnp.maximum(jnp.round(pred * cpr), 1.0),
        0.0,
    ).astype(jnp.int32)
    clean_q = jnp.where(read_idx[:, None] >= 0, clean_q, 0)

    t = jnp.arange(T, dtype=jnp.int32)[None, :]  # (1, T)
    levels = jnp.take_along_axis(
        clean_q, jnp.minimum(starts_ext, T - 1), axis=1
    )  # (B, K+1)

    sigma_counts = (
        jnp.maximum(noise_stdev, knobs.min_noise)
        * knobs.noise_std * knobs.scaling_max_value * cpr
    )  # (B, K) ADC counts
    sigma_raw = jnp.round(sigma_counts * 4.0)
    sigma_q = jnp.clip(sigma_raw, 0, 255).astype(jnp.uint8)

    d = jnp.diff(clean_q, axis=1, prepend=jnp.zeros((B, 1), jnp.int32))
    d = jnp.where(is_start, 0, d)  # starts come from `levels`
    lo = jnp.clip(d, -8, 7)
    u = (lo + 8).astype(jnp.uint8)
    stream = (u[:, 0::2] | (u[:, 1::2] << 4)).astype(jnp.uint8)  # (B, T/2)

    resid = d - lo
    over = resid != 0
    resid_fits = (resid >= -32768) & (resid <= 32767)
    sort_key = (~over).astype(jnp.int8)
    pos_b = jnp.broadcast_to(t, (B, T))
    _, pos_sorted, resid_sorted = jax.lax.sort(
        (sort_key, pos_b, resid), dimension=-1, is_stable=True, num_keys=1
    )
    exc_pos = pos_sorted[:, :E].astype(jnp.uint8)
    exc_val = resid_sorted[:, :E].astype(jnp.int16)
    n_exc = jnp.sum(over, axis=1).astype(jnp.int32)
    row_bad = (
        jnp.any(~resid_fits, axis=1)
        | ((knobs.noise_std > 0) & knobs.noise_sampling
           & jnp.any(sigma_raw > 255, axis=1))
        | jnp.any(jnp.abs(levels) > 32767, axis=1)
    )
    n_exc = n_exc + jnp.where(row_bad, jnp.int32(1 << 20), jnp.int32(0))
    return (stream, levels.astype(jnp.int16), sigma_q,
            ends.astype(jnp.uint8), exc_pos, exc_val, n_exc)


def _flat_compact(flagged: jnp.ndarray, vals: jnp.ndarray, cap: int):
    """Front-compact vals[flagged] (row-major order) into a (cap,) int32
    buffer with zeros past the total, plus the total count.

    Bit-identical to scattering every element at its global flagged-rank,
    but avoids the (B*T)-update scatter (measured ~4 ms/batch at B=2048):
    a per-row lane sort front-packs each row, two B-update scatters +
    running maxes recover each flat slot's (owning row, offset), and one
    cap-sized gather assembles the buffer (~1 ms total).
    """
    B, T = flagged.shape
    key = (~flagged).astype(jnp.int8)
    _, vals_sorted = jax.lax.sort(
        (key, vals), dimension=-1, is_stable=True, num_keys=1
    )  # flagged values front-packed per row, original order kept
    n_row = jnp.sum(flagged, axis=1).astype(jnp.int32)  # (B,)
    prefix = jnp.cumsum(n_row) - n_row  # exclusive row offsets
    total = prefix[-1] + n_row[-1]
    # slot -> owning row and its start offset: contributing rows' prefixes
    # strictly increase, so mark each row's first slot and fill forward
    # with a running max (both rows and prefixes are non-decreasing).
    tgt = jnp.where(n_row > 0, prefix, cap)
    rows = jnp.arange(B, dtype=jnp.int32)
    row_of = jax.lax.cummax(
        jnp.zeros(cap, jnp.int32).at[tgt].max(rows, mode="drop")
    )
    start_of = jax.lax.cummax(
        jnp.zeros(cap, jnp.int32).at[tgt].max(prefix, mode="drop")
    )
    slot = jnp.arange(cap, dtype=jnp.int32)
    src = jnp.clip(row_of * T + (slot - start_of), 0, B * T - 1)
    flat = vals_sorted.reshape(-1)[src]
    return jnp.where(slot < total, flat, 0), total


def _pack_event_wire_ulp(
    dec: jnp.ndarray,  # (B, T) bfloat16 CLEAN decoder output (pre-scaling)
    seg_parts: tuple,  # (ends, starts_ext, seg, is_start) from segment_map
    noise_stdev: jnp.ndarray,  # (B, K) f32 per-k-mer stdev (model units)
    read_idx: jnp.ndarray,  # (B,) int32, -1 = padding row
    knobs: PredictKnobs,
):
    """Pack the clean signal as bf16 event levels + 2-bit ULP deltas.

    The decoder runs in bfloat16, so its output sits exactly on the bf16
    grid — and for non-negative bf16 values the raw bit pattern is a
    MONOTONIC uint16 ordinal (1 ULP = 1). Within an event the signal is
    near-constant, so consecutive-frame ordinal deltas are almost always
    in {0, +1, -1} (~97% with trained weights): a 2-bit symbol stream
    covers them, a 4-bit side channel takes |delta| <= 8 escapes
    (~3%/sample, ESC symbol marks them in order), and full (pos, val)
    exception slots catch the ~2e-6/sample remainder.

    Wire contents per row (T=250, K=16: 127 B vs 229 at the 4-bit event
    tier and 504 raw):
      stream   (ceil(T/4),) u8   four 2-bit symbols per byte (0 = +0,
                                 1 = +1 ULP, 2 = -1 ULP, 3 = escape)
      lvl0     ()           u16  raw bf16 bits of event 0's first frame
      lvl_d    (K,)         i8   event-level deltas in bf16-ordinal
                                 space vs the PREVIOUS NON-ZERO level
                                 (adjacent k-mer currents sit within
                                 ~half an octave, so they fit i8);
                                 -128 = this level is exactly 0,
                                 -127 = escape: the exact u16 sits in
                                 the batch-flat `lvl_esc` buffer
      sigma_q  (K,)         u8   per-event noise stdev, ADC counts in
                                 1/4 units (as the 4-bit tier)
      ends     (K,)         u8   capped cumulative event boundaries
      esc      (NIB/2,)     u8   slice of the BATCH-FLAT escape buffer:
                                 biased 4-bit deltas in global stream
                                 order; nibble value 8 (an impossible
                                 d=0 escape) marks a WIDE jump whose
                                 exact value sits in `wide`
      lvl_esc  ()           u16  slice of the batch-flat escaped-level
                                 buffer (one u16 slot per row)
      wide     ()           u8   slice of the batch-flat wide-jump i32
                                 buffer (B//4 slots = 1 byte per row,
                                 zero-padded to B bytes)
      flags    ()           u8   bit 0: sigma field / flat-buffer
                                 overflow (batch recomputes raw)

    The escape/wide/level-escape buffers are shared across the whole
    batch, so no PER-ROW budget exists at all — only batch totals are
    capped, with >40-sigma headroom at production batch sizes. Rows
    consume the flat buffers strictly in row-major stream order, so the
    per-row start offsets are DERIVED by the decoder (a serial walk
    anyway) instead of shipped; under device data-parallelism each
    shard's buffers restart at its first row. The host verifies the
    totals exactly and recomputes the batch raw on the (astronomically
    rare) overflow.

    Because the host (runtime/wire.EventWireDecoder) rebuilds the exact
    bf16 prediction, it replays the device's own digitisation chain
    (f32 cast -> x scaling -> noise -> clamp -> x dig / range - offset ->
    round): output is BIT-IDENTICAL to the raw tier for noise-free runs
    (and for noisy runs decoded with the SAME noise values), and within
    1 ADC count for sampled-noise runs (the per-event stdev is quantised
    to quarter counts; the native threefry fill's ~1e-5 float-rounding
    deviation can additionally flip a keep/drop decision for a sample
    sitting exactly at the 0-clamp boundary — see _pack_event_wire).
    """
    B, T = dec.shape
    ends, starts_ext, seg, is_start = seg_parts
    K = ends.shape[1]
    assert T <= 255, "ULP event tier needs ends to fit uint8 (T < 256)"
    assert B >= 4, "ULP event tier needs B >= 4 (one i32 wide slot)"
    assert dec.dtype == jnp.bfloat16, "ULP event tier needs bfloat16 compute"
    CAP_ESC = B * WIRE_ESC_NIB_PER_ROW  # batch-flat nibble capacity
    # Wide jumps hit ~1.8e-4 of ROWS (measured over 3.1M rows), so B//4
    # i32 slots per batch is still >50-sigma headroom at B=2048.
    CAP_WIDE = max(B // 4, 1)
    CAP_LVL = B  # escaped levels: ~0.1/row measured on the R9 demo

    # Monotonic ordinal: the decoder output is post-ReLU (>= +0.0), so the
    # raw bf16 bit pattern itself orders values; 1 ULP = 1 ordinal step.
    ord_ = jax.lax.bitcast_convert_type(dec, jnp.uint16).astype(jnp.int32)
    ord_ = jnp.where(read_idx[:, None] >= 0, ord_, 0)

    levels32 = jnp.take_along_axis(
        ord_, jnp.minimum(starts_ext, T - 1), axis=1
    )  # (B, K+1) raw bf16 bit ordinals, int32

    # Level wire: one u16 anchor + K i8 deltas vs the previous NON-ZERO
    # level (zeros are structural — empty/tail segments — and get their
    # own marker so the 0 <-> ~0x3F00 transitions never consume escapes).
    lvl_nz = levels32 != 0
    lvl_idx = jnp.where(
        lvl_nz, jnp.arange(K + 1, dtype=jnp.int32)[None, :], -1
    )
    last_nz = jax.lax.cummax(lvl_idx, axis=1)  # last nonzero index <= e
    prev_idx = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), last_nz[:, :-1]], axis=1
    )
    prev_nz = jnp.where(
        prev_idx >= 0,
        jnp.take_along_axis(levels32, jnp.maximum(prev_idx, 0), axis=1),
        0,
    )  # (B, K+1)
    lvl_delta = levels32 - prev_nz
    lvl_fits = (lvl_delta >= -126) & (lvl_delta <= 126)
    lvl_is_esc = lvl_nz & ~lvl_fits  # nonzero level, delta out of i8 range
    lvl_d = jnp.where(
        ~lvl_nz, -128, jnp.where(lvl_is_esc, -127, lvl_delta)
    )[:, 1:].astype(jnp.int8)  # (B, K); event 0 ships as the u16 anchor
    lvl0 = levels32[:, 0].astype(jnp.uint16)

    # Batch-flat escaped-level buffer, row-major rank order (decoder
    # derives per-row offsets by walking rows in order).
    lvl_flat, n_lvl_total = _flat_compact(
        lvl_is_esc[:, 1:], levels32[:, 1:], CAP_LVL
    )
    lvl_esc = lvl_flat.astype(jnp.uint16).reshape(B)  # one u16 slot per row

    cpr = knobs.digitisation / knobs.signal_range
    sigma_counts = (
        jnp.maximum(noise_stdev, knobs.min_noise)
        * knobs.noise_std * knobs.scaling_max_value * cpr
    )
    sigma_raw = jnp.round(sigma_counts * 4.0)
    sigma_q = jnp.clip(sigma_raw, 0, 255).astype(jnp.uint8)

    d = jnp.diff(ord_, axis=1, prepend=jnp.zeros((B, 1), jnp.int32))
    d = jnp.where(is_start, 0, d)  # starts come from `levels`

    # 2-bit symbols: 0 -> +0, 1 -> +1, 2 -> -1, 3 -> escape.
    sym = jnp.where(
        d == 0, 0, jnp.where(d == 1, 1, jnp.where(d == -1, 2, 3))
    ).astype(jnp.int32)
    pad = (-T) % 4
    symp = jnp.pad(sym, ((0, 0), (0, pad))) if pad else sym
    q = symp.reshape(B, -1, 4)
    stream = (
        q[..., 0] | (q[..., 1] << 2) | (q[..., 2] << 4) | (q[..., 3] << 6)
    ).astype(jnp.uint8)  # (B, ceil(T/4))

    # Batch-flat escape buffer: the j-th escape of the BATCH (row-major
    # stream order) owns nibble j; the decoder re-derives each row's start
    # by walking rows in order (no offsets on the wire).
    is_esc = sym == 3  # (B, T)
    is_wide = (d < -8) | (d > 7)
    nib_val = jnp.where(is_wide, 8, jnp.clip(d, -8, 7) + 8)
    nib_flat, n_esc_total = _flat_compact(is_esc, nib_val, CAP_ESC)
    esc = (
        nib_flat[0::2] | (nib_flat[1::2] << 4)
    ).astype(jnp.uint8).reshape(B, -1)  # (B, NIB/2) flat bytes

    # Batch-flat wide-jump values (exact i32 ordinal deltas), shipped as
    # CAP_WIDE i32 slots bitcast to bytes and zero-padded to one byte/row.
    wide, n_wide_total = _flat_compact(is_wide, d, CAP_WIDE)
    wide_b = jax.lax.bitcast_convert_type(wide, jnp.uint8).reshape(-1)
    wide_b = jnp.concatenate(
        [wide_b, jnp.zeros(B - wide_b.shape[0], jnp.uint8)]
    ).reshape(B)

    sigma_bad = (
        (knobs.noise_std > 0) & knobs.noise_sampling
        & jnp.any(sigma_raw > 255, axis=1)
    )
    # Batch-level overflow is flagged on EVERY row (the whole batch is
    # recomputed raw anyway; per-row attribution is meaningless).
    batch_bad = (
        (n_esc_total > CAP_ESC) | (n_wide_total > CAP_WIDE)
        | (n_lvl_total > CAP_LVL)
    )
    flags = (sigma_bad | batch_bad).astype(jnp.uint8)
    return (stream, lvl0, lvl_d, sigma_q, ends.astype(jnp.uint8), esc,
            lvl_esc, wide_b, flags)


def _pack_wire(signal_compact: jnp.ndarray, counts: jnp.ndarray, bits: int):
    """Pack (B, T) int16 front-compacted signal into narrow first-differences
    plus sparse exact exceptions.

    bits=8:  delta stream is (B, T) int8 (clip +-127).
    bits=12: delta stream is (B, T*3/2) uint8 — deltas biased by 2048 into
             12-bit fields, two values per three bytes (clip +-2047..2048).

    Returns (stream, exc_pos (B,E) uint8, exc_val (B,E) int16, n_exc (B,)
    int32). Decode: runtime/wire.py unpack_wire. n_exc lets the host verify
    no row overflowed the exception slots (lossless guarantee); it is
    per-row so every output shards cleanly over the 'dp' mesh axis.
    Residuals outside int16 (only possible for near-full-range sample
    jumps) are folded into n_exc as an overflow so the host recomputes that
    batch raw — packing stays lossless by construction.
    """
    B, T = signal_compact.shape
    pos = jnp.arange(T, dtype=jnp.int32)[None, :]
    s = jnp.where(pos < counts[:, None], signal_compact.astype(jnp.int32), 0)
    d = jnp.diff(s, axis=1, prepend=jnp.zeros((B, 1), jnp.int32))
    d = jnp.where(pos < counts[:, None], d, 0)

    if bits == 8:
        lo = jnp.clip(d, -127, 127)
        stream = lo.astype(jnp.int8)
    elif bits == 12:
        assert T % 2 == 0, "12-bit packing needs an even frame budget"
        lo = jnp.clip(d, -2048, 2047)
        u = (lo + 2048).astype(jnp.uint32)  # 12-bit biased fields
        u0 = u[:, 0::2]
        u1 = u[:, 1::2]
        b0 = u0 & 0xFF
        b1 = (u0 >> 8) | ((u1 & 0xF) << 4)
        b2 = u1 >> 4
        stream = jnp.stack([b0, b1, b2], axis=-1).reshape(B, (T // 2) * 3)
        stream = stream.astype(jnp.uint8)
    else:
        raise ValueError(f"unsupported wire_bits {bits}")
    resid = d - lo  # exact correction, 0 for in-range deltas
    over = resid != 0
    resid_fits = (resid >= -32768) & (resid <= 32767)

    # Front-pack (position, residual) of the exceptions via stable sort.
    sort_key = (~over).astype(jnp.int8)
    _, pos_sorted, resid_sorted = jax.lax.sort(
        (sort_key, jnp.broadcast_to(pos, (B, T)), resid),
        dimension=-1, is_stable=True, num_keys=1,
    )
    E = WIRE_EXC_SLOTS[bits]
    exc_pos = pos_sorted[:, :E].astype(jnp.uint8)
    # int16 wire width; rows whose residuals don't fit are flagged below.
    exc_val = resid_sorted[:, :E].astype(jnp.int16)
    n_exc = jnp.sum(over, axis=1).astype(jnp.int32)
    row_bad = jnp.any(~resid_fits, axis=1)
    n_exc = n_exc + jnp.where(row_bad, jnp.int32(1 << 20), jnp.int32(0))
    return stream, exc_pos, exc_val, n_exc


def wire_layout(bits: int, T: int, K: int):
    """Per-row field layout of the single-buffer wire framing.

    Shared by the device framer (_frame_outputs) and the host splitter
    (runtime/wire.unframe_wire). Each entry is (name, numpy dtype, count).
    """
    import numpy as np

    if bits == 2:
        return [("stream", np.uint8, (T + 3) // 4),
                ("lvl0", np.uint16, 1), ("lvl_d", np.int8, K),
                ("sigma_q", np.uint8, K), ("ends", np.uint8, K),
                ("esc", np.uint8, WIRE_ESC_NIB_PER_ROW // 2),
                ("lvl_esc", np.uint16, 1), ("wide", np.uint8, 1),
                ("flags", np.uint8, 1)]
    if bits == 4:
        E = WIRE_EXC_SLOTS[4]
        return [("stream", np.uint8, T // 2), ("levels", np.int16, K + 1),
                ("sigma_q", np.uint8, K), ("ends", np.uint8, K),
                ("exc_pos", np.uint8, E), ("exc_val", np.int16, E),
                ("n_exc", np.int32, 1)]
    if bits in (8, 12):
        E = WIRE_EXC_SLOTS[bits]
        W = T if bits == 8 else (T // 2) * 3
        return [("stream", np.int8 if bits == 8 else np.uint8, W),
                ("exc_pos", np.uint8, E), ("exc_val", np.int16, E),
                ("n_exc", np.int32, 1), ("counts", np.int32, 1)]
    return [("signal", np.int16, T), ("counts", np.int32, 1)]


def _frame_outputs(outs: tuple) -> jnp.ndarray:
    """Concatenate a tier's output arrays into one (B, ROW_BYTES) uint8
    buffer (little-endian field bytes).

    The axon-tunneled chip costs a full round trip PER FETCHED ARRAY
    (~45 ms measured) regardless of size; shipping each batch as a single
    buffer turns 2-7 round trips into one. Layout: wire_layout().
    """
    parts = []
    for o in outs:
        B = o.shape[0]
        if o.ndim == 1:
            o = o[:, None]
        # single-byte dtypes keep their shape; wider ones grow a trailing
        # itemsize axis (little-endian byte order, asserted by tests)
        b = jax.lax.bitcast_convert_type(o, jnp.uint8)
        parts.append(b.reshape(B, -1))
    return jnp.concatenate(parts, axis=1)


def make_predict_fn(config: dict, knobs: PredictKnobs, framed: bool = False):
    """Build the jitted predict function for a fixed config + knob set.

    framed=True wraps the tier's outputs into the single-buffer wire
    framing (one D2H fetch per batch); decode with runtime/wire.unframe_wire.
    """
    step = functools.partial(predict_step, config=dict(config), knobs=knobs)
    if not framed:
        return jax.jit(step)

    def framed_step(params, codes, read_idx, chunk_off, base_key,
                    n_kmers=None):
        return _frame_outputs(
            step(params, codes, read_idx, chunk_off, base_key, n_kmers)
        )

    return jax.jit(framed_step)


def make_predict_fn_sharded(config: dict, knobs: PredictKnobs, mesh,
                            framed: bool = False):
    """Data-parallel predict over a 1-D 'dp' mesh via shard_map.

    Reads are embarrassingly parallel: params replicate, the chunk batch
    splits over chips, and the per-chunk (read-index-derived) RNG keys make
    the sharded output bit-identical to single-chip execution. ZERO
    cross-chip collectives in the loop (BASELINE north star).
    """
    from jax.sharding import PartitionSpec as P

    step = functools.partial(predict_step, config=dict(config), knobs=knobs)
    if framed:
        def fstep(params, codes, read_idx, chunk_off, base_key, n_kmers):
            return _frame_outputs(
                step(params, codes, read_idx, chunk_off, base_key, n_kmers)
            )

        sharded = jax.shard_map(
            fstep,
            mesh=mesh,
            in_specs=(P(), P("dp"), P("dp"), P("dp"), P(), P("dp")),
            out_specs=P("dp"),
            check_vma=False,
        )
        return jax.jit(sharded)
    n_out = {2: 9, 4: 7, 8: 5, 12: 5, 16: 2}[knobs.wire_bits]
    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P("dp"), P("dp"), P("dp"), P()),
        out_specs=tuple(P("dp") for _ in range(n_out)),
        check_vma=False,
    )
    return jax.jit(sharded)
