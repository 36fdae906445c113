"""Length regulation: expand per-k-mer frames into per-sample signal frames.

The reference builds a dense (B, K, T) alignment matrix via
cumsum -> padding-mask -> diff and applies it with bmm
(src/seq2squiggle/modules.py:344-392). We compute the same alignment
directly from cumulative durations with two vectorized comparisons and
contract it on the MXU — no mask/diff chain, no dynamic
`output_max_seq_len` (the reference pads/truncates to max_signal_len
anyway, so a static T keeps shapes fixed and avoids recompilation).

Semantics (bit-equivalent to the reference for integer durations):
  frame t copies k-mer j iff  cum[j-1] <= t < cum[j]   (cum[-1] := 0)
  frames with t >= cum[K-1] are all-zero (later stripped at export)
  durations whose cumulative sum exceeds T are truncated at T
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from .attention import matmul_precision


def alignment_matrix(durations: jnp.ndarray, max_signal_len: int) -> jnp.ndarray:
    """Build the one-hot k-mer->frame alignment.

    durations: (B, K) integer dwell counts.
    Returns M: (B, T, K) float32 with M[b, t, j] = 1 iff frame t belongs to
    k-mer j.
    """
    cum = jnp.cumsum(durations.astype(jnp.int32), axis=1)  # (B, K)
    t = jnp.arange(max_signal_len, dtype=jnp.int32)  # (T,)
    # below[b, t, j] = t < cum[b, j];   M = below[j] & ~below[j-1]
    below = t[None, :, None] < cum[:, None, :]  # (B, T, K)
    prev = jnp.concatenate(
        [jnp.zeros_like(below[..., :1]), below[..., :-1]], axis=-1
    )
    return (below & ~prev).astype(jnp.float32)


def segment_map(
    durations: jnp.ndarray, max_signal_len: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-frame segment bookkeeping shared by the regulator and the event
    wire packers (computing it once per predict step saves two redundant
    (B, K, T) reduction passes per batch).

    durations: (B, K) integer dwell counts.
    Returns (ends, starts_ext, seg, is_start):
      ends       (B, K)   int32 cumulative event boundaries, capped at T
      starts_ext (B, K+1) int32 start frame of each segment (+1 tail entry)
      seg        (B, T)   int32 segment id per frame in [0, K] (K = tail)
      is_start   (B, T)   bool, True on each segment's first frame
    """
    B, K = durations.shape
    ends = jnp.minimum(
        jnp.cumsum(durations.astype(jnp.int32), axis=1), max_signal_len
    )
    t = jnp.arange(max_signal_len, dtype=jnp.int32)[None, :]
    # seg(t) = #boundaries <= t: the index of the segment frame t falls in.
    seg = jnp.sum(t[:, None, :] >= ends[:, :, None], axis=1).astype(jnp.int32)
    starts_ext = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), ends], axis=1
    )
    # seg is non-decreasing in t, so a frame starts a segment exactly where
    # seg changes (zero-duration segments own no frame in either reading).
    # A shift-compare costs one VPU pass; the equivalent
    # take_along_axis(starts_ext, seg) gather measured ~4 ms/batch on TPU.
    is_start = jnp.concatenate(
        [
            jnp.ones((B, 1), bool),
            seg[:, 1:] != seg[:, :-1],
        ],
        axis=1,
    )
    return ends, starts_ext, seg, is_start


def regulate_from_seg(
    x: jnp.ndarray,
    seg: jnp.ndarray,
    x_noise: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """length_regulate given a precomputed segment map (see segment_map).

    Frames in the tail segment (seg == K) expand to zeros — the alignment
    one-hot `seg == j` is exactly the below/&~prev matrix length_regulate
    builds, so the einsum results are bit-identical.
    """
    K = x.shape[1]
    M = seg[:, :, None] == jnp.arange(K, dtype=jnp.int32)[None, None, :]
    out = jnp.einsum(
        "btk,bkd->btd",
        M.astype(x.dtype),
        x,
        preferred_element_type=jnp.float32,
        precision=matmul_precision(x.dtype),
    ).astype(x.dtype)
    out_noise = None
    if x_noise is not None:
        out_noise = jnp.einsum(
            "btk,bkd->btd",
            M.astype(jnp.float32),
            x_noise.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=matmul_precision(jnp.float32),
        )
    return out, out_noise


def length_regulate(
    x: jnp.ndarray,
    durations: jnp.ndarray,
    max_signal_len: int,
    x_noise: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
    """Expand (B, K, D) k-mer frames to (B, T, D) signal frames.

    durations: (B, K) integer dwell counts.
    x_noise: optional (B, K, C) per-k-mer noise stdevs expanded with the
        same alignment (reference: modules.py:379-380).
    Returns (expanded, expanded_noise, frame_valid) where frame_valid is a
    (B, T) bool mask of frames within the total duration.
    """
    M = alignment_matrix(durations, max_signal_len)  # (B, T, K) f32
    Mc = M.astype(x.dtype)
    out = jnp.einsum(
        "btk,bkd->btd",
        Mc,
        x,
        preferred_element_type=jnp.float32,
        precision=matmul_precision(x.dtype),
    )
    out = out.astype(x.dtype)
    out_noise = None
    if x_noise is not None:
        out_noise = jnp.einsum(
            "btk,bkd->btd",
            M,
            x_noise.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=matmul_precision(jnp.float32),
        )
    total = jnp.sum(durations.astype(jnp.int32), axis=1)  # (B,)
    frame_valid = (
        jnp.arange(max_signal_len, dtype=jnp.int32)[None, :] < total[:, None]
    )
    return out, out_noise, frame_valid
