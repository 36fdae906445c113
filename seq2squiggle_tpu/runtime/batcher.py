"""Host-side chunk encoding and batching.

The reference one-hot encodes k-mers in a per-character Python loop
(src/seq2squiggle/utils.py:56-89) and splits reads via ThreadPool
(dataloader.py:401-453) — a measured CPU bottleneck. Here a read becomes
int8 base codes via one table lookup, k-mers via a zero-copy sliding-window
view, and chunks via reshape; one-hot happens on the TPU. Every chunk has
the same static shape, so batches are flat (B, 16, k) blocks regardless of
read lengths — no bucketing, no recompilation, and data-parallel sharding
needs no load balancing beyond round-robin.

Code mapping matches the reference "_ACGT" vocabulary: '_'=0 (padding
k-mer), A=1, C=2, G=3, T=4; anything else (N, lowercase, ...) maps to 5,
which one-hots to the all-zero row exactly like the reference's dict-miss.
"""

from __future__ import annotations

import dataclasses
from typing import Generator, Iterable, List, Optional, Tuple

import numpy as np

_CODE_LUT = np.full(256, 5, np.uint8)
for i, ch in enumerate("_ACGT"):
    _CODE_LUT[ord(ch)] = i


def seq_to_codes(seq: str) -> np.ndarray:
    """ASCII sequence -> int8 base codes."""
    raw = np.frombuffer(seq.encode("ascii"), np.uint8)
    return _CODE_LUT[raw]


def read_chunk_codes(seq: str, seq_kmer: int, max_dna_len: int) -> Optional[np.ndarray]:
    """Split one read into (n_chunks, max_dna_len, seq_kmer) k-mer code blocks.

    Mirrors extract_kmers + add_remainder + split_sequence
    (reference: utils.py:334-356): overlapping k-mers, padded with the
    all-'_' k-mer to a multiple of max_dna_len. Returns None for reads
    shorter than seq_kmer (the reference skips those).
    """
    codes = seq_to_codes(seq)
    n_kmers = len(codes) - seq_kmer + 1
    if n_kmers <= 0:
        return None
    kmers = np.lib.stride_tricks.sliding_window_view(codes, seq_kmer)
    remain = (-n_kmers) % max_dna_len
    if remain:
        padded = np.zeros((n_kmers + remain, seq_kmer), np.uint8)
        padded[:n_kmers] = kmers
        kmers = padded
    else:
        kmers = np.ascontiguousarray(kmers)
    return kmers.reshape(-1, max_dna_len, seq_kmer)


def read_chunk_windows(
    seq: str, seq_kmer: int, max_dna_len: int
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Split one read into base-code windows: (n_chunks, L+k-1) uint8 plus
    per-chunk valid-k-mer counts (n_chunks,) uint8.

    Same chunk semantics as read_chunk_codes, but each chunk carries its
    L+k-1 underlying bases instead of L materialised k-mers — 6x fewer
    bytes over the measured host->device bottleneck (k=9: 24 B vs 144 B
    per chunk row). The device rebuilds the k-mer windows with k static
    slices and masks k-mers >= n_valid to the all-'_' padding k-mer
    (runtime/predict.predict_step), reproducing the reference's
    pad-to-multiple-of-16 semantics (utils.py:334-356) exactly.
    """
    codes = seq_to_codes(seq)
    n_kmers = len(codes) - seq_kmer + 1
    if n_kmers <= 0:
        return None
    L, W = max_dna_len, max_dna_len + seq_kmer - 1
    n_chunks = -(-n_kmers // L)
    padded = np.zeros(n_chunks * L + seq_kmer - 1, np.uint8)
    padded[: len(codes)] = codes
    windows = padded[
        np.arange(n_chunks, dtype=np.int64)[:, None] * L
        + np.arange(W, dtype=np.int64)[None, :]
    ]
    n_valid = np.minimum(
        L, n_kmers - np.arange(n_chunks, dtype=np.int64) * L
    ).astype(np.uint8)
    return windows, n_valid


def expand_windows(
    windows: np.ndarray, n_kmers: np.ndarray, seq_kmer: int
) -> np.ndarray:
    """Host-side oracle for the device-side window->k-mer expansion:
    (B, L+k-1) base windows + valid counts -> (B, L, k) k-mer codes."""
    B, W = windows.shape
    K = W - seq_kmer + 1
    kmers = np.stack([windows[:, j : j + K] for j in range(seq_kmer)], axis=-1)
    valid = np.arange(K)[None, :] < n_kmers[:, None]
    return np.where(valid[..., None], kmers, 0).astype(np.uint8)


@dataclasses.dataclass
class Segment:
    """A read's contiguous slice of one batch."""

    read_id: str
    start_row: int
    n_rows: int
    read_done: bool  # True iff this is the read's final slice


@dataclasses.dataclass
class Batch:
    codes: np.ndarray  # (B, max_dna_len + k - 1) uint8 base-code windows
    read_idx: np.ndarray  # (B,) int32 global read index; -1 for padding rows
    chunk_off: np.ndarray  # (B,) int32 chunk offset within its read
    n_kmers: np.ndarray  # (B,) uint8 valid k-mers per row (rest pad to '_'*k)
    segments: List[Segment]
    n_valid: int


def iter_batches(
    reads: Iterable[Tuple[str, str]],
    batch_size: int,
    seq_kmer: int,
    max_dna_len: int,
    read_idx_start: int = 0,
    read_idx_step: int = 1,
) -> Generator[Batch, None, None]:
    """Pack a (sequence, read_id) stream into fixed-size chunk batches.

    Reads are split across batch boundaries when needed; per-batch Segment
    records let the exporter reassemble reads without inspecting chunk data.
    Each row carries its (global read index, chunk offset within the read),
    which drive the per-chunk RNG keys — simulated output is therefore
    invariant to batch size AND to how reads are sharded across processes
    or chips (a shard only needs its reads' global indices, supplied via
    read_idx_start/read_idx_step for round-robin sharding).
    """
    W = max_dna_len + seq_kmer - 1
    buf = np.zeros((batch_size, W), np.uint8)
    ridx = np.full(batch_size, -1, np.int32)
    coff = np.zeros(batch_size, np.int32)
    nval = np.zeros(batch_size, np.uint8)
    segments: List[Segment] = []
    fill = 0
    read_counter = read_idx_start

    def flush():
        nonlocal buf, ridx, coff, nval, segments, fill
        batch = Batch(
            buf.copy(), ridx.copy(), coff.copy(), nval.copy(), segments, fill
        )
        buf = np.zeros((batch_size, W), np.uint8)
        ridx = np.full(batch_size, -1, np.int32)
        coff = np.zeros(batch_size, np.int32)
        nval = np.zeros(batch_size, np.uint8)
        segments = []
        fill = 0
        return batch

    for seq, read_id in reads:
        chunked = read_chunk_windows(seq, seq_kmer, max_dna_len)
        if chunked is None:
            read_counter += read_idx_step
            continue
        chunks, chunk_nval = chunked
        pos = 0
        n = len(chunks)
        while pos < n:
            space = batch_size - fill
            take = min(space, n - pos)
            buf[fill : fill + take] = chunks[pos : pos + take]
            ridx[fill : fill + take] = read_counter
            coff[fill : fill + take] = np.arange(pos, pos + take, dtype=np.int32)
            nval[fill : fill + take] = chunk_nval[pos : pos + take]
            segments.append(
                Segment(read_id, fill, take, read_done=(pos + take == n))
            )
            fill += take
            pos += take
            if fill == batch_size:
                yield flush()
        read_counter += read_idx_step
    if fill > 0:
        yield flush()
