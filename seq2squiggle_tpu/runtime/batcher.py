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


@dataclasses.dataclass
class Segment:
    """A read's contiguous slice of one batch."""

    read_id: str
    start_row: int
    n_rows: int
    read_done: bool  # True iff this is the read's final slice


@dataclasses.dataclass
class Batch:
    codes: np.ndarray  # (B, max_dna_len, seq_kmer) uint8
    read_idx: np.ndarray  # (B,) int32 global read index; -1 for padding rows
    chunk_off: np.ndarray  # (B,) int32 chunk offset within its read
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
    buf = np.zeros((batch_size, max_dna_len, seq_kmer), np.uint8)
    ridx = np.full(batch_size, -1, np.int32)
    coff = np.zeros(batch_size, np.int32)
    segments: List[Segment] = []
    fill = 0
    read_counter = read_idx_start

    def flush():
        nonlocal buf, ridx, coff, segments, fill
        batch = Batch(buf.copy(), ridx.copy(), coff.copy(), segments, fill)
        buf = np.zeros((batch_size, max_dna_len, seq_kmer), np.uint8)
        ridx = np.full(batch_size, -1, np.int32)
        coff = np.zeros(batch_size, np.int32)
        segments = []
        fill = 0
        return batch

    for seq, read_id in reads:
        chunks = read_chunk_codes(seq, seq_kmer, max_dna_len)
        if chunks is None:
            read_counter += read_idx_step
            continue
        pos = 0
        n = len(chunks)
        while pos < n:
            space = batch_size - fill
            take = min(space, n - pos)
            buf[fill : fill + take] = chunks[pos : pos + take]
            ridx[fill : fill + take] = read_counter
            coff[fill : fill + take] = np.arange(pos, pos + take, dtype=np.int32)
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
