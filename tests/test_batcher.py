"""Host chunking/batching semantics vs the reference algorithm."""

import numpy as np

from seq2squiggle_tpu.runtime.batcher import (
    expand_windows,
    iter_batches,
    read_chunk_codes,
    read_chunk_windows,
    seq_to_codes,
)


def _reference_kmer_chunks(seq, k, max_dna_len):
    """Direct transcription of the reference algorithm semantics
    (extract_kmers -> add_remainder -> chunk split, utils.py:334-356)
    as a python oracle."""
    kmers = [seq[i : i + k] for i in range(len(seq) - k + 1)]
    if not kmers:
        return None
    remain = max_dna_len - (len(kmers) % max_dna_len)
    if remain % max_dna_len > 0:
        kmers += ["_" * k] * remain
    table = {"_": 0, "A": 1, "C": 2, "G": 3, "T": 4}
    codes = [[table.get(ch, 5) for ch in km] for km in kmers]
    arr = np.array(codes, np.uint8)
    return arr.reshape(-1, max_dna_len, k)


def test_seq_to_codes():
    np.testing.assert_array_equal(
        seq_to_codes("_ACGTNacgtX"),
        np.array([0, 1, 2, 3, 4, 5, 5, 5, 5, 5, 5], np.uint8),
    )


def test_read_chunk_codes_matches_reference():
    rng = np.random.default_rng(0)
    for length in (8, 9, 10, 24, 25, 100, 314):
        seq = "".join(rng.choice(list("ACGT"), length))
        ours = read_chunk_codes(seq, 9, 16)
        oracle = _reference_kmer_chunks(seq, 9, 16)
        if oracle is None:
            assert ours is None
        else:
            np.testing.assert_array_equal(ours, oracle)


def test_short_read_skipped():
    assert read_chunk_codes("ACGT", 9, 16) is None


def test_iter_batches_segments_and_padding():
    reads = [("A" * 100, "r1"), ("C" * 40, "r2"), ("G" * 300, "r3")]
    batches = list(iter_batches(iter(reads), batch_size=8, seq_kmer=9,
                                max_dna_len=16))
    # chunk counts: r1: ceil(92/16)=6, r2: ceil(32/16)=2, r3: ceil(292/16)=19
    total_chunks = sum(b.n_valid for b in batches)
    assert total_chunks == 6 + 2 + 19
    # (read index, chunk offset) pairs cover each read consecutively
    all_ridx = np.concatenate([b.read_idx[: b.n_valid] for b in batches])
    all_coff = np.concatenate([b.chunk_off[: b.n_valid] for b in batches])
    np.testing.assert_array_equal(
        all_ridx, np.concatenate([np.full(6, 0), np.full(2, 1), np.full(19, 2)])
    )
    np.testing.assert_array_equal(
        all_coff, np.concatenate([np.arange(6), np.arange(2), np.arange(19)])
    )
    # padding rows are -1
    last = batches[-1]
    assert np.all(last.read_idx[last.n_valid :] == -1)
    # segments: per-read row counts sum correctly and read_done fires once
    per_read = {}
    done_count = {}
    for b in batches:
        for seg in b.segments:
            per_read[seg.read_id] = per_read.get(seg.read_id, 0) + seg.n_rows
            if seg.read_done:
                done_count[seg.read_id] = done_count.get(seg.read_id, 0) + 1
    assert per_read == {"r1": 6, "r2": 2, "r3": 19}
    assert done_count == {"r1": 1, "r2": 1, "r3": 1}


def test_batch_content_matches_per_read_chunks():
    """Base windows + n_kmers expand to exactly the reference's materialised
    k-mer chunks (incl. the all-'_' padding k-mers of each final chunk)."""
    reads = [("ACGTACGTACGTACGTACGTACGT", "r1"), ("T" * 50, "r2"),
             ("ACGTN" * 37, "r3")]
    batches = list(iter_batches(iter(reads), batch_size=4, seq_kmer=9,
                                max_dna_len=16))
    rows = np.concatenate([
        expand_windows(b.codes, b.n_kmers, 9)[: b.n_valid] for b in batches
    ])
    expected = np.concatenate(
        [read_chunk_codes(seq, 9, 16) for seq, _ in reads]
    )
    np.testing.assert_array_equal(rows, expected)


def test_read_chunk_windows_match_codes():
    rng = np.random.default_rng(3)
    for k, length in ((9, 16), (9, 24), (9, 100), (6, 313), (9, 8), (6, 5)):
        seq = "".join(rng.choice(list("ACGTN"), length))
        codes = read_chunk_codes(seq, k, 16)
        windowed = read_chunk_windows(seq, k, 16)
        if codes is None:
            assert windowed is None
            continue
        windows, n_valid = windowed
        np.testing.assert_array_equal(
            expand_windows(windows, n_valid, k), codes
        )
