"""Read generation: read mode (1:1 / resampled) and reference mode
(genome sampling with empirical length distributions).

Behavioral parity with the reference read path (src/seq2squiggle/utils.py:
290-671): identical length distributions (expon/beta/gamma with the same
hard-coded fit parameters and per-read seeds), the same QC rules (exact
length for DNA, min read length, <=10% N), N->random-base replacement,
random strand with reverse complement (RNA always +), and <=20 retries per
read. Genome sanitisation and base replacement are vectorised with
bytes.translate / numpy instead of per-character python loops.
"""

from __future__ import annotations

import logging
import random
from typing import Generator, List, Tuple
from uuid import uuid4

import numpy as np
import scipy.stats as st

from .fasta import read_fastx

logger = logging.getLogger("seq2squiggle_tpu")

_COMPLEMENT = bytes.maketrans(b"ACGT", b"TGCA")


def _build_sanitise_table() -> bytes:
    """Uppercase; anything outside ACGT becomes N."""
    table = bytearray(b"N" * 256)
    for b in b"ACGT":
        table[b] = b
    for lower, upper in zip(b"acgt", b"ACGT"):
        table[lower] = upper
    return bytes(table)


_SANITISE = _build_sanitise_table()


def reverse_complement(seq: str) -> str:
    return seq.encode("ascii").translate(_COMPLEMENT)[::-1].decode("ascii")


def sanitise_genome(seq: str) -> str:
    """Uppercase; non-ACGT -> N (reference: utils.py:593-596)."""
    return seq.encode("ascii").translate(_SANITISE).decode("ascii")


def n_to_random_bases(read: str) -> str:
    """Replace N with random ACGT (reference: utils.py:401-402), vectorised.

    Draws ride random.randbytes (one call on the seeded global Mersenne
    stream, 2 bits per N) instead of a per-N python randrange loop — a
    read straddling a multi-kb assembly gap used to cost thousands of
    python iterations. Same uniform marginal per N; deterministic under
    the same seed (the stream consumption differs from the old loop)."""
    arr = np.frombuffer(read.encode("ascii"), np.uint8).copy()
    n_mask = arr == ord("N")
    count = int(n_mask.sum())
    if count:
        choices = np.frombuffer(b"ACGT", np.uint8)
        draws = np.frombuffer(random.randbytes(count), np.uint8) & 3
        arr[n_mask] = choices[draws]
    return arr.tobytes().decode("ascii")


# Empirical read-length distributions (reference: utils.py:311-331).


def draw_gamma_dis(mean, seed, total_len):
    sample = st.gamma.rvs(6.3693711, 0.53834893, size=1, random_state=seed)
    sample = int(sample * mean / 4.39)
    return int(np.clip(sample, 1, total_len))


def draw_beta_dis(mean, seed, total_len):
    sample = st.beta.rvs(1.778, 7.892, 316.758, 34191.257, size=1, random_state=seed)
    sample = (sample[0] * mean / 6615.0).astype(int)
    return int(np.clip(sample, 1, total_len))


def draw_expon_dis(mean, seed, total_len):
    sample = st.expon.rvs(
        loc=213.98910256668592, scale=6972.5319847131141, size=1, random_state=seed
    )
    sample = (sample[0] * mean / 7106.0).astype(int)
    return int(np.clip(sample, 1, total_len))


_DISTR_FUNCS = {"beta": draw_beta_dis, "gamma": draw_gamma_dis, "expon": draw_expon_dis}


def draw_lengths_batch(distr: str, mean: int, total_len: int, size: int,
                       random_state) -> np.ndarray:
    """Vectorised batch version of the draw_* functions above: one scipy rvs
    call for `size` reads instead of one RandomState per read (the per-read
    path costs ~0.5 ms/read, a real bottleneck at 10k+ reads)."""
    if distr == "gamma":
        s = st.gamma.rvs(6.3693711, 0.53834893, size=size,
                         random_state=random_state)
        lengths = (s * mean / 4.39).astype(np.int64)
    elif distr == "beta":
        s = st.beta.rvs(1.778, 7.892, 316.758, 34191.257, size=size,
                        random_state=random_state)
        lengths = (s * mean / 6615.0).astype(np.int64)
    elif distr == "expon":
        s = st.expon.rvs(loc=213.98910256668592, scale=6972.5319847131141,
                         size=size, random_state=random_state)
        lengths = (s * mean / 7106.0).astype(np.int64)
    else:
        raise KeyError(distr)
    return np.clip(lengths, 1, total_len)


def read_check(read: str, read_length: int, read_i: int, profile: str,
               min_read_len: int = 30) -> bool:
    """QC for a sampled read (reference: utils.py:381-398)."""
    if profile.startswith("dna") and len(read) != read_length:
        logger.debug(
            f"Sampled read length ({len(read)}) of read {read_i} differs from "
            f"requested length ({read_length})."
        )
        return False
    if len(read) < min_read_len:
        logger.debug(
            f"Sampled read length ({len(read)}) of read {read_i} is below the "
            f"minimum read length ({min_read_len})."
        )
        return False
    if read.count("N") > 0.1 * read_length:
        logger.debug(f"Too many 'N' bases for read {read_i}")
        return False
    return True


def _get_genome_and_position(genome_lens: List[int], random_position: int):
    cumulative = 0
    for i, length in enumerate(genome_lens):
        cumulative += length
        if random_position < cumulative:
            return i, random_position - (cumulative - length)
    raise ValueError("Random position exceeds the total length of genomes")


def sample_reads_from_reference(
    genome_seqs: List[str],
    genome_lens: List[int],
    n: int,
    r: int,
    c: int,
    config: dict,
    seed: int,
    distr: str = "expon",
    profile: str = "dna-r10-min",
    min_read_len: int = 30,
    max_retries: int = 20,
) -> Tuple[List[str], int]:
    """Sample reads from a (multi-contig) reference genome.

    Returns (reads, total_chunks) where total_chunks is the effective chunk
    count used for progress accounting (reference: utils.py:573).
    """
    if n <= 0 and c <= 0:
        raise ValueError("You need to specify the coverage c or the number of reads n")
    if n != -1 and c != -1:
        raise ValueError(
            "You can only either specify the coverage c or the number of reads, "
            "but not both"
        )

    total_len = sum(len(s) for s in genome_seqs)
    avg_genome_len = total_len / len(genome_seqs)
    if r <= 0:
        # Whole-contig mode (-r 0/-1): each read is one full contig/
        # transcript. (The reference documents this but its r<=0 guard makes
        # the path unreachable, seq2squiggle.py:427 vs utils.py:554-556.)
        if c != -1:
            raise ValueError(
                "Whole-contig mode (-r <= 0) requires -n, not coverage."
            )
        seq_num = n
    else:
        seq_num = n if n != -1 else round(c * total_len / r)
    logger.debug(f"Number of reads: {seq_num}")

    if r > avg_genome_len and profile.startswith("dna"):
        logger.warning(
            f"Average reference sequence length ({avg_genome_len:.2f}) is smaller "
            f"than the desired average read length ({r}). Reads longer than the "
            "reference sequence will be skipped; consider reducing -r."
        )

    total_genome_len = sum(genome_lens)
    cum_lens = np.cumsum(np.asarray(genome_lens, np.int64))
    is_dna = profile.startswith("dna")

    # Vectorised sampling with per-round retries: draw positions, lengths,
    # and strands for all outstanding reads in one shot, QC, re-draw the
    # failures (same distributions and QC as the reference's per-read loop,
    # utils.py:415-479, in O(rounds) numpy passes instead of O(reads)).
    out: dict = {}
    remaining = np.arange(seq_num)
    for attempt in range(max_retries):
        m = len(remaining)
        if m == 0:
            break
        round_rng = np.random.RandomState(
            np.random.SeedSequence([seed & 0x7FFFFFFF, attempt]).generate_state(1)[0]
        )
        start_pos = round_rng.randint(0, total_genome_len, size=m)
        genome_idx = np.searchsorted(cum_lens, start_pos, side="right")
        start_in_genome = start_pos - np.where(
            genome_idx > 0, cum_lens[genome_idx - 1], 0
        )
        if r > 0:
            lengths = draw_lengths_batch(distr, r, total_len, m, round_rng)
        else:
            # whole-contig mode: full contig from position 0
            start_in_genome = np.zeros(m, np.int64)
            lengths = np.asarray(
                [len(genome_seqs[g]) for g in genome_idx], np.int64
            )
        strands = (
            round_rng.choice(np.array(["+", "-"]), size=m) if is_dna
            else np.full(m, "+")
        )
        failures = []
        for j, read_i in enumerate(remaining):
            genome = genome_seqs[genome_idx[j]]
            a = int(start_in_genome[j])
            read = genome[a : a + int(lengths[j])]
            if read_check(read, int(lengths[j]), int(read_i), profile,
                          min_read_len):
                if "N" in read:
                    read = n_to_random_bases(read)
                if strands[j] == "-":
                    read = reverse_complement(read)
                out[int(read_i)] = read
            else:
                failures.append(read_i)
        remaining = np.asarray(failures, np.int64)
    for read_i in remaining:
        logger.debug(
            f"Failed to sample a valid read after {max_retries} retries for "
            f"read {read_i}. Skipping this read."
        )
    sampled_reads: List[str] = [out[i] for i in sorted(out)]

    total_chunks = sum(
        round(len(read) / config["max_dna_len"]) for read in sampled_reads
    )
    return sampled_reads, total_chunks


def get_reads(
    fasta: str,
    read_input: bool,
    n: int,
    r: int,
    c: int,
    config: dict,
    distr: str,
    seed: int,
    profile: str,
    min_read_len: int,
) -> Tuple[Generator[Tuple[str, str], None, None], int]:
    """Produce the (sequence, read_id) stream and an effective-length estimate.

    Read mode (reference: utils.py:645-665): 1:1 over the FASTA/Q, or with
    -n > 0, seeded sampling with replacement and fresh UUIDs.
    Reference mode: genome sanitisation + read sampling as above.
    """
    logger.info(f"{'Read' if read_input else 'Reference'} mode.")

    if read_input:
        if n <= 0:
            total_chunks = sum(
                round(len(seq) / config["max_dna_len"])
                for seq, _ in read_fastx(fasta)
            )
            return read_fastx(fasta), total_chunks

        all_reads = list(read_fastx(fasta))
        rng = random.Random(seed)
        sampled = [rng.choice(all_reads) for _ in range(n)]

        def generator():
            for seq, _ in sampled:
                yield seq, str(uuid4())

        effective = sum(
            round(len(seq) / config["max_dna_len"]) for seq, _ in sampled
        )
        return generator(), effective

    # Reference mode: sanitisation (uppercase, non-ACGT -> N; reference
    # utils.py:593-596) fuses into the parser's newline-strip translate
    # pass — one pass over the genome, no second full-genome copy.
    from .fasta import read_fasta_translated

    genome_seqs = [seq for seq, _ in read_fasta_translated(fasta, _SANITISE)]
    genome_lens = [len(s) for s in genome_seqs]
    reads, total_chunks = sample_reads_from_reference(
        genome_seqs, genome_lens, n, r, c, config, seed, distr, profile,
        min_read_len,
    )

    def gen():
        for read in reads:
            yield read, str(uuid4())

    return gen(), total_chunks
