"""Human-genome-scale reference-mode host path: sanitise + sampling cost.

VERDICT r3 next-#8: nothing measured the genome-sanitise / read-sampling
host stages beyond the 48 kb lambda reference. This script times every
host stage of reference mode on a synthetic multi-contig genome (default
100 Mb; --size-mb to scale up) with human-like dirt: lowercase
soft-masked runs and N gaps, so `sanitise_genome`'s translate path and
the N-fraction QC both do real work.

Pure host CPU — no TPU needed. Run from the repo root:

    python scripts/profiling/profile_genome_scale.py [--size-mb 100]

Prints one JSON line per stage and a summary line; paste the summary
into BASELINE.md. Reference equivalents: utils.py:587-638 (per-character
python sanitise loop under an mp.Pool) and utils.py:415-479 (per-read
sampling loop).
"""

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

CONTIG_MB = 25  # contigs of 25 Mb => human-chromosome order of magnitude


def build_genome(path: str, size_mb: int, seed: int = 0) -> None:
    """Synthetic FASTA: ACGT + ~30% soft-masked (lowercase) + ~0.5% N runs,
    wrapped at 60 columns — the layout tools emit for real genomes."""
    rng = np.random.default_rng(seed)
    n_contigs = max(1, size_mb // CONTIG_MB)
    per_contig = size_mb * 1_000_000 // n_contigs
    with open(path, "wb") as fh:
        for ci in range(n_contigs):
            bases = rng.choice(
                np.frombuffer(b"ACGT", np.uint8), size=per_contig
            ).astype(np.uint8)
            # soft-masked runs: ~30% of the contig in ~10 kb lowercase blocks
            n_soft = per_contig * 30 // 100 // 10_000
            starts = rng.integers(0, per_contig - 10_000, size=n_soft)
            for s in starts:
                bases[s:s + 10_000] |= 0x20  # ASCII lowercase
            # N gaps: ~0.5% in 5 kb runs (centromere/telomere stand-ins)
            n_gaps = per_contig * 5 // 1000 // 5_000
            gstarts = rng.integers(0, per_contig - 5_000, size=n_gaps)
            for s in gstarts:
                bases[s:s + 5_000] = ord("N")
            rows = per_contig // 60
            body = np.empty((rows, 61), np.uint8)
            body[:, :60] = bases[: rows * 60].reshape(rows, 60)
            body[:, 60] = ord("\n")
            fh.write(f">contig_{ci}\n".encode())
            fh.write(body.tobytes())
            tail = bases[rows * 60:]
            if tail.size:
                fh.write(tail.tobytes() + b"\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size-mb", type=int, default=100)
    ap.add_argument("--n-reads", type=int, default=10_000)
    ap.add_argument("--read-len", type=int, default=10_000)
    args = ap.parse_args()

    path = f"/tmp/genome_{args.size_mb}mb.fasta"
    if not os.path.exists(path):
        t0 = time.perf_counter()
        build_genome(path, args.size_mb)
        print(json.dumps({"stage": "build_fixture",
                          "seconds": round(time.perf_counter() - t0, 2),
                          "bytes": os.path.getsize(path)}))

    from seq2squiggle_tpu.config import load_config
    from seq2squiggle_tpu.io.fasta import read_fasta_translated, read_fastx
    from seq2squiggle_tpu.io.reads import (
        _SANITISE,
        sample_reads_from_reference,
        sanitise_genome,
    )

    cfg = load_config(None)

    t0 = time.perf_counter()
    raw = [seq for seq, _ in read_fastx(path)]
    t_parse = time.perf_counter() - t0
    total = sum(len(s) for s in raw)
    print(json.dumps({"stage": "parse_fastx", "seconds": round(t_parse, 3),
                      "mb_per_s": round(total / 1e6 / t_parse, 1)}))

    t0 = time.perf_counter()
    genome_seqs = [sanitise_genome(s) for s in raw]
    t_san = time.perf_counter() - t0
    print(json.dumps({"stage": "sanitise", "seconds": round(t_san, 3),
                      "mb_per_s": round(total / 1e6 / t_san, 1)}))
    del raw, genome_seqs

    # The production path (io/reads.get_reads): parse + sanitise fused
    # into one bytes.translate pass per contig.
    t0 = time.perf_counter()
    genome_seqs = [seq for seq, _ in read_fasta_translated(path, _SANITISE)]
    t_fused = time.perf_counter() - t0
    print(json.dumps({"stage": "fused_parse_sanitise",
                      "seconds": round(t_fused, 3),
                      "mb_per_s": round(total / 1e6 / t_fused, 1),
                      "vs_two_pass": round((t_parse + t_san) / t_fused, 2)}))
    genome_lens = [len(s) for s in genome_seqs]

    t0 = time.perf_counter()
    reads, total_chunks = sample_reads_from_reference(
        genome_seqs, genome_lens, args.n_reads, args.read_len, -1, cfg,
        seed=42, distr="expon", profile="dna-r10-prom",
    )
    t_samp = time.perf_counter() - t0
    n_bases = sum(len(r) for r in reads)
    print(json.dumps({"stage": "sample_reads", "seconds": round(t_samp, 3),
                      "reads": len(reads), "bases": n_bases,
                      "reads_per_s": round(len(reads) / t_samp, 1)}))

    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    print(json.dumps({
        "stage": "summary", "genome_mb": round(total / 1e6, 1),
        "fused_parse_sanitise_s": round(t_fused, 2),
        "sample_s": round(t_samp, 2),
        "host_total_s": round(t_fused + t_samp, 2),
        "peak_rss_mb": round(rss_mb, 1),
        "reads": len(reads), "read_bases": n_bases,
        "total_chunks": total_chunks,
    }))


if __name__ == "__main__":
    main()
