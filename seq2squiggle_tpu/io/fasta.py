"""FASTA/FASTQ reading without external dependencies.

Replaces the reference's pysam.FastxFile usage (src/seq2squiggle/utils.py:290-308)
with a dependency-free buffered parser. Supports multi-line FASTA, FASTQ, and
gzip-compressed inputs; yields (sequence, name) tuples in file order, matching
the reference generator's contract.
"""

from __future__ import annotations

import gzip
import io
import os
from typing import Generator, Tuple


def _open_text(path: str):
    if str(path).endswith(".gz"):
        return io.TextIOWrapper(gzip.open(path, "rb"), encoding="ascii")
    return open(path, "r", encoding="ascii", buffering=8 * 1024 * 1024)


def read_fastx(path: str) -> Generator[Tuple[str, str], None, None]:
    """Yield (sequence, name) for each record in a FASTA or FASTQ file.

    The record name is the first whitespace-delimited token after '>' / '@',
    the same field pysam exposes as entry.name.
    """
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    with _open_text(path) as fh:
        first = fh.read(1)
        if not first:
            return
        fh.seek(0)
        if first == ">":
            yield from _read_fasta(fh)
        elif first == "@":
            yield from _read_fastq(fh)
        else:
            raise ValueError(
                f"{path} does not look like FASTA or FASTQ (starts with {first!r})"
            )


def _read_fasta(fh) -> Generator[Tuple[str, str], None, None]:
    name = None
    seq_parts = []
    for line in fh:
        line = line.rstrip("\n").rstrip("\r")
        if not line:
            continue
        if line[0] == ">":
            if name is not None:
                yield "".join(seq_parts), name
            name = line[1:].split()[0] if len(line) > 1 else ""
            seq_parts = []
        else:
            seq_parts.append(line)
    if name is not None:
        yield "".join(seq_parts), name


def _read_fastq(fh) -> Generator[Tuple[str, str], None, None]:
    while True:
        header = fh.readline()
        if not header:
            return
        header = header.rstrip("\n")
        if not header:
            continue
        if header[0] != "@":
            raise ValueError(f"Malformed FASTQ header line: {header!r}")
        seq = fh.readline().rstrip("\n").rstrip("\r")
        plus = fh.readline()
        qual = fh.readline()
        if not qual:
            raise ValueError("Truncated FASTQ record")
        del plus, qual
        name = header[1:].split()[0] if len(header) > 1 else ""
        yield seq, name
