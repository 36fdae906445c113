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

    Plain (non-gzip) FASTA takes a block-based binary path: records split
    on b'\\n>' and newlines strip via bytes.translate — ~3x the line
    parser's throughput, which matters at genome scale (a human-sized
    3 Gb reference parses in seconds, not half a minute). gzip and FASTQ
    keep the line parser (decompression / 4-line framing dominate there).
    """
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    if not str(path).endswith(".gz"):
        with open(path, "rb") as fb:
            first_b = fb.read(1)
            if not first_b:
                return
            if first_b == b">":
                yield from _read_fasta_blocks(fb)
                return
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


def read_fasta_translated(
    path: str, table: bytes
) -> Generator[Tuple[str, str], None, None]:
    """FASTA records with a 256-byte translation table applied DURING the
    newline-strip pass — genome sanitisation (uppercase, non-ACGT -> N)
    rides the same single C-level bytes.translate call as newline
    removal, so reference mode makes one pass over the genome instead of
    parse-then-sanitise (two passes + a second full string copy; at
    human-genome scale that's seconds of wall and gigabytes of peak RSS).
    Falls back to parse-then-translate for gzip inputs."""
    if not str(path).endswith(".gz"):
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        with open(path, "rb") as fb:
            first_b = fb.read(1)
            if not first_b:
                return
            if first_b == b">":
                yield from _read_fasta_blocks(fb, table=table)
                return
    for seq, name in read_fastx(path):
        yield seq.encode("ascii").translate(table).decode("ascii"), name


def _read_fasta_blocks(
    fb, chunk_bytes: int = 16 * 1024 * 1024, table: bytes = None
) -> Generator[Tuple[str, str], None, None]:
    """Block-based FASTA parser over a binary stream positioned just past
    the leading '>'. Accumulates raw chunks per record (no quadratic
    rejoin inside multi-hundred-MB contigs) and splits records on b'\\n>';
    newline/CR removal — plus the optional translation table — is one
    C-level bytes.translate pass per record."""

    def emit(rec: bytes) -> Tuple[str, str]:
        nl = rec.find(b"\n")
        if nl < 0:
            header, body = rec, b""
        else:
            header, body = rec[:nl], rec[nl + 1:]
        tokens = header.split()
        name = tokens[0].decode("ascii") if tokens else ""
        return body.translate(table, delete=b"\n\r").decode("ascii"), name

    parts = []  # raw byte chunks of the record(s) currently in flight
    prev_tail = b""  # last byte of the previous chunk (boundary '\n>')
    for chunk in iter(lambda: fb.read(chunk_bytes), b""):
        boundary = prev_tail == b"\n" and chunk[:1] == b">"
        if boundary or b"\n>" in chunk:
            joined = b"".join(parts) + chunk
            recs = joined.split(b"\n>")
            for rec in recs[:-1]:
                yield emit(rec)
            parts = [recs[-1]]
        else:
            parts.append(chunk)
        prev_tail = chunk[-1:]
    last = b"".join(parts)
    if last.strip():
        yield emit(last)


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
