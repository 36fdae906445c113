"""FASTA/FASTQ parsing: gzip support, block fast path, fused sanitise."""

import gzip

import pytest

from seq2squiggle_tpu.io.fasta import read_fasta_translated, read_fastx
from seq2squiggle_tpu.io.reads import _SANITISE, sanitise_genome


def test_gz_fastq(tmp_path):
    path = tmp_path / "reads.fastq.gz"
    rec = "@read1 extra\nACGTACGTACGTAC\n+\nIIIIIIIIIIIIII\n@read2\nTTTTGGGG\n+\nIIIIIIII\n"
    with gzip.open(path, "wt") as fh:
        fh.write(rec)
    out = list(read_fastx(str(path)))
    assert out == [("ACGTACGTACGTAC", "read1"), ("TTTTGGGG", "read2")]


def test_gz_fasta(tmp_path):
    path = tmp_path / "g.fasta.gz"
    with gzip.open(path, "wt") as fh:
        fh.write(">c1 desc\nACGT\nACGT\n>c2\nTTTT\n")
    out = list(read_fastx(str(path)))
    assert out == [("ACGTACGT", "c1"), ("TTTT", "c2")]


def _messy_fasta_text():
    # multi-line bodies, lowercase, ambiguity codes, CRLF, record at EOF
    # without trailing newline, a record whose header has no description
    return (">c1 desc here\nacgtACGT\r\nNRYKMacg\n"
            ">c2\nTTTT\ngggg\n"
            ">c3 x\nA")


def test_plain_fasta_block_path_matches_line_parser(tmp_path):
    """The binary block fast path (plain FASTA) must produce exactly what
    the line parser produces for gzip of the same content."""
    plain = tmp_path / "g.fasta"
    plain.write_text(_messy_fasta_text())
    gz = tmp_path / "g.fasta.gz"
    with gzip.open(gz, "wt") as fh:
        fh.write(_messy_fasta_text())
    assert list(read_fastx(str(plain))) == list(read_fastx(str(gz)))
    assert [n for _, n in read_fastx(str(plain))] == ["c1", "c2", "c3"]


def test_block_path_record_spanning_chunks(tmp_path):
    """Records larger than the read chunk, and a '\\n>' split across a
    chunk boundary, must parse identically to the line parser."""
    from seq2squiggle_tpu.io import fasta as F

    body1 = "ACGT" * 50  # 200 bases over several 64-byte chunks
    text = f">c1\n{body1}\n>c2\nTT\n"
    path = tmp_path / "big.fasta"
    path.write_text(text)
    with open(path, "rb") as fb:
        assert fb.read(1) == b">"
        out = list(F._read_fasta_blocks(fb, chunk_bytes=64))
    assert out == [(body1, "c1"), ("TT", "c2")]
    # force the boundary case: chunk ends exactly on the '\n' before '>'
    split_at = text.index("\n>") + 1
    with open(path, "rb") as fb:
        assert fb.read(1) == b">"
        out2 = list(F._read_fasta_blocks(fb, chunk_bytes=split_at - 1))
    assert out2 == out


@pytest.mark.parametrize("gz", [False, True])
def test_read_fasta_translated_fuses_sanitise(tmp_path, gz):
    """read_fasta_translated(path, _SANITISE) == sanitise_genome after
    parse, on both the binary fast path and the gzip fallback."""
    name = "g.fasta.gz" if gz else "g.fasta"
    path = tmp_path / name
    if gz:
        with gzip.open(path, "wt") as fh:
            fh.write(_messy_fasta_text())
    else:
        path.write_text(_messy_fasta_text())
    fused = list(read_fasta_translated(str(path), _SANITISE))
    two_pass = [(sanitise_genome(s), n) for s, n in read_fastx(str(path))]
    assert fused == two_pass
    assert fused[0][0] == "ACGTACGTNNNNNACG"  # lowercase up, non-ACGT -> N
