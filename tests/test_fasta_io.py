"""gzip FASTQ input support."""

import gzip

from seq2squiggle_tpu.io.fasta import read_fastx


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
