"""Host-side IO: FASTA/FASTQ reading, read sampling, SLOW5/BLOW5/POD5 writing."""
