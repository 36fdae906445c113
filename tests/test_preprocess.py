"""Preprocessor: synthetic events.tsv -> training chunks, semantics checks."""

import numpy as np
import pandas as pd
import pytest

from seq2squiggle_tpu.config import load_config
from seq2squiggle_tpu.train.preprocess import (
    build_chunkset,
    preprocess_run,
    typical_indices,
)


def make_events(n_events=64, k=9, seed=0, read_name="read1", start_pos=0):
    """Synthetic uncalled4-style events table."""
    rng = np.random.default_rng(seed)
    rows = []
    sig_pos = 0
    for i in range(n_events):
        kmer = "".join(rng.choice(list("ACGT"), k))
        n_samples = int(rng.integers(2, 12))
        samples = rng.normal(80, 10, n_samples).round(3)
        rows.append(
            dict(
                read_name=read_name,
                position=start_pos + i,
                model_kmer=kmer,
                start_idx=sig_pos,
                end_idx=sig_pos + n_samples,
                event_stdv=float(rng.uniform(0.5, 3.0)),
                samples=",".join(map(str, samples)),
            )
        )
        sig_pos += n_samples
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def cfg():
    return load_config(None)


def test_build_chunkset_shapes(cfg):
    df = make_events(64)
    data = build_chunkset(df, cfg, rna=False, partition_by=False)
    assert data["chunks"].shape == (4, 16, 9, 5)
    assert data["targets"].shape == (4, 250)
    assert data["chunks_lengths"].shape == (4, 16)
    assert data["stdevs"].shape == (4, 16)
    # chunk lengths match the target content: each chunk's target length is
    # the sum of its event lengths (when below max_signal_len)
    for i in range(4):
        total = int(data["chunks_lengths"][i].sum())
        assert data["targets_lengths"][i] == min(total, 32767)


def test_build_chunkset_signal_alignment(cfg):
    """The flattened signal slices must line up with per-event boundaries."""
    df = make_events(16, seed=1)
    data = build_chunkset(df, cfg, rna=False, partition_by=False)
    # reconstruct event 0's samples from the table and compare
    first = np.array([float(x) for x in df.iloc[0]["samples"].split(",")],
                     np.float32)
    n0 = len(first)
    np.testing.assert_allclose(data["targets"][0][:n0], first, rtol=1e-6)


def test_padding_to_multiple_of_16(cfg):
    df = make_events(20)  # 20 events -> padded to 32 -> 2 chunks
    data = build_chunkset(df, cfg, rna=False, partition_by=False)
    assert data["chunks"].shape[0] == 2
    # padding k-mers are '_'*k -> one-hot channel 0, with length 1, stdev 0
    pad_rows = data["chunks"][1][4:]  # events 20..31 are padding
    assert np.all(pad_rows[..., 0] == 1)
    assert np.all(pad_rows[..., 1:] == 0)
    assert np.all(data["chunks_lengths"][1][4:] == 1)
    assert np.all(data["stdevs"][1][4:] == 0)


def test_n_kmers_filtered(cfg):
    df = make_events(32)
    df.loc[3, "model_kmer"] = "N" * 9
    data = build_chunkset(df, cfg, rna=False, partition_by=False)
    # 31 usable events -> padded to 32 -> 2 chunks
    assert data["chunks"].shape[0] == 2


def test_rna_reverses_per_event_samples(cfg):
    df = make_events(16, seed=2)
    fwd = build_chunkset(df, cfg, rna=False, partition_by=False)
    rev = build_chunkset(df, cfg, rna=True, partition_by=False)
    first = np.array([float(x) for x in df.iloc[0]["samples"].split(",")],
                     np.float32)
    n0 = len(first)
    np.testing.assert_allclose(rev["targets"][0][:n0], first[::-1], rtol=1e-6)
    assert not np.allclose(fwd["targets"][0][:n0], rev["targets"][0][:n0])


def test_typical_indices():
    lengths = np.array([0, 10, 250, 251, 100])
    idx = typical_indices(lengths, 250)
    np.testing.assert_array_equal(idx, [1, 2, 4])


def test_preprocess_run_writes_files(tmp_path, cfg):
    events = tmp_path / "events.tsv"
    df = pd.concat([make_events(40, seed=3, read_name="r1"),
                    make_events(40, seed=4, read_name="r2", start_pos=1000)])
    df.to_csv(events, sep="\t", index=False)
    outdir = tmp_path / "out"
    preprocess_run(str(events), str(outdir), batches=True, chunksize=48,
                   partition_by=False, rna=False, config=cfg)
    files = sorted(f.name for f in outdir.iterdir())
    assert any(f.startswith("chunks-0000") for f in files)
    assert any(f.startswith("targets-") for f in files)
    assert any(f.startswith("stdevs-") for f in files)
    chunks = np.load(outdir / "chunks-0000.npy")
    assert chunks.ndim == 4 and chunks.shape[1:] == (16, 9, 5)


def test_partition_by_keeps_reads_separate(tmp_path, cfg):
    df = pd.concat([make_events(10, seed=5, read_name="r1"),
                    make_events(10, seed=6, read_name="r2")])
    data = build_chunkset(df, cfg, rna=False, partition_by=True)
    # each read padded to 16 independently -> 2 chunks
    assert data["chunks"].shape[0] == 2


def test_preprocess_gz_events(tmp_path, cfg):
    import gzip

    df = make_events(64, seed=9)
    events = tmp_path / "events.tsv.gz"
    with gzip.open(events, "wt") as fh:
        df.to_csv(fh, sep="\t", index=False)
    outdir = tmp_path / "out"
    preprocess_run(str(events), str(outdir), batches=True, chunksize=64,
                   partition_by=False, rna=False, config=cfg)
    chunks = np.load(outdir / "chunks-0000.npy")
    assert chunks.shape[0] == 4
