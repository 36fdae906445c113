"""End-to-end simulation tests on the reference example inputs (CPU)."""

import numpy as np
import pytest

from seq2squiggle_tpu.config import load_config
from seq2squiggle_tpu.io.slow5 import read_slow5
from seq2squiggle_tpu.runtime.simulate import simulate_run
from seq2squiggle_tpu.utils import set_seeds

TEST_FASTA = "/root/reference/example/test.fasta"


def _run(out, seed=42, batch_size=64, **kwargs):
    cfg = load_config(None)
    cfg["compute_dtype"] = "float32"
    set_seeds(seed)
    defaults = dict(
        config=cfg, saved_weights="random", fasta=TEST_FASTA, read_input=True,
        n=-1, r=1000, c=-1, out=str(out), profile="dna-r10-min",
        dwell_mean=None, dwell_std=0.0, noise_std=2.0, noise_sampling=True,
        duration_sampling=True, distr="expon", predict_batch_size=batch_size,
        export_every_n_samples=1_000_000, seed=seed, show_progress=False,
    )
    defaults.update(kwargs)
    return simulate_run(**defaults)


def test_e2e_blow5(tmp_path):
    out = tmp_path / "out.blow5"
    stats = _run(out)
    assert stats["reads"] == 7  # test.fasta has 7 reads
    _, records = read_slow5(out)
    assert len(records) == 7
    assert all(r["len_raw_signal"] > 0 for r in records)


def test_e2e_deterministic_and_batch_size_invariant(tmp_path):
    """Same seed => identical signals, for ANY batch size (per-chunk RNG)."""
    outs = []
    for name, bs in (("a.blow5", 64), ("b.blow5", 64), ("c.blow5", 17)):
        _run(tmp_path / name, batch_size=bs)
        _, records = read_slow5(tmp_path / name)
        outs.append([r["signal"] for r in records])
    for sig_a, sig_b, sig_c in zip(*outs):
        np.testing.assert_array_equal(sig_a, sig_b)
        np.testing.assert_array_equal(sig_a, sig_c)


def test_e2e_ulp_probe_downgrades_rough_model(tmp_path, caplog):
    """A model whose decoder escapes the ULP symbol alphabet too often
    (random weights here) must be caught by the FIRST-BATCH budget probe
    and stepped down to the 4-bit event tier in one move — not ground
    through repeated overflow -> raw-recompute churn (VERDICT r2 next
    #8: tier autotune)."""
    import logging

    cfg = load_config(None)  # bfloat16: the ULP tier is the default
    set_seeds(7)
    out = tmp_path / "probe.blow5"
    with caplog.at_level(logging.INFO, logger="seq2squiggle_tpu"):
        stats = simulate_run(
            config=cfg, saved_weights="random", fasta=TEST_FASTA,
            read_input=True, n=-1, r=1000, c=-1, out=str(out),
            profile="dna-r10-min", dwell_mean=None, dwell_std=0.0,
            noise_std=2.0, noise_sampling=True, duration_sampling=True,
            distr="expon", predict_batch_size=64,
            export_every_n_samples=1_000_000, seed=7, show_progress=False,
        )
    assert stats["reads"] == 7
    probes = [r for r in caplog.records if "ULP-tier probe" in r.message]
    churn = [r for r in caplog.records
             if "overflows before" in r.message]
    assert len(probes) == 1, "the budget probe must fire exactly once"
    # at most the in-flight batch 0 itself recomputes raw; no repeat churn
    assert len(churn) <= 1


def test_e2e_static_dwell_no_noise(tmp_path):
    """Ideal mode: constant dwell, no noise -> deterministic signal lengths."""
    out = tmp_path / "out.slow5"
    stats = _run(out, duration_sampling=False, noise_std=0.0, dwell_mean=10.0)
    _, records = read_slow5(out)
    assert len(records) == 7
    # With 16-kmer chunks and dwell 10, each chunk yields <= 160 samples and
    # every frame of a full chunk is within the valid region.
    assert stats["samples"] > 0


def test_e2e_streaming_export_matches_single_flush(tmp_path):
    """Tiny export threshold (many flushes) must produce the same file
    contents as one big flush."""
    _run(tmp_path / "one.blow5")
    _run(tmp_path / "many.blow5", export_every_n_samples=4)
    _, rec_one = read_slow5(tmp_path / "one.blow5")
    _, rec_many = read_slow5(tmp_path / "many.blow5")
    assert len(rec_one) == len(rec_many)
    for a, b in zip(rec_one, rec_many):
        assert a["read_id"] == b["read_id"]
        np.testing.assert_array_equal(a["signal"], b["signal"])


def test_e2e_read_mode_resampling(tmp_path):
    out = tmp_path / "out.slow5"
    stats = _run(out, n=12)
    _, records = read_slow5(out)
    assert len(records) == 12


def test_e2e_reference_mode(tmp_path):
    out = tmp_path / "out.slow5"
    stats = _run(
        out, fasta="/root/reference/example/lamda_genome.fasta",
        read_input=False, n=5, r=500,
    )
    _, records = read_slow5(out)
    assert len(records) == 5


def test_e2e_rna_profile(tmp_path):
    out = tmp_path / "out.slow5"
    _run(out, profile="rna-004-min")
    attrs, records = read_slow5(out)
    assert attrs["experiment_type"] == "rna"
    assert len(records) == 7


@pytest.mark.parametrize("profile,kmer", [("dna-r9-min", 6), ("dna-r10-min", 9)])
def test_profile_forces_kmer(tmp_path, profile, kmer):
    from seq2squiggle_tpu.profiles import update_config_for_profile

    cfg = load_config(None)
    update_config_for_profile(profile, cfg)
    assert cfg["seq_kmer"] == kmer


def test_e2e_r9_profile_pod5(tmp_path):
    """BASELINE config 3: R9 chemistry (k=6 model) with POD5 export."""
    from seq2squiggle_tpu.io.pod5_native import read_pod5

    out = tmp_path / "out.pod5"
    _run(out, profile="dna-r9-min", dwell_std=1.5, duration_sampling=False)
    data = read_pod5(str(out))
    assert len(data["reads"]) == 7
    assert data["run_info"]["sequencing_kit"] == "SQK-LSK109"
    assert all(r["num_samples"] > 0 for r in data["reads"])


def test_e2e_coverage_mode(tmp_path):
    """BASELINE config 4: coverage mode (-c) on a genome."""
    out = tmp_path / "out.slow5"
    stats = _run(
        out, fasta="/root/reference/example/lamda_genome.fasta",
        read_input=False, n=-1, c=2, r=2000,
    )
    from seq2squiggle_tpu.io.slow5 import read_slow5

    _, records = read_slow5(out)
    # lambda is 48.5 kb; 2x coverage at r=2000 -> ~48 reads (minus QC skips)
    assert 30 <= len(records) <= 60
    assert stats["samples"] > 0


def test_e2e_whole_contig_mode(tmp_path):
    """-r 0 with -n: each read is one full contig (documented reference
    behavior whose code path was unreachable there)."""
    out = tmp_path / "out.slow5"
    stats = _run(out, fasta="/root/reference/example/lamda_genome.fasta",
                 read_input=False, n=2, r=0, duration_sampling=False,
                 dwell_mean=4.0, noise_std=0.0)
    from seq2squiggle_tpu.io.slow5 import read_slow5

    _, records = read_slow5(out)
    assert len(records) == 2
    # lambda is 48,502 bp -> 48,494 k-mers -> ceil(/16) = 3031 chunks/read
    assert stats["chunks"] == 2 * 3031
    assert all(r["len_raw_signal"] > 0 for r in records)


def test_e2e_pallas_fallback_chain(tmp_path, caplog, monkeypatch):
    """When the fused kernels fail on a backend, the first-batch probe must
    step down packed -> per-head-loop -> XLA and still complete the run.

    On this CPU test backend the Pallas TPU kernels genuinely fail to
    lower, so forcing the auto-gate open exercises the REAL failure path:
    both Pallas attempts raise, the run lands on the XLA blocks, and the
    output still round-trips."""
    import logging

    from seq2squiggle_tpu.models import fft_model

    real_gate = fft_model._use_pallas_blocks

    def forced_gate(config, x, mask, dropout_rng):
        if config.get("use_pallas", "auto") == "auto":
            return mask is None and dropout_rng is None  # pretend TPU
        return real_gate(config, x, mask, dropout_rng)

    monkeypatch.setattr(fft_model, "_use_pallas_blocks", forced_gate)
    out = tmp_path / "out.blow5"
    with caplog.at_level(logging.WARNING):
        stats = _run(out)
    assert stats["reads"] == 7
    msgs = [r.message for r in caplog.records]
    assert any("per-head-loop" in m for m in msgs)
    assert any("falling back to XLA blocks" in m for m in msgs)
    _, records = read_slow5(out)
    assert len(records) == 7
    assert all(r["len_raw_signal"] > 0 for r in records)
