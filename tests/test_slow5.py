"""SLOW5/BLOW5 codec round-trips, svb-zd codec, append semantics, writers."""

import numpy as np
import pytest

from seq2squiggle_tpu.io.slow5 import (
    Slow5FileWriter,
    read_slow5,
    svb_decode,
    svb_encode,
    zigzag_delta_decode,
    zigzag_delta_encode,
)
from seq2squiggle_tpu.io.writers import BLOW5Writer, digitise, indexed_uuid
from seq2squiggle_tpu.profiles import get_profile


def test_zigzag_delta_roundtrip():
    rng = np.random.default_rng(0)
    sig = rng.integers(-32768, 32767, 5000).astype(np.int16)
    zz = zigzag_delta_encode(sig)
    np.testing.assert_array_equal(zigzag_delta_decode(zz), sig)


def test_svb_roundtrip():
    rng = np.random.default_rng(1)
    for n in (0, 1, 3, 4, 5, 1000):
        vals = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
        enc = svb_encode(vals)
        np.testing.assert_array_equal(svb_decode(enc, n), vals)


def _write(path, n_reads=3, rna=False, seed=0):
    profile = get_profile("rna-004-min" if rna else "dna-r10-min")
    writer = BLOW5Writer(
        path, profile, ideal_mode=True,
        profile_name="rna-004-min" if rna else "dna-r10-min",
        preserve_read_ids=False, rng=np.random.default_rng(seed),
    )
    rng = np.random.default_rng(seed)
    signals = {
        f"read{i}": rng.integers(0, 2000, rng.integers(50, 400)).astype(np.int16)
        for i in range(n_reads)
    }
    writer.write_batch(signals)
    writer.close()
    return signals, profile


@pytest.mark.parametrize("ext", ["slow5", "blow5"])
def test_writer_roundtrip(tmp_path, ext):
    path = str(tmp_path / f"out.{ext}")
    signals, profile = _write(path)
    attrs, records = read_slow5(path)
    assert attrs["sequencing_kit"] == "SQK-LSK114"
    assert attrs["experiment_type"] == "genomic_dna"
    assert int(attrs["sample_frequency"]) == profile["sample_rate"]
    assert len(records) == len(signals)
    start_time = 0
    for i, (key, rec) in enumerate(zip(signals, records)):
        np.testing.assert_array_equal(rec["signal"], signals[key])
        assert rec["read_id"] == str(indexed_uuid(i + 1))
        assert rec["read_number"] == i
        assert rec["start_time"] == start_time
        assert rec["digitisation"] == profile["digitisation"]
        # ideal mode: offset / median_before are the profile means
        assert rec["offset"] == profile["offset_mean"]
        assert rec["median_before"] == profile["median_before_mean"]
        start_time += len(signals[key])


def test_blow5_append(tmp_path):
    """Streaming flushes append to the same file; readback sees all reads."""
    path = str(tmp_path / "out.blow5")
    profile = get_profile("dna-r10-min")
    writer = BLOW5Writer(path, profile, True, "dna-r10-min", False,
                         np.random.default_rng(0))
    s1 = {"a": np.arange(100, dtype=np.int16)}
    s2 = {"b": np.arange(50, dtype=np.int16) * 2}
    writer.write_batch(s1)
    writer.close()
    # Re-open (simulates a new flush session appending to an existing file)
    writer2 = BLOW5Writer(path, profile, True, "dna-r10-min", False,
                          np.random.default_rng(0))
    writer2.read_counter = 1
    writer2.start_time = 100
    writer2.write_batch(s2)
    writer2.close()
    _, records = read_slow5(path)
    assert len(records) == 2
    np.testing.assert_array_equal(records[0]["signal"], s1["a"])
    np.testing.assert_array_equal(records[1]["signal"], s2["b"])
    assert records[1]["start_time"] == 100


def test_rna_reversal(tmp_path):
    path = str(tmp_path / "out.blow5")
    signals, _ = _write(path, n_reads=1, rna=True)
    _, records = read_slow5(path)
    np.testing.assert_array_equal(records[0]["signal"],
                                  signals["read0"][::-1])


def test_digitise_matches_reference_math():
    # signal_io.py:135-138: round(sig * dig / range - offset), half-to-even
    sig = np.array([100.0, 100.03, 0.0, 80.5], np.float32)
    raw = digitise(sig, 8192.0, 1536.598389, 13.380569389019)
    expected = np.round(
        sig * 8192.0 / 1536.598389 - 13.380569389019
    ).astype(np.int16)
    np.testing.assert_array_equal(raw, expected)


def test_preserve_read_ids(tmp_path):
    path = str(tmp_path / "out.slow5")
    profile = get_profile("dna-r10-min")
    writer = BLOW5Writer(path, profile, True, "dna-r10-min",
                         preserve_read_ids=True, rng=np.random.default_rng(0))
    writer.write_batch({"my_read": np.arange(10, dtype=np.int16)})
    writer.close()
    _, records = read_slow5(path)
    assert records[0]["read_id"] == "my_read"


@pytest.mark.parametrize("press", ["zstd", "zlib", "none"])
def test_slow5_press_choices_roundtrip(tmp_path, press):
    """Every --slow5-press choice writes a readable BLOW5 with the matching
    record-compression enum in the header (zstd=3 is the default; zlib=1
    matches the reference's pyslow5 default, signal_io.py:83-86)."""
    from seq2squiggle_tpu.io.writers import SLOW5_PRESS

    path = str(tmp_path / "out.blow5")
    profile = get_profile("dna-r10-min")
    writer = BLOW5Writer(path, profile, True, "dna-r10-min", False,
                         np.random.default_rng(0), slow5_press=press)
    sig = {"a": np.arange(300, dtype=np.int16)}
    writer.write_batch(sig)
    writer.close()
    with open(path, "rb") as fh:
        header = fh.read(70)
    # BLOW5 fixed header: magic(6) + version(3), record_press at offset 9
    assert header[9] == SLOW5_PRESS[press]
    _, records = read_slow5(path)
    np.testing.assert_array_equal(records[0]["signal"], sig["a"])


def test_empty_signal_skipped(tmp_path):
    path = str(tmp_path / "out.slow5")
    profile = get_profile("dna-r10-min")
    writer = BLOW5Writer(path, profile, True, "dna-r10-min", False,
                         np.random.default_rng(0))
    writer.write_batch({"empty": np.zeros(0, np.int16),
                        "ok": np.ones(5, np.int16)})
    writer.close()
    _, records = read_slow5(path)
    assert len(records) == 1
