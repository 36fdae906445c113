"""Native POD5 writer: container round-trip + writer facade + e2e."""

import os

import numpy as np
import pytest
import uuid

from seq2squiggle_tpu.io.pod5_native import (
    Pod5NativeWriter,
    read_pod5,
    vbz_compress,
    vbz_decompress,
)
from seq2squiggle_tpu.io.writers import POD5Writer, indexed_uuid
from seq2squiggle_tpu.profiles import get_profile


def test_vbz_roundtrip():
    rng = np.random.default_rng(0)
    sig = rng.normal(800, 100, 50000).astype(np.int16)
    comp = vbz_compress(sig)
    assert len(comp) < 2 * len(sig)  # compresses below 2 B/sample
    np.testing.assert_array_equal(vbz_decompress(comp, len(sig)), sig)


def test_pod5_native_roundtrip(tmp_path):
    path = str(tmp_path / "out.pod5")
    writer = Pod5NativeWriter(path)
    writer.set_run_info(sample_rate=5000, sequencing_kit="SQK-LSK114",
                        flow_cell_product_code="FLO-MIN114",
                        sample_id="test")
    rng = np.random.default_rng(1)
    sigs = [rng.integers(0, 2000, n).astype(np.int16)
            for n in (100, 50, 120000)]  # last one spans 2 signal chunks
    for i, sig in enumerate(sigs):
        writer.add_read(read_id=indexed_uuid(i + 1), signal=sig,
                        read_number=i, median_before=200.0 + i,
                        calibration_offset=-120.5, calibration_scale=0.1374)
    writer.close()

    data = read_pod5(path)
    assert data["run_info"]["sample_rate"] == 5000
    assert data["run_info"]["sequencing_kit"] == "SQK-LSK114"
    assert len(data["reads"]) == 3
    for i, (read, sig) in enumerate(zip(data["reads"], sigs)):
        assert read["read_id"] == str(indexed_uuid(i + 1))
        np.testing.assert_array_equal(read["signal"], sig)
        assert read["num_samples"] == len(sig)
        assert read["median_before"] == pytest.approx(200.0 + i)
        assert read["end_reason"] == "signal_positive"
        assert read["calibration_offset"] == pytest.approx(-120.5)


def test_pod5_double_close_is_idempotent(tmp_path):
    """A second close() must be a no-op — not reopen the filename 'wb'
    (which truncates the completed container to an empty file)."""
    path = str(tmp_path / "out.pod5")
    writer = Pod5NativeWriter(path)
    writer.set_run_info(sample_rate=5000, sequencing_kit="SQK-LSK114",
                        flow_cell_product_code="FLO-MIN114",
                        sample_id="test")
    writer.add_read(read_id=indexed_uuid(1),
                    signal=np.arange(64, dtype=np.int16))
    writer.close()
    size = os.path.getsize(path)
    writer.close()  # must not truncate or rewrite
    assert os.path.getsize(path) == size
    data = read_pod5(path)
    assert len(data["reads"]) == 1
    np.testing.assert_array_equal(
        data["reads"][0]["signal"], np.arange(64, dtype=np.int16))


def test_pod5_streaming_multi_flush(tmp_path):
    """Reads stream into the container across many flushes with FLAT
    memory: after every add_read the writer retains only scalar metadata
    (no signal arrays, no unbounded vbz blobs), and the finished file
    round-trips identically to a single-batch write (VERDICT r2 next #6;
    the reference buffers everything, signal_io.py:175-282)."""
    path = str(tmp_path / "stream.pod5")
    writer = Pod5NativeWriter(path)
    writer.set_run_info(sample_rate=5000, sequencing_kit="SQK-LSK114",
                        flow_cell_product_code="FLO-MIN114",
                        sample_id="stream")
    rng = np.random.default_rng(5)
    n_reads = 2 * Pod5NativeWriter.SIGNAL_FLUSH_ROWS + 37  # >2 batch flushes
    sigs = []
    for i in range(n_reads):
        sig = rng.integers(0, 2000, int(rng.integers(20, 400))).astype(
            np.int16
        )
        sigs.append(sig)
        writer.add_read(read_id=indexed_uuid(i + 1), signal=sig,
                        read_number=i)
        # flat memory: metadata only — no read dict may hold an array, and
        # the signal-row staging buffer stays below one flush quantum
        assert all("signal" not in r for r in writer._reads)
        assert len(writer._sig_blobs) < Pod5NativeWriter.SIGNAL_FLUSH_ROWS
    writer.close()

    data = read_pod5(path)
    assert len(data["reads"]) == n_reads
    for i, (read, sig) in enumerate(zip(data["reads"], sigs)):
        assert read["read_id"] == str(indexed_uuid(i + 1))
        np.testing.assert_array_equal(read["signal"], sig)


def test_pod5_writer_facade(tmp_path):
    path = str(tmp_path / "out.pod5")
    profile = get_profile("dna-r10-min")
    writer = POD5Writer(path, profile, ideal_mode=True,
                        profile_name="dna-r10-min", preserve_read_ids=False,
                        rng=np.random.default_rng(0))
    rng = np.random.default_rng(2)
    signals = {f"r{i}": rng.integers(0, 1500, 80).astype(np.int16)
               for i in range(4)}
    writer.write_batch(signals)
    writer.close()
    data = read_pod5(path)
    assert len(data["reads"]) == 4
    assert data["run_info"]["flow_cell_product_code"] == "FLO-MIN114"
    # ideal mode: calibration offset is the profile mean offset
    assert data["reads"][0]["calibration_offset"] == pytest.approx(
        profile["offset_mean"]
    )
    np.testing.assert_array_equal(data["reads"][2]["signal"], signals["r2"])


def test_pod5_rna_reversal(tmp_path):
    path = str(tmp_path / "out.pod5")
    profile = get_profile("rna-004-min")
    writer = POD5Writer(path, profile, True, "rna-004-min", False,
                        np.random.default_rng(0))
    sig = np.arange(50, dtype=np.int16)
    writer.write_batch({"r": sig})
    writer.close()
    data = read_pod5(path)
    np.testing.assert_array_equal(data["reads"][0]["signal"], sig[::-1])


def test_e2e_pod5(tmp_path):
    from test_e2e import _run

    out = tmp_path / "out.pod5"
    stats = _run(out)
    data = read_pod5(str(out))
    assert len(data["reads"]) == 7
    assert all(r["num_samples"] > 0 for r in data["reads"])
