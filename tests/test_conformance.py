"""Cross-tool output conformance (VERDICT r3 missing #2 / next #6).

These tests open files written by OUR codecs with the ECOSYSTEM's own
tooling — pyslow5 (slow5lib's Python bindings), the slow5tools binary,
and ONT's pod5 package. None of those ship in this image (no egress), so
every test here is GATED: it runs automatically in any environment that
has the tool installed and skips otherwise. Run just this tier with

    pytest -m conformance

The offline stand-ins remain tests/test_slow5_goldens.py (hand-packed
byte goldens following docs/SLOW5_SPEC_NOTES.md) and the POD5
self-round-trip in tests/test_pod5.py; README "Conformance" states
exactly what is and is not externally validated.

Reference parity: the upstream tool inherits BLOW5/POD5 correctness from
pyslow5/pod5 themselves (reference signal_io.py:62-282); this module is
where our self-implemented codecs earn the same guarantee.
"""

from __future__ import annotations

import shutil
import subprocess
import uuid

import numpy as np
import pytest

from seq2squiggle_tpu.io.slow5 import (
    PRESS_ZLIB,
    PRESS_ZSTD,
    SIGPRESS_NONE,
    SIGPRESS_SVB_ZD,
    Slow5FileWriter,
)
from seq2squiggle_tpu.io.writers import BLOW5Writer, POD5Writer, indexed_uuid
from seq2squiggle_tpu.profiles import get_profile

pytestmark = pytest.mark.conformance


def _have(mod):
    try:
        __import__(mod)
        return True
    except ImportError:
        return False


HAVE_PYSLOW5 = _have("pyslow5")
HAVE_POD5 = _have("pod5")
SLOW5TOOLS = shutil.which("slow5tools")

ATTRS = {
    "asic_id": "123456",
    "run_id": "run_conformance",
    "sample_frequency": "5000",
}
AUX = {
    "channel_number": "42",
    "median_before": 219.5,
    "read_number": 7,
    "start_mux": 2,
    "start_time": 1000,
}


def _write_blow5(path, record_press, signal_press, n_reads=3):
    rng = np.random.default_rng(7)
    sigs = [rng.integers(-100, 2000, n).astype(np.int16)
            for n in (100, 5000, 1)]
    w = Slow5FileWriter(str(path), record_press=record_press,
                        signal_press=signal_press)
    w.open(ATTRS)
    for i, sig in enumerate(sigs[:n_reads]):
        aux = dict(AUX, read_number=i)
        w.write_record(f"read_{i}", sig, 2048.0, -243.0, 281.5, 5000.0, aux)
    w.close()
    return sigs[:n_reads]


@pytest.mark.skipif(not HAVE_PYSLOW5, reason="pyslow5 not installed")
@pytest.mark.parametrize(
    "record_press,signal_press",
    [(PRESS_ZLIB, SIGPRESS_SVB_ZD), (PRESS_ZSTD, SIGPRESS_SVB_ZD),
     (PRESS_ZLIB, SIGPRESS_NONE)],
)
def test_pyslow5_reads_our_blow5(tmp_path, record_press, signal_press):
    """slow5lib itself must parse our BLOW5: header attrs, aux fields,
    and bit-exact signal for every press combination we emit."""
    import pyslow5

    path = tmp_path / "ours.blow5"
    sigs = _write_blow5(path, record_press, signal_press)

    f = pyslow5.Open(str(path), "r")
    hdr = f.get_all_headers()
    assert hdr["run_id"] == ATTRS["run_id"]
    assert str(hdr["sample_frequency"]) == ATTRS["sample_frequency"]
    reads = list(f.seq_reads(aux="all"))
    assert len(reads) == len(sigs)
    for i, (read, sig) in enumerate(zip(reads, sigs)):
        assert read["read_id"] == f"read_{i}"
        np.testing.assert_array_equal(
            np.asarray(read["signal"], np.int16), sig)
        assert read["digitisation"] == pytest.approx(2048.0)
        assert read["offset"] == pytest.approx(-243.0)
        assert read["range"] == pytest.approx(281.5)
        assert read["aux"]["read_number"] == i
        assert read["aux"]["median_before"] == pytest.approx(219.5)
    f.close()


@pytest.mark.skipif(not SLOW5TOOLS, reason="slow5tools not on PATH")
def test_slow5tools_quickcheck_and_view(tmp_path):
    """The reference toolchain's own binary must accept our container:
    quickcheck exits 0 and `view` converts to ASCII SLOW5 with our IDs."""
    path = tmp_path / "ours.blow5"
    _write_blow5(path, PRESS_ZLIB, SIGPRESS_SVB_ZD)
    subprocess.run([SLOW5TOOLS, "quickcheck", str(path)], check=True)
    out = subprocess.run(
        [SLOW5TOOLS, "view", str(path)], check=True, capture_output=True,
        text=True,
    ).stdout
    assert "read_0" in out and "read_2" in out


@pytest.mark.skipif(not HAVE_PYSLOW5, reason="pyslow5 not installed")
def test_pyslow5_reads_facade_output(tmp_path):
    """End-to-end writer facade (profile headers, digitised signal,
    indexed UUID read IDs) through slow5lib."""
    import pyslow5

    path = tmp_path / "facade.blow5"
    profile = get_profile("dna-r10-prom")
    w = BLOW5Writer(path, profile, True, "dna-r10-prom", False,
                    rng=np.random.default_rng(1))
    w.write_batch({"read1": np.linspace(60.0, 120.0, 400, dtype=np.float32)})
    w.close()

    f = pyslow5.Open(str(path), "r")
    reads = list(f.seq_reads(aux="all"))
    assert len(reads) == 1
    assert reads[0]["read_id"] == str(indexed_uuid(1))
    assert reads[0]["len_raw_signal"] == 400
    f.close()


@pytest.mark.skipif(not HAVE_POD5, reason="pod5 not installed")
def test_pod5_package_reads_our_pod5(tmp_path):
    """ONT's pod5 reader must parse our self-implemented container
    (Arrow IPC tables, flatbuffers footer, vbz signal) bit-exactly."""
    import pod5

    from seq2squiggle_tpu.io.pod5_native import Pod5NativeWriter

    path = tmp_path / "ours.pod5"
    rng = np.random.default_rng(3)
    sigs = [rng.integers(0, 2000, n).astype(np.int16)
            for n in (100, 120000)]  # second spans >1 signal chunk
    w = Pod5NativeWriter(str(path))
    w.set_run_info(sample_rate=5000, sequencing_kit="SQK-LSK114",
                   flow_cell_product_code="FLO-MIN114", sample_id="conf")
    for i, sig in enumerate(sigs):
        w.add_read(read_id=indexed_uuid(i + 1), signal=sig, read_number=i,
                   median_before=200.0 + i, calibration_offset=-120.5,
                   calibration_scale=0.1374)
    w.close()

    with pod5.Reader(str(path)) as reader:
        reads = list(reader.reads())
        assert len(reads) == len(sigs)
        by_id = {str(r.read_id): r for r in reads}
        for i, sig in enumerate(sigs):
            r = by_id[str(indexed_uuid(i + 1))]
            np.testing.assert_array_equal(np.asarray(r.signal, np.int16), sig)
            assert r.run_info.sample_rate == 5000
            assert r.run_info.sequencing_kit == "SQK-LSK114"
            assert r.calibration.offset == pytest.approx(-120.5)
            assert r.calibration.scale == pytest.approx(0.1374)


@pytest.mark.skipif(not HAVE_POD5, reason="pod5 not installed")
def test_pod5_package_reads_facade_output(tmp_path):
    import pod5

    path = tmp_path / "facade.pod5"
    profile = get_profile("dna-r10-prom")
    w = POD5Writer(path, profile, True, "dna-r10-prom", False,
                   rng=np.random.default_rng(1))
    w.write_batch({"read1": np.linspace(60.0, 120.0, 400, dtype=np.float32)})
    w.close()

    with pod5.Reader(str(path)) as reader:
        reads = list(reader.reads())
        assert len(reads) == 1
        assert len(reads[0].signal) == 400
