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


@pytest.mark.parametrize("press", ["zstd", "zlib", "none"])
def test_batch_encoder_matches_per_record(tmp_path, press):
    """The whole-flush native encoder (blow5_encode_batch) and the
    per-record Python path produce byte-identical files for every record
    compression method — write_records_batch is forced on one file and
    bypassed on the other."""
    from seq2squiggle_tpu.io.slow5 import Slow5FileWriter, PRESS_ZSTD

    rng = np.random.default_rng(3)
    n = 17
    sigs = [rng.integers(-3000, 3000, size=int(rng.integers(1, 4000)),
                         dtype=np.int16) for _ in range(n)]
    ids = [f"00000000-0000-0000-0000-{i + 1:012d}" for i in range(n)]
    offs = rng.normal(10, 2, n).tolist()
    mbs = rng.normal(200, 20, n).tolist()
    rns = list(range(n))
    sts = np.cumsum([0] + [len(s) for s in sigs[:-1]]).tolist()
    hdr = {"run_id": "r0"}
    from seq2squiggle_tpu.io.writers import SLOW5_PRESS

    pa, pb = str(tmp_path / "a.blow5"), str(tmp_path / "b.blow5")
    wa = Slow5FileWriter(pa, record_press=SLOW5_PRESS[press])
    wa.open(hdr)
    used_native = wa.write_records_batch(
        ids, sigs, 8192.0, offs, 1500.0, 4000.0, mbs, rns, sts)
    wa.close()
    wb = Slow5FileWriter(pb, record_press=SLOW5_PRESS[press])
    wb.open(hdr)
    for i in range(n):
        wb.write_record(ids[i], sigs[i], 8192.0, offs[i], 1500.0, 4000.0,
                        {"channel_number": "0", "median_before": mbs[i],
                         "read_number": rns[i], "start_mux": 0,
                         "start_time": sts[i]})
    wb.close()
    if not used_native:
        pytest.skip("native batch encoder unavailable in this environment")
    if press == "zstd":
        # python-zstandard bundles its own libzstd while the native encoder
        # links the system one; different library versions can legitimately
        # emit different (both valid) frames, so zstd pins decoded equality
        # only. zlib/none stay byte-exact.
        from seq2squiggle_tpu.io.slow5 import read_slow5

        ha, ra = read_slow5(pa)
        hb, rb = read_slow5(pb)
        assert ha == hb and len(ra) == len(rb) == n
        for a, b in zip(ra, rb):
            sa = a.pop("signal")
            sb = b.pop("signal")
            np.testing.assert_array_equal(sa, sb)
            assert a == b
    else:
        with open(pa, "rb") as fa, open(pb, "rb") as fb:
            assert fa.read() == fb.read()


def test_write_flat_matches_write_batch(tmp_path):
    """BLOW5Writer.write_flat (the exporter's flat layout) produces the
    same records as write_batch on the same reads, including empty-read
    skipping and identical metadata RNG draw order."""
    profile = get_profile("dna-r10-min")
    rng = np.random.default_rng(5)
    sigs = {f"r{i}": rng.integers(-2000, 2000,
                                  size=(0 if i == 2 else 500 + i),
                                  dtype=np.int16).astype(np.int16)
            for i in range(5)}
    pa, pb = str(tmp_path / "a.blow5"), str(tmp_path / "b.blow5")
    wa = BLOW5Writer(pa, profile, False, "dna-r10-min", False,
                     np.random.default_rng(7))
    ids = list(sigs)
    flat = np.concatenate([sigs[r] for r in ids])
    off = np.zeros(len(ids) + 1, np.int64)
    np.cumsum([sigs[r].size for r in ids], out=off[1:])
    wa.write_flat(ids, flat, off)
    wa.close()
    wb = BLOW5Writer(pb, profile, False, "dna-r10-min", False,
                     np.random.default_rng(7))
    wb.write_batch(sigs)
    wb.close()
    _, ra = read_slow5(pa)
    _, rb = read_slow5(pb)
    assert len(ra) == len(rb) == 4  # the empty read is skipped
    for x, y in zip(ra, rb):
        for key in y:
            if key == "signal":
                np.testing.assert_array_equal(x[key], y[key])
            else:
                assert x[key] == y[key], key


def test_batch_append_across_sessions(tmp_path):
    """Appending a second batch-encoded session to an existing BLOW5 file
    (EOF stripped, arbitrary unaligned resume offset for the O_DIRECT
    bulk path) yields all records intact."""
    from seq2squiggle_tpu.io.slow5 import Slow5FileWriter

    path = str(tmp_path / "a.blow5")
    rng = np.random.default_rng(11)
    hdr = {"run_id": "r0"}
    all_sigs = []

    for session in range(3):
        w = Slow5FileWriter(path)
        w.open(hdr)
        sigs = [rng.integers(-3000, 3000, size=int(rng.integers(1, 3000)),
                             dtype=np.int16) for _ in range(7)]
        ids = [f"s{session}-r{i}" for i in range(7)]
        n = len(ids)
        used = w.write_records_batch(
            ids, sigs, 8192.0, [10.0] * n, 1500.0, 4000.0, [200.0] * n,
            list(range(n)), list(range(n)))
        w.close()
        if not used:
            pytest.skip("native batch encoder unavailable")
        all_sigs.extend(sigs)

    _, records = read_slow5(path)
    assert len(records) == 21
    for rec, sig in zip(records, all_sigs):
        np.testing.assert_array_equal(rec["signal"], sig)


def _bulk_roundtrip(tmp_path, monkeypatch, fake_pwrite):
    """Drive Slow5FileWriter.write_bulk with a patched os.pwrite and return
    (expected payload, bytes actually landed after the header)."""
    import mmap
    import os as _os

    path = str(tmp_path / "bulk.blow5")
    w = Slow5FileWriter(path)
    w.open({"run_id": "r0"})
    # Force the O_DIRECT branch even on filesystems that refuse O_DIRECT
    # (tmpfs): a plain fd has identical pwrite semantics for this test.
    if getattr(w, "_fd_direct", -1) < 0:
        w._fd_direct = _os.open(path, _os.O_WRONLY)
    hdr_end = w._fh.tell()

    n = 3 * w._DIRECT_ALIGN + 123  # head + two aligned pages + tail
    s0 = w.direct_source_offset()
    m = mmap.mmap(-1, s0 + n + w._DIRECT_ALIGN)
    buf = np.frombuffer(m, np.uint8)
    rng = np.random.default_rng(5)
    payload = rng.integers(0, 256, n, dtype=np.uint8)
    buf[s0:s0 + n] = payload

    monkeypatch.setattr(_os, "pwrite", fake_pwrite)
    w.write_bulk(buf, s0, n)
    assert w._fh.tell() == hdr_end + n  # stream position advanced fully
    monkeypatch.undo()
    w.close()

    with open(path, "rb") as fh:
        data = fh.read()
    return payload, data[hdr_end:hdr_end + n]


def test_write_bulk_short_pwrite_loops(tmp_path, monkeypatch):
    """A pwrite that lands fewer bytes than asked must be retried until the
    whole aligned middle is on disk (no gap of garbage mid-file)."""
    import os as _os

    real = _os.pwrite
    calls = []

    def short(fd, mv, off):
        # Cap each call at one page, slicing the caller's page-aligned
        # buffer (an O_DIRECT fd rejects copies into unaligned memory).
        nwritten = real(fd, mv[:4096], off)
        calls.append(nwritten)
        return nwritten

    payload, landed = _bulk_roundtrip(tmp_path, monkeypatch, short)
    np.testing.assert_array_equal(np.frombuffer(landed, np.uint8), payload)
    assert len(calls) > 1  # the loop actually retried


def test_write_bulk_pwrite_failure_falls_back(tmp_path, monkeypatch):
    """If O_DIRECT pwrite fails outright, the remainder must land through
    the buffered fh at the correct offset."""

    def boom(fd, mv, off):
        raise OSError(28, "No space left on device")

    payload, landed = _bulk_roundtrip(tmp_path, monkeypatch, boom)
    np.testing.assert_array_equal(np.frombuffer(landed, np.uint8), payload)


def test_write_bulk_partial_then_failure(tmp_path, monkeypatch):
    """One short direct write followed by a hard failure: the already-landed
    prefix stays, the rest arrives via the buffered fallback, byte-exact."""
    import os as _os

    real = _os.pwrite
    state = {"n": 0}

    def flaky(fd, mv, off):
        state["n"] += 1
        if state["n"] > 1:
            raise OSError(28, "No space left on device")
        return real(fd, mv[:4096], off)

    payload, landed = _bulk_roundtrip(tmp_path, monkeypatch, flaky)
    np.testing.assert_array_equal(np.frombuffer(landed, np.uint8), payload)


def test_native_load_retries_without_zstd(tmp_path, monkeypatch):
    """A cached .so that fails to dlopen (e.g. built against a libzstd that
    has since vanished) must be deleted and rebuilt without the optional
    zstd dependency — not silently disable every native fast path."""
    import ctypes
    import os
    import shutil

    from seq2squiggle_tpu.io.native import build

    real_so = build._cache_path()
    if not os.path.exists(real_so) and build.load_native() is None:
        pytest.skip("native codec unavailable in this environment")

    cached = str(tmp_path / "libslow5codec-test.so")
    shutil.copy(real_so, cached)
    monkeypatch.setattr(build, "_cache_path", lambda: cached)

    rebuilds = []

    def fake_compile(out_path, allow_zstd=True):
        rebuilds.append(allow_zstd)
        shutil.copy(real_so, out_path)  # stand-in for the no-zstd build
        return True

    monkeypatch.setattr(build, "_compile", fake_compile)

    real_cdll = ctypes.CDLL
    attempts = {"n": 0}

    def flaky_cdll(path, *args, **kwargs):
        attempts["n"] += 1
        if attempts["n"] == 1:
            raise OSError(
                "libzstd.so.1: cannot open shared object file")
        return real_cdll(path, *args, **kwargs)

    monkeypatch.setattr(ctypes, "CDLL", flaky_cdll)
    monkeypatch.setattr(build, "_LIB", None)
    monkeypatch.setattr(build, "_TRIED", False)

    lib = build.load_native()
    assert lib is not None
    assert rebuilds == [False]  # exactly one retry, zstd excluded
    assert attempts["n"] == 2
