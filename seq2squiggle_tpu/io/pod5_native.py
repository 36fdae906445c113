"""Native POD5 writer/reader (no `pod5` wheel required).

POD5 is a container of Apache Arrow IPC files (signal / reads / run-info
tables) with a flatbuffers footer, and vbz-compressed signal
(zig-zag delta -> StreamVByte -> zstd). This implementation follows the
published pod5-file-format specification to the best of this build's
knowledge and round-trips through the reader in this module (the contract
the test suite enforces); cross-tool validation against ONT tooling is
documented as best-effort since those wheels are absent here.

Container layout:
    [signature "\\x8bPOD\\r\\n\\x1a\\n"] [16-byte section marker]
    per table: [Arrow IPC file bytes] [pad to 8] [section marker]
    [footer magic "FOOTER\\0\\0"] [footer flatbuffer] [pad to 8]
    [footer length int64] [section marker] [signature]

The footer magic matches pod5's combined_file_utils (an 8-byte
"FOOTER\\0\\0" immediately before the footer flatbuffer); the trailing
length counts the flatbuffer bytes only.

The reference's POD5Writer (src/seq2squiggle/signal_io.py:175-282) delegates
to the pod5 wheel and buffers all reads; writers.POD5Writer keeps that
behavioral contract and uses this module when the wheel is missing.
"""

from __future__ import annotations

import logging
import os
import struct
import uuid
from datetime import datetime, timezone
from typing import Dict, List, Optional

import numpy as np

logger = logging.getLogger("seq2squiggle_tpu")

SIGNATURE = b"\x8bPOD\r\n\x1a\n"
FOOTER_MAGIC = b"FOOTER\x00\x00"
POD5_VERSION = "0.3.27"
SOFTWARE = "seq2squiggle-tpu"

# Footer flatbuffer content types (footer.fbs declaration order)
CONTENT_READS = 0
CONTENT_SIGNAL = 1
CONTENT_INDEX = 2
CONTENT_RUN_INFO = 3
FORMAT_FEATHER_V2 = 0

SIGNAL_CHUNK = 102400  # samples per signal-table row


def svb16_encode(signal: np.ndarray) -> bytes:
    """ONT svb16: StreamVByte specialised for 16-bit values, with the
    zig-zag delta transform folded in (vbz's delta_zig_zag mode).

    Layout (docs/POD5_SPEC_NOTES.md; ONT's vbz/svb16 library):
      - keys: ceil(n/8) bytes, ONE control bit per value, packed
        LSB-first within each byte (value i -> bit i%8 of byte i//8);
        bit 0 = one data byte, bit 1 = two.
      - data: per value, 1 byte (v & 0xFF) when v < 256 else 2 bytes
        little-endian.
    Values are zigzag(int16 wrap-around delta). NOT the 32-bit 2-bit-key
    StreamVByte that SLOW5's svb-zd uses — the two formats are cousins
    but byte-incompatible (pinned by tests/test_pod5_goldens.py).
    """
    sig = np.asarray(signal, np.int16)
    n = len(sig)
    if n == 0:
        return b""
    d16 = np.diff(sig.astype(np.int32), prepend=np.int32(0)).astype(np.int16)
    z = ((d16.astype(np.int32) << 1) ^ (d16.astype(np.int32) >> 15)).astype(
        np.uint16
    )
    two = z > 0xFF
    keys = np.packbits(two, bitorder="little")
    lens = two.astype(np.int64) + 1
    pos = np.zeros(n, np.int64)
    np.cumsum(lens[:-1], out=pos[1:])
    data = np.zeros(int(lens.sum()), np.uint8)
    data[pos] = (z & 0xFF).astype(np.uint8)
    data[pos[two] + 1] = (z[two] >> 8).astype(np.uint8)
    return keys.tobytes() + data.tobytes()


def svb16_decode(data: bytes, count: int) -> np.ndarray:
    """Inverse of svb16_encode; count = number of int16 samples."""
    if count == 0:
        return np.zeros(0, np.int16)
    klen = (count + 7) // 8
    buf = np.frombuffer(data, np.uint8)
    two = np.unpackbits(buf[:klen], bitorder="little")[:count].astype(bool)
    lens = two.astype(np.int64) + 1
    pos = np.zeros(count, np.int64)
    np.cumsum(lens[:-1], out=pos[1:])
    stream = buf[klen:]
    if int(lens.sum()) > len(stream):
        raise ValueError("svb16 stream truncated")
    z = stream[pos].astype(np.uint16)
    hi = np.zeros(count, np.uint16)
    hi[two] = stream[pos[two] + 1].astype(np.uint16)
    z = z | (hi << 8)
    d = ((z >> 1).astype(np.int32)
         ^ -(z & 1).astype(np.int32)).astype(np.int16)
    return np.cumsum(d.astype(np.int32)).astype(np.int16)


def vbz_compress(signal: np.ndarray) -> bytes:
    """vbz = zig-zag delta + svb16 StreamVByte + zstd (the codec pod5
    applies to every signal-table row; sample count lives in the table's
    `samples` column, not in the stream)."""
    import zstandard

    svb = svb16_encode(np.asarray(signal, np.int16))
    return zstandard.ZstdCompressor(level=1).compress(svb)


def vbz_decompress(data: bytes, count: int) -> np.ndarray:
    import zstandard

    svb = zstandard.ZstdDecompressor().decompress(data)
    return svb16_decode(svb, count)


# ---------------------------------------------------------------------------
# Arrow schemas
# ---------------------------------------------------------------------------


def _schema_metadata(file_identifier: str) -> dict:
    return {
        b"MINKNOW:file_identifier": file_identifier.encode(),
        b"MINKNOW:software": SOFTWARE.encode(),
        b"MINKNOW:pod5_version": POD5_VERSION.encode(),
    }


def _uuid_field(name: str):
    import pyarrow as pa

    return pa.field(
        name,
        pa.binary(16),
        nullable=False,
        metadata={
            b"ARROW:extension:name": b"minknow.uuid",
            b"ARROW:extension:metadata": b"",
        },
    )


def _signal_schema(file_identifier: str):
    import pyarrow as pa

    return pa.schema(
        [
            _uuid_field("read_id"),
            pa.field("signal", pa.large_binary(), nullable=False,
                     metadata={b"ARROW:extension:name": b"minknow.vbz",
                               b"ARROW:extension:metadata": b""}),
            pa.field("samples", pa.uint32(), nullable=False),
        ],
        metadata=_schema_metadata(file_identifier),
    )


def _reads_schema(file_identifier: str):
    import pyarrow as pa

    dict16 = pa.dictionary(pa.int16(), pa.utf8())
    return pa.schema(
        [
            _uuid_field("read_id"),
            pa.field("signal", pa.list_(pa.uint64()), nullable=False),
            pa.field("channel", pa.uint16(), nullable=False),
            pa.field("well", pa.uint8(), nullable=False),
            pa.field("pore_type", dict16, nullable=False),
            pa.field("calibration_offset", pa.float32(), nullable=False),
            pa.field("calibration_scale", pa.float32(), nullable=False),
            pa.field("read_number", pa.uint32(), nullable=False),
            pa.field("start", pa.uint64(), nullable=False),
            pa.field("median_before", pa.float32(), nullable=False),
            pa.field("tracked_scaling_scale", pa.float32(), nullable=False),
            pa.field("tracked_scaling_shift", pa.float32(), nullable=False),
            pa.field("predicted_scaling_scale", pa.float32(), nullable=False),
            pa.field("predicted_scaling_shift", pa.float32(), nullable=False),
            pa.field("num_reads_since_mux_change", pa.uint32(), nullable=False),
            pa.field("time_since_mux_change", pa.float32(), nullable=False),
            pa.field("num_minknow_events", pa.uint64(), nullable=False),
            pa.field("end_reason", dict16, nullable=False),
            pa.field("end_reason_forced", pa.bool_(), nullable=False),
            pa.field("run_info", dict16, nullable=False),
            pa.field("num_samples", pa.uint64(), nullable=False),
        ],
        metadata=_schema_metadata(file_identifier),
    )


def _run_info_schema(file_identifier: str):
    import pyarrow as pa

    str_map = pa.map_(pa.utf8(), pa.utf8())
    ts = pa.timestamp("ms", tz="UTC")
    return pa.schema(
        [
            pa.field("acquisition_id", pa.utf8(), nullable=False),
            pa.field("acquisition_start_time", ts, nullable=False),
            pa.field("adc_max", pa.int16(), nullable=False),
            pa.field("adc_min", pa.int16(), nullable=False),
            pa.field("context_tags", str_map, nullable=False),
            pa.field("experiment_name", pa.utf8(), nullable=False),
            pa.field("flow_cell_id", pa.utf8(), nullable=False),
            pa.field("flow_cell_product_code", pa.utf8(), nullable=False),
            pa.field("protocol_name", pa.utf8(), nullable=False),
            pa.field("protocol_run_id", pa.utf8(), nullable=False),
            pa.field("protocol_start_time", ts, nullable=False),
            pa.field("sample_id", pa.utf8(), nullable=False),
            pa.field("sample_rate", pa.uint16(), nullable=False),
            pa.field("sequencing_kit", pa.utf8(), nullable=False),
            pa.field("sequencer_position", pa.utf8(), nullable=False),
            pa.field("sequencer_position_type", pa.utf8(), nullable=False),
            pa.field("software", pa.utf8(), nullable=False),
            pa.field("system_name", pa.utf8(), nullable=False),
            pa.field("system_type", pa.utf8(), nullable=False),
            pa.field("tracking_id", str_map, nullable=False),
        ],
        metadata=_schema_metadata(file_identifier),
    )


# ---------------------------------------------------------------------------
# Footer flatbuffer (manual slot layout mirroring footer.fbs order)
# ---------------------------------------------------------------------------


def _build_footer(file_identifier: str, contents: List[dict]) -> bytes:
    import flatbuffers

    b = flatbuffers.Builder(1024)

    fid = b.CreateString(file_identifier)
    software = b.CreateString(SOFTWARE)
    version = b.CreateString(POD5_VERSION)

    file_offsets = []
    for item in contents:
        b.StartObject(4)
        b.PrependInt64Slot(0, item["offset"], 0)
        b.PrependInt64Slot(1, item["length"], 0)
        b.PrependInt16Slot(2, FORMAT_FEATHER_V2, 0)
        b.PrependInt16Slot(3, item["content_type"], 0)
        file_offsets.append(b.EndObject())

    b.StartVector(4, len(file_offsets), 4)
    for off in reversed(file_offsets):
        b.PrependUOffsetTRelative(off)
    vec = b.EndVector()

    b.StartObject(4)
    b.PrependUOffsetTRelativeSlot(0, fid, 0)
    b.PrependUOffsetTRelativeSlot(1, software, 0)
    b.PrependUOffsetTRelativeSlot(2, version, 0)
    b.PrependUOffsetTRelativeSlot(3, vec, 0)
    footer = b.EndObject()
    b.Finish(footer)
    return bytes(b.Output())


def _parse_footer(buf: bytes) -> dict:
    import flatbuffers

    n = flatbuffers.encode.Get(flatbuffers.packer.uoffset, buf, 0)
    tab = flatbuffers.table.Table(buf, n)

    def _string(slot):
        o = tab.Offset(4 + slot * 2)
        return tab.String(o + tab.Pos).decode() if o else None

    out = {
        "file_identifier": _string(0),
        "software": _string(1),
        "pod5_version": _string(2),
        "contents": [],
    }
    o = tab.Offset(4 + 3 * 2)
    if o:
        length = tab.VectorLen(o)
        vec_start = tab.Vector(o)
        for i in range(length):
            item_pos = tab.Indirect(vec_start + i * 4)
            item = flatbuffers.table.Table(buf, item_pos)

            def _i64(slot, it=item):
                oo = it.Offset(4 + slot * 2)
                return it.Get(flatbuffers.number_types.Int64Flags,
                              oo + it.Pos) if oo else 0

            def _i16(slot, it=item):
                oo = it.Offset(4 + slot * 2)
                return it.Get(flatbuffers.number_types.Int16Flags,
                              oo + it.Pos) if oo else 0

            out["contents"].append(
                dict(offset=_i64(0), length=_i64(1), format=_i16(2),
                     content_type=_i16(3))
            )
    return out


# ---------------------------------------------------------------------------
# Writer / reader
# ---------------------------------------------------------------------------


def _arrow_file_bytes(schema, batch) -> bytes:
    import pyarrow as pa

    sink = pa.BufferOutputStream()
    with pa.ipc.new_file(sink, schema) as writer:
        writer.write_batch(batch)
    return sink.getvalue().to_pybytes()


class Pod5NativeWriter:
    """STREAMING POD5 writer: the signal table (the memory hog — vbz blobs
    of every read) is written incrementally as Arrow record batches into
    the open container file, so memory stays flat however many reads a run
    produces; only the small per-read scalar metadata (~100 B/read) is held
    for the reads table at close(). The reference buffers EVERY read in RAM
    for a single pod5.Writer pass (signal_io.py:175-282, warned about at
    inference.py:72-79) — a deliberate improvement, not replicated
    behavior. Layout identical to the buffered version (signal table
    first), so read_pod5 round-trips unchanged."""

    # signal rows buffered before an Arrow record batch is emitted (keeps
    # per-batch IPC framing overhead negligible without holding much data)
    SIGNAL_FLUSH_ROWS = 512

    def __init__(self, filename: str):
        self.filename = str(filename)
        self.file_identifier = str(uuid.uuid4())
        self._reads: List[dict] = []  # metadata only, no signal arrays
        self._run_info: Optional[dict] = None
        self._fh = None
        self._closed = False
        self._sig_writer = None
        self._signal_offset = 0
        self._section_marker = b""
        self._sig_row_count = 0
        self._sig_read_ids: List[bytes] = []
        self._sig_blobs: List[bytes] = []
        self._sig_samples: List[int] = []

    def set_run_info(self, **kwargs):
        self._run_info = kwargs

    def _ensure_open(self):
        import pyarrow as pa

        if self._fh is not None:
            return
        self._fh = open(self.filename, "wb")
        self._section_marker = uuid.uuid4().bytes
        self._fh.write(SIGNATURE)
        self._fh.write(self._section_marker)
        self._signal_offset = self._fh.tell()
        # The signal table streams into a sibling temp file through
        # pa.OSFile — a pure-native sink at origin 0, so the Arrow IPC
        # file is self-contained (its internal offsets are relative to
        # ITS start) and close() splices it into the container verbatim.
        # Two constraints force this shape: (a) wrapping the container's
        # Python file in pa.PythonFile makes every Arrow write re-enter
        # Python from C++, observed to SEGFAULT when another thread is
        # concurrently inside a JAX device->host transfer on the
        # experimental axon backend (round-3 50k-read POD5 crash); (b) a
        # seekable native sink at a nonzero container offset makes
        # pyarrow emit absolute positions, corrupting the embedded file.
        self._sig_tmp = self.filename + ".sigtmp"
        self._sig_fh = pa.OSFile(self._sig_tmp, "wb")
        self._sig_writer = pa.ipc.new_file(
            self._sig_fh, _signal_schema(self.file_identifier)
        )

    def _flush_signal_rows(self):
        import pyarrow as pa

        if not self._sig_blobs:
            return
        batch = pa.record_batch(
            [
                pa.array(self._sig_read_ids, pa.binary(16)),
                pa.array(self._sig_blobs, pa.large_binary()),
                pa.array(self._sig_samples, pa.uint32()),
            ],
            schema=pa.schema(
                [f.remove_metadata()
                 for f in _signal_schema(self.file_identifier)]
            ),
        )
        self._sig_writer.write_batch(batch)
        self._sig_read_ids, self._sig_blobs, self._sig_samples = [], [], []

    def add_read(self, *, read_id: uuid.UUID, signal: np.ndarray,
                 channel: int = 123, well: int = 3,
                 pore_type: str = "not_set", calibration_offset: float = 0.0,
                 calibration_scale: float = 1.0, read_number: int = 0,
                 start_sample: int = 0, median_before: float = 0.0,
                 end_reason: str = "signal_positive",
                 end_reason_forced: bool = False):
        self._ensure_open()
        sig = np.asarray(signal, np.int16)
        rows = []
        for off in range(0, max(len(sig), 1), SIGNAL_CHUNK):
            chunk = sig[off : off + SIGNAL_CHUNK]
            rows.append(self._sig_row_count)
            self._sig_row_count += 1
            self._sig_read_ids.append(read_id.bytes)
            self._sig_blobs.append(vbz_compress(chunk))
            self._sig_samples.append(len(chunk))
        if len(self._sig_blobs) >= self.SIGNAL_FLUSH_ROWS:
            self._flush_signal_rows()
        self._reads.append(dict(
            read_id=read_id, signal_rows=rows, num_samples=len(sig),
            channel=channel, well=well, pore_type=pore_type,
            calibration_offset=calibration_offset,
            calibration_scale=calibration_scale, read_number=read_number,
            start=start_sample, median_before=median_before,
            end_reason=end_reason, end_reason_forced=end_reason_forced,
        ))

    def close(self):
        import pyarrow as pa

        if self._closed:  # idempotent: a second close() must NOT reopen
            return        # the filename 'wb' and truncate the real file
        if self._run_info is None:
            raise ValueError("set_run_info() must be called before close()")
        self._ensure_open()  # zero-read runs still produce a valid file

        fid = self.file_identifier
        signal_schema = _signal_schema(fid)
        read_signal_rows = [r["signal_rows"] for r in self._reads]

        # ---- finish the streamed signal table, splice into the container
        self._flush_signal_rows()
        self._sig_writer.close()
        self._sig_fh.close()
        fh = self._fh
        import shutil

        with open(self._sig_tmp, "rb") as sig_in:
            shutil.copyfileobj(sig_in, fh, length=16 * 1024 * 1024)
        os.remove(self._sig_tmp)
        contents = [dict(offset=self._signal_offset,
                         length=fh.tell() - self._signal_offset,
                         content_type=CONTENT_SIGNAL)]
        fh.write(b"\0" * ((-fh.tell()) % 8))
        fh.write(self._section_marker)

        # ---- run info table (single row) ----
        ri = dict(self._run_info)
        run_info_id = ri.get("acquisition_id") or fid
        ri["acquisition_id"] = run_info_id

        def ts(value):
            if isinstance(value, datetime):
                return value
            return datetime.now(timezone.utc)

        run_schema = _run_info_schema(fid)
        run_batch = pa.record_batch(
            [
                pa.array([ri["acquisition_id"]], pa.utf8()),
                pa.array([ts(ri.get("acquisition_start_time"))],
                         pa.timestamp("ms", tz="UTC")),
                pa.array([ri.get("adc_max", 4095)], pa.int16()),
                pa.array([ri.get("adc_min", -4096)], pa.int16()),
                pa.array([list(ri.get("context_tags", {}).items())],
                         pa.map_(pa.utf8(), pa.utf8())),
                pa.array([ri.get("experiment_name", "")], pa.utf8()),
                pa.array([ri.get("flow_cell_id", "")], pa.utf8()),
                pa.array([ri.get("flow_cell_product_code", "")], pa.utf8()),
                pa.array([ri.get("protocol_name", "")], pa.utf8()),
                pa.array([ri.get("protocol_run_id", "")], pa.utf8()),
                pa.array([ts(ri.get("protocol_start_time"))],
                         pa.timestamp("ms", tz="UTC")),
                pa.array([ri.get("sample_id", "")], pa.utf8()),
                pa.array([int(ri.get("sample_rate", 4000))], pa.uint16()),
                pa.array([ri.get("sequencing_kit", "")], pa.utf8()),
                pa.array([ri.get("sequencer_position", "")], pa.utf8()),
                pa.array([ri.get("sequencer_position_type", "")], pa.utf8()),
                pa.array([ri.get("software", SOFTWARE)], pa.utf8()),
                pa.array([ri.get("system_name", "")], pa.utf8()),
                pa.array([ri.get("system_type", "")], pa.utf8()),
                pa.array([list(ri.get("tracking_id", {}).items())],
                         pa.map_(pa.utf8(), pa.utf8())),
            ],
            schema=pa.schema([f.remove_metadata() for f in run_schema]),
        )

        # ---- reads table ----
        def dict_arr(values):
            return pa.array(values, pa.utf8()).dictionary_encode().cast(
                pa.dictionary(pa.int16(), pa.utf8())
            )

        reads_schema = _reads_schema(fid)
        n = len(self._reads)
        reads_batch = pa.record_batch(
            [
                pa.array([r["read_id"].bytes for r in self._reads],
                         pa.binary(16)),
                pa.array(read_signal_rows, pa.list_(pa.uint64())),
                pa.array([r["channel"] for r in self._reads], pa.uint16()),
                pa.array([r["well"] for r in self._reads], pa.uint8()),
                dict_arr([r["pore_type"] for r in self._reads]),
                pa.array([r["calibration_offset"] for r in self._reads],
                         pa.float32()),
                pa.array([r["calibration_scale"] for r in self._reads],
                         pa.float32()),
                pa.array([r["read_number"] for r in self._reads], pa.uint32()),
                pa.array([r["start"] for r in self._reads], pa.uint64()),
                pa.array([r["median_before"] for r in self._reads],
                         pa.float32()),
                pa.array([0.0] * n, pa.float32()),  # tracked_scaling_scale
                pa.array([0.0] * n, pa.float32()),  # tracked_scaling_shift
                pa.array([0.0] * n, pa.float32()),  # predicted_scaling_scale
                pa.array([0.0] * n, pa.float32()),  # predicted_scaling_shift
                pa.array([0] * n, pa.uint32()),  # num_reads_since_mux_change
                pa.array([0.0] * n, pa.float32()),  # time_since_mux_change
                pa.array([0] * n, pa.uint64()),  # num_minknow_events
                dict_arr([r["end_reason"] for r in self._reads]),
                pa.array([r["end_reason_forced"] for r in self._reads],
                         pa.bool_()),
                dict_arr([run_info_id] * n),
                pa.array([r["num_samples"] for r in self._reads],
                         pa.uint64()),
            ],
            schema=pa.schema([f.remove_metadata() for f in reads_schema]),
        )

        for content_type, schema, batch in (
            (CONTENT_RUN_INFO, run_schema, run_batch),
            (CONTENT_READS, reads_schema, reads_batch),
        ):
            offset = fh.tell()
            data = _arrow_file_bytes(schema, batch)
            fh.write(data)
            contents.append(dict(offset=offset, length=len(data),
                                 content_type=content_type))
            fh.write(b"\0" * ((-fh.tell()) % 8))
            fh.write(self._section_marker)

        footer = _build_footer(fid, contents)
        fh.write(FOOTER_MAGIC)
        fh.write(footer)
        fh.write(b"\0" * ((-fh.tell()) % 8))
        fh.write(struct.pack("<q", len(footer)))
        fh.write(self._section_marker)
        fh.write(SIGNATURE)
        fh.close()
        self._fh = None
        self._closed = True
        self._reads = []


def read_pod5(path: str) -> dict:
    """Read a POD5 file written by this module (round-trip contract).

    Returns {"file_identifier", "run_info": dict, "reads": [dict]} where
    each read carries its decoded int16 signal.
    """
    import pyarrow as pa

    with open(path, "rb") as fh:
        data = fh.read()
    assert data[:8] == SIGNATURE, "bad POD5 signature"
    assert data[-8:] == SIGNATURE, "bad POD5 trailing signature"
    # footer length sits before the final [section marker][signature]
    tail = len(data) - 8 - 16
    (footer_len,) = struct.unpack_from("<q", data, tail - 8)
    footer_end = tail - 8
    # footer bytes end at the pre-padding boundary
    footer_start = footer_end - ((-footer_len) % 8) - footer_len
    assert data[footer_start - 8 : footer_start] == FOOTER_MAGIC, (
        "bad POD5 footer magic"
    )
    footer = _parse_footer(data[footer_start : footer_start + footer_len])

    tables = {}
    for item in footer["contents"]:
        buf = data[item["offset"] : item["offset"] + item["length"]]
        reader = pa.ipc.open_file(pa.BufferReader(buf))
        tables[item["content_type"]] = reader.read_all()

    signal_tbl = tables[CONTENT_SIGNAL]
    reads_tbl = tables[CONTENT_READS]
    run_tbl = tables[CONTENT_RUN_INFO]

    sig_blobs = signal_tbl.column("signal").to_pylist()
    sig_samples = signal_tbl.column("samples").to_pylist()

    reads = []
    for i in range(reads_tbl.num_rows):
        rows = reads_tbl.column("signal")[i].as_py()
        sig = np.concatenate(
            [vbz_decompress(sig_blobs[int(r)], sig_samples[int(r)])
             for r in rows]
        ) if rows else np.zeros(0, np.int16)
        reads.append({
            "read_id": str(uuid.UUID(bytes=reads_tbl.column("read_id")[i].as_py())),
            "signal": sig,
            "channel": reads_tbl.column("channel")[i].as_py(),
            "well": reads_tbl.column("well")[i].as_py(),
            "pore_type": reads_tbl.column("pore_type")[i].as_py(),
            "calibration_offset": reads_tbl.column("calibration_offset")[i].as_py(),
            "calibration_scale": reads_tbl.column("calibration_scale")[i].as_py(),
            "read_number": reads_tbl.column("read_number")[i].as_py(),
            "median_before": reads_tbl.column("median_before")[i].as_py(),
            "end_reason": reads_tbl.column("end_reason")[i].as_py(),
            "num_samples": reads_tbl.column("num_samples")[i].as_py(),
        })
    run_info = {
        name: run_tbl.column(name)[0].as_py() for name in run_tbl.column_names
    }
    return {
        "file_identifier": footer["file_identifier"],
        "run_info": run_info,
        "reads": reads,
    }
