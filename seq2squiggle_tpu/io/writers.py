"""Signal-file writers: BLOW5/SLOW5 (streaming, appendable) and POD5.

Capability parity with the reference signal_io module
(src/seq2squiggle/signal_io.py:62-282): same header fields, same
digitisation math, same per-read metadata (offset/median_before draws in
non-ideal mode, cumulative start_time, RNA 3'->5' reversal, indexed or
preserved read IDs).

Differences by design:
  - Signals arrive already digitised to int16 (the TPU inner loop performs
    round(sig * digitisation / range - offset_mean) on device); writers also
    accept float pA arrays and digitise on the host for the POD5/test paths.
  - read_number / indexed UUIDs count across streaming flushes (the
    reference restarts both at every flush, producing duplicate read IDs in
    long streaming runs — a bug we do not replicate).
"""

from __future__ import annotations

import logging
import uuid
from datetime import datetime
from typing import Dict, Optional

import numpy as np

from ..profiles import get_seq_kit_and_flow_cell
from .slow5 import Slow5FileWriter

logger = logging.getLogger("seq2squiggle_tpu")


def indexed_uuid(index: int) -> uuid.UUID:
    """Deterministic incrementing UUID (reference: signal_io.py:19-23)."""
    return uuid.UUID(f"00000000-0000-0000-0000-{index:012d}")


def digitise(signal_pa: np.ndarray, digitisation: float, range_val: float,
             offset_mean: float) -> np.ndarray:
    """pA -> raw int16 ADC (reference: signal_io.py:134-138; np.round is
    round-half-to-even)."""
    raw = np.round(
        signal_pa.astype(np.float32) * digitisation / range_val - offset_mean
    )
    return raw.astype(np.int16)


class _WriterBase:
    def __init__(self, filename, profile: dict, ideal_mode: bool,
                 profile_name: str, preserve_read_ids: bool,
                 rng: Optional[np.random.Generator] = None):
        self.filename = str(filename)
        self.profile = profile
        self.ideal_mode = ideal_mode
        self.profile_name = profile_name
        self.preserve_read_ids = preserve_read_ids
        self.signals: Optional[Dict[str, np.ndarray]] = None  # reference-compat
        self.median_before = float(profile["median_before_mean"])
        self.median_before_std = float(profile["median_before_std"])
        self.offset = float(profile["offset_mean"])
        self.offset_std = float(profile["offset_std"])
        self.digitisation = float(profile["digitisation"])
        self.signal_range = float(profile["range"])
        self.sample_rate = float(profile["sample_rate"])
        self.start_time = 0
        self.read_counter = 0  # local reads written; persists across flushes
        # Round-robin read sharding (multi-process / multi-host runs): the
        # n-th read this writer sees has GLOBAL index start + n*step, so
        # indexed UUIDs and read_numbers never collide across shard files.
        self.read_index_start = 0
        self.read_index_step = 1
        self.rng = rng if rng is not None else np.random.default_rng()
        self.is_rna = profile_name.startswith("rna")

    def _global_read_index(self) -> int:
        return self.read_index_start + self.read_counter * self.read_index_step

    def _per_read_metadata(self):
        if self.ideal_mode:
            return self.median_before, self.offset
        return (
            float(self.rng.normal(self.median_before, self.median_before_std)),
            float(self.rng.normal(self.offset, self.offset_std)),
        )

    def _prepare_signal(self, signal: np.ndarray) -> np.ndarray:
        if signal.dtype != np.int16:
            signal = digitise(
                np.asarray(signal), self.digitisation, self.signal_range, self.offset
            )
        if self.is_rna:
            signal = np.ascontiguousarray(signal[::-1])
        return signal

    def _read_id(self, read_id: str) -> str:
        if self.preserve_read_ids:
            return str(read_id)
        return str(indexed_uuid(self._global_read_index() + 1))

    def save(self):
        """Reference-compatible entry point: consume self.signals and write."""
        if not self.signals:
            logger.warning("No signals were found; nothing exported")
            raise ValueError("No signals were found; nothing exported")
        self.write_batch(self.signals)
        self.signals = None

    def write_batch(self, signals: Dict[str, np.ndarray]):
        raise NotImplementedError

    def write_flat(self, read_ids, flat: np.ndarray, sample_off: np.ndarray):
        """Flat-layout entry point: all reads' samples concatenated + (n+1)
        prefix offsets (the layout the streaming exporter already holds).
        Base implementation slices into the dict form; BLOW5 overrides with
        a zero-copy native path."""
        sample_off = np.asarray(sample_off)
        self.write_batch({
            rid: flat[sample_off[i]:sample_off[i + 1]]
            for i, rid in enumerate(read_ids)
        })

    def close(self):
        pass


#: --slow5-press choices -> BLOW5 record-compression enum. "zstd" is the
#: default: at bench volume (123 M samples, 1-core host) zlib-1 costs
#: ~2.5 s of host CPU vs ~0.6 s for zstd-1 with a slightly SMALLER file
#: (the svb-zd signal blobs dominate the record bytes and are
#: high-entropy). Both are standard BLOW5 enum values (zstd=3) readable
#: by slow5lib/slow5tools release builds; "zlib" restores the pyslow5
#: default the reference emits (signal_io.py:83-86).
SLOW5_PRESS = {"zstd": 3, "zlib": 1, "none": 0}


class BLOW5Writer(_WriterBase):
    """Streaming SLOW5/BLOW5 writer (appendable across flushes)."""

    def __init__(self, *args, slow5_press: str = "zstd", **kwargs):
        super().__init__(*args, **kwargs)
        if slow5_press == "zstd":
            try:
                import zstandard  # noqa: F401
            except ImportError:
                logger.warning(
                    "python-zstandard unavailable; falling back to zlib "
                    "BLOW5 record compression"
                )
                slow5_press = "zlib"
        self._file = Slow5FileWriter(
            self.filename, record_press=SLOW5_PRESS[slow5_press]
        )
        self._opened = False

    def _header_attrs(self):
        seq_kit, flow_cell = get_seq_kit_and_flow_cell(self.profile_name)
        return {
            "asic_id": "asic_id_0",
            "exp_start_time": datetime.now().strftime("%Y-%m-%dT%H:%M:%SZ"),
            "run_id": "run_id_0",
            "flow_cell_id": "FAN00000",
            "flow_cell_product_code": flow_cell,
            "experiment_type": "rna" if self.is_rna else "genomic_dna",
            "sample_frequency": int(self.sample_rate),
            "sequencing_kit": seq_kit,
        }

    def write_batch(self, signals: Dict[str, np.ndarray]):
        if not self._opened:
            self._file.open(self._header_attrs())
            self._opened = True
        # Collect the flush into parallel arrays first (metadata draws stay
        # in the exact per-read order of the original loop, so seeded
        # output is unchanged), then encode every record in one native
        # call; the per-record path below is the fallback and reuses the
        # already-drawn metadata so RNG state never diverges between paths.
        ids, sigs, mbs, offs, rns, sts = [], [], [], [], [], []
        for read_id, signal in signals.items():
            signal = np.asarray(signal)
            if signal.size == 0:
                logger.debug(f"Empty signal, skipping {read_id}")
                continue
            median_before_value, offset_value = self._per_read_metadata()
            raw = self._prepare_signal(signal)
            ids.append(self._read_id(read_id))
            sigs.append(raw)
            mbs.append(median_before_value)
            offs.append(offset_value)
            rns.append(self._global_read_index())
            sts.append(self.start_time)
            self.start_time += int(len(raw))
            self.read_counter += 1
        if not ids:
            return
        if self._file.write_records_batch(
            ids, sigs, self.digitisation, offs, self.signal_range,
            self.sample_rate, mbs, rns, sts,
        ):
            return
        for i, rid in enumerate(ids):
            aux = {
                "channel_number": "0",
                "median_before": mbs[i],
                "read_number": rns[i],
                "start_mux": 0,
                "start_time": sts[i],
            }
            self._file.write_record(
                rid, sigs[i], self.digitisation, offs[i],
                self.signal_range, self.sample_rate, aux,
            )

    def write_flat(self, read_ids, flat: np.ndarray, sample_off: np.ndarray):
        """Native fast path for the exporter's flat layout: per-read
        metadata draws stay in stream order, signals are NOT re-sliced or
        re-concatenated — the flat buffer goes straight to the batch
        encoder. RNA (per-read reversal) and float pA input fall back to
        the per-read path."""
        flat = np.asarray(flat)
        if self.is_rna or flat.dtype != np.int16 or not self._file.binary:
            return super().write_flat(read_ids, flat, sample_off)
        if not self._opened:
            self._file.open(self._header_attrs())
            self._opened = True
        lens = np.diff(np.asarray(sample_off, np.int64))
        ids, mbs, offs, rns, sts, keep_lens = [], [], [], [], [], []
        for i, rid in enumerate(read_ids):
            if lens[i] == 0:
                logger.debug(f"Empty signal, skipping {rid}")
                continue
            median_before_value, offset_value = self._per_read_metadata()
            ids.append(self._read_id(rid))
            mbs.append(median_before_value)
            offs.append(offset_value)
            rns.append(self._global_read_index())
            sts.append(self.start_time)
            keep_lens.append(int(lens[i]))
            self.start_time += int(lens[i])
            self.read_counter += 1
        if not ids:
            return
        # empty reads contribute no samples, so the kept reads' prefix
        # offsets still index the original flat buffer exactly
        off2 = np.zeros(len(ids) + 1, np.int64)
        np.cumsum(keep_lens, out=off2[1:])
        if self._file.write_records_batch(
            ids, None, self.digitisation, offs, self.signal_range,
            self.sample_rate, mbs, rns, sts,
            flat=flat, sample_off=off2,
        ):
            return
        for i, rid in enumerate(ids):
            aux = {
                "channel_number": "0",
                "median_before": mbs[i],
                "read_number": rns[i],
                "start_mux": 0,
                "start_time": sts[i],
            }
            self._file.write_record(
                rid, flat[off2[i]:off2[i + 1]], self.digitisation, offs[i],
                self.signal_range, self.sample_rate, aux,
            )

    def close(self):
        if self._opened:
            self._file.close()
            self._opened = False


class POD5Writer(_WriterBase):
    """STREAMING POD5 writer: the `pod5` wheel when present, else the
    built-in native Arrow/flatbuffers implementation (io/pod5_native.py).

    The reference buffers every read in RAM for one pod5.Writer pass
    (signal_io.py:175-282, warned about at inference.py:72-79). Both of
    our backends instead write reads as they arrive — the native writer
    streams signal record batches into the open container, and the wheel's
    Writer natively supports incremental add_read — so memory stays flat
    at any run size.
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        try:
            import pod5  # noqa: F401

            self._pod5 = pod5
        except ImportError:
            self._pod5 = None
            logger.info(
                "pod5 wheel not installed; using the built-in native POD5 "
                "writer."
            )
        self._writer = None
        self._run_info = None

    def _ensure_open(self):
        if self._writer is not None:
            return
        if self._pod5 is not None:
            self._run_info = self._pod5.RunInfo(**self._run_info_fields())
            self._writer = self._pod5.Writer(self.filename)
        else:
            from .pod5_native import Pod5NativeWriter

            self._writer = Pod5NativeWriter(self.filename)
            self._writer.set_run_info(**self._run_info_fields())

    def write_batch(self, signals: Dict[str, np.ndarray]):
        self._ensure_open()
        scale = self.signal_range / self.digitisation
        for read_id, signal in signals.items():
            signal = np.asarray(signal)
            if signal.size == 0:
                logger.debug(f"Empty signal, skipping {read_id}")
                continue
            median_before_value, offset_value = self._per_read_metadata()
            raw = self._prepare_signal(signal)
            if self.preserve_read_ids:
                rid = uuid.uuid5(uuid.NAMESPACE_DNS, str(read_id))
            else:
                rid = indexed_uuid(self._global_read_index() + 1)
            if self._pod5 is not None:
                pod5 = self._pod5
                self._writer.add_read(
                    pod5.Read(
                        read_id=rid,
                        pore=pod5.Pore(channel=123, well=3,
                                       pore_type="not_set"),
                        calibration=pod5.Calibration(
                            offset=offset_value, scale=scale
                        ),
                        read_number=self._global_read_index(),
                        start_sample=0,
                        median_before=median_before_value,
                        end_reason=pod5.EndReason(
                            reason=pod5.EndReasonEnum.SIGNAL_POSITIVE,
                            forced=False,
                        ),
                        run_info=self._run_info,
                        signal=raw,
                    )
                )
            else:
                self._writer.add_read(
                    read_id=rid,
                    signal=raw,
                    calibration_offset=float(offset_value),
                    calibration_scale=float(scale),
                    read_number=self._global_read_index(),
                    median_before=float(median_before_value),
                )
            self.read_counter += 1

    def _run_info_fields(self):
        seq_kit, flow_cell = get_seq_kit_and_flow_cell(self.profile_name)
        return dict(
            acquisition_id="",
            acquisition_start_time=datetime.now(),
            adc_max=4095,
            adc_min=-4096,
            context_tags={},
            experiment_name="",
            flow_cell_id="",
            flow_cell_product_code=flow_cell,
            protocol_name="",
            protocol_run_id="",
            protocol_start_time=datetime.now(),
            sample_id="test",
            sample_rate=int(self.sample_rate),
            sequencing_kit=seq_kit,
            sequencer_position="",
            sequencer_position_type="",
            software="",
            system_name="",
            system_type="",
            tracking_id={},
        )

    def close(self):
        if self._writer is None:
            return
        self._writer.close()
        self._writer = None
