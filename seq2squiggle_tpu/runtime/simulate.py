"""Inference orchestration: the `predict` pipeline.

Equivalent of the reference inference_run (src/seq2squiggle/inference.py:
270-427), restructured around the TPU inner loop: resolve chemistry profile
and knobs, load weights, stream reads -> chunk batches -> jitted device step
-> streaming BLOW5/SLOW5/POD5 export. Host work for batch N
overlaps device compute for batch N+1 via JAX async dispatch.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Optional

import jax
import numpy as np

from ..config import check_model_config
from ..models.fft_model import count_params, init_params
from ..models.torch_import import load_checkpoint
from ..io.reads import get_reads
from ..io.writers import BLOW5Writer, POD5Writer
from ..profiles import get_profile, update_config_for_profile, update_profile
from .batcher import iter_batches
from .exporter import StreamingExporter
from .predict import PredictKnobs, make_predict_fn, make_predict_fn_sharded

logger = logging.getLogger("seq2squiggle_tpu")


def get_writer(out, profile_dict, ideal_mode, export_every_n_samples,
               profile_name, preserve_read_ids, rng, slow5_press="zstd"):
    """Choose the writer by extension (reference: inference.py:30-82)."""
    out = str(out)
    out_dir = os.path.dirname(out)
    if out_dir and not os.path.exists(out_dir):
        os.makedirs(out_dir, exist_ok=True)
    if os.path.exists(out):
        logger.warning(f"Output file {out} already exists. File will be deleted.")
        os.remove(out)

    if out.endswith((".blow5", ".slow5")):
        writer = BLOW5Writer(
            out, profile_dict, ideal_mode, profile_name, preserve_read_ids,
            rng, slow5_press=slow5_press,
        )
        return writer, export_every_n_samples
    if out.endswith(".pod5"):
        # POD5 streams too (io/pod5_native.Pod5NativeWriter writes signal
        # record batches incrementally), unlike the reference's buffer-all
        # pod5 pass (inference.py:72-79) — same flush cadence as BLOW5.
        writer = POD5Writer(
            out, profile_dict, ideal_mode, profile_name, preserve_read_ids, rng
        )
        return writer, export_every_n_samples
    raise ValueError("Output file must have .pod5, .slow5, or .blow5 extension.")


def resolve_weights(saved_weights: Optional[str], config: dict, seed: int,
                    profile_name: str = "dna-r10-prom"):
    """Load checkpoint params, or initialise fresh ones for --model random.

    With no --model, resolve pretrained weights like the reference
    (inference.py:85-221): local cache first, then the upstream GitHub
    releases (profile-keyword matched).
    """
    if saved_weights is None:
        from ..io.weights import resolve_pretrained

        logger.info("Weights file path is not provided.")
        return load_checkpoint(resolve_pretrained(profile_name))
    if str(saved_weights) == "random":
        logger.warning("Using randomly initialised weights (--model random).")
        params = init_params(config, jax.random.key(seed))
        return params, dict(config)
    return load_checkpoint(str(saved_weights))


def simulate_run(
    *,
    config: dict,
    saved_weights: Optional[str],
    fasta: str,
    read_input: bool,
    n: int,
    r: int,
    c: int,
    out: str,
    profile: str,
    dwell_mean: Optional[float],
    dwell_std: float,
    noise_std: float,
    noise_sampling: bool,
    duration_sampling: bool,
    distr: str,
    predict_batch_size: int,
    export_every_n_samples: int,
    sample_rate: Optional[int] = None,
    bps: Optional[int] = None,
    digitisation: Optional[int] = None,
    range_val: Optional[float] = None,
    offset_mean: Optional[float] = None,
    offset_std: Optional[float] = None,
    median_before_mean: Optional[float] = None,
    median_before_std: Optional[float] = None,
    min_noise: float = 0.0,
    min_duration: int = 3,
    min_read_len: int = 30,
    preserve_read_ids: bool = False,
    seed: int = 42,
    show_progress: bool = True,
    num_shards: int = 1,
    shard_index: int = 0,
    trace_dir: Optional[str] = None,
    wire_format: str = "auto",
    slow5_press: str = "zstd",
) -> dict:
    """Run the simulation; returns a stats dict (reads, samples, seconds).

    trace_dir enables a jax.profiler trace of the whole loop (device + host
    timelines, viewable in XProf/TensorBoard) — profiling support the
    reference lacks entirely (SURVEY section 5)."""
    from ..utils import tune_host_allocator

    tune_host_allocator()  # before the pipeline threads spawn
    profile_dict = get_profile(profile)
    profile_dict = update_profile(
        profile_dict,
        sample_rate=sample_rate,
        bps=bps,
        digitisation=digitisation,
        range=range_val,
        offset_mean=offset_mean,
        offset_std=offset_std,
        median_before_mean=median_before_mean,
        median_before_std=median_before_std,
    )
    if dwell_mean is None:
        dwell_mean = profile_dict["sample_rate"] / profile_dict["bps"]
    config = update_config_for_profile(profile, config)
    ideal_mode = not (duration_sampling or dwell_std > 0)

    writer_rng = np.random.default_rng(seed)
    writer, export_every_n_samples = get_writer(
        out, profile_dict, ideal_mode, export_every_n_samples, profile,
        preserve_read_ids, writer_rng, slow5_press=slow5_press,
    )

    params, ckpt_config = resolve_weights(saved_weights, config, seed, profile)
    check_model_config(ckpt_config, config)
    logger.info(f"Model parameters: {count_params(params):,}")

    knobs = PredictKnobs(
        dwell_mean=float(dwell_mean),
        dwell_std=float(dwell_std),
        noise_std=float(noise_std),
        noise_sampling=bool(noise_sampling),
        duration_sampling=bool(duration_sampling),
        min_noise=float(min_noise),
        min_duration=int(min_duration),
        scaling_max_value=float(config["scaling_max_value"]),
        digitisation=float(profile_dict["digitisation"]),
        signal_range=float(profile_dict["range"]),
        offset_mean=float(profile_dict["offset_mean"]),
        # Start at the narrowest wire tier; drain() downgrades
        # 2 -> 4 -> 8 -> 12 -> 16 on repeated exception overflow
        # (recomputing the affected batch raw), so every run self-selects
        # the narrowest faithful format for its weights/noise scale (see
        # PredictKnobs.wire_bits). Tier 2 ("ulp") ships raw bf16 event
        # levels + 2-bit ULP deltas and regenerates the noise host-side
        # from the same threefry keys - deterministic, sharding-invariant,
        # and BIT-IDENTICAL to the raw tier for noise-free runs (noisy
        # samples may differ by 1 ADC count from sigma quantisation).
        # Tier 4 ("event") is its 4-bit fallback with integer-count
        # levels. --wire-format pins the starting tier ("8" gives the
        # narrowest unconditionally bit-lossless one).
        wire_bits={"auto": 2, "ulp": 2, "event": 4, "8": 8, "12": 12,
                   "raw": 16}[str(wire_format)],
    )
    T_frames = int(config["max_signal_len"])
    if knobs.wire_bits == 2 and not (
        T_frames <= 255 and config.get("compute_dtype") == "bfloat16"
    ):
        logger.info("ULP wire tier needs bfloat16 compute and < 256 frames; "
                    "starting at the 4-bit event tier instead.")
        knobs = dataclasses.replace(knobs, wire_bits=4)
    if knobs.wire_bits == 4 and not (T_frames % 2 == 0 and T_frames <= 255):
        logger.info("Event wire tier needs an even frame budget < 256; "
                    "starting at 8-bit deltas instead.")
        knobs = dataclasses.replace(knobs, wire_bits=8)
    # Device-level data parallelism: with multiple local chips, shard the
    # chunk batch over a 1-D 'dp' mesh (replicated params, zero inner-loop
    # collectives). Output is bit-identical to single-chip execution thanks
    # to the read-index-derived RNG keys.
    devices = jax.devices()
    device_dp = len(devices) > 1 and predict_batch_size % len(devices) == 0
    if device_dp:
        from ..parallel.mesh import batch_sharding, make_mesh, replicated

        mesh = make_mesh(n_dp=len(devices), n_tp=1)
        logger.info(f"Data-parallel prediction over {len(devices)} devices")
        predict_fn = make_predict_fn_sharded(config, knobs, mesh, framed=True)
        _batch_sharding = batch_sharding(mesh)
        _param_sharding = replicated(mesh)
    else:
        predict_fn = make_predict_fn(config, knobs, framed=True)
    base_key = jax.random.key(seed)

    reads, total_chunks = get_reads(
        fasta, read_input, n, r, c, config, distr, seed, profile, min_read_len
    )

    # Round-robin read sharding for multi-process / multi-host operation.
    # RNG keys derive from GLOBAL read indices, so every read's signal is
    # identical no matter how many shards simulate the set (zero cross-shard
    # communication; each shard writes its own output file).
    read_idx_start, read_idx_step = 0, 1
    if num_shards > 1:
        if not (0 <= shard_index < num_shards):
            raise ValueError("shard_index must be in [0, num_shards)")
        _all = reads

        def _sharded():
            for i, item in enumerate(_all):
                if i % num_shards == shard_index:
                    yield item

        reads = _sharded()
        total_chunks = total_chunks // num_shards
        read_idx_start, read_idx_step = shard_index, num_shards
        # Writers number reads by GLOBAL index so indexed UUIDs and
        # read_numbers never collide when shard files are merged.
        writer.read_index_start = read_idx_start
        writer.read_index_step = read_idx_step

    device = _batch_sharding if device_dp else devices[0]
    params = jax.device_put(params, _param_sharding if device_dp else device)

    # Streaming writers (BLOW5/SLOW5) get a background export thread so
    # record encode/compress/write overlaps device compute and D2H; POD5
    # buffers until finalize anyway, so a thread would add nothing.
    if export_every_n_samples != float("inf"):
        from .async_writer import AsyncWriter

        writer = AsyncWriter(writer)
    exporter = StreamingExporter(writer, export_every_n_samples)

    progress = None
    if show_progress:
        try:
            from tqdm import tqdm

            progress = tqdm(total=total_chunks, unit="chunk", smoothing=0.05)
        except ImportError:  # pragma: no cover
            progress = None

    if trace_dir:
        jax.profiler.start_trace(trace_dir)

    t0 = time.perf_counter()
    t0_proc = time.process_time()
    # In-flight batches awaiting host processing. The fetch + wire decode +
    # export run on a dedicated drain thread: fetching is a network wait
    # (GIL released), so the decode of batch N overlaps the transfer of
    # batch N+1 even on this 1-core host. The bounded queue caps in-flight
    # device memory (~3 MB/batch) and applies back-pressure. Depth 12:
    # deep enough that a BURSTY stall (scheduling delay under host
    # contention, a slow tunnel window) drains from buffered work instead
    # of convoying the whole pipeline — under a synthetic 50%-duty bursty
    # load the 10k bench measured 5.45/5.55 s with depth 12/6/8
    # (drain/h2d/writer) vs 5.90/6.75 s with the old 6/3/4, isolated wall
    # unchanged; steady contention is unaffected either way (the core
    # simply isn't there). In-flight memory stays ~6 MB of wire buffers.
    pipeline_depth = 12

    # (predict_fn, knobs) swap as ONE tuple: the decode thread's _downgrade
    # replaces both together, and the dispatch loop reads both from a single
    # reference — a framed buffer is always tagged with the wire_bits of the
    # fn that produced it (a split read could pair the old tier's buffer
    # with the new tier's bits and mis-decode).
    state = {"active": (predict_fn, knobs), "raw_fn": None}

    def dataclasses_replace_wire(k, bits=16):
        return dataclasses.replace(k, wire_bits=bits)

    def build_predict_fn(k):
        """Rebuild the (possibly device-sharded) predict fn for knobs k."""
        if device_dp:
            return make_predict_fn_sharded(config, k, mesh, framed=True)
        return make_predict_fn(config, k, framed=True)

    def _raw_recompute(batch):
        """Re-run one batch with the raw (unpacked) wire format."""
        if state["raw_fn"] is None:
            state["raw_fn"] = build_predict_fn(dataclasses_replace_wire(knobs))
        return state["raw_fn"](
            params,
            jax.device_put(batch.codes, device),
            jax.device_put(batch.read_idx, device),
            jax.device_put(batch.chunk_off, device),
            base_key,
            jax.device_put(batch.n_kmers, device),
        )

    # Stage timers (SEQ2SQUIGGLE_TPU_TIMERS=1): where does the wall go?
    timers = {"d2h_wait": 0.0, "decode": 0.0, "export": 0.0, "dispatch": 0.0}
    d2h_waits: list = []
    timing = bool(os.environ.get("SEQ2SQUIGGLE_TPU_TIMERS"))

    T_row = int(config["max_signal_len"])
    K_row = int(config["max_dna_len"])

    # A packed tier that can't hold one batch costs ONE raw recompute of
    # that batch; permanently stepping the whole run down a tier costs
    # wider rows for every remaining batch over the measured D2H
    # bottleneck (plus a mid-run recompile). A single overflowing row in
    # millions (observed: 1 row in 3M at 50k reads) must not do the
    # latter, so the tier only downgrades once several batches overflow —
    # that's the signature of a weights/noise regime the tier genuinely
    # can't encode (e.g. 15 pA noise under int8 deltas).
    _DOWNGRADE_AFTER = 4  # overflowing batches tolerated per tier
    overflow_counts = {2: 0, 4: 0, 8: 0, 12: 0}

    def _downgrade(exc, bits, batch):
        """Recompute one batch raw; downgrade the tier if overflows recur."""
        from .wire import unframe_wire

        raw_buf = np.asarray(_raw_recompute(batch))
        _, cur_knobs = state["active"]
        if bits == cur_knobs.wire_bits:
            overflow_counts[bits] += 1
            if overflow_counts[bits] < _DOWNGRADE_AFTER:
                logger.warning(
                    f"{exc} — recomputed this batch raw "
                    f"({overflow_counts[bits]}/{_DOWNGRADE_AFTER} "
                    f"overflows before the {bits}-bit tier downgrades)."
                )
            else:
                next_bits = {2: 4, 4: 8, 8: 12, 12: 16}[bits]
                tier_name = {4: "the 4-bit event tier", 8: "8-bit deltas",
                             12: "12-bit deltas", 16: "raw int16"}[next_bits]
                logger.warning(
                    f"{exc} — downgrading wire format to {tier_name}."
                )
                new_knobs = dataclasses_replace_wire(cur_knobs, next_bits)
                new_fn = (
                    state["raw_fn"] if next_bits == 16
                    else build_predict_fn(new_knobs)
                )
                state["active"] = (new_fn, new_knobs)
        return unframe_wire(raw_buf, 16, T_row, K_row)

    def _probe_ulp_budgets(arrs):
        """First-batch escape-budget probe (runs once, ~1 ms): if any of
        the ULP tier's batch-flat budgets has < 8 sigma of Poisson
        headroom at this model's measured escape rate, step down to the
        4-bit event tier NOW — one proactive recompile instead of
        repeated overflow -> raw-recompute churn later. A mean-usage
        threshold would be wrong: the R9 demo runs at 81% of the escape
        budget with 40+ sigma of headroom (batch-flat buffers only care
        about the batch TOTAL). Under dp>1 each shard packs its own flat
        buffers with its own caps, so usage is judged per shard (the
        worst shard), not whole-batch — a shard-imbalanced batch can
        overflow one shard while the batch mean looks roomy."""
        from .predict import WIRE_ESC_NIB_PER_ROW

        stream, _, lvl_d, _, _, esc = arrs[:6]
        B_rows = stream.shape[0]
        dp = len(devices) if device_dp else 1
        B_shard = B_rows // dp
        byte_vals = np.arange(256, dtype=np.uint16)
        esc_lut = sum(
            (((byte_vals >> (2 * j)) & 3) == 3).astype(np.uint8)
            for j in range(4)
        )

        def worst(mask):  # max per-dp-shard count (rows are shard-major)
            return int(mask.reshape(dp, -1).sum(axis=1).max())

        usage = [
            (worst(esc_lut[stream].astype(np.int64)),
             B_shard * WIRE_ESC_NIB_PER_ROW, "escape"),
            # nibble 8 marks wides; unused esc slots are 0, never 8
            (worst(((esc & 0xF) == 8).astype(np.int64)
                   + ((esc >> 4) == 8)),
             max(B_shard // 4, 1), "wide-jump"),
            (worst(lvl_d == np.int8(-127)), B_shard, "level-escape"),
        ]
        for n, cap, name in usage:
            if n + 8.0 * np.sqrt(n) > cap:
                fn_cur, knobs_cur = state["active"]
                if knobs_cur.wire_bits != 2:
                    return
                logger.info(
                    f"ULP-tier probe: batch 0's worst shard used "
                    f"{n}/{cap} {name} slots "
                    "(< 8 sigma headroom); switching to the 4-bit event "
                    "tier proactively."
                )
                new_knobs = dataclasses_replace_wire(knobs_cur, 4)
                state["active"] = (build_predict_fn(new_knobs), new_knobs)
                return

    def drain(entry):
        buf, batch, bits = entry
        segments = batch.segments
        t = time.perf_counter()
        t_cpu = time.thread_time()
        from .wire import unframe_wire, unpack_wire

        flat = signal_np = counts_np = None
        arrs = unframe_wire(buf, bits, T_row, K_row)
        if bits == 2 and not state.get("ulp_probed"):
            state["ulp_probed"] = True
            _probe_ulp_budgets(arrs)
        if bits in (2, 4):  # event tiers: host-side noise regeneration
            if state.get("event_decoder", {}).get(bits) is None:
                from .wire import EventWireDecoder

                state.setdefault("event_decoder", {})[bits] = (
                    EventWireDecoder(
                        dataclasses_replace_wire(knobs, bits), base_key,
                        frames=T_row,
                        dp_shards=len(devices) if device_dp else 1,
                    )
                )
            try:
                flat, counts_np = state["event_decoder"][bits](
                    arrs, batch.read_idx, batch.chunk_off
                )
            except RuntimeError as exc:
                signal_np, counts_np = _downgrade(exc, bits, batch)
        elif bits in (8, 12):  # packed delta wire format
            lo, exc_pos, exc_val, n_exc, counts_np = arrs
            try:
                signal_np = unpack_wire(lo, exc_pos, exc_val, n_exc, bits=bits)
            except RuntimeError as exc:
                # The current tier can't hold this weights/noise regime's
                # deltas: recompute this batch raw and downgrade the run's
                # wire format one tier. Already-dispatched batches decode
                # with the tier recorded at dispatch time.
                signal_np, counts_np = _downgrade(exc, bits, batch)
        else:
            signal_np, counts_np = arrs
        if timing:
            dt = time.perf_counter() - t
            # thread_time = this thread's actual CPU seconds: on the 1-core
            # host the wall numbers inflate under contention, so the CPU
            # split is what says where the core really goes.
            timers["decode_cpu"] = (timers.get("decode_cpu", 0.0)
                                    + time.thread_time() - t_cpu)
            timers["decode"] += dt
            timers[f"decode_t{bits}"] = timers.get(f"decode_t{bits}", 0.0) + dt
            timers[f"n_t{bits}"] = timers.get(f"n_t{bits}", 0) + 1
            t = time.perf_counter()
            t_cpu = time.thread_time()
        if flat is not None:
            exporter.add_flat(flat, counts_np, segments)
        else:
            exporter.add_batch(signal_np, counts_np, segments)
        if timing:
            timers["export"] += time.perf_counter() - t
            timers["export_cpu"] = (timers.get("export_cpu", 0.0)
                                    + time.thread_time() - t_cpu)
        if progress is not None:
            progress.update(sum(s.n_rows for s in segments))

    import queue
    import threading

    # Two-stage drain pipeline: the fetch worker blocks on the device->host
    # transfer (a network wait on a tunneled chip - GIL released, ~no CPU),
    # while the decode worker does the CPU work (wire decode, noise
    # regeneration, export). On a 1-core host these genuinely overlap:
    # measured 13 s transfer + 13 s decode serialized on one thread, ~max of
    # the two when split.
    drain_queue: "queue.Queue" = queue.Queue(maxsize=pipeline_depth)
    decode_queue: "queue.Queue" = queue.Queue(maxsize=pipeline_depth)
    drain_err: list = []

    def _fetch_worker():
        while True:
            item = drain_queue.get()
            try:
                if item is None:
                    decode_queue.put(None)
                    return
                if not drain_err:
                    outs, batch, bits = item
                    t = time.perf_counter()
                    buf = np.asarray(outs)
                    if timing:
                        dt = time.perf_counter() - t
                        timers["d2h_wait"] += dt
                        d2h_waits.append(dt)
                    decode_queue.put((buf, batch, bits))
            except BaseException as exc:  # re-raised on the main thread
                drain_err.append(exc)
                decode_queue.put(None)
            finally:
                drain_queue.task_done()

    def _decode_worker():
        while True:
            item = decode_queue.get()
            try:
                if item is None:
                    return
                if not drain_err:
                    drain(item)
            except BaseException as exc:
                drain_err.append(exc)
            finally:
                decode_queue.task_done()

    fetch_thread = threading.Thread(
        target=_fetch_worker, name="seq2squiggle-fetch", daemon=True
    )
    decode_thread = threading.Thread(
        target=_decode_worker, name="seq2squiggle-decode", daemon=True
    )
    fetch_thread.start()
    decode_thread.start()

    # H2D producer thread: batch prep (read sampling, windowed base codes)
    # and the host->device transfers run ahead of the dispatch loop on a
    # bounded queue, so neither sits on the critical path between device
    # dispatches. device_put is thread-safe and async; the queue depth
    # caps in-flight device input memory (~50 KB/batch of windowed codes).
    # Depth 6 lets prep run ahead through other stages' CPU bursts on the
    # 1-core host (same convoy rationale as pipeline_depth above).
    h2d_queue: "queue.Queue" = queue.Queue(maxsize=6)
    h2d_err: list = []

    def _h2d_producer():
        try:
            t_cpu0 = time.thread_time()
            for batch in iter_batches(
                reads, predict_batch_size, config["seq_kmer"],
                config["max_dna_len"],
                read_idx_start=read_idx_start, read_idx_step=read_idx_step,
            ):
                h2d_queue.put((
                    batch,
                    jax.device_put(batch.codes, device),
                    jax.device_put(batch.read_idx, device),
                    jax.device_put(batch.chunk_off, device),
                    jax.device_put(batch.n_kmers, device),
                ))
            if timing:
                # includes queue-put blocking (no CPU) only in wall terms;
                # thread_time is pure batch-prep + device_put CPU
                timers["h2d_cpu"] = time.thread_time() - t_cpu0
        except BaseException as exc:  # re-raised on the main thread
            h2d_err.append(exc)
        finally:
            h2d_queue.put(None)

    h2d_thread = threading.Thread(
        target=_h2d_producer, name="seq2squiggle-h2d", daemon=True
    )
    h2d_thread.start()

    first_batch = True
    t_loop0 = time.perf_counter()
    t_loop0_cpu = time.thread_time()
    while True:
        item = h2d_queue.get()
        if item is None:
            break
        batch, codes_dev, ridx_dev, coff_dev, nk_dev = item
        fn, knobs_now = state["active"]
        if first_batch and config.get("use_pallas", "auto") == "auto":
            # Fused-kernel support varies by backend; step down rather than
            # failing the run: two-block pair -> packed attention ->
            # per-head-loop Pallas -> pure XLA blocks.
            def _attempt(f):
                o = f(params, codes_dev, ridx_dev, coff_dev, base_key, nk_dev)
                jax.block_until_ready(o)
                return o

            outs = None
            try:
                outs = _attempt(fn)
            except Exception as exc:
                from ..models.fft_model import _pair_mode

                # Downgrade ladder, least to most drastic. Rungs only for
                # knobs in their 'auto' default (an explicit user setting
                # is respected: its failure falls through to XLA).
                ladder = []
                if _pair_mode(config) and config.get(
                        "pallas_pair", "auto") == "auto":
                    ladder.append(("pallas_pair", False,
                                   "Two-block fused kernel",
                                   "retrying with per-block kernels"))
                if config.get("pallas_packed", "auto") == "auto":
                    ladder.append(("pallas_packed", False,
                                   "Head-packed fused kernel",
                                   "retrying with the per-head-loop kernel"))
                ladder.append(("use_pallas", False, "Fused Pallas path",
                               "falling back to XLA blocks"))
                for key, val, name, action in ladder:
                    logger.warning(
                        f"{name} unavailable on this backend "
                        f"({type(exc).__name__}); {action}."
                    )
                    config = dict(config, **{key: val})
                    fn = build_predict_fn(knobs_now)
                    if key == "use_pallas":
                        # last rung: let a genuine failure propagate
                        state["active"] = (fn, knobs_now)
                        state["raw_fn"] = None
                        outs = _attempt(fn)
                        break
                    try:
                        outs = _attempt(fn)
                    except Exception as exc2:
                        exc = exc2
                        continue
                    state["active"] = (fn, knobs_now)
                    state["raw_fn"] = None
                    break
            first_batch = False
        else:
            outs = fn(params, codes_dev, ridx_dev, coff_dev, base_key, nk_dev)
        # Start the device->host copy now so it overlaps the NEXT batch's
        # compute (D2H over the interconnect is the measured bottleneck).
        outs.copy_to_host_async()
        if drain_err:
            raise drain_err[0]
        drain_queue.put((outs, batch, knobs_now.wire_bits))
    if timing:
        # dispatch-loop duration (batch prep + H2D run on their own thread)
        timers["dispatch"] = time.perf_counter() - t_loop0
        timers["dispatch_cpu"] = time.thread_time() - t_loop0_cpu
    h2d_thread.join()
    if h2d_err:
        raise h2d_err[0]
    drain_queue.put(None)
    fetch_thread.join()
    decode_thread.join()
    if drain_err:
        raise drain_err[0]

    t_fin = time.perf_counter()
    exporter.finalize()
    elapsed = time.perf_counter() - t0
    if trace_dir:
        jax.profiler.stop_trace()
        logger.info(f"Profiler trace written to {trace_dir}")
    if progress is not None:
        progress.close()

    if timing:
        timers["finalize"] = time.perf_counter() - t_fin
        # Whole-PROCESS CPU for the loop: our per-stage thread_time timers
        # miss CPU burned by runtime-internal threads (e.g. the backend
        # client's D2H deserialisation). process_cpu >> sum(stage _cpu)
        # means the core is going to those, not to this code.
        timers["process_cpu"] = time.process_time() - t0_proc
        for dec_bits, dec in state.get("event_decoder", {}).items():
            for k, v in dec.timers.items():
                timers[f"event{dec_bits}_{k}"] = v
        for k, v in getattr(writer, "timers", {}).items():
            timers[f"writer_{k}"] = v
        # nested BLOW5 batch-encode stage split (prep/native/file-write)
        inner = getattr(getattr(writer, "_writer", writer), "_file", None)
        for k, v in getattr(inner, "timers", {}).items():
            timers[f"slow5_{k}"] = v
        logger.warning(
            "stage timers: "
            + ", ".join(
                f"{k}={v}" if isinstance(v, int) else f"{k}={v:.2f}s"
                for k, v in timers.items()
            )
        )
        if d2h_waits:
            top = sorted(d2h_waits, reverse=True)[:5]
            logger.warning(
                f"d2h waits: n={len(d2h_waits)} "
                f"median={sorted(d2h_waits)[len(d2h_waits)//2]*1e3:.0f}ms "
                f"top5={[f'{x:.1f}s' for x in top]}"
            )

    stats = {
        "reads": exporter.total_reads,
        "chunks": exporter.total_chunks,
        "samples": exporter.total_samples,
        "seconds": elapsed,
        "ksamples_per_s": exporter.total_samples / elapsed / 1e3 if elapsed else 0.0,
    }
    if timing:
        # Machine-readable copy of the stage timers so callers (bench.py)
        # can report the compute-vs-transfer split, not just wall clock.
        stats["timers"] = {
            k: (v if isinstance(v, int) else round(v, 3))
            for k, v in timers.items()
        }
    logger.info(
        f"Simulated {stats['reads']} reads / {stats['samples']:,} samples in "
        f"{elapsed:.2f}s ({stats['ksamples_per_s']:.1f} kSamples/s)"
    )
    return stats
