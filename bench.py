"""Headline benchmark: 10,000 lambda-phage reads -> BLOW5 on one chip.

BASELINE.json config 2: reference mode on example/lamda_genome.fasta,
-n 10000, default noise + duration samplers, BLOW5 out. North star:
< 60 s wall on one TPU v5e chip AND >= 50x a CPU baseline.

Prints ONE JSON line:
  {"metric": "ksamples_per_s_per_chip", "value": ..., "unit": "kSamples/s",
   "vs_baseline": <north-star wall-clock target / median measured wall>}

The measured config runs BENCH_RUNS times (default 3) and the headline is
the MEDIAN: the tunneled chip's D2H bandwidth fluctuates ~2x between runs
(BASELINE.md), so single-sample walls are noise. detail.runs carries every
wall for the spread. detail.vs_cpu is the measured TPU/CPU throughput
ratio: a subprocess runs the identical simulate_run config on the JAX CPU
backend (BENCH_CPU_READS reads, default 32 - CPU is ~15 kSamples/s) and
the ratio quantifies the north star's ">= 50x CPU baseline" clause (the
reference itself cannot execute in this image - its pyslow5/pod5/pysam/
lightning wheels are absent - so our own CPU backend is the denominator).
Set BENCH_SKIP_CPU=1 to skip that phase.
"""

import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

N_READS = int(os.environ.get("BENCH_READS", 10_000))
# Large batches amortise the per-dispatch fixed costs (RPC serialisation,
# pytree flattening, device_put round trips) that dominate the 1-core
# host's dispatch/h2d threads. Measured (round 5, adjacent windows):
# B=2048 -> 5.99 s median; B=4096 -> 5.45/5.54 s (process CPU 4.09 ->
# 3.62 s), device ms/chunk unchanged; B=8192 -> 5.36/5.93 s (no further
# gain — the fixed costs are amortised by 4096 and the bigger D2H
# buffers bunch the tunnel transfers).
BATCH = int(os.environ.get("BENCH_BATCH", 4096))
N_RUNS = int(os.environ.get("BENCH_RUNS", 3))
N_CPU_READS = int(os.environ.get("BENCH_CPU_READS", 32))
# Backend-init retries: the tunneled backend's claim attempt blocks up to
# ~26 min before raising UNAVAILABLE during an outage (round 3 lost its
# bench to exactly this), so attempts are few but each is long, with
# backoff sleeps spreading them across the run window.
INIT_ATTEMPTS = int(os.environ.get("BENCH_INIT_ATTEMPTS", 3))
INIT_PROBE_TIMEOUT = int(os.environ.get("BENCH_INIT_PROBE_TIMEOUT", 2100))
TARGET_SECONDS = 60.0
LAST_GOOD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_LAST_GOOD.json")
# TPU v5e peak: 197 TFLOP/s bf16 per chip (the MFU denominator).
PEAK_FLOPS = float(os.environ.get("BENCH_PEAK_FLOPS", 197e12))


def _sys_busy_seconds():
    """Whole-SYSTEM busy CPU seconds since boot (/proc/stat line 1, all
    fields except idle+iowait), or None off-Linux. Sampled around each
    bench run: system busy minus our own process_time = CPU taken by
    other processes — the 1-core host's dominant wall inflator."""
    try:
        with open("/proc/stat") as f:
            vals = [int(v) for v in f.readline().split()[1:]]
        return (sum(vals) - vals[3] - vals[4]) / os.sysconf("SC_CLK_TCK")
    except (OSError, ValueError, IndexError):
        return None


def sim_kwargs(cfg, weights, out, batch):
    return dict(
        config=dict(cfg), saved_weights=weights,
        fasta="/root/reference/example/lamda_genome.fasta", read_input=False,
        n=64, r=1000, c=-1, out=out, profile="dna-r10-prom",
        dwell_mean=None, dwell_std=0.0, noise_std=2.0, noise_sampling=True,
        duration_sampling=True, distr="expon", predict_batch_size=batch,
        # Flush every ~64k chunks so BLOW5 encode/compress/write streams
        # through the AsyncWriter thread DURING the loop; one deferred
        # final flush was measured adding ~4s of dead single-core time.
        export_every_n_samples=65_536, seed=42, show_progress=False,
    )


def _weights():
    w = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "assets", "bench-weights-R10.npz")
    # Fall back to random weights only if the committed checkpoint is gone:
    # an untrained model emits ~94% exact zeros after the decoder ReLU,
    # which the exporter strips (reference semantics) — that would
    # undercount the samples/s a real simulation moves off-chip by >10x.
    return w if os.path.exists(w) else "random"


def _setup():
    from seq2squiggle_tpu.utils import (enable_compile_cache, set_seeds,
                                        setup_logging)

    enable_compile_cache()
    setup_logging("warning")

    from seq2squiggle_tpu.config import load_config

    cfg = load_config(None)  # bfloat16 compute
    set_seeds(42)
    return cfg


def cpu_denominator_main():
    """BENCH_MODE=cpu subprocess: same config on the JAX CPU backend."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    cfg = _setup()
    from seq2squiggle_tpu.runtime.simulate import simulate_run

    out = os.path.join(tempfile.mkdtemp(prefix="bench_cpu_"), "cpu.blow5")
    # CPU batches of 256 compile faster and run at the same samples/s
    warm = sim_kwargs(cfg, _weights(), out, batch=256)
    warm["n"] = 8
    simulate_run(**warm)
    os.remove(out)
    stats = simulate_run(**{**warm, "n": N_CPU_READS})
    print(json.dumps({
        "cpu_ksamples_per_s": round(stats["samples"] / stats["seconds"] / 1e3,
                                    2),
        "cpu_reads": stats["reads"],
    }))
    return 0


def measure_cpu_denominator():
    """Run the CPU-backend measurement in a subprocess (the parent process
    is already bound to the TPU backend; PYTHONPATH='' drops the
    sitecustomize that force-registers it)."""
    env = dict(os.environ, BENCH_MODE="cpu", PYTHONPATH="",
               JAX_PLATFORMS="cpu")
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=900,
        )
        line = proc.stdout.strip().splitlines()[-1]
        return json.loads(line)
    except (subprocess.SubprocessError, IndexError, ValueError,
            json.JSONDecodeError):
        return None


def attempt_real_weights():
    """Best-effort live released-weights attempt (VERDICT r3 missing #1):
    in whatever environment the bench runs, try to fetch the upstream
    R10 .ckpt via io/weights.py and import it. Runs in a SUBPROCESS with
    a hard timeout so a blackholed egress route cannot stall the bench;
    never fatal. The returned record lands in the bench JSON either as
    the imported checkpoint's identity (ckpt name + param count) or as
    the error that proves egress is impossible here — so every bench
    artifact states where the real-weights fidelity gap stands.
    Set BENCH_SKIP_REAL_WEIGHTS=1 to skip."""
    if os.environ.get("BENCH_SKIP_REAL_WEIGHTS"):
        return None
    script = (
        "import json\n"
        "import numpy as np\n"
        "rec = {}\n"
        "try:\n"
        "    from seq2squiggle_tpu.io.weights import resolve_pretrained\n"
        "    path = resolve_pretrained('dna-r10-prom')\n"
        "    rec['ckpt'] = path.rsplit('/', 1)[-1]\n"
        "    from seq2squiggle_tpu.models.torch_import import load_checkpoint\n"
        "    params, _ = load_checkpoint(path)\n"
        "    import jax\n"
        "    rec['params'] = int(sum(int(np.prod(np.shape(l)))\n"
        "        for l in jax.tree_util.tree_leaves(params)))\n"
        "    rec['status'] = 'imported'\n"
        "except Exception as exc:\n"
        "    rec['status'] = 'unavailable'\n"
        "    rec['error'] = f'{type(exc).__name__}: {exc}'[:2000]\n"
        "print('REAL_WEIGHTS ' + json.dumps(rec))\n"
    )
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    try:
        proc = subprocess.run(
            [sys.executable, "-c", script], env=env, capture_output=True,
            text=True, timeout=300, cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in proc.stdout.splitlines():
            if line.startswith("REAL_WEIGHTS "):
                return json.loads(line[len("REAL_WEIGHTS "):])
        tail = (proc.stderr or proc.stdout).strip().splitlines()
        return {"status": "unavailable",
                "error": (tail[-1][:300] if tail else f"rc={proc.returncode}")}
    except subprocess.TimeoutExpired:
        return {"status": "unavailable", "error": "timeout after 300s"}


def wait_for_backend():
    """Probe backend init in a SUBPROCESS with bounded exponential-backoff
    retries. A probe child that fails (or hangs past the claim-wait
    ceiling) leaves the parent's JAX state untouched, so a later attempt
    can still succeed in-process. Returns (ok, attempts, last_error)."""
    probe = ("import jax; d = jax.devices(); "
             "print('BENCH_PROBE_OK', len(d), d[0].platform)")
    last_error = None
    for attempt in range(1, INIT_ATTEMPTS + 1):
        try:
            proc = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True,
                text=True, timeout=INIT_PROBE_TIMEOUT,
            )
            if proc.returncode == 0 and "BENCH_PROBE_OK" in proc.stdout:
                return True, attempt, None
            tail = (proc.stderr or proc.stdout).strip().splitlines()
            last_error = tail[-1][:400] if tail else f"rc={proc.returncode}"
        except subprocess.TimeoutExpired:
            last_error = f"probe timeout after {INIT_PROBE_TIMEOUT}s"
        if attempt < INIT_ATTEMPTS:
            time.sleep(min(60 * 2 ** (attempt - 1), 300))
    return False, INIT_ATTEMPTS, last_error


def emit_failure(error, attempts, partial=None):
    """The bench must NEVER exit nonzero on a backend outage: emit a JSON
    record carrying the error, the attempt count, and the last good
    driver-comparable result so the round still has an artifact."""
    last_good = None
    try:
        with open(LAST_GOOD) as fh:
            last_good = json.load(fh)
    except (OSError, json.JSONDecodeError):
        pass
    record = {
        "metric": "ksamples_per_s_per_chip",
        "value": None,
        "unit": "kSamples/s",
        "vs_baseline": None,
        "error": str(error)[:800],
        "attempts": attempts,
        "last_good": last_good,
    }
    if partial:
        record["partial"] = partial
    # CPU-only egress probe still runs during an outage: the artifact
    # should carry the real-weights record regardless of TPU health.
    real_weights = attempt_real_weights()
    if real_weights:
        record["real_weights"] = real_weights
    print(json.dumps(record))
    return 0


def _analytic_flops(config):
    """Model FLOPs per chunk of the predict program (2·MACs, static
    shapes). Counts the useful work — matmuls of encoder/decoder blocks
    (head-loop attention semantics), regulator einsum, duration/noise
    heads — and ignores elementwise ops, so the MFU line is a stable
    lower bound comparable across kernel variants."""
    D = int(config["dmodel"])
    dff = int(config["dff"])
    Le = int(config["max_dna_len"])
    Lt = int(config["max_signal_len"])
    He = int(config["encoder_heads"])
    Hd = int(config["decoder_heads"])

    def block(L, H):
        qkv = 3 * 2 * L * D * D
        scores = 2 * H * L * L * (D // H)
        ctx = 2 * H * L * L * (D // H)
        den = 2 * H * L * L  # e @ 1 softmax denominator
        out = 2 * L * D * D
        ffn = 2 * 2 * L * D * dff
        return qkv + scores + ctx + den + out + ffn

    enc = int(config["encoder_layers"]) * block(Le, He)
    dec = int(config["decoder_layers"]) * block(Lt, Hd)
    heads = 2 * Le * D * 2 + 2 * Le * D  # duration(2) + noise(1) heads
    reg = 2 * Lt * (Le + 1) * D          # segment-map einsum expansion
    out_head = 2 * Lt * D
    return float(enc + dec + heads + reg + out_head)


def measure_device_compute(cfg, n_iters=32):
    """Steady-state ON-CHIP time of the jitted predict program, via the
    SLOPE method: wall(1 dispatch + 1-byte probe fetch) vs wall(n_iters
    dispatches + probe); per-batch = (t_n - t_1)/(n_iters - 1). The probe
    fetch is the only reliable sync on the tunneled backend
    (jax.block_until_ready is a no-op there and under-measures ~500x), and
    differencing cancels the fetch round trip. Reported as detail.device_*:
    what the device itself sustains, independent of the tunnel's D2H
    bandwidth and its ~2x fluctuation."""
    import jax

    from seq2squiggle_tpu.io.reads import get_reads
    from seq2squiggle_tpu.profiles import get_profile, update_config_for_profile
    from seq2squiggle_tpu.runtime.batcher import iter_batches
    from seq2squiggle_tpu.runtime.predict import PredictKnobs, make_predict_fn
    from seq2squiggle_tpu.runtime.simulate import resolve_weights

    profile = "dna-r10-prom"
    pd = get_profile(profile)
    config = update_config_for_profile(profile, cfg)
    params, _ = resolve_weights(_weights(), config, 42, profile)
    knobs = PredictKnobs(
        dwell_mean=pd["sample_rate"] / pd["bps"],
        scaling_max_value=float(config["scaling_max_value"]),
        digitisation=float(pd["digitisation"]),
        signal_range=float(pd["range"]),
        offset_mean=float(pd["offset_mean"]),
        wire_bits=2,  # the ULP tier the measured runs settle on
    )
    fn = make_predict_fn(config, knobs, framed=True)
    reads, _ = get_reads(
        "/root/reference/example/lamda_genome.fasta", False, 64, 1000, -1,
        config, "expon", 42, profile, 30,
    )
    batch = next(
        iter_batches(reads, BATCH, config["seq_kmer"], config["max_dna_len"])
    )
    import numpy as np

    dev = jax.devices()[0]
    args = (
        jax.device_put(params, dev),
        jax.device_put(batch.codes, dev),
        jax.device_put(batch.read_idx, dev),
        jax.device_put(batch.chunk_off, dev),
        jax.random.key(42),
        jax.device_put(batch.n_kmers, dev),
    )
    probe = jax.jit(lambda o: o[0, 0])
    np.asarray(probe(fn(*args)))  # compile + first-run

    def walled(m):
        t0 = time.perf_counter()
        out = None
        for _ in range(m):
            out = fn(*args)
        np.asarray(probe(out))  # 1-byte fetch: the real sync point
        return time.perf_counter() - t0

    slopes = []
    for _ in range(3):
        t1 = walled(1)
        tn = walled(n_iters)
        slopes.append((tn - t1) / (n_iters - 1))
    per_batch = statistics.median(slopes)
    out = {
        "device_batch_ms": round(per_batch * 1e3, 2),
        "device_kchunks_per_s": round(BATCH / per_batch / 1e3, 1),
    }
    # MFU line: FLOP count for the program over the slope-measured batch
    # time, against the chip's bf16 peak. Tracked per round so
    # utilization regressions are visible in the artifact (round 3 found
    # the hot matmuls using 8/128 MXU lanes only by hand-profiling).
    # Prefers XLA's own cost analysis; the axon AOT-compile backend
    # returns None from cost_analysis(), so fall back to the analytic
    # model-FLOP count (useful FLOPs at head-loop semantics — the MFU
    # convention; the packed kernel's replicated score FLOPs are not
    # "useful" work and would flatter the number).
    flops, src = 0.0, "xla"
    try:
        ca = fn.lower(*args).cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if ca:
            flops = float(ca.get("flops", 0.0))
    except Exception:
        pass
    if flops <= 0:
        flops, src = _analytic_flops(config) * BATCH, "analytic"
    if flops > 0:
        out["device_gflops_per_batch"] = round(flops / 1e9, 2)
        out["device_tflops_per_s"] = round(flops / per_batch / 1e12, 2)
        out["mfu_pct"] = round(flops / per_batch / PEAK_FLOPS * 100, 2)
        out["flops_source"] = src
    return out


def measure_train_step(cfg, batch_size=256, n_iters=17):
    """Steady-state ms/step of the production jitted train step (forward +
    three-term loss + grads + optimizer update), slope method — so the
    bench artifact also records TRAINING throughput per round. Synthetic
    preprocessed chunks, default model size, bf16 compute."""
    import jax
    import numpy as np

    from seq2squiggle_tpu.models.fft_model import init_params
    from seq2squiggle_tpu.train.loop import make_train_step
    from seq2squiggle_tpu.train.optimizers import build_optimizer

    config = dict(cfg, compute_dtype="bfloat16")
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    B, K, T = batch_size, int(config["max_dna_len"]), int(
        config["max_signal_len"])
    k5 = int(config["seq_kmer"]) * 5
    batch = {
        "chunks": jax.device_put(
            rng.integers(0, 2, (B, K, k5)).astype(np.float32), dev),
        "targets": jax.device_put(
            rng.standard_normal((B, T, 1)).astype(np.float32), dev),
        "chunks_lengths": jax.device_put(
            rng.integers(1, 30, (B, K)).astype(np.int32), dev),
        "stdevs": jax.device_put(
            np.abs(rng.standard_normal((B, K))).astype(np.float32), dev),
    }
    mask = jax.device_put(np.ones(B, np.float32), dev)
    key = jax.random.key(1)
    optimizer = build_optimizer(config, total_steps=10_000)
    step = make_train_step(config, optimizer)
    p = jax.device_put(init_params(config, jax.random.key(0)), dev)
    o = jax.device_put(optimizer.init(p), dev)

    def run(m, p, o):
        t0 = time.perf_counter()
        metrics = None
        for _ in range(m):
            p, o, metrics = step(p, o, batch, mask, key)
        np.asarray(metrics["total_loss"])  # 4-byte fetch = the sync
        return time.perf_counter() - t0, p, o

    _, p, o = run(1, p, o)  # compile
    slopes = []
    for _ in range(3):
        t1, p, o = run(1, p, o)
        tn, p, o = run(n_iters, p, o)
        slopes.append((tn - t1) / (n_iters - 1))
    ms = min(slopes) * 1e3
    return {"train_ms_per_step": round(ms, 2),
            "train_batch": B,
            "train_kchunks_per_s": round(B / ms, 1)}


def main():
    if os.environ.get("BENCH_MODE") == "cpu":
        return cpu_denominator_main()

    ok, attempts, err = wait_for_backend()
    if not ok:
        return emit_failure(f"TPU backend unavailable: {err}", attempts)

    cfg = _setup()
    from seq2squiggle_tpu.runtime.simulate import simulate_run

    # Stage timers ride the stats dict so the artifact carries the
    # compute-vs-transfer split (the round-3 "compute is 3 ms/batch"
    # error survived two rounds because the JSON only held wall clock).
    os.environ.setdefault("SEQ2SQUIGGLE_TPU_TIMERS", "1")
    out = os.path.join(tempfile.mkdtemp(prefix="bench_"), "lambda_10k.blow5")
    warm = sim_kwargs(cfg, _weights(), out, BATCH)

    runs = []
    try:
        # Warm-up: compile the inner loop on a few reads so the measured
        # runs are steady-state (first XLA compile is excluded, as is
        # standard).
        simulate_run(**warm)
        os.remove(out)

        for _ in range(max(N_RUNS, 1)):
            busy0, proc0 = _sys_busy_seconds(), time.process_time()
            t0 = time.perf_counter()
            stats = simulate_run(**{**warm, "n": N_READS})
            wall = time.perf_counter() - t0
            # CPU seconds burned by OTHER processes while this run was in
            # flight: the bench host has ONE core, so a co-running job
            # inflates the wall 2-3x (BASELINE.md round 5). Recording the
            # split makes a slow artifact self-attributing: high
            # host_other_cpu_s = contention, not a pipeline regression.
            busy1 = _sys_busy_seconds()
            if busy1 is not None and busy0 is not None:
                stats["host_other_cpu_s"] = round(
                    max(0.0, (busy1 - busy0)
                        - (time.process_time() - proc0)), 2)
            runs.append((wall, stats))
            blow5_bytes = os.path.getsize(out)
            os.remove(out)
    except Exception as exc:  # mid-run outage: keep what finished
        if not runs:
            return emit_failure(exc, attempts)
        partial = {"completed_runs": [round(w, 2) for w, _ in runs]}
        return emit_failure(f"died after {len(runs)} run(s): {exc}",
                            attempts, partial=partial)

    other = [s.get("host_other_cpu_s") for _, s in runs
             if s.get("host_other_cpu_s") is not None]
    if other and max(other) > 1.5:
        # The 1-core bench host inflates walls 1.5-2.6x under co-running
        # CPU load (BASELINE.md round 5); flag it so a slow headline is
        # read as contention, not a pipeline regression.
        print(f"bench: host contention detected — other processes burned "
              f"{max(other):.1f}s CPU during a measured run; walls are "
              f"inflated (run bench.py on an idle host)", file=sys.stderr)
    walls = sorted(w for w, _ in runs)
    med_wall, med_stats = sorted(runs, key=lambda r: r[0])[len(runs) // 2]
    ks = round(med_stats["samples"] / med_stats["seconds"] / 1e3, 1)

    detail = {
        "reads": med_stats["reads"],
        "samples": med_stats["samples"],
        "runs_wall_seconds": [round(w, 2) for w in walls],
        "median_wall_seconds": round(med_wall, 2),
        "spread_wall_seconds": round(walls[-1] - walls[0], 2),
        "north_star": f"{N_READS} lambda reads -> BLOW5 < {TARGET_SECONDS}s"
                      " and >= 50x CPU",
        "blow5_bytes": blow5_bytes,
    }
    if med_stats.get("timers"):
        # Compute-vs-transfer split for the median run. Stages overlap
        # (threads), so these are per-stage walls, not a partition.
        detail["stage_timers_s"] = med_stats["timers"]
    # EVERY run's timers, in run order (VERDICT r4 weak #5: a +18% outlier
    # run was unexplained because only the median run's timers survived).
    # per_run rows pair each wall with its stage split so an outlier's
    # cause — tunnel D2H phase, writer stall, decode contention — is
    # attributable from the artifact alone.
    per_run = []
    for wall, stats in runs:
        row = {"wall_s": round(wall, 2)}
        if stats.get("host_other_cpu_s") is not None:
            row["host_other_cpu_s"] = stats["host_other_cpu_s"]
        if stats.get("timers"):
            row["stage_timers_s"] = stats["timers"]
        per_run.append(row)
    if any("stage_timers_s" in r for r in per_run):
        detail["per_run"] = per_run
    if not os.environ.get("BENCH_SKIP_CPU"):
        cpu = measure_cpu_denominator()
        if cpu:
            detail["cpu_ksamples_per_s"] = cpu["cpu_ksamples_per_s"]
            detail["vs_cpu"] = round(ks / cpu["cpu_ksamples_per_s"], 1)
    real_weights = attempt_real_weights()
    if real_weights:
        detail["real_weights"] = real_weights
    if not os.environ.get("BENCH_SKIP_DEVICE"):
        try:
            dev = measure_device_compute(cfg)
            detail.update(dev)
            # Same per-chunk sample yield as the measured run: what the
            # compute path alone would sustain with a non-tunneled host.
            detail["device_ksamples_per_s"] = round(
                dev["device_kchunks_per_s"] * 1e3
                * med_stats["samples"] / med_stats["chunks"] / 1e3, 1,
            )
        except Exception:  # the probe must never sink the headline bench
            pass
    if not os.environ.get("BENCH_SKIP_TRAIN"):
        try:
            detail.update(measure_train_step(cfg))
        except Exception:  # same: never sink the headline
            pass

    result = {
        "metric": "ksamples_per_s_per_chip",
        "value": ks,
        "unit": "kSamples/s",
        "vs_baseline": round(TARGET_SECONDS / med_wall, 3),
        "detail": detail,
    }
    # Persist for emit_failure's last_good in a future outage round —
    # but only FULL runs: a probe run with skip flags or a non-default
    # read count would clobber the artifact with a partial record.
    is_full = (not os.environ.get("BENCH_SKIP_CPU")
               and not os.environ.get("BENCH_SKIP_DEVICE")
               and N_READS == 10_000 and N_RUNS >= 3)
    if is_full:
        try:
            import datetime

            with open(LAST_GOOD, "w") as fh:
                json.dump(
                    {**result,
                     "recorded_utc": datetime.datetime.now(
                         datetime.timezone.utc).isoformat(
                             timespec="seconds")},
                    fh)
        except OSError:
            pass
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
