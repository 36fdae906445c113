"""Headline benchmark: 10,000 lambda-phage reads -> BLOW5 on one chip.

BASELINE.json config 2: reference mode on example/lamda_genome.fasta,
-n 10000, default noise + duration samplers, BLOW5 out. North star:
< 60 s wall on one TPU v5e chip.

Prints ONE JSON line:
  {"metric": "ksamples_per_s_per_chip", "value": ..., "unit": "kSamples/s",
   "vs_baseline": <north-star wall-clock target / measured wall>}

vs_baseline > 1.0 means the 10k-read simulation beat the 60 s target (the
reference itself cannot run in this image - its pyslow5/pod5/pysam/lightning
wheels are absent - so the driver-defined target is the anchor).
"""

import json
import os
import sys
import tempfile
import time

N_READS = int(os.environ.get("BENCH_READS", 10_000))
# 2048-chunk batches halve the per-batch device round trips vs the CLI
# default of 1024 — significant over the network-tunneled chip.
BATCH = int(os.environ.get("BENCH_BATCH", 2048))
TARGET_SECONDS = 60.0


def main():
    from seq2squiggle_tpu.utils import enable_compile_cache, set_seeds, setup_logging

    enable_compile_cache()
    setup_logging("warning")

    from seq2squiggle_tpu.config import load_config
    from seq2squiggle_tpu.runtime.simulate import simulate_run

    cfg = load_config(None)  # bfloat16 compute
    set_seeds(42)

    # Use the committed trained checkpoint when present: an untrained model
    # emits ~94% exact zeros after the decoder ReLU, which the exporter
    # strips (reference semantics) — that would undercount the samples/s a
    # real simulation moves off-chip by >10x.
    weights = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "assets", "bench-weights-R10.npz")
    weights = weights if os.path.exists(weights) else "random"

    out = os.path.join(tempfile.mkdtemp(prefix="bench_"), "lambda_10k.blow5")

    # Warm-up: compile the inner loop on a few reads so the measured run is
    # steady-state (first XLA compile is excluded, as is standard).
    warm = dict(
        config=dict(cfg), saved_weights=weights,
        fasta="/root/reference/example/lamda_genome.fasta", read_input=False,
        n=64, r=1000, c=-1, out=out, profile="dna-r10-prom",
        dwell_mean=None, dwell_std=0.0, noise_std=2.0, noise_sampling=True,
        duration_sampling=True, distr="expon", predict_batch_size=BATCH,
        # Flush every ~64k chunks so BLOW5 encode/compress/write streams
        # through the AsyncWriter thread DURING the loop; one deferred
        # final flush was measured adding ~4s of dead single-core time.
        export_every_n_samples=65_536, seed=42, show_progress=False,
    )
    simulate_run(**warm)
    os.remove(out)

    t0 = time.perf_counter()
    stats = simulate_run(**{**warm, "n": N_READS})
    wall = time.perf_counter() - t0

    result = {
        "metric": "ksamples_per_s_per_chip",
        "value": round(stats["samples"] / stats["seconds"] / 1e3, 1),
        "unit": "kSamples/s",
        "vs_baseline": round(TARGET_SECONDS / wall, 3),
        "detail": {
            "reads": stats["reads"],
            "samples": stats["samples"],
            "inner_seconds": round(stats["seconds"], 2),
            "wall_seconds": round(wall, 2),
            "north_star": f"{N_READS} lambda reads -> BLOW5 < {TARGET_SECONDS}s",
            "blow5_bytes": os.path.getsize(out),
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
