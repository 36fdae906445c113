"""BASELINE config 5: sustained coverage-mode run at genome scale.

"Human-scale reference at 30x coverage across a v5e slice, streaming
BLOW5" (BASELINE.json configs[4]; VERDICT r4 next #3). Builds a synthetic
multi-contig genome with human-like dirt (reusing
profile_genome_scale.build_genome), runs the REAL predict pipeline in
coverage mode (-c) streaming BLOW5 to disk, and reports sustained
MSamples/s, peak RSS, output size, and the stage-timer split.

Run from the repo root on hardware:
    python scripts/profiling/profile_scale_run.py \
        [--size-mb 100] [--coverage 30] [--read-len 5000] [--batch 2048]

The multi-chip path at this scale is validated separately on the
8-virtual-device CPU mesh (tiny genome; --virtual-8) — the real chip here
is single; the sharded predict path is the same code
(runtime/predict.make_predict_fn_sharded) either way.
"""

import argparse
import json
import os
import resource
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size-mb", type=int, default=100)
    ap.add_argument("--coverage", type=float, default=30.0)
    ap.add_argument("--read-len", type=int, default=5000)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--out", default=None, help="BLOW5 path (default: tmp)")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--virtual-8", action="store_true",
                    help="8-virtual-CPU-device dp mesh, tiny genome")
    args = ap.parse_args()

    if args.virtual_8:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        )
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.size_mb = 0  # sentinel: build a 1 Mb genome below
        args.coverage = min(args.coverage, 0.2)
        args.read_len = min(args.read_len, 2000)
        args.batch = 256

    os.environ.setdefault("SEQ2SQUIGGLE_TPU_TIMERS", "1")

    from scripts.profiling.profile_genome_scale import build_genome
    from seq2squiggle_tpu.utils import (enable_compile_cache, set_seeds,
                                        setup_logging)

    enable_compile_cache()
    setup_logging("info")
    set_seeds(42)

    from seq2squiggle_tpu.config import load_config
    from seq2squiggle_tpu.runtime.simulate import simulate_run

    cfg = load_config(None)

    workdir = tempfile.mkdtemp(prefix="scale_run_")
    genome = os.path.join(workdir, "genome.fasta")
    size_mb = args.size_mb or 1
    print(f"building {size_mb} Mb genome ...", flush=True)
    if args.size_mb:
        build_genome(genome, args.size_mb)
    else:  # tiny virtual-8 genome: one contig, simple repeat-free ACGT
        import numpy as np

        rng = np.random.default_rng(0)
        with open(genome, "w") as fh:
            fh.write(">c0\n")
            fh.write("".join(rng.choice(list("ACGT"), 1_000_000)) + "\n")

    out = args.out or os.path.join(workdir, "coverage.blow5")
    weights = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "..", "assets", "bench-weights-R10.npz")

    t0 = time.perf_counter()
    stats = simulate_run(
        config=dict(cfg), saved_weights=weights, fasta=genome,
        read_input=False, n=-1, r=args.read_len, c=args.coverage, out=out,
        profile="dna-r10-prom", dwell_mean=None, dwell_std=0.0,
        noise_std=2.0, noise_sampling=True, duration_sampling=True,
        distr="expon", predict_batch_size=args.batch,
        export_every_n_samples=65_536, seed=42, show_progress=True,
    )
    wall = time.perf_counter() - t0

    peak_rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    out_bytes = os.path.getsize(out)
    rec = {
        "genome_mb": size_mb,
        "coverage": args.coverage,
        "read_len": args.read_len,
        "reads": stats["reads"],
        "samples": stats["samples"],
        "wall_s": round(wall, 1),
        "msamples_per_s": round(stats["samples"] / stats["seconds"] / 1e6, 2),
        "blow5_gb": round(out_bytes / 1e9, 2),
        "peak_rss_gb": round(peak_rss_gb, 2),
        "timers": stats.get("timers"),
    }
    print("SCALE_RUN " + json.dumps(rec), flush=True)
    if not args.keep and not args.out:
        os.remove(out)


if __name__ == "__main__":
    main()
