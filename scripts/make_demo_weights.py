#!/usr/bin/env python
"""Regenerate the demo/bench checkpoints from synthetic eventalign data.

Round-1's synthetic events drew every sample from N(80, 10) — within-event
noise of 10 pA, ~4x anything a real pore produces — so the noise head of
the demo weights predicted ~15 pA stdevs and the packed int8 wire tier
could never engage. This script builds events whose statistics mirror real
nanopore data:

  - k-mer level: 85 pA + a per-(position, base) linear contribution
    (sum over the k positions, range roughly +-25 pA). Real pore models
    are approximately nearest-neighbour-additive, and a linear map of the
    one-hot features is exactly representable by the model's src_emb
    layer, so the tiny 220k-param model can actually fit it.
  - within-event noise: sigma in ~[1.2, 2.6] pA, also a per-(position,
    base) map (event_stdv column + the sample draws agree).
  - dwell: per-event sample counts from a Gamma around the profile dwell
    (mean ~12.5 for dna-r10-prom; ~10 for the R9 4kHz profiles), so the
    duration head learns realistic per-k-mer Gamma parameters.

Usage (runs on the default JAX backend — the tunneled TPU in this image;
set DEMO_WEIGHTS_CPU=1 to force the CPU backend):
    python scripts/make_demo_weights.py [R10|R9|both] [outdir]

Writes assets/bench-weights-R10.npz (k=9) and/or assets/bench-weights-R9.npz
(k=6), the checkpoints bench.py and the e2e demos load.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd


def _contrib_table(rng: np.random.Generator, k: int, scale: float) -> np.ndarray:
    """(k, 4) per-position-per-base additive contributions, zero-mean."""
    t = rng.normal(0.0, scale, (k, 4))
    return t - t.mean(axis=1, keepdims=True)


def make_events(n_events: int, k: int, dwell_mean: float, seed: int,
                read_len_events: int = 4000) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    base_idx = rng.integers(0, 4, (n_events, k))
    bases = np.array(list("ACGT"))
    level_tab = _contrib_table(rng, k, 25.0 / np.sqrt(k))
    sigma_tab = _contrib_table(rng, k, 0.25 / np.sqrt(k))
    dwell_tab = _contrib_table(rng, k, 2.0 / np.sqrt(k))

    pos = np.arange(k)
    levels = 85.0 + level_tab[pos, base_idx].sum(axis=1)
    sigmas = np.clip(1.9 + sigma_tab[pos, base_idx].sum(axis=1), 1.2, 2.6)
    dwell_mu = np.clip(dwell_mean + dwell_tab[pos, base_idx].sum(axis=1),
                       3.0, 40.0)
    # per-event integer dwell: Gamma(shape=4) around the k-mer mean
    dwell = np.maximum(
        1, np.round(rng.gamma(4.0, dwell_mu / 4.0)).astype(np.int64)
    )

    ends = np.cumsum(dwell)
    starts = ends - dwell
    flat = rng.normal(np.repeat(levels, dwell), np.repeat(sigmas, dwell))
    flat = np.round(np.maximum(flat, 0.0), 3)

    kmers = ["".join(row) for row in bases[base_idx]]
    sample_strs = [
        ",".join(map(str, flat[s:e])) for s, e in zip(starts, ends)
    ]
    n_reads = (n_events + read_len_events - 1) // read_len_events
    read_names = np.repeat(
        [f"read_{i}" for i in range(n_reads)], read_len_events
    )[:n_events]
    positions = np.tile(np.arange(read_len_events), n_reads)[:n_events]
    return pd.DataFrame(
        dict(
            read_name=read_names,
            position=positions,
            model_kmer=kmers,
            start_idx=starts,
            end_idx=ends,
            event_stdv=sigmas,
            samples=sample_strs,
        )
    )


def build(which: str, outdir: str):
    import jax

    if os.environ.get("DEMO_WEIGHTS_CPU"):
        jax.config.update("jax_platforms", "cpu")

    from seq2squiggle_tpu.utils import enable_compile_cache

    enable_compile_cache()

    from seq2squiggle_tpu.config import load_config
    from seq2squiggle_tpu.profiles import update_config_for_profile
    from seq2squiggle_tpu.train.preprocess import build_chunkset, save_chunkset
    from seq2squiggle_tpu.train.loop import train_run

    if which == "R10":
        profile, k, dwell, seed = "dna-r10-prom", 9, 12.5, 101
        out = os.path.join(outdir, "bench-weights-R10.npz")
    else:
        profile, k, dwell, seed = "dna-r9-prom", 6, 10.0, 202
        out = os.path.join(outdir, "bench-weights-R9.npz")

    cfg = load_config(None)
    cfg = update_config_for_profile(profile, cfg)
    assert cfg["seq_kmer"] == k
    # bfloat16 compute: the f32-fidelity path requests HIGHEST-precision
    # matmuls, which this environment's CPU backend emulates extremely
    # slowly; bf16 activations with f32 accumulation train the demo model
    # fine on CPU or the tunneled TPU.
    cfg["compute_dtype"] = "bfloat16"
    cfg["max_epochs"] = 20
    cfg["lr"] = 1e-3
    cfg["warmup_ratio"] = 0.05
    cfg["train_batch_size"] = 512
    cfg["max_chunks_valid"] = 2048

    import shutil
    import tempfile

    scratch = tempfile.mkdtemp(prefix=f"demo_weights_{which}_")
    npy_dir = os.path.join(scratch, "npy")
    os.makedirs(npy_dir, exist_ok=True)
    n_events_per_file = 16 * 4096  # 4096 chunks per file
    for i in range(4):
        df = make_events(n_events_per_file, k, dwell, seed + i)
        data = build_chunkset(df, cfg, rna=False, partition_by=False)
        save_chunkset(data, npy_dir, i)
        print(f"[{which}] wrote file {i}: {data['chunks'].shape[0]} chunks",
              flush=True)

    # Warm-start the softplus head biases near realistic magnitudes. A
    # fresh softplus head outputs ~0.69 (=softplus(0)) ~= 114 pA of noise;
    # descending to the true ~0.012 needs thousands of small-lr steps, far
    # more than a demo training run. Centering the output biases at the
    # data's global statistics (noise ~2 pA scaled, Gamma(conc~4,
    # rate~4/dwell)) lets the per-k-mer structure converge in a few
    # hundred steps. Weight VALUES are still learned from data.
    import jax

    from seq2squiggle_tpu.models.fft_model import init_params

    def inv_softplus(y: float) -> float:
        return float(np.log(np.expm1(y)))

    params0 = init_params(cfg, jax.random.key(seed))
    params0["noise_sampler"]["fc2"]["bias"] = np.full(
        1, inv_softplus(1.9 / 165.0), np.float32
    )
    params0["duration_sampler"]["conc"]["fc2"]["bias"] = np.full(
        1, inv_softplus(4.0), np.float32
    )
    params0["duration_sampler"]["rate"]["fc2"]["bias"] = np.full(
        1, inv_softplus(4.0 / dwell), np.float32
    )

    ckpt = os.path.join(scratch, "model.npz")
    metrics = train_run(
        train_dir=npy_dir, valid_dir=None, config=cfg, model_path=ckpt,
        save_valid_plots=False, seed=seed, init_params_override=params0,
    )
    os.makedirs(outdir, exist_ok=True)
    shutil.copyfile(ckpt, out)
    print(f"[{which}] final metrics: {metrics}", flush=True)
    print(f"[{which}] saved {out} (scratch: {scratch})", flush=True)


if __name__ == "__main__":
    which_arg = sys.argv[1] if len(sys.argv) > 1 else "both"
    outdir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets"
    )
    for w in (["R10", "R9"] if which_arg == "both" else [which_arg]):
        build(w, outdir)
