"""Cumulative-stage device timing of the predict step (slope method).

Builds the real bench batch (B=2048 lambda chunks, trained weights), then
times jitted CUMULATIVE truncations of predict_step:

  enc      one-hot + encoder (2 fused blocks @ L=16)
  +heads   noise head + duration Gamma sampling (threefry)
  +reg     segment map + length-regulator expansion to (B, 250, 64)
  +dec     decoder (2 fused blocks @ L=250 + out head)
  full     the production framed ULP-tier step (pack + frame included)

Per-batch device time uses the slope method ((t_N - t_1)/(N-1) around a
1-byte probe fetch) because block_until_ready is a no-op on the axon
backend. Stage deltas between consecutive rows are the per-stage costs.
Cross-process numbers drift ~7%; only compare within one run.

Usage: python scripts/profiling/profile_predict_stages.py [n_iters]
"""

import statistics
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

import bench

cfg = bench._setup()

from seq2squiggle_tpu.profiles import get_profile, update_config_for_profile
from seq2squiggle_tpu.runtime.simulate import resolve_weights
from seq2squiggle_tpu.runtime.predict import (
    PredictKnobs, _compute_durations, make_predict_fn,
)
from seq2squiggle_tpu.sampling import per_chunk_keys
from seq2squiggle_tpu.models.fft_model import (
    encoder_forward, noise_head, decoder_forward,
)
from seq2squiggle_tpu.ops.regulator import regulate_from_seg, segment_map
from seq2squiggle_tpu.io.reads import get_reads
from seq2squiggle_tpu.runtime.batcher import iter_batches

PROFILE = "dna-r10-prom"
config = update_config_for_profile(PROFILE, cfg)
params, _ = resolve_weights(bench._weights(), config, 42, PROFILE)
pd = get_profile(PROFILE)
knobs = PredictKnobs(
    dwell_mean=pd["sample_rate"] / pd["bps"],
    scaling_max_value=float(config["scaling_max_value"]),
    digitisation=float(pd["digitisation"]),
    signal_range=float(pd["range"]),
    offset_mean=float(pd["offset_mean"]),
    wire_bits=2,
)

B = int(bench.BATCH)
reads, _ = get_reads(
    "/root/reference/example/lamda_genome.fasta", False, 64, 1000, -1,
    config, "expon", 42, PROFILE, 30,
)
batch = next(iter_batches(reads, B, config["seq_kmer"], config["max_dna_len"]))

dev = jax.devices()[0]
P = jax.device_put(params, dev)
codes_d = jax.device_put(batch.codes, dev)
ridx_d = jax.device_put(batch.read_idx, dev)
coff_d = jax.device_put(batch.chunk_off, dev)
nk_d = jax.device_put(batch.n_kmers, dev)
key = jax.random.key(42)

T = int(config["max_signal_len"])
k = int(config["seq_kmer"])
n_chars = len(config["allowed_chars"])
compute_dtype = (
    jnp.bfloat16 if config.get("compute_dtype") == "bfloat16" else jnp.float32
)


def _front(codes, n_kmers):
    K = codes.shape[1] - k + 1
    kmers = jnp.stack([codes[:, j:j + K] for j in range(k)], axis=-1)
    valid = (
        jnp.arange(K, dtype=jnp.int32)[None, :]
        < n_kmers.astype(jnp.int32)[:, None]
    )
    kmers = jnp.where(valid[..., None], kmers, 0)
    one_hot = jax.nn.one_hot(kmers, n_chars, dtype=compute_dtype)
    return one_hot.reshape(codes.shape[0], K, k * n_chars)


def stage_enc(params, codes, read_idx, chunk_off, base_key, n_kmers):
    one_hot = _front(codes, n_kmers)
    enc_out, emb_out = encoder_forward(params, one_hot, config)
    return jnp.sum(enc_out.astype(jnp.float32)) + jnp.sum(
        emb_out.astype(jnp.float32))


def _to_heads(params, codes, read_idx, chunk_off, base_key, n_kmers):
    one_hot = _front(codes, n_kmers)
    enc_out, emb_out = encoder_forward(params, one_hot, config)
    emb32 = emb_out.astype(jnp.float32)
    noise_stdev = noise_head(params, emb32, config)
    read_keys = per_chunk_keys(base_key, read_idx)
    chunk_keys = jax.vmap(jax.random.fold_in)(read_keys, chunk_off)
    dur_keys = jax.vmap(lambda c: jax.random.fold_in(c, 1))(chunk_keys)
    durations = _compute_durations(params, emb32, dur_keys, knobs, config)
    return enc_out, noise_stdev, durations


def stage_heads(*a):
    enc_out, noise_stdev, durations = _to_heads(*a)
    return (jnp.sum(enc_out.astype(jnp.float32)) + jnp.sum(noise_stdev)
            + jnp.sum(durations))


def _to_reg(*a):
    enc_out, noise_stdev, durations = _to_heads(*a)
    seg_parts = segment_map(durations, T)
    expanded, noise_ext = regulate_from_seg(
        enc_out, seg_parts[2], x_noise=noise_stdev[..., None]
    )
    return expanded, noise_ext


def stage_reg(*a):
    expanded, noise_ext = _to_reg(*a)
    return jnp.sum(expanded.astype(jnp.float32)) + jnp.sum(
        noise_ext.astype(jnp.float32))


def stage_dec(*a):
    expanded, _ = _to_reg(*a)
    dec = decoder_forward(a[0], expanded, config)[..., 0]
    return jnp.sum(dec.astype(jnp.float32))


full_fn = make_predict_fn(config, knobs, framed=True)

STAGES = [
    ("enc", jax.jit(stage_enc)),
    ("+heads", jax.jit(stage_heads)),
    ("+reg", jax.jit(stage_reg)),
    ("+dec", jax.jit(stage_dec)),
    ("full", full_fn),
]

args = (P, codes_d, ridx_d, coff_d, key, nk_d)
probe = jax.jit(lambda o: jnp.ravel(o)[0])

n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 17

for name, fn in STAGES:
    np.asarray(probe(fn(*args)))  # compile + first run
    print(f"{name}: compiled", flush=True)


def walled(fn, m):
    t0 = time.perf_counter()
    out = None
    for _ in range(m):
        out = fn(*args)
    np.asarray(probe(out))
    return time.perf_counter() - t0


res = {name: [] for name, _ in STAGES}
for rnd in range(4):
    for name, fn in STAGES:
        t1 = walled(fn, 1)
        tn = walled(fn, n_iters)
        res[name].append((tn - t1) / (n_iters - 1) * 1e3)

prev = 0.0
print(f"\nB={B} per-batch device ms (median of 4 rounds, interleaved):")
for name, _ in STAGES:
    med = statistics.median(res[name])
    print(f"  {name:7s} {med:7.2f} ms  (delta {med - prev:+7.2f})  "
          f"rounds: {', '.join(f'{t:.1f}' for t in res[name])}", flush=True)
    prev = med
