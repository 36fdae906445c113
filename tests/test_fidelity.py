"""Statistical fidelity: event-level dwell and current statistics of the
end-to-end simulation must match the model's own heads (the eventalign-level
parity the north star requires, testable without external basecallers)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seq2squiggle_tpu.config import load_config
from seq2squiggle_tpu.models.fft_model import (
    decoder_forward,
    duration_gamma_params,
    encoder_forward,
)
from seq2squiggle_tpu.models.torch_import import load_native_checkpoint
from seq2squiggle_tpu.ops.regulator import length_regulate
from seq2squiggle_tpu.runtime.batcher import expand_windows, iter_batches
from seq2squiggle_tpu.runtime.predict import PredictKnobs, make_predict_fn
from seq2squiggle_tpu.sampling import per_chunk_keys, sample_gamma_durations

WEIGHTS = "/root/repo/assets/bench-weights-R10.npz"


@pytest.fixture(scope="module")
def setup():
    params, ckpt_cfg = load_native_checkpoint(WEIGHTS)
    cfg = load_config(None)
    cfg["compute_dtype"] = "float32"
    rng = np.random.default_rng(0)
    # 8 reads x 250 bp -> 8 x 16 = 128 chunks = exactly one small batch
    seqs = ["".join(rng.choice(list("ACGT"), 250)) for _ in range(8)]
    reads = [(s, f"r{i}") for i, s in enumerate(seqs)]
    batches = list(iter_batches(iter(reads), 128, cfg["seq_kmer"],
                                cfg["max_dna_len"]))
    assert len(batches) == 1
    return params, cfg, batches[0]


def test_simulated_dwell_matches_duration_head(setup):
    """Total simulated samples (noise off) ~= sum of sampled durations from
    the Gamma head: the length regulator + decoder + export pipeline must
    not add or drop samples."""
    params, cfg, batch = setup
    knobs = PredictKnobs(noise_std=0.0, duration_sampling=True,
                         min_duration=3, wire_bits=16)
    fn = make_predict_fn(cfg, knobs)
    key = jax.random.key(7)
    sig, counts = fn(params, batch.codes, batch.read_idx, batch.chunk_off,
                     key, batch.n_kmers)
    counts = np.asarray(counts)[: batch.n_valid]

    # independent expectation: durations drawn with the same per-chunk keys
    kmer_codes = expand_windows(batch.codes, batch.n_kmers, cfg["seq_kmer"])
    one_hot = jax.nn.one_hot(kmer_codes, 5, dtype=jnp.float32).reshape(
        kmer_codes.shape[0], 16, -1
    )
    _, emb = encoder_forward(params, one_hot, cfg)
    conc, rate = duration_gamma_params(params, emb, cfg)
    read_keys = per_chunk_keys(key, jnp.asarray(batch.read_idx))
    chunk_keys = jax.vmap(jax.random.fold_in)(read_keys, jnp.asarray(batch.chunk_off))
    dur_keys = jax.vmap(lambda c: jax.random.fold_in(c, 1))(chunk_keys)
    dur = sample_gamma_durations(dur_keys, conc, rate)
    dur = jnp.round(jnp.maximum(jnp.maximum(dur, 1.0), 3.0)).astype(np.int32)
    expected = np.minimum(np.asarray(dur).sum(axis=1), 250)[: batch.n_valid]

    # With a trained model and no noise, nearly all in-duration frames are
    # non-zero; allow a tiny slack for genuinely-zero frames.
    assert np.mean(counts == expected) > 0.95
    np.testing.assert_allclose(counts.mean(), expected.mean(), rtol=0.01)


def test_simulated_current_matches_decoder(setup):
    """Exported current levels (noise off, fixed dwell) must equal the
    decoder's output scaled by scaling_max_value and digitised."""
    params, cfg, batch = setup
    knobs = PredictKnobs(noise_std=0.0, duration_sampling=False,
                         dwell_mean=10.0, dwell_std=0.0, wire_bits=16)
    fn = make_predict_fn(cfg, knobs)
    key = jax.random.key(8)
    sig, counts = fn(params, batch.codes, batch.read_idx, batch.chunk_off,
                     key, batch.n_kmers)
    sig = np.asarray(sig)
    counts = np.asarray(counts)

    kmer_codes = expand_windows(batch.codes, batch.n_kmers, cfg["seq_kmer"])
    one_hot = jax.nn.one_hot(kmer_codes, 5, dtype=jnp.float32).reshape(
        kmer_codes.shape[0], 16, -1
    )
    enc, _ = encoder_forward(params, one_hot, cfg)
    durations = jnp.full(enc.shape[:2], 10, jnp.int32)
    expanded, _, _ = length_regulate(enc, durations, 250)
    pred = np.asarray(decoder_forward(params, expanded, cfg))[..., 0]
    pred = np.maximum(pred * 165.0, 0.0)
    raw = np.round(
        pred * knobs.digitisation / knobs.signal_range - knobs.offset_mean
    ).astype(np.int16)

    row = 0
    n = counts[row]
    assert n == 160, f"expected 16 k-mers x 10 samples, got {n}"
    np.testing.assert_array_equal(sig[row][:n], raw[row][:n])

    # event currents: mean level per k-mer is within 3 pA of the decoder's
    # per-event mean for every event of the first 10 chunks
    scale = knobs.signal_range / knobs.digitisation
    for b in range(10):
        got = sig[b][: counts[b]].reshape(16, 10).mean(axis=1) * scale
        want = raw[b][: counts[b]].reshape(16, 10).mean(axis=1) * scale
        np.testing.assert_allclose(got, want, atol=0.01)
