"""On-device random sampling with per-chunk counter-based keys.

The reference draws Gamma dwell times and Gaussian amplitude noise from the
global torch RNG stream (src/seq2squiggle/modules.py:221-223,
model.py:224-240), which makes results depend on batch size and device
count. Here every chunk derives its own threefry key by folding the global
chunk index into the run seed, so simulated signals are bit-identical for
any batch size and any data-parallel sharding — parity with the reference is
statistical (same distributions), as required for any RNG re-implementation.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def per_chunk_keys(base_key: jax.Array, chunk_idx: jnp.ndarray) -> jax.Array:
    """Derive one key per chunk from the run key. chunk_idx: (B,) int32."""
    return jax.vmap(lambda i: jax.random.fold_in(base_key, i))(chunk_idx)


_GAMMA_ROUNDS = 8  # acceptance ~96%/round; P(no accept in 8) < 1e-11


def sample_gamma(key: jax.Array, a: jnp.ndarray) -> jnp.ndarray:
    """Gamma(a, 1) sampler with a FIXED number of rejection rounds.

    jax.random.gamma's data-dependent while_loop degenerates for
    concentrations around 1e-2 (observed minutes-long executions); this
    sampler runs 8 Marsaglia-Tsang rounds with first-accept selection -
    constant cost, fully vectorised, no divergent control flow, which is
    also the TPU-friendly formulation (pure VPU math). The rounds are a
    lax.fori_loop so the compiled module contains the threefry body once.

    a < 1 uses the standard boost: G_a = G_{a+1} * U^(1/a), evaluated in log
    space so tiny results underflow cleanly to 0 instead of hitting
    subnormal-arithmetic slow paths.
    """
    a = a.astype(jnp.float32)
    boost_needed = a < 1.0
    a_eff = jnp.where(boost_needed, a + 1.0, a)
    d = a_eff - 1.0 / 3.0
    c = 1.0 / jnp.sqrt(9.0 * d)

    def round_body(i, carry):
        sample, done = carry
        ki = jax.random.fold_in(key, i)
        kn, ku = jax.random.split(ki)
        x = jax.random.normal(kn, d.shape, jnp.float32)
        v = (1.0 + c * x) ** 3
        u = jax.random.uniform(ku, d.shape, jnp.float32, 1e-37, 1.0)
        ok_v = v > 0.0
        log_v = jnp.log(jnp.where(ok_v, v, 1.0))
        accept = ok_v & (jnp.log(u) < 0.5 * x * x + d * (1.0 - v + log_v))
        take = accept & ~done
        return jnp.where(take, d * v, sample), done | accept

    # fallback `d`: the distribution mode, hit with probability < 1e-11
    sample, _ = jax.lax.fori_loop(
        0, _GAMMA_ROUNDS, round_body, (d, jnp.zeros(a.shape, bool))
    )

    u_boost = jax.random.uniform(
        jax.random.fold_in(key, _GAMMA_ROUNDS), a.shape, jnp.float32, 1e-37, 1.0
    )
    log_sample = jnp.log(sample) + jnp.where(
        boost_needed, jnp.log(u_boost) / a, 0.0
    )
    return jnp.exp(log_sample)


def sample_gamma_durations(
    keys: jax.Array, conc: jnp.ndarray, rate: jnp.ndarray
) -> jnp.ndarray:
    """Sample Gamma(concentration, rate) dwell times, one row per chunk.

    keys: (B,) chunk keys; conc/rate: (B, K) float32.
    Gamma(a, rate) == Gamma(a, 1) / rate.
    """
    g = jax.vmap(sample_gamma)(keys, conc)
    return g / rate


def sample_normal(keys: jax.Array, shape_per_row: Tuple[int, ...]) -> jnp.ndarray:
    """Standard-normal draws, one independent stream per chunk row."""

    def row(key):
        return jax.random.normal(key, shape_per_row, jnp.float32)

    return jax.vmap(row)(keys)
