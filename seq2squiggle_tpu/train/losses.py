"""Training losses (reference get_loss, src/seq2squiggle/model.py:419-480):

total = MSE(signal) + 0.0005 * mean(-Gamma.log_prob(|durations|)) + MSE(noise)

All terms support a per-sample mask so padded rows of the final batch do not
contribute (the reference drops this problem on the DataLoader; we keep
static batch shapes for jit instead).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
from jax.scipy.special import gammaln

DURATION_LOSS_SCALE = 0.0005


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over elements whose sample row is valid. x: (B, ...), mask: (B,)."""
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    m = mask.reshape(shape)
    per_elem = jnp.prod(jnp.asarray(x.shape[1:])) if x.ndim > 1 else 1
    total = jnp.sum(x * m)
    count = jnp.sum(mask) * per_elem
    return total / jnp.maximum(count, 1.0)


def gamma_log_prob(conc: jnp.ndarray, rate: jnp.ndarray,
                   x: jnp.ndarray) -> jnp.ndarray:
    """log pdf of Gamma(concentration, rate) (torch.distributions.Gamma)."""
    return (
        conc * jnp.log(rate)
        + (conc - 1.0) * jnp.log(x)
        - rate * x
        - gammaln(conc)
    )


def total_loss(
    prediction: jnp.ndarray,  # (B, T, 1)
    targets: jnp.ndarray,  # (B, T, 1)
    conc: jnp.ndarray,  # (B, K)
    rate: jnp.ndarray,  # (B, K)
    data_ls: jnp.ndarray,  # (B, K) ground-truth durations (int)
    noise_std_prediction: jnp.ndarray,  # (B, K)
    noise_std_target: jnp.ndarray,  # (B, K), already / scaling_max_value
    sample_mask: jnp.ndarray,  # (B,)
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    signal_loss = _masked_mean(
        jnp.square(prediction - targets), sample_mask
    )

    # durations: abs + map zeros to 1 (model.py:465)
    x = jnp.abs(data_ls.astype(jnp.float32))
    x = x + (data_ls == 0).astype(jnp.float32)
    nll = -gamma_log_prob(conc, rate, x)
    duration_loss = _masked_mean(nll, sample_mask) * DURATION_LOSS_SCALE

    noise_loss = _masked_mean(
        jnp.square(noise_std_target - noise_std_prediction), sample_mask
    )

    total = signal_loss + duration_loss + noise_loss
    return total, {
        "signal_loss": signal_loss,
        "duration_loss": duration_loss,
        "noise_loss": noise_loss,
        "total_loss": total,
    }
