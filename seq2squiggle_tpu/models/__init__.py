"""Model family: FastSpeech-style feed-forward transformer squiggle models."""

from .fft_model import (  # noqa: F401
    init_params,
    encoder_forward,
    decoder_forward,
    noise_head,
    duration_gamma_params,
    count_params,
)
