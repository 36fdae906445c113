"""Logging and seeding utilities (reference: src/seq2squiggle/utils.py:687-741)."""

from __future__ import annotations

import logging
import os
import random
import sys

import numpy as np

logger = logging.getLogger("seq2squiggle_tpu")


def setup_logging(verbosity: str = "info"):
    logging_levels = {
        "debug": logging.DEBUG,
        "info": logging.INFO,
        "warning": logging.WARNING,
        "error": logging.ERROR,
    }
    logging.captureWarnings(True)
    root_logger = logging.getLogger()
    root_logger.setLevel(logging.DEBUG)
    warnings_logger = logging.getLogger("py.warnings")

    console_formatter = logging.Formatter(
        "{name} {levelname} {asctime}: {message}", style="{", datefmt="%H:%M:%S"
    )
    console_handler = logging.StreamHandler(sys.stderr)
    console_handler.setLevel(logging_levels[verbosity.lower()])
    console_handler.setFormatter(console_formatter)
    root_logger.addHandler(console_handler)
    warnings_logger.addHandler(console_handler)

    for noisy in ("jax", "fsspec", "h5py", "urllib3", "matplotlib", "orbax"):
        logging.getLogger(noisy).setLevel(logging.WARNING)


def enable_compile_cache(cache_dir: str = ""):
    """Enable JAX's persistent compilation cache.

    XLA-CPU compilation of threefry-heavy programs can take minutes on small
    hosts; caching makes every run after the first start instantly. Safe to
    call multiple times.
    """
    import jax

    if not cache_dir:
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "seq2squiggle_tpu", "jax"
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def set_seeds(seed: int) -> int:
    """Seed python/numpy RNGs; seed 0 draws a fresh seed from the OS CSPRNG.

    Returns the resolved seed (also used to build the JAX root key).
    """
    if not seed:
        seed = int.from_bytes(os.urandom(4), byteorder="big", signed=False)
        logger.info(f"No seed provided. Generated random seed: {seed}")
    logger.info(f"Setting all random seeds to {seed}")
    os.environ["PYTHONHASHSEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return seed
