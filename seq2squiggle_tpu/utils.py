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


_ALLOCATOR_TUNED = False


def tune_host_allocator():
    """Keep glibc from returning large buffers to the kernel between uses.

    The streaming pipeline cycles tens-of-MB numpy buffers (decoded signal,
    exporter flats, the BLOW5 encode scratch) across three threads every
    flush. By default glibc serves those via fresh mmaps and munmaps them
    on free, so every reuse pays first-touch page faults — measured
    ~150 MB/s of zero-fill on the bench host, i.e. ~0.45 s per fresh 55 MB
    flush buffer, dwarfing the actual encode. Raising M_MMAP_THRESHOLD and
    M_TRIM_THRESHOLD keeps those blocks on the heap and resident, trading
    retained RSS (bounded by peak working set) for allocation cost.

    Linux/glibc only; silently a no-op elsewhere. Call before the worker
    threads spawn. Safe to call multiple times.
    """
    global _ALLOCATOR_TUNED
    if _ALLOCATOR_TUNED or not sys.platform.startswith("linux"):
        return
    _ALLOCATOR_TUNED = True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
        # Disable transparent huge pages for this process: with the TPU
        # runtime resident, THP direct compaction turns the first touch of
        # each fresh tens-of-MB flush buffer into a multi-second stall
        # (measured 1.5-2.7 s per 55 MB vs 0.04 s with THP off — the
        # pipeline at full rate allocates one such buffer per flush). The
        # TLB cost of 4K pages on these short-lived streaming buffers is
        # noise by comparison.
        PR_SET_THP_DISABLE = 41
        libc.prctl(PR_SET_THP_DISABLE, 1, 0, 0, 0)
    except (OSError, AttributeError) as exc:  # musl, containers, etc.
        logger.debug(f"host allocator tuning unavailable: {exc}")


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
