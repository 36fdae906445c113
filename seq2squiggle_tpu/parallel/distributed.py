"""Multi-host (multi-process) runtime initialisation.

The reference covers multi-GPU through Lightning DDP/NCCL
(src/seq2squiggle/train.py:114-129). The TPU-native equivalent is JAX's
multi-controller runtime: every host runs the same program, calls
`jax.distributed.initialize`, and sees the global device set; shardings
over a global Mesh drive the collectives (ICI within a slice, DCN across
hosts) with no hand-written communication.

Activation (opt-in, never interferes with single-host runs):
  - On TPU pods: set SEQ2SQUIGGLE_TPU_DISTRIBUTED=1 —
    `jax.distributed.initialize()` autodetects the coordinator, process
    count, and process id from the TPU environment.
  - Anywhere else (including CPU tests): set JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID explicitly.

Recipes (documented in README):
  - predict: run one process per host; reads auto-shard round-robin by
    GLOBAL read index (zero cross-host communication, bit-identical output
    for any shard count) and each process writes
    `<out>.shard<i>.<ext>` — merge with `slow5tools cat` or keep per-shard
    files for downstream tools that accept multiple inputs.
  - train: one process per host; the ('dp','tp') mesh spans all global
    devices, every process feeds its local slab of the (identically
    shuffled) batch, and only process 0 writes checkpoints/metrics.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger("seq2squiggle_tpu")

_INITIALISED = False


def maybe_init_distributed() -> bool:
    """Initialise the JAX distributed runtime if the environment asks for
    it; returns True when running multi-process. Safe to call repeatedly."""
    global _INITIALISED
    explicit = os.environ.get("JAX_COORDINATOR_ADDRESS")
    requested = os.environ.get("SEQ2SQUIGGLE_TPU_DISTRIBUTED", "").lower() in (
        "1", "true", "yes",
    )
    if not (explicit or requested):
        return False

    import jax

    if not _INITIALISED:
        kwargs = {}
        if explicit:
            kwargs = dict(
                coordinator_address=explicit,
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]),
            )
        jax.distributed.initialize(**kwargs)
        _INITIALISED = True
        logger.info(
            f"JAX distributed runtime: process {jax.process_index()}/"
            f"{jax.process_count()}, {jax.local_device_count()} local / "
            f"{jax.device_count()} global devices"
        )
    return jax.process_count() > 1
