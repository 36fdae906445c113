"""Device mesh and sharding layouts.

The simulation workload is embarrassingly parallel over reads, so the
primary axis is data parallelism ('dp') with ZERO inner-loop collectives:
each chip gets a contiguous slab of chunk rows, params are replicated, and
outputs come back per-chip (reference equivalent: the disabled
DataParallelIterableDataSet + DDP scaffolding, dataloader.py:262-318).

For training we additionally expose Megatron-style tensor parallelism
('tp') over the FFN hidden dimension and the attention heads: column-
parallel w_1/w_qs/w_ks/w_vs, row-parallel w_2/fc. XLA inserts the psum
after the row-parallel matmuls and the gradient all-reduce over 'dp'
automatically from the shardings; we never hand-write collectives.
(With dmodel=64 this is a scaling demonstration more than a win - the
model is tiny - but the layout is real and compiles to ICI collectives.)
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_dp: Optional[int] = None, n_tp: int = 1,
              devices=None) -> Mesh:
    """Create a ('dp', 'tp') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_dp is None:
        n_dp = len(devices) // n_tp
    devices = np.asarray(devices[: n_dp * n_tp]).reshape(n_dp, n_tp)
    return Mesh(devices, axis_names=("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch/chunk) axis over 'dp'; everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def param_shardings(params: dict, mesh: Mesh):
    """Sharding pytree for the model params.

    FFN: w_1 kernel (d, dff) column-parallel over 'tp'; w_2 kernel (dff, d)
    row-parallel. Attention: q/k/v projections (d, H*dk) column-parallel
    (shards whole heads since head h owns features [h*dk, (h+1)*dk)); output
    projection fc (H*dk, d) row-parallel. Everything else replicated.
    """

    def spec_for(path: str, leaf) -> NamedSharding:
        pspec = P()
        if leaf.ndim == 2:
            if "ffn/w_1/kernel" in path or any(
                f"attn/{w}/kernel" in path for w in ("w_qs", "w_ks", "w_vs")
            ):
                pspec = P(None, "tp")
            elif "ffn/w_2/kernel" in path or "attn/fc/kernel" in path:
                pspec = P("tp", None)
        elif leaf.ndim == 1:
            if "ffn/w_1/bias" in path or any(
                f"attn/{w}/bias" in path for w in ("w_qs", "w_ks", "w_vs")
            ):
                pspec = P("tp")
        return NamedSharding(mesh, pspec)

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: walk(v, f"{prefix}{k}/") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return type(tree)(walk(v, f"{prefix}{i}/") for i, v in enumerate(tree))
        return spec_for(prefix[:-1], tree)

    return walk(params)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params: dict, mesh: Mesh) -> dict:
    return jax.device_put(params, param_shardings(params, mesh))
