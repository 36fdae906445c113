"""Training loop: optax + jit over a ('dp','tp') mesh.

Functional equivalent of the reference train_run + LightningModule
training/validation steps (src/seq2squiggle/train.py:25-111,
model.py:65-193): same forward wiring (noise and duration heads on the
detached pre-PE embedding, ground-truth durations through the length
regulator), same three-term loss, same optimizer/schedule menu, per-epoch
weights-only checkpoints, first-batch validation plots, and gradient-norm
logging every 100 steps.

TPU-first differences: one jitted train_step with static shapes (final
batch padded + masked), batch sharded over the 'dp' mesh axis and params
replicated (XLA inserts the gradient all-reduce), optional tensor-parallel
FFN/head sharding over 'tp', and a full train-state checkpoint (params +
optimizer state) for mid-training resume, which the reference lacks.
"""

from __future__ import annotations

import functools
import logging
import os
import pickle
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.fft_model import (
    count_params,
    decoder_forward,
    duration_gamma_params,
    encoder_forward,
    init_params,
    noise_head,
)
from ..models.torch_import import load_checkpoint, save_native_checkpoint
from ..ops.regulator import length_regulate
from .data import ChunkDataset, epoch_batches, load_file_groups
from .losses import total_loss
from .metrics import MetricsLogger
from .optimizers import build_optimizer

logger = logging.getLogger("seq2squiggle_tpu")


def model_forward_train(
    params: dict,
    batch: Dict[str, jnp.ndarray],
    config: dict,
    dropout_rng: Optional[jax.Array],
):
    """Shared train/valid forward. Returns (prediction, conc, rate,
    noise_pred)."""
    B, K = batch["chunks"].shape[:2]
    data = batch["chunks"].reshape(B, K, -1)
    compute_dtype = (
        jnp.bfloat16 if config.get("compute_dtype") == "bfloat16" else jnp.float32
    )
    data = data.astype(compute_dtype)

    rngs = (
        jax.random.split(dropout_rng, 4) if dropout_rng is not None else [None] * 4
    )
    enc_out, emb_out = encoder_forward(params, data, config, dropout_rng=rngs[0])

    emb_detached = jax.lax.stop_gradient(emb_out).astype(jnp.float32)
    noise_pred = noise_head(params, emb_detached, config, dropout_rng=rngs[1])
    conc, rate = duration_gamma_params(
        params, emb_detached, config, dropout_rng=rngs[2]
    )

    expanded, _, _ = length_regulate(
        enc_out, batch["chunks_lengths"], config["max_signal_len"]
    )
    prediction = decoder_forward(params, expanded, config, dropout_rng=rngs[3])
    return prediction.astype(jnp.float32), conc, rate, noise_pred


def loss_fn(params, batch, mask, config, dropout_rng):
    prediction, conc, rate, noise_pred = model_forward_train(
        params, batch, config, dropout_rng
    )
    return total_loss(
        prediction,
        batch["targets"],
        conc,
        rate,
        batch["chunks_lengths"],
        noise_pred,
        batch["stdevs"],
        mask,
    )


def make_train_step(config: dict, optimizer):
    """Jitted (params, opt_state, batch, mask, rng) -> (params, opt_state,
    metrics)."""

    def step(params, opt_state, batch, mask, rng):
        (_, metrics), grads = jax.value_and_grad(
            lambda p: loss_fn(p, batch, mask, config, rng), has_aux=True
        )(params)
        metrics["grad_norm"] = optax_global_norm(grads)
        # Per-parameter gradient norms (reference logs these every 100
        # steps, model.py:410-416); ~56 scalars, negligible to return.
        metrics.update(per_param_grad_norms(grads))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: (p + u).astype(p.dtype), params, updates
        )
        return params, opt_state, metrics

    return jax.jit(step, donate_argnums=(0, 1))


def make_valid_step(config: dict):
    def step(params, batch, mask):
        _, metrics = loss_fn(params, batch, mask, config, None)
        return metrics

    return jax.jit(step)


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))


def per_param_grad_norms(grads) -> Dict[str, jnp.ndarray]:
    def walk(tree, prefix, out):
        if isinstance(tree, dict):
            for key, value in tree.items():
                walk(value, f"{prefix}{key}/", out)
        elif isinstance(tree, (list, tuple)):
            for i, value in enumerate(tree):
                walk(value, f"{prefix}{i}/", out)
        else:
            out[f"grad_norm/{prefix[:-1]}"] = jnp.linalg.norm(
                tree.astype(jnp.float32)
            )

    out: Dict[str, jnp.ndarray] = {}
    walk(grads, "", out)
    return out


def _save_train_state(path: str, params, opt_state, epoch: int):
    """Write train_state.npz: params under params/<path>, optimizer-state
    leaves as opt/<i> in tree-flatten order, plus a JSON meta record.

    Only leaf VALUES go to disk — the optimizer tree STRUCTURE is rebuilt
    from the current optimizer's freshly-initialised state on resume, so
    the format survives optax version changes that keep the leaf schedule
    (unlike the raw pickle this replaces, which froze optax's internal
    class layout into the artifact). allow_pickle=False end to end."""
    import json

    from ..models.torch_import import _flatten

    flat = {
        f"params/{k}": v
        for k, v in _flatten(jax.tree_util.tree_map(np.asarray, params)).items()
    }
    opt_leaves = jax.tree_util.tree_leaves(opt_state)
    for i, leaf in enumerate(opt_leaves):
        flat[f"opt/{i:04d}"] = np.asarray(leaf)
    flat["__meta__"] = np.frombuffer(
        json.dumps({"epoch": int(epoch), "n_opt_leaves": len(opt_leaves),
                    "format": 1}).encode("utf-8"),
        np.uint8,
    )
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)  # atomic: a crash mid-save keeps the old state


def load_train_state(path: str):
    """Load a train state; returns {params, opt_leaves, epoch}.

    Dispatches on extension: .npz is the current format; .pkl is the
    legacy raw-pickle format (pre-format-1 runs), loadable once so an
    in-flight training run can still resume after upgrading."""
    if path.endswith(".pkl"):
        with open(path, "rb") as fh:
            legacy = pickle.load(fh)
        return {
            "params": legacy["params"],
            "opt_leaves": jax.tree_util.tree_leaves(legacy["opt_state"]),
            "epoch": int(legacy["epoch"]),
        }
    import json

    from ..models.torch_import import _unflatten

    with np.load(path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    meta = json.loads(bytes(flat.pop("__meta__")).decode("utf-8"))
    params = _unflatten(
        {k[len("params/"):]: v for k, v in flat.items()
         if k.startswith("params/")}
    )
    opt_leaves = [flat[f"opt/{i:04d}"] for i in range(meta["n_opt_leaves"])]
    return {"params": params, "opt_leaves": opt_leaves,
            "epoch": int(meta["epoch"])}


def restore_opt_state(fresh_opt_state, saved_leaves):
    """Graft saved leaf values onto the CURRENT optimizer's state tree.

    Validates leaf count and per-leaf shapes against the freshly
    initialised state so a config/optimizer mismatch fails loudly instead
    of silently mis-assigning moments."""
    leaves, treedef = jax.tree_util.tree_flatten(fresh_opt_state)
    if len(leaves) != len(saved_leaves):
        raise ValueError(
            f"train_state has {len(saved_leaves)} optimizer leaves but the "
            f"current optimizer expects {len(leaves)} — optimizer config "
            "changed since the state was saved; restart without --resume."
        )
    out = []
    for i, (ref, new) in enumerate(zip(leaves, saved_leaves)):
        new = np.asarray(new)
        if tuple(np.shape(ref)) != tuple(new.shape):
            raise ValueError(
                f"train_state optimizer leaf {i} has shape {new.shape} but "
                f"the current optimizer expects {tuple(np.shape(ref))} — "
                "model/optimizer config changed; restart without --resume."
            )
        out.append(new)
    return jax.tree_util.tree_unflatten(treedef, out)


def train_run(
    train_dir: str,
    valid_dir: Optional[str],
    config: dict,
    model_path: Optional[str],
    save_valid_plots: bool,
    seed: int = 42,
    max_steps_per_epoch: Optional[int] = None,
    resume: bool = False,
    init_params_override: Optional[dict] = None,
) -> dict:
    """Train a model; returns final metrics. Checkpoints land next to
    model_path (or ./logs-<log_name>/ like the reference, train.py:64-70)."""
    if model_path is not None:
        log_dir, filename = os.path.split(str(model_path))
        ckpt_name = os.path.splitext(filename)[0] or "last"
        log_dir = log_dir or "."
    else:
        log_dir = "./logs-" + config["log_name"]
        ckpt_name = "last"
        logger.info(f"Model path not specified. Saving to {log_dir}/{ckpt_name}.npz")
    os.makedirs(log_dir, exist_ok=True)

    params = (
        init_params_override
        if init_params_override is not None
        else init_params(config, jax.random.key(seed))
    )
    logger.info(f"Total Trainable Params: {count_params(params):,}")

    train_files, valid_files = load_file_groups(
        train_dir, valid_dir, config["train_valid_split"],
        config.get("random_seed", seed),
    )
    train_ds = ChunkDataset(train_files, config["max_chunks_train"], config)
    valid_ds = ChunkDataset(valid_files, config["max_chunks_valid"], config)
    logger.info(
        f"True Training dataset size: {len(train_ds)}; "
        f"validation size: {len(valid_ds)}"
    )

    batch_size = int(config["train_batch_size"])
    steps_per_epoch = max(1, (len(train_ds) + batch_size - 1) // batch_size)
    if max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)
    total_steps = steps_per_epoch * int(config["max_epochs"])

    optimizer = build_optimizer(config, total_steps)

    # Multi-device parallelism over a ('dp','tp') mesh: batches shard over
    # 'dp' (XLA inserts the gradient all-reduce from the shardings); with
    # tensor_parallel > 1 (CLI: train --tp) the FFN hidden dim and the
    # attention heads additionally shard over 'tp' (column/row-parallel,
    # XLA inserts the psum after the row-parallel matmuls).
    mesh = None
    place_params = lambda p: p  # noqa: E731
    n_dev = jax.device_count()
    n_tp = max(1, int(config.get("tensor_parallel", 1)))
    if n_tp > 1 and n_dev % n_tp != 0:
        raise ValueError(
            f"tensor_parallel={n_tp} does not divide the device count {n_dev}"
        )
    n_dp = n_dev // n_tp
    if n_dev > 1 and n_dp >= 1 and batch_size % max(n_dp, 1) == 0:
        from ..parallel.mesh import (
            batch_sharding, make_mesh, replicated, shard_params,
        )

        mesh = make_mesh(n_dp=n_dp, n_tp=n_tp)
        logger.info(
            f"Training over {n_dev} devices (dp={n_dp}, tp={n_tp})"
        )
        if n_tp > 1:
            place_params = lambda p: shard_params(p, mesh)  # noqa: E731
        else:
            place_params = lambda p: jax.device_put(p, replicated(mesh))  # noqa: E731
        params = place_params(params)
        _bsh = batch_sharding(mesh)
    elif n_tp > 1:
        logger.warning(
            f"tensor_parallel={n_tp} requested but only {n_dev} device(s) "
            "available or batch not divisible; running unsharded."
        )

    opt_state = optimizer.init(params)
    start_epoch = 0
    state_path = os.path.join(log_dir, "train_state.npz")
    legacy_path = os.path.join(log_dir, "train_state.pkl")
    resume_path = (
        state_path if os.path.exists(state_path)
        else legacy_path if os.path.exists(legacy_path)
        else None
    )
    if resume and resume_path:
        # Mid-training resume with optimizer state (beyond the reference's
        # weights-only checkpoints).
        saved = load_train_state(resume_path)
        params = place_params(saved["params"])
        opt_state = restore_opt_state(opt_state, saved["opt_leaves"])
        start_epoch = int(saved["epoch"]) + 1
        logger.info(f"Resuming training from epoch {start_epoch}")
    elif resume:
        logger.warning(f"--resume requested but {state_path} not found; "
                       "starting fresh.")

    # Pallas training kernels vary in lowerability by backend:
    # compile-check fwd+bwd ONCE at the real decoder length before the
    # loop, stepping down one rung at a time — whole-block kernels ->
    # attention-core kernels -> pure XLA (the train-side mirror of
    # predict's first-batch ladder). Probes run only when the rung would
    # actually engage.
    from ..models.fft_model import _train_kernel_mode

    _probe_x = jnp.zeros(
        (1, int(config["max_signal_len"]), int(config["dmodel"])),
        jnp.bfloat16 if config.get("compute_dtype") == "bfloat16"
        else jnp.float32,
    )
    if _train_kernel_mode(config, _probe_x, None) == "block":
        try:
            from ..ops.pallas.block_train import probe_block

            probe_block(int(config["max_signal_len"]),
                        int(config["dmodel"]),
                        int(config["decoder_heads"]),
                        dtype=_probe_x.dtype)
        except Exception as exc:
            logger.warning(
                f"Fused-block training kernel unavailable on this backend "
                f"({type(exc).__name__}); trying the attention-core "
                "kernels."
            )
            config = dict(config, pallas_train="core")
    if _train_kernel_mode(config, _probe_x, None) == "core":
        try:
            from ..ops.pallas.attn_core import probe_core

            probe_core(int(config["max_signal_len"]), int(config["dmodel"]),
                       int(config["decoder_heads"]),
                       dtype=_probe_x.dtype)
        except Exception as exc:
            logger.warning(
                f"Packed attention training kernel unavailable on this "
                f"backend ({type(exc).__name__}); falling back to XLA "
                "attention."
            )
            config = dict(config, pallas_train=False)

    train_step = make_train_step(config, optimizer)
    valid_step = make_valid_step(config)

    n_proc = jax.process_count()
    is_primary = jax.process_index() == 0

    # Multi-host: every process iterates the identical global permutation
    # (same shuffle seed) but GATHERS only the slab its local devices own
    # on the 'dp' axis (epoch_batches local_rows) — the other processes'
    # rows are never read from the memmaps. No data ever crosses hosts.
    local_rows = None
    if mesh is not None and n_proc > 1:
        pid = jax.process_index()
        local_rows = slice(
            pid * batch_size // n_proc, (pid + 1) * batch_size // n_proc
        )

    def place_batch(batch, mask):
        if mesh is None:
            return batch, jnp.asarray(mask)
        if n_proc > 1:
            # batch/mask are already this process's slab
            put = lambda v: jax.make_array_from_process_local_data(  # noqa: E731
                _bsh, np.asarray(v)
            )
        else:
            put = lambda v: jax.device_put(v, _bsh)  # noqa: E731
        return {k: put(v) for k, v in batch.items()}, put(mask)

    metrics_log = MetricsLogger(log_dir, config)
    rng = np.random.default_rng(seed)
    base_key = jax.random.key(seed)

    step = start_epoch * steps_per_epoch
    last_metrics: Dict[str, float] = {}
    for epoch in range(start_epoch, int(config["max_epochs"])):
        for i, (batch, mask) in enumerate(
            epoch_batches(train_ds, batch_size, rng, shuffle=True,
                          local_rows=local_rows)
        ):
            if max_steps_per_epoch and i >= max_steps_per_epoch:
                break
            dropout_rng = jax.random.fold_in(base_key, step)
            batch, mask = place_batch(batch, mask)
            params, opt_state, metrics = train_step(
                params, opt_state, batch, mask, dropout_rng
            )
            if step % 100 == 0:
                host = {f"train_{k}": float(v) for k, v in metrics.items()}
                host["lr_epoch"] = epoch
                if is_primary:
                    metrics_log.log(host, step=step)
                last_metrics = host
            step += 1

        # ---- validation ----
        val_accum: Dict[str, float] = {}
        n_val = 0
        first_batch = None
        for batch, mask in epoch_batches(valid_ds, batch_size, rng,
                                         shuffle=False,
                                         local_rows=local_rows):
            batch, mask = place_batch(batch, mask)
            metrics = valid_step(params, batch, mask)
            if first_batch is None:
                first_batch = (batch, mask)
            for k, v in metrics.items():
                val_accum[k] = val_accum.get(k, 0.0) + float(v)
            n_val += 1
        if n_val:
            val_metrics = {f"valid_{k}": v / n_val for k, v in val_accum.items()}
            if is_primary:
                metrics_log.log(val_metrics, step=step)
            last_metrics.update(val_metrics)
            logger.info(
                f"epoch {epoch}: "
                + ", ".join(f"{k}={v:.5f}" for k, v in val_metrics.items())
            )

        if save_valid_plots and first_batch is not None and is_primary:
            try:
                from .plots import generate_validation_plots

                generate_validation_plots(
                    params, config, first_batch[0], epoch, log_dir,
                    jax.random.fold_in(base_key, 10_000 + epoch),
                )
            except Exception as exc:  # plots must never kill training
                logger.warning(f"Validation plots failed: {exc}")

        # ---- checkpoints: weights-only npz per epoch (save_top_k=-1) ----
        if config.get("save_model", True):
            ckpt_params, ckpt_opt = params, opt_state
            if n_proc > 1:
                # Collective gather on EVERY process (p0-only would
                # deadlock); p0 alone writes the files below.
                from jax.experimental import multihost_utils

                ckpt_params = multihost_utils.process_allgather(
                    params, tiled=True
                )
                ckpt_opt = multihost_utils.process_allgather(
                    opt_state, tiled=True
                )
            if is_primary:
                epoch_path = os.path.join(
                    log_dir, f"{ckpt_name}-epoch{epoch}.npz"
                )
                save_native_checkpoint(epoch_path, ckpt_params, config)
                save_native_checkpoint(
                    os.path.join(log_dir, f"{ckpt_name}.npz"), ckpt_params,
                    config,
                )
                _save_train_state(
                    os.path.join(log_dir, "train_state.npz"), ckpt_params,
                    ckpt_opt, epoch,
                )

    metrics_log.close()
    logger.info("Training finished.")
    return last_metrics
