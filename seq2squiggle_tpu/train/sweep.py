"""Hyperparameter sweeps.

The reference runs a wandb sweep agent (src/seq2squiggle/train_sweep.py:
15-46, search space configs/sweep.yaml). When wandb is available and
sweep_id looks like 'user/project/id', we do the same. Otherwise sweep_id
is a local YAML search-space file (same wandb sweep format: parameters with
`values` or `min`/`max`) and we run offline random search, tracking the best
trial by valid_total_loss in <outdir>/sweep_results.jsonl.
"""

from __future__ import annotations

import json
import logging
import os
import random
from typing import Optional

import yaml

logger = logging.getLogger("seq2squiggle_tpu")


def _sample_param(spec, rng: random.Random):
    if isinstance(spec, dict):
        if "values" in spec:
            return rng.choice(spec["values"])
        if "min" in spec and "max" in spec:
            lo, hi = spec["min"], spec["max"]
            if spec.get("distribution", "").startswith("log"):
                import math

                return math.exp(rng.uniform(math.log(lo), math.log(hi)))
            if isinstance(lo, int) and isinstance(hi, int):
                return rng.randint(lo, hi)
            return rng.uniform(lo, hi)
        if "value" in spec:
            return spec["value"]
    return spec


def sweep_run(sweep_id: str, count: int, config: dict, seed: int,
              train_dir: Optional[str] = None,
              valid_dir: Optional[str] = None):
    if not os.path.exists(sweep_id):
        try:
            import wandb

            from .loop import train_run

            def agent_fn():
                wandb.init()
                cfg = dict(config)
                cfg.update(dict(wandb.config))
                train_run(
                    train_dir=cfg.get("train_dir", train_dir),
                    valid_dir=cfg.get("valid_dir", valid_dir),
                    config=cfg, model_path=None, save_valid_plots=False,
                    seed=seed,
                )

            wandb.agent(sweep_id, agent_fn, count=count)
            return
        except ImportError:
            raise FileNotFoundError(
                f"sweep_id {sweep_id!r} is not a local YAML file and wandb "
                "is not installed. Provide a search-space YAML for offline "
                "random search."
            )

    with open(sweep_id) as fh:
        space = yaml.safe_load(fh)
    parameters = space.get("parameters", {})
    td = train_dir or space.get("train_dir")
    vd = valid_dir or space.get("valid_dir")
    if not td:
        raise ValueError(
            "Offline sweep needs a train_dir (top-level key in the YAML)."
        )

    from .loop import train_run

    rng = random.Random(seed)
    results_path = os.path.join(
        os.path.dirname(os.path.abspath(sweep_id)), "sweep_results.jsonl"
    )
    best = None
    for trial in range(count):
        cfg = dict(config)
        trial_params = {k: _sample_param(v, rng) for k, v in parameters.items()}
        cfg.update(trial_params)
        logger.info(f"Sweep trial {trial}: {trial_params}")
        metrics = train_run(
            train_dir=td, valid_dir=vd, config=cfg, model_path=None,
            save_valid_plots=False, seed=seed + trial,
        )
        score = metrics.get("valid_total_loss", float("inf"))
        row = {"trial": trial, "params": trial_params, "metrics": metrics}
        with open(results_path, "a") as fh:
            fh.write(json.dumps(row) + "\n")
        if best is None or score < best[0]:
            best = (score, trial, trial_params)
    if best:
        logger.info(
            f"Best trial {best[1]} (valid_total_loss={best[0]:.5f}): {best[2]}"
        )
