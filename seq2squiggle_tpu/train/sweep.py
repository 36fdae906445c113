"""Hyperparameter sweeps.

The reference runs a wandb sweep agent (src/seq2squiggle/train_sweep.py:
15-46, search space configs/sweep.yaml). When wandb is available and
sweep_id looks like 'user/project/id', we do the same. Otherwise sweep_id
is a local YAML search-space file (same wandb sweep format: parameters with
`values` or `min`/`max`) and we run an offline search, tracking the best
trial by valid_total_loss in <outdir>/sweep_results.jsonl.

Offline search methods (top-level `method:` key in the YAML):
  random   — uniform/log-uniform sampling from the space (default)
  grid     — cartesian product of every parameter's `values` (discrete
             specs only), capped at --count points
  halving  — successive halving: --count random configs start at
             `min_epochs` (default 1), the best 1/`eta` (default 3)
             advance to an eta× epoch budget each rung until one
             survives (budgets capped at the config's max_epochs)
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


def _grid_points(parameters: dict) -> list:
    """Cartesian product over discrete parameter specs, in YAML key order
    (wandb grid semantics: every parameter needs `values`/`value`)."""
    import itertools

    keys, axes = [], []
    for k, spec in parameters.items():
        if isinstance(spec, dict) and "values" in spec:
            keys.append(k)
            axes.append(list(spec["values"]))
        elif isinstance(spec, dict) and "value" in spec:
            keys.append(k)
            axes.append([spec["value"]])
        else:
            raise ValueError(
                f"method: grid requires discrete 'values' for parameter "
                f"{k!r} (got {spec!r}); use method: random for "
                "min/max ranges."
            )
    return [dict(zip(keys, combo)) for combo in itertools.product(*axes)]


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
    method = str(space.get("method", "random")).lower()
    best = None
    trial_no = 0

    def run_trial(trial_params, extra_cfg=None, record=None):
        nonlocal best, trial_no
        cfg = dict(config)
        cfg.update(trial_params)
        if extra_cfg:
            cfg.update(extra_cfg)
        logger.info(f"Sweep trial {trial_no}: {trial_params}"
                    + (f" {extra_cfg}" if extra_cfg else ""))
        metrics = train_run(
            train_dir=td, valid_dir=vd, config=cfg, model_path=None,
            save_valid_plots=False, seed=seed + trial_no,
        )
        score = metrics.get("valid_total_loss", float("inf"))
        row = {"trial": trial_no, "params": trial_params, "metrics": metrics}
        if record:
            row.update(record)
        with open(results_path, "a") as fh:
            fh.write(json.dumps(row) + "\n")
        if best is None or score < best[0]:
            best = (score, trial_no, trial_params)
        trial_no += 1
        return score

    if method == "grid":
        points = _grid_points(parameters)
        if len(points) > count:
            logger.info(
                f"Grid has {len(points)} points; --count caps it at {count}."
            )
            points = points[:count]
        for trial_params in points:
            run_trial(trial_params)
    elif method == "halving":
        eta = max(2, int(space.get("eta", 3)))
        budget = max(1, int(space.get("min_epochs", 1)))
        max_budget = int(config.get("max_epochs", budget))
        survivors = [
            {k: _sample_param(v, rng) for k, v in parameters.items()}
            for _ in range(count)
        ]
        rung = 0
        while True:
            scored = []
            for trial_params in survivors:
                score = run_trial(
                    trial_params,
                    extra_cfg={"max_epochs": min(budget, max_budget)},
                    record={"rung": rung,
                            "epochs": min(budget, max_budget)},
                )
                scored.append((score, trial_params))
            if len(survivors) <= 1:
                break
            scored.sort(key=lambda t: t[0])
            survivors = [tp for _, tp in scored[:max(1, len(scored) // eta)]]
            budget *= eta
            rung += 1
    else:
        for _ in range(count):
            trial_params = {
                k: _sample_param(v, rng) for k, v in parameters.items()
            }
            run_trial(trial_params)

    if best:
        logger.info(
            f"Best trial {best[1]} (valid_total_loss={best[0]:.5f}): {best[2]}"
        )
