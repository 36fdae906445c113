"""Training observability: JSONL metrics log with optional wandb mirror.

The reference logs exclusively through wandb (train.py:44-49,
model.py:462-479) plus per-parameter gradient norms every 100 steps
(model.py:410-416). Here every metric always lands in
<log_dir>/metrics.jsonl (machine-readable, offline-first); wandb mirrors it
when the package is installed and wandb_logger_state != disabled.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

logger = logging.getLogger("seq2squiggle_tpu")


class MetricsLogger:
    def __init__(self, log_dir: str, config: dict):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._fh = open(self.path, "a", buffering=1)
        self._wandb = None
        state = config.get("wandb_logger_state", "disabled")
        if state != "disabled":
            try:
                import wandb

                wandb.init(
                    project="seq2squiggle-tpu",
                    config=config,
                    name=config.get("log_name"),
                    mode=state,
                )
                self._wandb = wandb
            except ImportError:
                logger.warning(
                    "wandb_logger_state=%s but wandb is not installed; "
                    "metrics go to %s only", state, self.path,
                )

    def log(self, metrics: Dict[str, float], step: Optional[int] = None):
        row = {"time": time.time()}
        if step is not None:
            row["step"] = int(step)
        row.update({k: float(v) for k, v in metrics.items()})
        self._fh.write(json.dumps(row) + "\n")
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self):
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()
