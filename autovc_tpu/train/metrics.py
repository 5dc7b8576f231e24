"""Metrics/observability (reference solver_encoder.py:313-421).

The reference's backbone is wandb (scalars + spectrogram images). Here the
primary sink is a local JSONL stream (always available, machine-readable) with
optional wandb mirroring when the package + token exist, plus the reference's
console log line format.
"""

from __future__ import annotations

import datetime
import json
import os
import time
from typing import Any, Mapping


class MetricsLogger:
    def __init__(self, run_dir: str, run_name: str, use_wandb: bool = False, config=None):
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, f"metrics_{run_name}.jsonl")
        self._f = open(self.path, "a", buffering=1)
        self.start_time = time.time()
        self._wandb = None
        if use_wandb:
            try:  # wandb is optional in this environment
                import wandb  # type: ignore

                token_file = "wandb.token"
                if os.path.exists(token_file):
                    with open(token_file) as fh:
                        wandb.login(key=fh.readline().strip())
                wandb.init(project="autovc-tpu", name=run_name, config=config)
                self._wandb = wandb
            except Exception as e:  # pragma: no cover
                print(f"[metrics] wandb unavailable ({e}); logging to JSONL only")

    def log(self, step: int, metrics: Mapping[str, Any]) -> None:
        rec = {"step": step, "time": time.time() - self.start_time}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            self._wandb.log(dict(metrics), step=step)

    def console(self, step: int, num_iters: int, metrics: Mapping[str, Any], keys=None):
        """Reference log-line format (solver_encoder.py:324-329)."""
        et = str(datetime.timedelta(seconds=time.time() - self.start_time))[:-7]
        line = f"Elapsed [{et}], Iteration [{step}/{num_iters}]"
        for k in keys or sorted(metrics):
            line += f", {k}: {float(metrics[k]):.4f}"
        print(line, flush=True)

    def close(self):
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
