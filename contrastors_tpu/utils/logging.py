"""Metrics logging: wandb when available+enabled, JSONL + stdout otherwise
(reference: trainers/base.py:161-184 wandb tracker,
distributed.py:71-81 rank-zero guard)."""

import json
import os
import time
from typing import Any, Dict, Optional

import jax


def _to_py(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return v


class Tracker:
    def __init__(
        self,
        enabled_wandb: bool = False,
        project: Optional[str] = None,
        entity: Optional[str] = None,
        run_name: Optional[str] = None,
        group: Optional[str] = None,
        output_dir: Optional[str] = None,
        hyperparams: Optional[Dict[str, Any]] = None,
        print_every: int = 10,
    ):
        self.is_main = jax.process_index() == 0
        self.print_every = print_every
        self._wandb = None
        self._jsonl = None
        if not self.is_main:
            return
        if enabled_wandb:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=project, entity=entity, name=run_name, group=group, config=hyperparams
                )
            except Exception as e:  # offline container: fall through to jsonl
                print(f"[tracker] wandb unavailable ({e}); logging to jsonl")
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            self._jsonl = open(os.path.join(output_dir, "metrics.jsonl"), "a")
        self._t0 = time.time()

    def log(self, metrics: Dict[str, Any], step: int):
        if not self.is_main:
            return
        payload = {k: _to_py(v) for k, v in metrics.items()}
        if self._wandb is not None:
            self._wandb.log(payload, step=step)
        if self._jsonl is not None:
            self._jsonl.write(json.dumps({"step": step, "t": time.time() - self._t0, **payload}) + "\n")
            self._jsonl.flush()
        if step % self.print_every == 0:
            brief = " ".join(f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}" for k, v in payload.items())
            print(f"[step {step}] {brief}", flush=True)

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()
        if self._jsonl is not None:
            self._jsonl.close()
