"""Multi-host (multi-process) utilities.

The reference launches one torch process per GPU and initializes NCCL
(reference: train.py:114-118, distributed.py:40-68). The JAX counterpart is
one process per HOST with jax.distributed.initialize(); inside a process,
GSPMD handles every device. Loss/metrics computed by a jitted step on
global arrays are already global (the mesh spans all processes), so the
reference's per-step loss gather (base.py:485-498) is only needed for
HOST-side numbers (eval metrics computed in numpy) — process_allmean below.
"""

import os
from typing import Dict

import jax
import numpy as np


def maybe_initialize_distributed() -> bool:
    """Env-gated jax.distributed.initialize() (reference train.py:114-118).

    Triggers when a coordinator is configured — either explicitly via
    CONTRASTORS_TPU_MULTIHOST=1 (auto-detection on TPU pods) or via
    JAX_COORDINATOR_ADDRESS / COORDINATOR_ADDRESS (+ NUM_PROCESSES,
    PROCESS_ID for CPU/GPU clusters). Returns True when initialized.
    Safe to call twice (no-ops if the client is already created).
    """
    explicit = os.environ.get("CONTRASTORS_TPU_MULTIHOST", "").lower() in ("1", "true")
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS")
    if not explicit and not coord:
        return False
    try:
        if jax._src.distributed.global_state.client is not None:  # already up
            return True
    except Exception:  # noqa: BLE001 - private API probe only
        pass
    kwargs = {}
    if coord:
        kwargs["coordinator_address"] = coord
        if os.environ.get("NUM_PROCESSES"):
            kwargs["num_processes"] = int(os.environ["NUM_PROCESSES"])
        if os.environ.get("PROCESS_ID"):
            kwargs["process_id"] = int(os.environ["PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    return True


def process_allmean(metrics: Dict[str, float]) -> Dict[str, float]:
    """Mean scalar metrics across processes (reference base.py:485-498
    gather+mean). No-op single-process; keys must match on every process."""
    if jax.process_count() == 1 or not metrics:
        return metrics
    from jax.experimental import multihost_utils

    keys = sorted(k for k, v in metrics.items() if isinstance(v, (int, float, np.floating)))
    if not keys:
        return metrics
    local = np.asarray([float(metrics[k]) for k in keys], np.float32)
    gathered = multihost_utils.process_allgather(local)  # [nproc, len(keys)]
    out = dict(metrics)
    means = np.mean(np.asarray(gathered), axis=0)
    for k, m in zip(keys, means):
        out[k] = float(m)
    return out


def process_allmin(metrics: Dict[str, float]) -> Dict[str, float]:
    """Min scalar metrics across processes — for gates where one bad rank
    must flip the global decision (e.g. packing's dry-pack kept fraction:
    averaging would mask a single truncating rank)."""
    if jax.process_count() == 1 or not metrics:
        return metrics
    from jax.experimental import multihost_utils

    keys = sorted(k for k, v in metrics.items() if isinstance(v, (int, float, np.floating)))
    if not keys:
        return metrics
    local = np.asarray([float(metrics[k]) for k in keys], np.float32)
    gathered = multihost_utils.process_allgather(local)
    out = dict(metrics)
    mins = np.min(np.asarray(gathered), axis=0)
    for k, m in zip(keys, mins):
        out[k] = float(m)
    return out
