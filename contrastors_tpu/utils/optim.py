"""Optimizer and LR schedules.

Counterpart of the reference AdamW setup (reference: optimizer.py:7-48 —
decay/no-decay split: no decay for <2-D params, biases, LayerNorm weights,
logit_scale) and the HF get_scheduler call (reference: trainers/base.py:228-265).
DeepSpeed ZeRO-2 is replaced by sharding the optax state pytree over the
data mesh axis (parallel/sharding.py) — no engine needed.
"""

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax


def decay_mask(params) -> Any:
    """True where weight decay applies (reference optimizer.py:16-28)."""

    def keep(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        if any("logit_scale" in str(n) for n in names):
            return False
        if names and str(names[-1]) in ("bias",):
            return False
        # LayerNorm/RMSNorm scales, layerscale vectors, embeddings' 1-D, etc.
        # (squeezed rank < 2, computed from the shape tuple — no allocation)
        if sum(d > 1 for d in leaf.shape) < 2:
            return False
        return True

    return jax.tree_util.tree_map_with_path(keep, params)


def make_schedule(
    schedule_type: str,
    learning_rate: float,
    total_steps: int,
    warmup_steps: int = 0,
    cooldown_steps: Optional[int] = None,
):
    """linear / cosine / constant(_with_warmup) / inverse_sqrt — the HF
    get_scheduler family the reference recipes use."""
    # HF warmup: lr * (step+1)/warmup — the first applied step is
    # lr/warmup_steps, NOT 0 (a 0-lr first step is a wasted optimizer step;
    # round-1 Weak #8)
    warmup = optax.linear_schedule(
        learning_rate / max(warmup_steps, 1), learning_rate, max(warmup_steps, 1)
    )
    rest = max(total_steps - warmup_steps, 1)
    if schedule_type == "linear":
        main = optax.linear_schedule(learning_rate, 0.0, rest)
    elif schedule_type == "cosine":
        main = optax.cosine_decay_schedule(learning_rate, rest)
    elif schedule_type in ("constant", "constant_with_warmup"):
        main = optax.constant_schedule(learning_rate)
    elif schedule_type == "inverse_sqrt":

        def main(step):
            # HF inverse_sqrt: lr * sqrt(warmup) / sqrt(step)
            s = jnp.maximum(step + warmup_steps, 1)
            return learning_rate * jnp.sqrt(jnp.maximum(warmup_steps, 1) / s)

    else:
        raise ValueError(f"unknown schedule_type {schedule_type!r}")
    sched = optax.join_schedules([warmup, main], [warmup_steps])
    if cooldown_steps:
        def with_cooldown(step):
            base = sched(jnp.minimum(step, total_steps))
            frac = jnp.clip((step - (total_steps - cooldown_steps)) / cooldown_steps, 0.0, 1.0)
            return base * (1.0 - frac)

        return with_cooldown
    return sched


def make_optimizer(
    params,
    learning_rate,
    weight_decay: float = 0.0,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    max_grad_norm: Optional[float] = None,
    frozen_mask: Optional[Any] = None,
):
    """AdamW with the reference's decay partition; optional grad clipping and
    a frozen mask (True = trainable) replacing requires_grad=False."""
    mask = decay_mask(params)
    chain = []
    if max_grad_norm is not None and max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(
        optax.adamw(
            learning_rate=learning_rate,
            b1=beta1,
            b2=beta2,
            eps=eps,
            weight_decay=weight_decay,
            mask=mask,
        )
    )
    tx = optax.chain(*chain)
    if frozen_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree_util.tree_map(lambda t: "train" if t else "freeze", frozen_mask),
        )
    return tx
