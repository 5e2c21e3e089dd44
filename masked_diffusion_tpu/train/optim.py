"""Optimizers and LR schedules (optax).

Mirrors the reference's get_optimizer / get_lr_scheduler
(main_train_masked.py:134-165), which wrap torch optimizers and the HF
transformers warmup schedules:

  cosine      : linear warmup, then 0.5*(1+cos(pi * cycles * 2 * progress))
  hard_cosine : warmup, then cosine with hard restarts over `cycles`
  constant    : warmup to lr, then flat
  linear      : warmup, then linear decay to 0

Gradient clipping (global norm 1.0, trainer_masked.py:145) and gradient
accumulation (optax.MultiSteps replaces accelerator.accumulate) are composed
here so the train step sees a single optax transform.
"""

from __future__ import annotations

import math
from typing import Optional

import optax


def build_lr_schedule(
    name: str,
    lr: float,
    warmup_steps: int,
    total_steps: int,
    num_cycles: float = 0.5,
) -> optax.Schedule:
    warmup_steps = max(0, int(warmup_steps))

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, dtype=jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        denom = jnp.maximum(1.0, total_steps - warmup_steps)
        progress = jnp.clip((step - warmup_steps) / denom, 0.0, 1.0)

        if name == "cosine":
            decay = jnp.maximum(
                0.0, 0.5 * (1.0 + jnp.cos(math.pi * num_cycles * 2.0 * progress))
            )
        elif name == "hard_cosine":
            cyc = jnp.mod(progress * num_cycles, 1.0)
            decay = jnp.where(
                progress >= 1.0, 0.0, jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(math.pi * cyc)))
            )
        elif name == "constant":
            decay = 1.0
        elif name == "linear":
            decay = 1.0 - progress
        else:
            raise ValueError(f"unknown lr_scheduler: {name!r}")

        return lr * jnp.where(step < warmup_steps, warm, decay)

    if name not in ("cosine", "hard_cosine", "constant", "linear"):
        raise ValueError(f"unknown lr_scheduler: {name!r}")
    return schedule


def build_optimizer(
    optim_name: str,
    schedule: optax.Schedule,
    grad_clip_norm: Optional[float] = 1.0,
    gradient_accumulation_steps: int = 1,
) -> optax.GradientTransformation:
    name = optim_name.lower()
    if name == "sgd":
        base = optax.sgd(schedule)
    elif name == "adam":
        base = optax.adam(schedule)
    elif name == "adamw":
        # torch.optim.AdamW default weight_decay=0.01 (the reference uses it
        # unmodified, main_train_masked.py:139-140)
        base = optax.adamw(schedule, weight_decay=0.01)
    else:
        raise ValueError(f"unknown optimizer: {optim_name!r}")

    parts = []
    if grad_clip_norm is not None:
        parts.append(optax.clip_by_global_norm(grad_clip_norm))
    parts.append(base)
    tx = optax.chain(*parts)

    if gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=gradient_accumulation_steps)
    return tx
