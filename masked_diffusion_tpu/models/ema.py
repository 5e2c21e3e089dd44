"""Exponential moving average of parameters.

Matches the diffusers EMAModel warmup law the reference configures
(main_train_masked.py:116-131: use_ema_warmup=True, inv_gamma, power,
max_decay): decay(step) = 1 - (1 + step/inv_gamma)^(-power), clamped to
[min_decay, max_decay], with step = optimization_step - 1 and decay forced to
0 at the first step (so the EMA starts as a copy of the online params).

In JAX this is a pure tree update — the reference's store/copy_to/restore
parameter-swap dance around sampling (trainer_masked_mean_shift.py:412-419)
disappears: sampling simply receives ema_params.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_decay(
    optimization_step,
    inv_gamma: float = 1.0,
    power: float = 0.75,
    min_decay: float = 0.0,
    max_decay: float = 0.9999,
    use_warmup: bool = True,
):
    """Decay value at an optimization step (1-indexed, i.e. after increment)."""
    step = jnp.maximum(0, jnp.asarray(optimization_step) - 1).astype(jnp.float32)
    if use_warmup:
        cur = 1.0 - (1.0 + step / inv_gamma) ** (-power)
    else:
        cur = (1.0 + step) / (10.0 + step)
    cur = jnp.clip(cur, min_decay, max_decay)
    return jnp.where(step <= 0, 0.0, cur)


def ema_update(
    ema_params,
    params,
    optimization_step,
    inv_gamma: float = 1.0,
    power: float = 0.75,
    min_decay: float = 0.0,
    max_decay: float = 0.9999,
    use_warmup: bool = True,
):
    """ema <- decay*ema + (1-decay)*params, elementwise over the tree."""
    decay = ema_decay(
        optimization_step, inv_gamma, power, min_decay, max_decay, use_warmup
    )
    return jax.tree.map(
        lambda e, p: (decay * e + (1.0 - decay) * p.astype(e.dtype)).astype(e.dtype),
        ema_params,
        params,
    )
