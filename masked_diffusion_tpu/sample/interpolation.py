"""Interpolation sampler (reference sampler.py:264-366).

Sweeps a grid of constant-image latents across [-1, 1] (shifted by
interpolation_shift) and runs the reverse loop with a *deterministic* shift
clamped around each latent's mean and a *shared* degradation mask across the
batch — so the batch dimension becomes an interpolation axis through data
space. One jitted lax.scan, like the main sampler.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from masked_diffusion_tpu.config import Config
from masked_diffusion_tpu.ops import degrade as degrade_ops
from masked_diffusion_tpu.ops import shift as shift_ops
from masked_diffusion_tpu.ops.schedule import MaskSchedule
from masked_diffusion_tpu.sample.latent import latent_initial_interpolation


def make_interpolation_sample_fn(
    model,
    schedule: MaskSchedule,
    cfg: Config,
    used_timesteps: np.ndarray,
    interpolation_shift: float,
    compute_dtype=None,
    mesh_plan=None,
) -> Callable:
    """Build sample(params, key) -> (sample_0, mu).

    With a mesh_plan, the latent grid is padded (repeating the last grid
    point) to a multiple of the mesh's data size and committed onto the batch
    sharding — matching generate_images' placement (sample/generate.py:54-56,
    82-83) so the cadence scan shards over chips instead of leaving a 100-row
    uncommitted host array to GSPMD; the returned sample is trimmed back.
    """
    used = np.asarray(used_timesteps, dtype=np.int32)
    n_steps = int(len(used))
    ts_dev = jnp.asarray(used)
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if cfg.weight_dtype == "bfloat16" else jnp.float32

    rule = cfg.momentum_adaptive
    if rule not in ("base_momentum", "momentum", "boosting"):
        raise ValueError(
            f"momentum_adaptive {rule!r} unsupported for interpolation sampling"
        )
    # interpolation masks are ratio thresholds; 'indexing' counts would make
    # them garbage (config.py:validate_sampling_modes)
    from masked_diffusion_tpu.config import validate_sampling_modes

    validate_sampling_modes(cfg)

    num = cfg.sample_num
    latent, mu = latent_initial_interpolation(
        num, cfg.out_channel, cfg.data_size, interpolation_shift
    )
    # under --mesh_spatial the latent carries P('data','model') and the scan
    # body pins that layout, like sample/loop.py (parallel/sp.py); mu is
    # per-image (not image-shaped) and stays on the data axis either way
    act_sharding = None
    if mesh_plan is not None:
        mult = mesh_plan.data_size
        if num % mult:
            pad = mult - num % mult
            latent = jnp.concatenate([latent, jnp.repeat(latent[-1:], pad, axis=0)])
            mu = jnp.concatenate([mu, jnp.repeat(mu[-1:], pad, axis=0)])
        latent_sharding = mesh_plan.batch_sharding
        if cfg.mesh_spatial:
            from masked_diffusion_tpu.parallel.sp import (
                activation_sharding,
                validate_spatial,
            )

            validate_spatial(mesh_plan, cfg.data_size)
            latent_sharding = act_sharding = activation_sharding(mesh_plan)
        latent = jax.device_put(latent, latent_sharding)
        mu = jax.device_put(mu, mesh_plan.batch_sharding)

    def sample_impl(params, key):
        def body(carry, i):
            sample_t, _, mask_next_prev, momentum, key = carry
            if act_sharding is not None:
                # pin every image-shaped carry to the SP layout (sample/loop.py)
                sample_t, mask_next_prev, momentum = (
                    jax.lax.with_sharding_constraint(x, act_sharding)
                    for x in (sample_t, mask_next_prev, momentum)
                )
            b = sample_t.shape[0]
            t = jnp.take(ts_dev, i)
            tvec = jnp.broadcast_to(t, (b,)).astype(jnp.int32)
            is_last = i == 0
            key, k_deg = jax.random.split(key)

            shift = shift_ops.schedule_shift_interpolation(
                schedule.shift_ratio(tvec), mu, interpolation_shift, sample_t.shape
            )
            shifted = sample_t + shift
            out = model.apply(
                params, shifted.astype(compute_dtype), tvec.astype(jnp.float32),
                deterministic=True,
            ).astype(jnp.float32)
            sample_0 = (shifted + out) - shift

            next_tvec = jnp.where(is_last, tvec, tvec - 1)
            amount_next = schedule.degrade_amount(next_tvec)

            degraded_t = degrade_ops.degrade_with_mask(
                sample_0, mask_next_prev, cfg.mean_option, cfg.mean_area
            )
            degraded_next, mask_next, _ = degrade_ops.degrade_interpolation_sampling(
                k_deg, sample_0, amount_next, cfg.mean_option, cfg.mean_area
            )

            difference = sample_t - degraded_t
            if rule == "base_momentum":
                new_sample_t = degraded_next + difference
            elif rule == "momentum":
                r = cfg.adaptive_momentum_rate
                momentum = (1.0 - r) * momentum + r * difference
                new_sample_t = momentum + degraded_next
            else:  # boosting (effective reference behavior)
                momentum = difference
                new_sample_t = momentum + degraded_next
            # the reference only updates state when i > 0 (sampler.py:316)
            new_sample_t = jnp.where(is_last, sample_t, new_sample_t)
            mask_next = jnp.where(is_last, mask_next_prev, mask_next)

            return (new_sample_t, sample_0, mask_next, momentum, key), None

        zeros = jnp.zeros_like(latent)
        carry = (latent, zeros, zeros, zeros, key)
        idx = jnp.arange(n_steps - 1, -1, -1)
        carry, _ = jax.lax.scan(body, carry, idx)
        # trim mesh padding back to the requested grid
        return carry[1][:num], mu[:num]

    return jax.jit(sample_impl)
