"""Mean-shift perturbations (reference scheduler.py:612-777).

The mean-shift trainer adds a random, timestep-scaled shift to the degraded
image before the UNet and inverts it afterwards; sampling does the same inside
the reverse loop. Six shift families; every one is scaled by ratio_list[t-1]
and broadcast to the mask shape.

Divergences from the reference, all deliberate:
  * channel counts derive from the input shape instead of the hardcoded 3
    (scheduler.py:657,692,700,707 break on 1-channel MNIST);
  * 'noise_with_perturbation' in the reference builds a perturbation term and
    then overwrites it (scheduler.py:708 vs :713 — shift_time = random*ratio
    discards the perturbation). The effective behavior (pure scaled Gaussian)
    is preserved; pass combine_perturbation=True to get the intended
    perturbation+noise form.
  * 'noise_std_reduction' vectorizes the per-image loop (scheduler.py:693-694)
    as noise * ratio[:,None,None,None], which is distribution-identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray

SHIFT_TYPES = (
    "1-d_constant",
    "3-d_constant",
    "noise_reduction",
    "noise_std_reduction",
    "noise_with_perturbation",
    "non_shift",
)


def schedule_shift(
    key: Array,
    ratios_t: Array,
    shape: tuple,
    shift_type: str,
    noise_mean: float = 0.0,
    dtype=jnp.float32,
    combine_perturbation: bool = False,
) -> Array:
    """Draw the per-step shift field.

    Args:
      key: PRNG key.
      ratios_t: (B,) ratio_list[t-1] for each batch element.
      shape: (B, H, W, C) target/mask shape the shift broadcasts to.
      shift_type: one of SHIFT_TYPES.
      noise_mean: mean of the Gaussian families (--noise_mean).
      combine_perturbation: opt-in fix of the reference's discarded
        perturbation term in 'noise_with_perturbation'.

    Returns a (B, H, W, C) shift field of `dtype`.
    """
    b, h, w, c = shape
    r = ratios_t.astype(jnp.float32)

    if shift_type == "1-d_constant":
        rand = jax.random.uniform(key, (b,), minval=-1.0, maxval=1.0)
        shift = (rand * r)[:, None, None, None]

    elif shift_type == "3-d_constant":
        rand = jax.random.uniform(key, (b, 1, 1, c), minval=-1.0, maxval=1.0)
        shift = rand * r[:, None, None, None]

    elif shift_type == "noise_reduction":
        rand = noise_mean + jax.random.normal(key, (b, h, w, 1))
        shift = rand * r[:, None, None, None]

    elif shift_type == "noise_std_reduction":
        rand = jax.random.normal(key, (b, h, w, c))
        shift = noise_mean + rand * r[:, None, None, None]

    elif shift_type == "noise_with_perturbation":
        k_noise, k_pert = jax.random.split(key)
        rand = noise_mean + jax.random.normal(k_noise, (b, h, w, c))
        if combine_perturbation:
            pert = jax.random.uniform(k_pert, (b, 1, 1, 1), minval=-1.0, maxval=1.0)
            shift = (pert + rand) * r[:, None, None, None]
        else:
            # reference effective behavior: perturbation computed then discarded
            shift = rand * r[:, None, None, None]

    elif shift_type == "non_shift":
        shift = jnp.zeros((b, 1, 1, 1))

    else:
        raise ValueError(f"unknown shift_type: {shift_type!r}")

    return jnp.broadcast_to(shift.astype(dtype), shape)


def schedule_shift_interpolation(
    ratios_t: Array,
    mu: Array,
    interpolation_shift: float,
    shape: tuple,
    dtype=jnp.float32,
) -> Array:
    """Deterministic interpolation shift clamped around the latent mean
    (scheduler.py:735-754): shift = c * ratio, clamped to [-mu-r, -mu+r]."""
    b = shape[0]
    r = ratios_t.astype(jnp.float32)
    shift = jnp.full((b,), float(interpolation_shift)) * r
    mu = jnp.reshape(mu.astype(jnp.float32), (-1,))
    shift = jnp.clip(shift, -1.0 * mu - r, -1.0 * mu + r)
    return jnp.broadcast_to(shift[:, None, None, None].astype(dtype), shape)


def perturb_shift(data: Array, shift: Array) -> Array:
    """x + shift (scheduler.py:757-766)."""
    return data + shift


def perturb_shift_inverse(data: Array, shift: Array) -> Array:
    """x - shift (scheduler.py:769-777)."""
    return data - shift
