"""Latent initialization for the reverse process (reference sampler.py:46-99).

The default 'data' mode inverse-CDF samples a per-image mean from the
training-set mean histogram (built in data/histogram.py, mirroring
main_train_masked.py:60-87), then broadcasts it to a constant image — the
masked process's analog of the Gaussian prior. Alternatives: zero / normal /
uniform / grid constant images.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def latent_initial(
    key: Array,
    sample_num: int,
    out_channel: int,
    data_size: int,
    sample_latent_shape: str = "data",
    mean_area: str = "image-wise",
    dataset_hist: Optional[tuple] = None,
) -> Array:
    """Constant-image latents (N, H, W, C)."""
    mode = sample_latent_shape.lower()
    dim_sample = 1 if mean_area == "image-wise" else out_channel

    if mode == "data":
        if dataset_hist is None or dataset_hist[0] is None:
            raise ValueError("sample_latent_shape='data' needs a dataset histogram")
        hist_shape, bin_edges, cum_sum = dataset_hist
        k_bin, key = jax.random.split(key)
        val_random = jax.random.uniform(k_bin, (sample_num,))
        flat_idx = jnp.searchsorted(jnp.asarray(cum_sum), val_random)
        flat_idx = jnp.clip(flat_idx, 0, int(jnp.prod(jnp.asarray(hist_shape))) - 1)
        index_bin = jnp.unravel_index(flat_idx, tuple(int(s) for s in hist_shape))
        means = []
        for c in range(dim_sample):
            k_c, key = jax.random.split(key)
            edges = jnp.asarray(bin_edges[c])
            lo = jnp.take(edges, index_bin[c])
            hi = jnp.take(edges, index_bin[c] + 1)
            val = (hi - lo) * jax.random.uniform(k_c, (sample_num,)) + lo
            means.append(val)
        sample_mean = jnp.stack(means, axis=-1)
    elif mode == "zero":
        sample_mean = jnp.zeros((sample_num, dim_sample))
    elif mode == "normal":
        sample_mean = jax.random.normal(key, (sample_num, dim_sample))
    elif mode == "uniform":
        sample_mean = jax.random.uniform(key, (sample_num, dim_sample), minval=-1.0, maxval=1.0)
    elif mode == "grid":
        sample_mean = jnp.linspace(-1.0, 1.0, sample_num)[:, None]
    else:
        raise ValueError(f"unknown sample_latent_shape: {sample_latent_shape!r}")

    sample = sample_mean[:, None, None, :]
    return jnp.broadcast_to(sample, (sample_num, data_size, data_size, out_channel)).astype(
        jnp.float32
    )


def latent_initial_interpolation(
    sample_num: int,
    out_channel: int,
    data_size: int,
    interpolation_shift: float,
) -> Tuple[Array, Array]:
    """Grid of constant images spanning [-1, 1] adjusted by the interpolation
    shift (sampler.py:86-99). Returns (latent, mu)."""
    if interpolation_shift > 0:
        grid = jnp.linspace(-1.0, 1.0 - interpolation_shift, sample_num)
    elif interpolation_shift < 0:
        grid = jnp.linspace(-1.0 - interpolation_shift, 1.0, sample_num)
    else:
        grid = jnp.linspace(-1.0, 1.0, sample_num)
    latent = jnp.broadcast_to(
        grid[:, None, None, None], (sample_num, data_size, data_size, out_channel)
    ).astype(jnp.float32)
    return latent, grid
