"""Standalone generation: checkpoint -> N images (the serving path).

The reference can only sample as a side effect of training (the save-cadence
EMA grids, trainer_masked_mean_shift.py:409-429) or through the Tester's
diversity loop (tester.py:57-133); there is no way to simply generate N
images from a trained checkpoint. This module adds that serving surface,
TPU-native: one jitted scan sampler reused across batches, latents sharded
over the device mesh's data axis (every chip samples its slice of each
batch), images written as PNG grids + per-image files.

CLI: `--method sample --test_model_path <checkpoint-epoch-N>` (or
`--resume_from_checkpoint latest --output_dir <run>/checkpoint`).
"""

from __future__ import annotations

import math
import os
import time
from typing import Optional

import jax
import numpy as np

from masked_diffusion_tpu.config import Config
from masked_diffusion_tpu.ops.schedule import MaskSchedule
from masked_diffusion_tpu.parallel.mesh import MeshPlan
from masked_diffusion_tpu.sample import latent_initial, make_sample_fn
from masked_diffusion_tpu.utils.grids import normalize01, save_image_grid, save_png


def generate_images(
    cfg: Config,
    model,
    params,
    schedule: MaskSchedule,
    dataset_hist=None,
    mesh_plan: Optional[MeshPlan] = None,
    num_images: Optional[int] = None,
    batch_size: Optional[int] = None,
    key=None,
    out_dir: Optional[str] = None,
    save_individual: bool = True,
) -> dict:
    """Sample `num_images` from `params` in mesh-sharded batches.

    Returns {"images": (N,H,W,C) float array in model space,
    "images_per_sec": float, "batches": int}. When `out_dir` is set, writes
    `sample_NNNNN.png` per image (per-image normalized, like the reference's
    local grids) and one `sample_grid.png` per batch.
    """
    num = int(num_images or cfg.sample_num)
    batch = int(batch_size or min(num, cfg.batch_size))
    if mesh_plan is not None:
        # the mesh shards the batch axis; round up so every chip gets a slice
        from masked_diffusion_tpu.parallel.mesh import round_up

        batch = round_up(batch, mesh_plan.data_size)

    # the Tester's fixed curriculum slice (tester.py:62)
    used = schedule.timesteps_for_epoch(1, 10, cfg.scheduler_num_scale_timesteps)
    # spatial partitioning (parallel/sp.py): latents carry P('data','model')
    # and the scan body pins that layout; params replicate as in pure DP
    latent_sharding = mesh_plan.batch_sharding if mesh_plan is not None else None
    act_sharding = None
    if mesh_plan is not None and cfg.mesh_spatial:
        from masked_diffusion_tpu.parallel.sp import (
            activation_sharding,
            validate_spatial,
        )

        validate_spatial(mesh_plan, cfg.data_size)
        latent_sharding = act_sharding = activation_sharding(mesh_plan)
    sample_fn = make_sample_fn(
        model, schedule, cfg, used, activation_sharding=act_sharding,
        mesh=mesh_plan.mesh if mesh_plan is not None else None,
    )
    if mesh_plan is not None:
        if mesh_plan.model_size > 1 and not cfg.mesh_spatial:
            from masked_diffusion_tpu.parallel.tp import shard_tree

            params = shard_tree(mesh_plan, params, cfg.tp_min_features)
        else:
            params = jax.device_put(params, mesh_plan.replicated)

    if key is None:
        key = jax.random.PRNGKey(cfg.seed)

    n_batches = int(math.ceil(num / batch))
    chunks = []
    t_first = None
    t0 = time.perf_counter()
    for i in range(n_batches):
        k_lat, k_samp = jax.random.split(jax.random.fold_in(key, i))
        latent = latent_initial(
            k_lat, batch, cfg.out_channel, cfg.data_size,
            cfg.sample_latent_shape, cfg.mean_area, dataset_hist,
        )
        if latent_sharding is not None:
            latent = jax.device_put(latent, latent_sharding)
        out = sample_fn(params, latent, k_samp)
        sample = out[0] if isinstance(out, tuple) else out
        chunks.append(np.asarray(sample))  # host fetch = true sync
        if t_first is None:
            t_first = time.perf_counter() - t0  # first batch pays the compile
    elapsed = time.perf_counter() - t0
    images = np.concatenate(chunks, axis=0)[:num]

    # steady-state throughput over REAL (unpadded) images: exclude the compile
    # batch when there is more than one batch, else the conservative all-in
    # figure; the mesh round-up padding never counts
    if n_batches > 1:
        ips = (num - min(batch, num)) / max(elapsed - t_first, 1e-9)
    else:
        ips = num / max(elapsed, 1e-9)

    if out_dir is not None:
        for b, chunk in enumerate(chunks):
            # trim the final chunk so mesh-padding images are not rendered
            real = chunk[: max(0, num - b * batch)]
            if len(real):
                save_image_grid(real, "image", out_dir, f"sample_grid_{b:04d}.png")
        if save_individual:
            # normalize01 is per-image over axis 0, so normalize the batch
            # once and index into it
            norm = normalize01(images)
            for idx in range(len(norm)):
                save_png(norm[idx], os.path.join(out_dir, f"sample_{idx:05d}.png"))

    return {"images": images, "images_per_sec": ips, "batches": n_batches}
