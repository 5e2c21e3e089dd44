"""Component-level timing for the sampling hot path (run on the TPU).

Times, at the headline config (batch 64, 64x64, bf16 flagship UNet):
  unet_fwd       : one jitted UNet forward
  degrade_pair   : the two per-step degrade calls
  shift          : shift draw + add/sub
  sample_step    : one full reverse-loop body (scan of length 1)
Prints one JSON line with ms/step for each and the implied MXU utilization
for the UNet (est. FLOPs / measured time / peak).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20):
    fn(*args)  # compile
    jax.block_until_ready(fn(*args))
    # block every iteration: over the axon tunnel, waiting only on the last
    # result of a pipelined burst under-reports per-call latency
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / n


def conv_flops_unet(batch, size, channels=(128, 128, 256, 256, 512, 512), layers=2):
    """Rough conv-only forward FLOPs."""
    total = 0
    s = size
    prev = channels[0]
    total += 2 * batch * s * s * 3 * channels[0] * 9  # conv_in
    skips = [channels[0]]
    for i, c in enumerate(channels):
        for _ in range(layers):
            total += 2 * batch * s * s * prev * c * 9
            total += 2 * batch * s * s * c * c * 9
            if prev != c:
                total += 2 * batch * s * s * prev * c
            prev = c
            skips.append(c)
        if i != len(channels) - 1:
            total += 2 * batch * (s // 2) * (s // 2) * c * c * 9
            skips.append(c)
            s //= 2
    total += 3 * 2 * batch * s * s * prev * prev * 9  # mid (approx)
    rev = list(reversed(channels))
    for i, c in enumerate(rev):
        for _ in range(layers + 1):
            sk = skips.pop()
            total += 2 * batch * s * s * (prev + sk) * c * 9
            total += 2 * batch * s * s * c * c * 9
            total += 2 * batch * s * s * (prev + sk) * c
            prev = c
        if i != len(rev) - 1:
            s *= 2
            total += 2 * batch * s * s * c * c * 9
    total += 2 * batch * s * s * channels[0] * 3 * 9  # conv_out
    return total


def main():
    from masked_diffusion_tpu.config import Config
    from masked_diffusion_tpu.models import build_unet
    from masked_diffusion_tpu.ops import degrade as degrade_ops
    from masked_diffusion_tpu.ops import shift as shift_ops
    from masked_diffusion_tpu.ops.schedule import build_schedule
    from masked_diffusion_tpu.sample import make_sample_fn

    batch = int(os.environ.get("PROF_BATCH", 64))
    size = int(os.environ.get("PROF_SIZE", 64))
    steps = int(os.environ.get("PROF_STEPS", 8))
    # PROF_SELECT=indexing PROF_SCHEDULE=log profiles the reference-default
    # degrade mode (integer-count masks, main_train_masked.py:395);
    # PROF_SIZE/PROF_BATCH explore other workload shapes (e.g. 256x256 where
    # the pallas kmask kernel's O(32*HW) scan should beat the O(HW log HW)
    # sort — set MDT_PALLAS_KMASK=1 for the B arm)
    select = os.environ.get("PROF_SELECT", "thresholding")
    sched_name = os.environ.get("PROF_SCHEDULE", "linear")
    cfg = Config(
        method="mean_shift", data_size=size, ddpm_schedule=sched_name,
        ddpm_num_steps=steps, select_degrade_pixel=select,
        degrade_channel="1-channel", mean_option="degraded_area",
        mean_area="image-wise", shift_type="1-d_constant",
        momentum_adaptive="base_momentum", sampling_mask_dependency="independent",
        mixed_precision="bf16",
    )
    schedule = build_schedule(sched_name, steps, size, select)
    steps = schedule.num_steps
    model = build_unet(dim_channel=3, dim_height=size, dim_width=size,
                       num_attention=1, dtype=jnp.bfloat16)
    x1 = jnp.zeros((1, size, size, 3), jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), x1, jnp.zeros((1,)))

    x = jnp.asarray(np.random.default_rng(0).normal(size=(batch, size, size, 3)),
                    jnp.bfloat16)
    t = jnp.full((batch,), 5.0)
    key = jax.random.PRNGKey(0)

    fwd = jax.jit(lambda p, xx, tt: model.apply(p, xx, tt))
    t_fwd = timeit(fwd, params, x, t)

    amount = schedule.degrade_amount(jnp.full((batch,), 5, jnp.int32))

    @jax.jit
    def degrade_pair(k, img):
        k1, k2 = jax.random.split(k)
        a, _, _ = degrade_ops.degrade_independent_base_sampling(
            k1, img, amount, select, "1-channel", "degraded_area", "image-wise")
        b, _, _ = degrade_ops.degrade_independent_base_sampling(
            k2, img, amount, select, "1-channel", "degraded_area", "image-wise")
        return a + b

    xf = x.astype(jnp.float32)
    t_deg = timeit(degrade_pair, key, xf)

    @jax.jit
    def shift_only(k, img):
        s = shift_ops.schedule_shift(
            k, schedule.shift_ratio(jnp.full((batch,), 5, jnp.int32)),
            img.shape, "1-d_constant", 0.0)
        return img + s

    t_shift = timeit(shift_only, key, xf)

    used = schedule.timesteps_for_epoch(0, 10, scale=1)
    sample_fn = make_sample_fn(model, schedule, cfg, used)
    latent = jnp.full((batch, size, size, 3), 0.1, jnp.float32)
    t_loop = timeit(sample_fn, params, latent, key, n=5)
    t_step = t_loop / steps

    flops = conv_flops_unet(batch, size)
    result = {
        "unet_fwd_ms": round(t_fwd * 1e3, 2),
        "degrade_pair_ms": round(t_deg * 1e3, 2),
        "shift_ms": round(t_shift * 1e3, 2),
        "sample_step_ms": round(t_step * 1e3, 2),
        "overhead_ms": round((t_step - t_fwd) * 1e3, 2),
        "unet_conv_tflops_est": round(flops / 1e12, 2),
        "unet_tflops_per_s": round(flops / t_fwd / 1e12, 1),
        "mxu_util_vs_197tf": round(flops / t_fwd / 197e12, 3),
        "select_degrade_pixel": select,
        "schedule": sched_name,
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
