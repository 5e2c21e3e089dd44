"""Train-step roofline profile: XLA cost analysis + honest timing (TPU).

Companion to profile_step.py (which covers the sampling hot path). This
profiles the full jitted train step (make_train_step: degrade -> shift ->
UNet fwd/bwd -> clip -> adamw -> EMA, train/step.py) at the flagship config
and reports the HBM roofline implied by XLA's cost analysis.

Measured on v5e (2026-08, batch 64, 64x64, bf16 compute / fp32 master):
  fwd        : 1.894 TFLOP,  9.68 GB accessed
  fwd+bwd    : 5.685 TFLOP, 33.46 GB
  full step  : 5.688 TFLOP, 41.82 GB  -> roofline 51.1 ms @ 819 GB/s
  measured   : 61.1 ms/step here (donate=False); bench.py's donated-buffer
               loop runs ~58 ms (17.3 steps/s) = 84-88% of HBM roofline
The optimizer/EMA tail adds 8.4 GB over fwd+bwd (adamw moments + params fp32
read/write, EMA read/write, clip-norm read) — all irreducible at fp32 master
precision; bf16 moments/EMA would lose the ~1e-4-relative updates bf16
cannot represent.

Timing note: per-call `block_until_ready` over the axon tunnel under-reports
(an AOT call appeared to finish a 1.9-TFLOP forward in 0.73 ms); this script
times a 10-step Python loop and fetches a scalar off the final state for
ground truth, the same method bench.py uses.
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


def main() -> int:
    from masked_diffusion_tpu.config import Config
    from masked_diffusion_tpu.models import build_unet
    from masked_diffusion_tpu.ops.schedule import build_schedule
    from masked_diffusion_tpu.train import (
        build_lr_schedule,
        build_optimizer,
        create_train_state,
        make_train_step,
    )

    batch = int(os.environ.get("PROF_BATCH", 64))
    size = int(os.environ.get("PROF_DATA_SIZE", 64))
    cfg = Config(
        method="mean_shift", data_size=size, ddpm_schedule="linear",
        ddpm_num_steps=1000, select_degrade_pixel="thresholding",
        degrade_channel="1-channel", mean_option="degraded_area",
        mean_area="image-wise", shift_type="1-d_constant",
        momentum_adaptive="base_momentum", sampling_mask_dependency="independent",
        mixed_precision="bf16", batch_size=batch, use_ema=True,
    )
    schedule = build_schedule("linear", 1000, size, "thresholding")
    used = schedule.timesteps_for_epoch(0, 10, scale=1)
    model = build_unet(dim_channel=3, dim_height=size, dim_width=size,
                       num_attention=1, dtype=jnp.bfloat16)
    lr = build_lr_schedule("cosine", 1e-4, 0, 1000)
    tx = build_optimizer("adamw", lr, 1.0)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (batch, size, size, 3), tx
    )

    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (batch, size, size, 3)),
        jnp.float32,
    )
    key = jax.random.PRNGKey(3)

    step_fn = make_train_step(model, schedule, cfg, tx, used, lr, donate=False)
    compiled = jax.jit(step_fn).lower(state, x, key).compile()
    ca = compiled.cost_analysis()
    flops = float(ca.get("flops", 0.0))
    gbytes = float(ca.get("bytes accessed", 0.0)) / 1e9

    state, _ = compiled(state, x, key)  # warm
    jax.block_until_ready(state.params)
    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        state, metrics = compiled(state, x, jax.random.PRNGKey(4 + i))
    _ = float(jnp.sum(metrics["train_loss"]))  # scalar fetch = true sync
    step_ms = (time.perf_counter() - t0) / n * 1e3

    roofline_ms = gbytes / 819.0 * 1e3  # v5e ~819 GB/s HBM
    print(json.dumps({
        "step_ms": round(step_ms, 2),
        "steps_per_sec": round(1e3 / step_ms, 2),
        "imgs_per_sec": round(batch * 1e3 / step_ms, 1),
        "step_flops_T": round(flops / 1e12, 3),
        "step_GB_accessed": round(gbytes, 2),
        "hbm_roofline_ms_at_819GBs": round(roofline_ms, 1),
        "pct_of_roofline": round(100 * roofline_ms / step_ms, 1),
        "batch": batch,
        "data_size": size,
        "backend": jax.default_backend(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
