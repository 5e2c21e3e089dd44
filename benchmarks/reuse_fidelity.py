"""Encoder-reuse fidelity on a TRAINED model (VERDICT r4 next-step 2).

The r4 drift number (docs/results_r4/reuse.json: mean|exact-K| ~= 7.4) was
measured on a randomly perturbed UNTRAINED model, where 200 steps of iterate
divergence is chaotic and the number says nothing about the feature. This
harness loads a real checkpoint (the r5 convergence run,
digits 64^2, T=4096 log + indexing, base_sampling/independent — the
reference-default mode) and samples exact vs --encoder_reuse K in {2, 3}
with SHARED latents and SHARED keys, then reports:

  * ms/step per arm (throughput, same law as the r4 in-loop arms),
  * mean|exact - K| drift over the final samples (now interpretable: on a
    trained sampler the iterates are attracted to the data manifold),
  * per-arm sample diversity: unique count under the tester's 0.9
    cosine-similarity dedup (tester.py:53 semantics) + per-image std,
  * per-image cosine similarity exact<->K (how much each sample moved),

and renders a side-by-side grid (rows: exact / K=2 / K=3, same columns =
same latent+keys) to docs/results_r5/reuse_fidelity_grid.png.

Usage (TPU, serialize with other TPU jobs):
  RF_CKPT=<run>/checkpoint/checkpoint-epoch-999 python benchmarks/reuse_fidelity.py
Env: RF_SAMPLES (default 36), RF_OUT (default docs/results_r5), RF_SIZE,
RF_STEPS, RF_SCHEDULE, RF_SELECT to match a differently-configured ckpt.
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
    from masked_diffusion_tpu.data.datasets import get_dataset
    from masked_diffusion_tpu.data.histogram import compute_mean_histogram
    from masked_diffusion_tpu.io.checkpoint import load_checkpoint
    from masked_diffusion_tpu.ops.schedule import build_schedule
    from masked_diffusion_tpu.sample import latent_initial, make_sample_fn
    from masked_diffusion_tpu.train.optim import build_lr_schedule, build_optimizer
    from masked_diffusion_tpu.train.step import create_train_state
    from masked_diffusion_tpu.train.trainer import build_model_from_config
    from masked_diffusion_tpu.utils.grids import make_grid, normalize01, save_png

    ckpt = os.environ.get("RF_CKPT")
    if not ckpt or not os.path.isdir(ckpt):
        raise SystemExit(f"RF_CKPT must point at a checkpoint dir (got {ckpt!r})")
    out_dir = os.environ.get("RF_OUT", os.path.join("docs", "results_r5"))
    os.makedirs(out_dir, exist_ok=True)
    n = int(os.environ.get("RF_SAMPLES", 36))
    size = int(os.environ.get("RF_SIZE", 64))
    steps = int(os.environ.get("RF_STEPS", 4096))
    schedule_name = os.environ.get("RF_SCHEDULE", "log")
    select = os.environ.get("RF_SELECT", "indexing")

    def cfg_k(k: int) -> Config:
        return Config(
            method="mean_shift", data_name="digits", data_size=size,
            in_channel=1, out_channel=1, ddpm_schedule=schedule_name,
            ddpm_num_steps=steps, select_degrade_pixel=select,
            degrade_channel="1-channel", mean_option="degraded_area",
            mean_area="image-wise", shift_type="1-d_constant",
            momentum_adaptive="base_sampling",
            sampling_mask_dependency="independent", mixed_precision="bf16",
            sample_num=n, use_ema=True, encoder_reuse=k,
        )

    cfg = cfg_k(0)
    schedule = build_schedule(schedule_name, steps, size, select)
    used = schedule.timesteps_for_epoch(0, 10, scale=1)

    model = build_model_from_config(cfg)
    tx = build_optimizer("adamw", build_lr_schedule("constant", 1e-4, 0, 1))
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, size, size, 1), tx, use_ema=True
    )
    params, ema, _, meta = load_checkpoint(ckpt, state.params, state.ema_params, None)
    weights = ema if ema is not None else params
    print(json.dumps({
        "backend": jax.default_backend(), "ckpt": ckpt,
        "epoch": meta.get("epoch"), "global_step": meta.get("global_step"),
        "deduped_steps": int(len(used)),
    }), flush=True)

    # the trained run's latent law: inverse-CDF over the digits data-mean
    # histogram (sample_latent_shape='data') — shared across all arms
    dataset = get_dataset("", "digits", size)
    hist = compute_mean_histogram(dataset.data, n, cfg.mean_area)
    latent = latent_initial(
        jax.random.PRNGKey(100), n, 1, size, "data", cfg.mean_area, hist
    )
    key = jax.random.PRNGKey(7)  # SHARED sampling key across arms

    def cosine_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        fa = a.reshape(len(a), -1)
        fb = b.reshape(len(b), -1)
        fa = fa / (np.linalg.norm(fa, axis=1, keepdims=True) + 1e-8)
        fb = fb / (np.linalg.norm(fb, axis=1, keepdims=True) + 1e-8)
        return fa @ fb.T

    def unique_count(imgs: np.ndarray, thresh: float = 0.9) -> int:
        """Greedy cosine dedup, tester.py:53/150-186 semantics."""
        sim = cosine_matrix(imgs, imgs)
        keep: list[int] = []
        for i in range(len(imgs)):
            if all(sim[i, j] <= thresh for j in keep):
                keep.append(i)
        return len(keep)

    arms = {}
    samples = {}
    for arm, k in (("exact", 0), ("reuse2", 2), ("reuse3", 3)):
        fn = make_sample_fn(model, schedule, cfg_k(k), used)
        s = fn(weights, latent, key)
        jax.block_until_ready(s)  # compile + warm
        t0 = time.perf_counter()
        s = fn(weights, latent, key)
        float(jnp.sum(s))  # scalar fetch = true sync over the tunnel
        dt = time.perf_counter() - t0
        s_np = np.asarray(s, np.float32)
        samples[arm] = s_np
        arms[arm] = {
            "ms_per_step": round(dt / len(used) * 1e3, 3),
            "images_per_sec": round(n / dt, 4),
            "per_image_std": round(float(s_np.std(axis=(1, 2, 3)).mean()), 4),
            "unique_of_n": unique_count(s_np),
            "finite": bool(np.isfinite(s_np).all()),
        }
        if arm != "exact":
            diag = np.diag(cosine_matrix(samples["exact"], s_np))
            arms[arm]["mean_abs_drift"] = round(
                float(np.mean(np.abs(s_np - samples["exact"]))), 5
            )
            arms[arm]["cos_to_exact_mean"] = round(float(diag.mean()), 4)
            arms[arm]["cos_to_exact_min"] = round(float(diag.min()), 4)
        print(json.dumps({"bench": "reuse_fidelity", "arm": arm, "n": n,
                          **arms[arm]}), flush=True)

    # side-by-side grid: same column = same latent + same keys
    ncols = min(n, 12)
    rows = [normalize01(samples[a][:ncols]) for a in ("exact", "reuse2", "reuse3")]
    grid = make_grid(np.concatenate(rows, axis=0), nrow=ncols)
    grid_path = os.path.join(out_dir, "reuse_fidelity_grid.png")
    save_png(grid, grid_path)

    record = {"bench": "reuse_fidelity", "n": n, "size": size,
              "schedule": schedule_name, "select": select,
              "deduped_steps": int(len(used)), "ckpt_epoch": meta.get("epoch"),
              "grid": grid_path, **{f"{a}_{k}": v for a, d in arms.items()
                                    for k, v in d.items()}}
    print(json.dumps(record), flush=True)
    with open(os.path.join(out_dir, "reuse_fidelity.json"), "a") as f:
        f.write(json.dumps(record) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
