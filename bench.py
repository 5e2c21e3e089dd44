"""Round benchmark: sampling throughput on real TPU hardware.

Headline metric (BASELINE.json): sampled images/sec/chip for a 1000-step
masked-DDPM reverse loop at 64x64 with the flagship UNet
(block_out_channels=(128,128,256,256,512,512), attention per num_attention=1),
bf16 compute. vs_baseline is measured against the cached CPU-reference probe
(benchmarks/torch_cpu_reference.py — the same architecture + per-step
arithmetic on CPU torch, since the reference repo neither runs as checked in
nor publishes numbers; target is >=10x).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N, ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _wait_for_tpu(max_wait_s: float) -> None:
    """Bounded wait for the TPU backend to come up.

    The axon tunnel occasionally drops; a bench that silently falls back to
    CPU would record a misleading number for the round. Probe the backend in
    subprocesses (a failed in-process init can wedge the PJRT client) and
    proceed on whatever backend is live once the budget is spent — the JSON
    records `extra.backend` either way.
    """
    import subprocess

    probe = "import jax; assert jax.devices()[0].platform == 'tpu'"
    deadline = time.time() + max_wait_s
    while True:
        try:
            ok = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True, timeout=60
            ).returncode == 0
        except subprocess.TimeoutExpired:  # wedged tunnel: same as down
            ok = False
        if ok or time.time() >= deadline:
            return
        print(
            f"bench: TPU backend not reachable, retrying "
            f"({int(deadline - time.time())}s left)...",
            file=sys.stderr, flush=True,
        )
        time.sleep(30)


def main() -> int:
    wait_s = float(os.environ.get("BENCH_TPU_WAIT_S", 300))
    if wait_s > 0 and os.environ.get("JAX_PLATFORMS", "").lower() != "cpu":
        try:
            _wait_for_tpu(wait_s)
        except Exception:
            pass  # probe trouble must never block the bench itself

    import jax
    import jax.numpy as jnp
    import numpy as np

    from masked_diffusion_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()

    from masked_diffusion_tpu.config import Config
    from masked_diffusion_tpu.models import build_unet
    from masked_diffusion_tpu.models.unet import count_params
    from masked_diffusion_tpu.ops.schedule import build_schedule
    from masked_diffusion_tpu.sample import make_sample_fn
    from masked_diffusion_tpu.train import (
        build_lr_schedule,
        build_optimizer,
        create_train_state,
        make_train_step,
    )

    data_size = int(os.environ.get("BENCH_DATA_SIZE", 64))
    batch = int(os.environ.get("BENCH_BATCH", 64))
    steps = int(os.environ.get("BENCH_STEPS", 1000))
    repeats = int(os.environ.get("BENCH_REPEATS", 2))
    # BENCH_SCHEDULE/BENCH_SELECT expose the reference-DEFAULT sampling mode
    # (indexing + log, main_train_masked.py:395) alongside the headline
    # thresholding+linear config; log/sigmoid dedup their tables, so the
    # actual step count is reported in extra.actual_steps
    sched_name = os.environ.get("BENCH_SCHEDULE", "linear")
    select = os.environ.get("BENCH_SELECT", "thresholding")

    cfg = Config(
        method="mean_shift", data_size=data_size,
        ddpm_schedule=sched_name, ddpm_num_steps=steps,
        select_degrade_pixel=select, degrade_channel="1-channel",
        mean_option="degraded_area", mean_area="image-wise",
        shift_type="1-d_constant", momentum_adaptive="base_momentum",
        sampling_mask_dependency="independent", mixed_precision="bf16",
        sample_num=batch, batch_size=batch, use_ema=True,
    )
    schedule = build_schedule(
        cfg.ddpm_schedule, cfg.ddpm_num_steps, data_size, cfg.select_degrade_pixel
    )
    used = schedule.timesteps_for_epoch(0, 10, scale=1)
    if sched_name == "linear":
        assert len(used) == steps
    steps = len(used)

    model = build_unet(
        dim_channel=3, dim_height=data_size, dim_width=data_size,
        num_attention=1, dtype=jnp.bfloat16,
    )
    # init at batch 1: parameters are batch-independent and a full-batch fp32
    # init forward transiently needs ~4GB of activations at 64x64/batch 64
    x0 = jnp.zeros((1, data_size, data_size, 3), jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,)))
    n_params = count_params(params)

    # ---------------------------------------------------------------- sampling
    sample_fn = make_sample_fn(model, schedule, cfg, used)
    latent = jnp.full((batch, data_size, data_size, 3), 0.1, jnp.float32)
    key = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    jax.block_until_ready(sample_fn(params, latent, key))  # compile + run
    compile_plus_first = time.perf_counter() - t0

    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(sample_fn(params, latent, jax.random.PRNGKey(2 + i)))
        times.append(time.perf_counter() - t0)
    sample_time = min(times)
    images_per_sec = batch / sample_time

    # ---------------------------------------------------------------- training
    lr = build_lr_schedule("cosine", 1e-4, 0, 1000)
    tx = build_optimizer("adamw", lr, 1.0)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (batch, data_size, data_size, 3), tx
    )
    # donate: the state (params+EMA+opt moments, ~2.3GB fp32) updates in place
    # instead of allocating fresh buffers every step — same as the Trainer
    step_fn = make_train_step(model, schedule, cfg, tx, used, lr, donate=True)
    batch_data = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (batch, data_size, data_size, 3)),
        jnp.float32,
    )
    state, _ = step_fn(state, batch_data, jax.random.PRNGKey(3))  # compile
    jax.block_until_ready(state.params)
    n_train = 10
    t0 = time.perf_counter()
    for i in range(n_train):
        state, metrics = step_fn(state, batch_data, jax.random.PRNGKey(4 + i))
    jax.block_until_ready(state.params)
    train_steps_per_sec = n_train / (time.perf_counter() - t0)

    # ---------------------------------------------------------------- baseline
    vs_baseline = None
    baseline_info = {}
    try:
        from benchmarks.torch_cpu_reference import get_or_measure_baseline

        baseline = get_or_measure_baseline()
        base_ips = baseline.get("images_per_sec_1000step")
        if base_ips:
            vs_baseline = images_per_sec / base_ips
            baseline_info = {
                "cpu_reference_images_per_sec": base_ips,
                "cpu_reference_sec_per_step": baseline.get("sec_per_step"),
            }
    except Exception as e:  # torch missing or probe failure: report raw value
        baseline_info = {"baseline_error": str(e)}

    result = {
        "metric": f"sampled images/sec/chip ({steps}-step masked DDPM, {data_size}x{data_size}, bf16)",
        "value": round(images_per_sec, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline is not None else None,
        "extra": {
            "schedule": sched_name,
            "select_degrade_pixel": select,
            "actual_steps": steps,
            "sample_loop_sec": round(sample_time, 3),
            "compile_plus_first_sec": round(compile_plus_first, 1),
            "train_steps_per_sec": round(train_steps_per_sec, 3),
            "train_imgs_per_sec": round(train_steps_per_sec * batch, 1),
            "batch": batch,
            "n_params": n_params,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            **baseline_info,
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
