"""Reverse-process sampler as one jitted lax.scan.

Rebuilds the reference's Python-loop sampler (_sample_mean_shift_momentum,
sampler.py:109-261) as a single compiled program: for t = T..1, shift ->
UNet -> inverse shift -> degrade x_0 at t and t-1 -> update rule. XLA fuses
the entire per-step body (the BASELINE.json north star); HBM traffic is one
UNet forward per step plus the carried state.

Variants, all compile-time static:
  sampling_mask_dependency in {independent, dependent_prev, dependent_t}
    (sampler.py:175-196)
  momentum_adaptive in {base_sampling, base_momentum, momentum, boosting}
    (sampler.py:199-250); 'boosting' reproduces the reference's effective
    behavior where the EMA line is overwritten by `momentum = difference`
    (sampler.py:248-249), and 'momentum' initializes its EMA buffer to zero
    (the reference reads an undefined variable on the first step).

Trajectory capture (the reference's 11 host-side buffers, sampler.py:116-126)
is an opt-in scan ys-output — off by default so HBM stays bounded at large T.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from masked_diffusion_tpu.config import Config
from masked_diffusion_tpu.ops import degrade as degrade_ops
from masked_diffusion_tpu.ops import shift as shift_ops
from masked_diffusion_tpu.ops.schedule import MaskSchedule

Array = jnp.ndarray

#: Captured ys are (T, k, H*W*C) — flattened row-major images; reshape with
#: trajectory_images() / on the host. See the in-scan capture comment for
#: why the 5-D form is not materialized on device (TPU minor-dim tiling).
TRAJECTORY_FIELDS = (
    "sample_t", "shift", "shifted", "mask", "shifted_result", "sample_0",
    "degrade_mask_t", "degrade_mask_next_t", "degraded_t", "difference",
    "degraded_next_t",
)


def trajectory_images(buf, height: int, width: int, channels: int):
    """Reshape one captured ys buffer (T, k, H*W*C) back to NHWC images
    (T, k, H, W, C). Works on numpy or jax arrays; call on HOST-fetched
    buffers — a device 5-D NHWC f32 array with C=3 is tile-padded 42x."""
    t, k, _ = buf.shape
    return buf.reshape(t, k, height, width, channels)


def _use_fused_degrade(cfg, dependency, rule, capture_trajectory, mesh=None) -> bool:
    """Gate the fused pallas degrade+update kernel.

    Coverage: independent dependency, base_momentum/base_sampling rules,
    1-channel masks, const or degraded_area image-wise means, no trajectory
    capture (the fused path never materializes the intermediates the ys
    record). Env MDT_PALLAS_FUSED=1/0 forces.

    Measured verdict (docs/PERFORMANCE.md "pallas verdicts", 64² batch 64):
    indexing mode WINS in-loop (14.04 vs 14.51 ms/step — the two XLA value
    sorts become two 32-pass bit-scans in one VMEM residency), thresholding
    TIES (14.02 vs 14.06) — so auto-on is indexing-only. Auto-on also
    requires TPU, and on multi-device runs a `mesh` from the caller:
    pallas_call has no GSPMD partitioning rule, so without shard_map a
    sharded mesh would replicate the call (same reasoning as
    ops/degrade.py:_use_pallas_kmask); with a mesh the body routes through
    fused_degrade_update_sharded over the 'data' axis.
    """
    import os

    from masked_diffusion_tpu.config import parse_mean_option

    if capture_trajectory or dependency != "independent":
        return False
    if rule not in ("base_momentum", "base_sampling"):
        return False
    if cfg.degrade_channel != "1-channel":
        return False
    mode, _ = parse_mean_option(cfg.mean_option)
    if mode == "degraded_area" and cfg.mean_area != "image-wise":
        return False
    if mode not in ("const", "degraded_area"):
        return False
    from masked_diffusion_tpu.ops.pallas.fused_degrade import fused_supported

    if not fused_supported(1, cfg.data_size, cfg.data_size, cfg.out_channel):
        return False  # exceeds the kernel's VMEM block budget (256²x3+)
    env = os.environ.get("MDT_PALLAS_FUSED", "").lower()
    if env in ("1", "true"):
        return True
    if env in ("0", "false"):
        return False
    return (
        cfg.select_degrade_pixel == "indexing"
        and jax.default_backend() == "tpu"
        # multi-device needs the shard_map route, which needs a mesh whose
        # 'data' axis actually shards the batch — a data=1 (pure-TP) mesh
        # would trace the unsharded pallas_call into a multi-device jit
        and (
            jax.device_count() == 1
            or (mesh is not None and mesh.shape["data"] > 1)
        )
    )


def make_sample_fn(
    model,
    schedule: MaskSchedule,
    cfg: Config,
    used_timesteps: np.ndarray,
    capture_trajectory: bool = False,
    capture_items: int = 0,
    compute_dtype=None,
    activation_sharding=None,
    mesh=None,
) -> Callable:
    """Build sample(params, latent, key) -> sample_0 [, trajectory dict].

    `used_timesteps` (ascending, 1-indexed) is baked in as a constant; the
    scan walks it in reverse. Pass EMA params for EMA sampling — the
    reference's store/copy_to/restore swap (trainer_masked_mean_shift.py:
    412-419) is unnecessary in a functional world.

    `activation_sharding` (a NamedSharding, parallel/sp.py) pins the carried
    sample's layout each step — spatial partitioning shards H over the
    'model' axis and the constraint keeps the whole scan in that layout.

    `mesh` (the jax Mesh the batch is sharded over, 'data' axis) keeps the
    pallas degrade kernels eligible on multi-chip DP runs: they are
    shard_mapped per shard instead of replicated by GSPMD. Ignored under
    spatial partitioning (activations are H-sharded, the kernels need whole
    images per shard).
    """
    used = np.asarray(used_timesteps, dtype=np.int32)
    n_steps = int(len(used))
    ts_dev = jnp.asarray(used)
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if cfg.weight_dtype == "bfloat16" else jnp.float32

    dependency = cfg.sampling_mask_dependency
    rule = cfg.momentum_adaptive
    # --encoder_reuse K ("Faster Diffusion", arXiv:2312.09608; PAPERS.md):
    # run the UNet encoder (conv_in + down path + middle) only every K-th
    # step and replay its cached activations through the up path on the
    # K-1 steps between — an opt-in approximation trading sample fidelity
    # for ~the encoder's share of the per-step FLOPs/bytes. K <= 1 = exact.
    reuse = int(getattr(cfg, "encoder_reuse", 0) or 0)
    if reuse < 0:
        raise ValueError(f"encoder_reuse must be >= 0, got {reuse}")
    if dependency not in ("independent", "dependent_prev", "dependent_t"):
        raise ValueError(f"unknown sampling_mask_dependency: {dependency!r}")
    if rule not in ("base_sampling", "base_momentum", "momentum", "boosting"):
        raise ValueError(f"unknown momentum_adaptive: {rule!r}")
    # dependent_t x indexing would silently mean-fill everything (config.py:
    # validate_sampling_modes; the reference crashes, scheduler.py:491-492)
    from masked_diffusion_tpu.config import validate_sampling_modes

    validate_sampling_modes(cfg)

    # SP shards activations along H; the pallas degrade kernels operate on
    # whole images per shard, so the mesh routing is DP-only
    pallas_mesh = mesh if activation_sharding is None else None

    degrade_independent = partial(
        degrade_ops.degrade_independent_base_sampling,
        select_degrade_pixel=cfg.select_degrade_pixel,
        degrade_channel=cfg.degrade_channel,
        mean_option=cfg.mean_option,
        mean_area=cfg.mean_area,
        mesh=pallas_mesh,
    )

    # fused pallas degrade+update (ops/pallas/fused_degrade.py): one kernel
    # pass replaces both degrade calls and the update rule; see
    # _use_fused_degrade for the mode coverage + gating
    use_fused = _use_fused_degrade(
        cfg, dependency, rule, capture_trajectory, pallas_mesh
    )
    if use_fused:
        # one host-side line so production logs confirm which degrade path
        # a run actually sampled with (VERDICT r4 #4 evidence contract)
        print("sampler: fused pallas degrade+update kernel ON", flush=True)
        from masked_diffusion_tpu.config import parse_mean_option
        from masked_diffusion_tpu.ops.pallas.fused_degrade import (
            fused_degrade_update,
            fused_degrade_update_sharded,
        )

        fused_mean_mode, fused_mean_value = parse_mean_option(cfg.mean_option)

    def sample_impl(params, latent, key):
        def body(carry, i):
            if reuse > 1:
                sample_t, _, mask_next_prev, momentum, key, cached = carry
            else:
                sample_t, _, mask_next_prev, momentum, key = carry
                cached = None
            if activation_sharding is not None:
                # pin EVERY image-shaped carry, not just sample_t: the mask/
                # momentum buffers would otherwise be free for propagation to
                # replicate (the degrade sorts gather over H*W), and per-chip
                # HBM would still scale with full H for them
                sample_t, mask_next_prev, momentum = (
                    jax.lax.with_sharding_constraint(x, activation_sharding)
                    for x in (sample_t, mask_next_prev, momentum)
                )
            b = sample_t.shape[0]
            t = jnp.take(ts_dev, i)
            tvec = jnp.broadcast_to(t, (b,)).astype(jnp.int32)
            is_last = i == 0

            key, k_shift, k_deg_t, k_deg_next = jax.random.split(key, 4)

            # --- shift -> UNet -> inverse shift (sampler.py:142-152)
            shift = shift_ops.schedule_shift(
                k_shift, schedule.shift_ratio(tvec), sample_t.shape,
                cfg.shift_type, cfg.noise_mean, dtype=jnp.float32,
            )
            shifted_sample_t = sample_t + shift
            if reuse > 1:
                # steps walk i = n_steps-1 .. 0; the walk counter refreshes
                # the encoder cache on its first step and every K-th after
                counter = (n_steps - 1) - i

                def full_fwd(op):
                    shifted, _ = op
                    return model.apply(
                        params, shifted.astype(compute_dtype),
                        tvec.astype(jnp.float32), deterministic=True,
                        return_cached=True,
                    )

                def reuse_fwd(op):
                    shifted, cache = op
                    out, _ = model.apply(
                        params, shifted.astype(compute_dtype),
                        tvec.astype(jnp.float32), deterministic=True,
                        cached=cache, return_cached=True,
                    )
                    return out, cache

                out, cached = jax.lax.cond(
                    counter % reuse == 0, full_fwd, reuse_fwd,
                    (shifted_sample_t, cached),
                )
                out = out.astype(jnp.float32)
            else:
                out = model.apply(
                    params, shifted_sample_t.astype(compute_dtype),
                    tvec.astype(jnp.float32), deterministic=True,
                ).astype(jnp.float32)
            shifted_sample_0 = shifted_sample_t + out
            sample_0 = shifted_sample_0 - shift

            # --- degradation at t and t-1 (sampler.py:167-196)
            next_tvec = jnp.where(is_last, tvec, tvec - 1)
            amount_t = schedule.degrade_amount(tvec)
            amount_next = schedule.degrade_amount(next_tvec)

            # batch is static at trace time: a batch that doesn't divide over
            # the mesh's data axis falls back to the XLA path below
            fused_ok = use_fused and (
                pallas_mesh is None
                or pallas_mesh.shape["data"] <= 1
                or b % pallas_mesh.shape["data"] == 0
            )
            if fused_ok:
                fused_kw = dict(
                    select=cfg.select_degrade_pixel, mean_mode=fused_mean_mode,
                    mean_value=float(fused_mean_value or 0.0), rule=rule,
                )
                if pallas_mesh is not None and pallas_mesh.shape["data"] > 1:
                    new_sample_t, mask_next = fused_degrade_update_sharded(
                        k_deg_t, sample_t, sample_0, amount_t, amount_next,
                        mesh=pallas_mesh, **fused_kw,
                    )
                else:
                    new_sample_t, mask_next = fused_degrade_update(
                        k_deg_t, sample_t, sample_0, amount_t, amount_next,
                        **fused_kw,
                    )
                # the reference guards the state update with `if i > 0`
                new_sample_t = jnp.where(is_last, sample_t, new_sample_t)
                c = (new_sample_t, sample_0, mask_next, momentum, key)
                return (c + (cached,) if reuse > 1 else c), None

            if dependency == "independent":
                degraded_t, mask_t, _ = degrade_independent(k_deg_t, sample_0, amount_t)
                degraded_next, mask_next, _ = degrade_independent(
                    k_deg_next, sample_0, amount_next
                )
            elif dependency == "dependent_prev":
                degraded_t = degrade_ops.degrade_with_mask(
                    sample_0, mask_next_prev, cfg.mean_option, cfg.mean_area
                )
                mask_t = mask_next_prev
                degraded_next, mask_next, _ = degrade_independent(
                    k_deg_next, sample_0, amount_next
                )
            else:  # dependent_t
                degraded_t, mask_t, _, degraded_next, mask_next, _ = (
                    degrade_ops.degrade_dependent_base_sampling(
                        k_deg_t, sample_0, amount_t, amount_next,
                        cfg.degrade_channel, cfg.mean_option, cfg.mean_area,
                    )
                )

            # --- update rule (sampler.py:199-250)
            difference = degraded_next - degraded_t
            if rule == "base_sampling":
                new_sample_t = degraded_next
                skip_on_last = True
            elif rule == "base_momentum":
                new_sample_t = sample_t + difference  # cold diffusion
                skip_on_last = True
            elif rule == "momentum":
                r = cfg.adaptive_momentum_rate
                momentum = (1.0 - r) * momentum + r * (sample_t - degraded_t)
                new_sample_t = momentum + degraded_next
                difference = sample_t - degraded_t
                skip_on_last = False
            else:  # boosting — effective reference behavior: momentum = difference
                momentum = sample_t - degraded_t
                new_sample_t = momentum + degraded_next
                difference = sample_t - degraded_t
                skip_on_last = False

            if skip_on_last:
                # the reference guards the state update with `if i > 0` / break
                new_sample_t = jnp.where(is_last, sample_t, new_sample_t)

            new_carry = (new_sample_t, sample_0, mask_next, momentum, key)
            if reuse > 1:
                new_carry = new_carry + (cached,)
            if capture_trajectory:
                # capture_items > 0 slices the stacked ys to the first k
                # items INSIDE the scan: the reference keeps 11 full
                # (T+1, N, C, H, W) host buffers (sampler.py:116-126), which
                # at T=1000 x N=100 x 64^2 would be tens of GB of HBM — only
                # a handful of items are ever rendered.
                #
                # Each slice is captured FLATTENED to (k, H*W*C): TPU tiles
                # the two minor dims of every buffer to (8, 128), so stacked
                # 5-D ys with C=3 or k=4 minor pad 42x (measured: eleven
                # 7.81 GB buffers for an unpadded 187 MB trajectory — an
                # instant OOM at T=1000, 64^2). H*W*C is lane-aligned for
                # real shapes and k rides the sublane dim (k=4 -> 8, a mere
                # 2x). Consumers reshape back to images on the host
                # (trainer._fetch_trajectory).
                k = min(capture_items, b) if capture_items > 0 else b

                def cap(x):
                    return jnp.broadcast_to(x, sample_t.shape)[:k].reshape(k, -1)

                ys = {
                    "sample_t": cap(sample_t), "shift": cap(shift),
                    "shifted": cap(shifted_sample_t),
                    "mask": cap(out), "shifted_result": cap(shifted_sample_0),
                    "sample_0": cap(sample_0), "degrade_mask_t": cap(mask_t),
                    "degrade_mask_next_t": cap(mask_next),
                    "degraded_t": cap(degraded_t),
                    "difference": cap(difference),
                    "degraded_next_t": cap(degraded_next),
                    # FULL-batch per-step scalar means: the reference's
                    # trajectory means are over the entire (T+1, N, ...)
                    # buffers (trainer_masked_mean_shift.py:386-390); the
                    # sliced image ys above cover only capture_items samples,
                    # so the statistic is carried separately at scalar cost
                    "means": {
                        "sample_t": jnp.mean(sample_t),
                        "shifted": jnp.mean(shifted_sample_t),
                        "sample_0": jnp.mean(sample_0),
                        "shifted_result": jnp.mean(shifted_sample_0),
                    },
                }
            else:
                ys = None
            return new_carry, ys

        zeros_img = jnp.zeros_like(latent, dtype=jnp.float32)
        carry = (
            latent.astype(jnp.float32),  # sample_t
            zeros_img,                   # sample_0 (filled on first step)
            zeros_img,                   # degrade_mask_next_t init (sampler.py:113)
            zeros_img,                   # momentum buffer (zero-init; see module doc)
            key,
        )
        if reuse > 1:
            # zero-filled encoder-cache placeholder (the first scan step is
            # a refresh, so the zeros are never consumed); eval_shape keeps
            # the placeholder free at trace time
            cache_shape = jax.eval_shape(
                lambda p, xx, tt: model.apply(
                    p, xx, tt, deterministic=True, return_cached=True
                ),
                params,
                jax.ShapeDtypeStruct(latent.shape, compute_dtype),
                jax.ShapeDtypeStruct((latent.shape[0],), jnp.float32),
            )[1]
            carry = carry + (
                jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), cache_shape),
            )
        idx = jnp.arange(n_steps - 1, -1, -1)
        carry, ys = jax.lax.scan(body, carry, idx)
        sample_0 = carry[1]
        if capture_trajectory:
            return sample_0, ys
        return sample_0

    return jax.jit(sample_impl)
