"""The jitted train step.

One pure function replaces both reference trainer hot loops
(trainer_masked.py:95-183 and trainer_masked_mean_shift.py:82-193): `base` and
`mean_shift` are the same step with the shift stage on or off. Per step:

  key split -> timestep draw from the epoch's curriculum -> degrade ->
  (shift) -> UNet forward -> residual reconstruction -> (inverse shift) ->
  (weighted) MSE in fp32 -> grads -> global-norm clip(1.0) -> optax update ->
  EMA update on sync boundaries.

Everything including the optimizer and EMA lives in one compiled program; the
DDP all-reduce the reference gets from accelerator.backward is emitted by XLA
when the step is jitted over a data-sharded mesh (parallel/mesh.py), and the
per-batch wait_for_everyone barrier (trainer_masked_mean_shift.py:183)
disappears — XLA collectives synchronize exactly where data dependencies
require.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from masked_diffusion_tpu.config import Config
from masked_diffusion_tpu.models.ema import ema_decay
from masked_diffusion_tpu.ops import degrade as degrade_ops
from masked_diffusion_tpu.ops import shift as shift_ops
from masked_diffusion_tpu.ops.schedule import MaskSchedule

Array = jnp.ndarray


class TrainState(flax.struct.PyTreeNode):
    step: Array  # micro-step counter (int32)
    params: Any
    ema_params: Any  # None when EMA disabled
    opt_state: Any


def create_train_state(
    model,
    key: Array,
    sample_shape: Tuple[int, ...],
    tx: optax.GradientTransformation,
    use_ema: bool = True,
) -> TrainState:
    # init at batch 1: parameters are batch-independent, and the init-time
    # forward pass at full batch can transiently exhaust HBM (fp32
    # activations, no donation) before training even starts
    x = jnp.zeros((1,) + tuple(sample_shape[1:]), jnp.float32)
    t = jnp.zeros((1,), jnp.float32)
    params = model.init(key, x, t)
    ema_params = jax.tree.map(jnp.copy, params) if use_ema else None
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        ema_params=ema_params,
        opt_state=tx.init(params),
    )


def make_train_step(
    model,
    schedule: MaskSchedule,
    cfg: Config,
    tx: optax.GradientTransformation,
    used_timesteps: np.ndarray,
    lr_schedule: Optional[Callable] = None,
    donate: bool = True,
    activation_sharding=None,
    mesh=None,
) -> Callable:
    """Build the jitted train step for one curriculum section.

    `used_timesteps` is the epoch's timestep list (schedule.timesteps_for_epoch)
    baked in as a compile-time constant — the curriculum produces at most
    `scheduler_num_scale_timesteps` distinct lists per run, so recompiles are
    bounded and each section's program is fully static.

    `activation_sharding` (a NamedSharding, parallel/sp.py) pins the UNet
    input's layout with a with_sharding_constraint — spatial partitioning
    relies on it so XLA's propagation cannot all-gather H and run replicated.

    `mesh` (the jax Mesh the batch is sharded over) keeps the pallas kmask
    kernel eligible for multi-chip DP training at 128²+ (shard_mapped per
    shard — ops/degrade.py:generate_masks). DP-only: ignored under SP.
    """
    step_fn = _make_step_impl(
        model, schedule, cfg, tx, used_timesteps, lr_schedule,
        activation_sharding, mesh,
    )
    donate_argnums = (0,) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_argnums)


def _make_step_impl(
    model,
    schedule: MaskSchedule,
    cfg: Config,
    tx: optax.GradientTransformation,
    used_timesteps: np.ndarray,
    lr_schedule: Optional[Callable] = None,
    activation_sharding=None,
    mesh=None,
) -> Callable:
    """The un-jitted step body, shared by make_train_step (one jit per call)
    and make_train_epoch (a lax.scan over the epoch's batches)."""
    used_dev = jnp.asarray(used_timesteps, dtype=jnp.int32)
    n_used = int(len(used_timesteps))
    mean_shift = cfg.method == "mean_shift"
    accum = max(1, cfg.gradient_accumulation_steps)
    compute_dtype = jnp.bfloat16 if cfg.weight_dtype == "bfloat16" else jnp.float32
    weight_table = (
        schedule.loss_weight_table(cfg.loss_weight_power_base)
        if cfg.loss_weight_use
        else None
    )

    def step_fn(state: TrainState, batch: Array, key: Array):
        img = batch.astype(jnp.float32)
        b = img.shape[0]
        k_time, k_mask, k_shift = jax.random.split(key, 3)

        # --- timestep draw from the curriculum (trainer_masked.py:114-115)
        timeindex = jax.random.randint(k_time, (b,), 0, n_used)
        timesteps = jnp.take(used_dev, timeindex)

        # --- degrade (scheduler.degrade_training)
        amount = schedule.degrade_amount(timesteps)
        degraded, binary_masks, degradation_mask, mean_mask = degrade_ops.degrade_training(
            k_mask, img, amount,
            cfg.select_degrade_pixel, cfg.degrade_channel,
            cfg.mean_option, cfg.mean_area,
            mesh=mesh if activation_sharding is None else None,
        )

        # --- mean shift (trainer_masked_mean_shift.py:119-120)
        if mean_shift:
            shift = shift_ops.schedule_shift(
                k_shift, schedule.shift_ratio(timesteps), img.shape,
                cfg.shift_type, cfg.noise_mean, dtype=jnp.float32,
            )
            net_in = degraded + shift
        else:
            shift = jnp.zeros((), jnp.float32)
            net_in = degraded

        if activation_sharding is not None:
            net_in = jax.lax.with_sharding_constraint(net_in, activation_sharding)

        t_float = timesteps.astype(jnp.float32)

        def loss_fn(params):
            out = model.apply(
                params, net_in.astype(compute_dtype), t_float, deterministic=True
            )
            recon = net_in + out.astype(jnp.float32)
            inv_recon = recon - shift if mean_shift else recon
            # fp32 loss regardless of compute dtype (trainer_masked_mean_shift.py:153)
            per_px = (inv_recon.astype(jnp.float32) - img) ** 2
            if weight_table is not None:
                w = jnp.take(weight_table, timeindex)  # indexed by timeindex (quirk kept)
                per_px = w[:, None, None, None] * per_px
            loss = jnp.mean(per_px)
            aux = {
                "reconstruct_train_mean": jnp.mean(recon),
                "inverse_reconstruct_train_mean": jnp.mean(inv_recon),
            }
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_step = state.step + 1
        opt_step = new_step // accum
        is_sync = (new_step % accum) == 0

        if state.ema_params is not None:
            decay = ema_decay(
                opt_step, cfg.ema_inv_gamma, cfg.ema_power, 0.0, cfg.ema_max_decay
            )
            # only advance the EMA on sync boundaries (trainer_masked.py:151-153)
            decay = jnp.where(is_sync, decay, 1.0)
            one_minus = jnp.where(is_sync, 1.0 - decay, 0.0)
            new_ema = jax.tree.map(
                lambda e, p: (decay * e + one_minus * p.astype(e.dtype)).astype(e.dtype),
                state.ema_params,
                new_params,
            )
        else:
            new_ema = None

        metrics = {
            "train_loss": loss,
            "shifted_degrade_img_mean": jnp.mean(net_in),
            "degraded_train_mean": jnp.mean(degraded),
            **aux,
        }
        if lr_schedule is not None:
            metrics["lr"] = lr_schedule(opt_step)

        new_state = TrainState(
            step=new_step, params=new_params, ema_params=new_ema,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    return step_fn


def make_train_epoch(
    model,
    schedule: MaskSchedule,
    cfg: Config,
    tx: optax.GradientTransformation,
    used_timesteps: np.ndarray,
    lr_schedule: Optional[Callable] = None,
    donate: bool = True,
    activation_sharding=None,
    mesh=None,
    batch_sharding=None,
) -> Callable:
    """A whole epoch as ONE compiled program: lax.scan of the train step over
    the epoch's batch-index rows, gathering each batch from the
    device-resident dataset inside the scan.

    Why: the r4 trace attribution (benchmarks/trace_train.py) showed the
    per-step jit executing AT the HBM roofline (~51 ms device) while the wall
    clock pays ~6-14 ms/step of host dispatch over the tunnel — with one
    dispatch per EPOCH that gap disappears entirely. The reference has no
    analog (its loop crosses the host every batch,
    trainer_masked_mean_shift.py:82-193).

    Signature: epoch_fn(state, data, sel, key) -> (state, key, metrics_stack)
      data: (N, H, W, C) device-resident dataset (Trainer._gather_batch's
            array), sel: (n_batches, batch_size) int32 index rows,
      key:  the epoch's data_key; the body splits it exactly like the loop
            (`data_key, step_key = jax.random.split(data_key)` per batch), so
            the step-key stream is IDENTICAL to the per-step path and resume
            replay semantics carry over unchanged.
    metrics_stack is a dict of (n_batches,) arrays — the same stacked layout
    the trainer already fetches once per epoch.
    """
    step_fn = _make_step_impl(
        model, schedule, cfg, tx, used_timesteps, lr_schedule,
        activation_sharding, mesh,
    )

    def epoch_fn(state: TrainState, data: Array, sel: Array, key: Array):
        def body(carry, sel_i):
            st, k = carry
            k, step_key = jax.random.split(k)
            batch = jnp.take(data, sel_i, axis=0)
            if batch_sharding is not None:
                # pin the gathered batch to the step's batch layout (the
                # loop path gets this from _gather_batch's out_shardings);
                # without it GSPMD is free to run the whole step replicated
                batch = jax.lax.with_sharding_constraint(batch, batch_sharding)
            st, metrics = step_fn(st, batch, step_key)
            return (st, k), metrics

        (state, key), metrics = jax.lax.scan(body, (state, key), sel)
        return state, key, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(epoch_fn, donate_argnums=donate_argnums)


def make_train_visuals_fn(
    model,
    schedule: MaskSchedule,
    cfg: Config,
    used_timesteps: np.ndarray,
) -> Callable:
    """Jitted forward-only pass returning the reference's train-time visual
    tensors (train_visual_names, trainer_masked.py:58,
    trainer_masked_mean_shift.py:58: input / degraded_img /
    degrade_binary_masks / degradation_mask / mean_pixel / mask /
    reconstructed_img, plus shift / shifted_degrade_img /
    inverse_shift_reconstructed_img on the mean-shift path). Run once on the
    save cadence against the last batch — never inside the hot loop."""
    used_dev = jnp.asarray(used_timesteps, dtype=jnp.int32)
    n_used = int(len(used_timesteps))
    mean_shift = cfg.method == "mean_shift"
    compute_dtype = jnp.bfloat16 if cfg.weight_dtype == "bfloat16" else jnp.float32

    def visuals_fn(params, batch: Array, key: Array):
        img = batch.astype(jnp.float32)
        b = img.shape[0]
        k_time, k_mask, k_shift = jax.random.split(key, 3)
        timeindex = jax.random.randint(k_time, (b,), 0, n_used)
        timesteps = jnp.take(used_dev, timeindex)

        amount = schedule.degrade_amount(timesteps)
        degraded, binary_masks, degradation_mask, mean_mask = degrade_ops.degrade_training(
            k_mask, img, amount,
            cfg.select_degrade_pixel, cfg.degrade_channel,
            cfg.mean_option, cfg.mean_area,
        )
        if mean_shift:
            shift = shift_ops.schedule_shift(
                k_shift, schedule.shift_ratio(timesteps), img.shape,
                cfg.shift_type, cfg.noise_mean, dtype=jnp.float32,
            )
            net_in = degraded + shift
        else:
            shift = None
            net_in = degraded

        out = model.apply(
            params, net_in.astype(compute_dtype), timesteps.astype(jnp.float32),
            deterministic=True,
        ).astype(jnp.float32)
        recon = net_in + out

        visuals = {
            "input": img,
            "degraded_img": degraded,
            "degrade_binary_masks": binary_masks,
            "degradation_mask": degradation_mask,
            "mean_pixel": mean_mask,
            "mask": out,  # the reference names the network output 'mask'
            "reconstructed_img": recon,
        }
        if mean_shift:
            visuals["shift"] = jnp.broadcast_to(shift, img.shape)
            visuals["shifted_degrade_img"] = net_in
            visuals["inverse_shift_reconstructed_img"] = recon - shift
        return visuals

    return jax.jit(visuals_fn)
