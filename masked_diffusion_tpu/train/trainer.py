"""Training orchestration.

The thin host-side shell around the jitted train step — the replacement for
both reference trainer classes (trainer_masked.py:211-272,
trainer_masked_mean_shift.py:218-273): epoch loop, per-epoch timestep
curriculum, metric aggregation, loss-curve PNG, EMA sample grids on the save
cadence, and checkpoint-epoch-N checkpoints. All compute state (params, EMA,
optimizer) lives on device inside TrainState; the host only moves batches and
writes artifacts.

`base` and `mean_shift` are one code path (cfg.method toggles the shift
stage); `Trainer(...)` below serves both dispatch arms of the reference CLI
(main_train_masked.py:327-330).
"""

from __future__ import annotations

import os
import statistics
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from masked_diffusion_tpu.config import Config
from masked_diffusion_tpu.data.datasets import InMemoryDataset
from masked_diffusion_tpu.models import build_unet
from masked_diffusion_tpu.models.unet import count_params
from masked_diffusion_tpu.ops.schedule import MaskSchedule, build_schedule
from masked_diffusion_tpu.parallel.mesh import MeshPlan
from masked_diffusion_tpu.sample import latent_initial, make_sample_fn
from masked_diffusion_tpu.train.optim import build_lr_schedule, build_optimizer
from masked_diffusion_tpu.train.step import (
    TrainState,
    create_train_state,
    make_train_step,
    make_train_visuals_fn,
)
from masked_diffusion_tpu.utils import host
from masked_diffusion_tpu.utils.grids import save_image_grid
from masked_diffusion_tpu.utils.profiling import trace
from masked_diffusion_tpu.io.checkpoint import save_checkpoint


def build_model_from_config(cfg: Config):
    """Model dispatch shared by the Trainer and the --method test arm: the
    default diffusers-style factory (--num_attention) or a named zoo
    architecture (--model unet1..unet6, models_Unet.py:17). The test arm MUST
    build the same tree the training run checkpointed, or orbax restore
    fails on template mismatch."""
    compute_dtype = jnp.bfloat16 if cfg.weight_dtype == "bfloat16" else jnp.float32
    if cfg.model != "default":
        from masked_diffusion_tpu.models.zoo import Model as zoo_model

        return zoo_model(
            cfg.model, cfg.in_channel, cfg.data_size, cfg.data_size,
            cfg.out_channel, dtype=compute_dtype,
            remat=cfg.remat, attention_chunk=cfg.attention_chunk,
            tinyhead_attention=cfg.tinyhead_attention,
        )
    return build_unet(
        dim_channel=cfg.in_channel,
        dim_height=cfg.data_size,
        dim_width=cfg.data_size,
        num_attention=cfg.num_attention,
        block_out_channels=cfg.block_out_channels,
        layers_per_block=cfg.layers_per_block,
        dtype=compute_dtype,
        remat=cfg.remat,
        attention_chunk=cfg.attention_chunk,
        tinyhead_attention=cfg.tinyhead_attention,
    )


def _unet_meta(model, cfg: Optional[Config] = None) -> dict:
    """Checkpoint meta recording the model topology + EMA hyperparameters.

    Written into every save's meta.json so io/export_torch.py can emit an
    exact diffusers config.json (sample_size / attention_head_dim /
    norm_groups leave no imprint on parameter shapes and would otherwise be
    guessed — wrong for e.g. the unet6 zoo tables' norm_groups=8). Key
    vocabulary matches what io/import_torch.py records on import; the "ema"
    block uses diffusers EMAModel config keys (this framework's warmup decay
    law IS the reference's EMAModel(use_ema_warmup=True, ...) schedule,
    main_train_masked.py:116-131 / models/ema.py) so a reference-side
    fine-tune continues the same decay curve."""
    ucfg = getattr(model, "config", None)
    if ucfg is None or not hasattr(ucfg, "block_out_channels"):
        return {}
    meta = {
        "unet_config": {
            "sample_size": ucfg.sample_size,
            "in_channels": ucfg.in_channels,
            "out_channels": ucfg.out_channels,
            "block_out_channels": list(ucfg.block_out_channels),
            "layers_per_block": ucfg.layers_per_block,
            "attn_down": list(ucfg.attn_down),
            "attn_up": list(ucfg.attn_up),
            "attention_head_dim": ucfg.attention_head_dim,
            "norm_groups": ucfg.norm_groups,
        }
    }
    if cfg is not None and cfg.use_ema:
        meta["ema"] = {
            "decay": cfg.ema_max_decay,
            "min_decay": 0.0,
            "use_ema_warmup": True,
            "inv_gamma": cfg.ema_inv_gamma,
            "power": cfg.ema_power,
            "update_after_step": 0,
        }
    return meta


class Trainer:
    def __init__(
        self,
        cfg: Config,
        dataset: InMemoryDataset,
        dataset_hist=None,
        mesh_plan: Optional[MeshPlan] = None,
        visualizer=None,
        model=None,
        schedule: Optional[MaskSchedule] = None,
    ):
        self.cfg = cfg
        self.dataset = dataset
        self.dataset_hist = dataset_hist
        self.mesh_plan = mesh_plan
        self.visualizer = visualizer

        # fail on silently-broken mode couplings (dependent_t x indexing,
        # interpolation x indexing) at construction, not at the first save
        # cadence hours into the run (config.py:validate_sampling_modes)
        from masked_diffusion_tpu.config import validate_sampling_modes

        validate_sampling_modes(cfg)
        if cfg.mesh_spatial and mesh_plan is not None:
            from masked_diffusion_tpu.parallel.sp import validate_spatial

            validate_spatial(mesh_plan, cfg.data_size)

        self.schedule = schedule or build_schedule(
            cfg.ddpm_schedule, cfg.ddpm_num_steps, cfg.data_size,
            cfg.select_degrade_pixel, cfg.ddpm_schedule_base,
        )
        cfg.updated_ddpm_num_steps = self.schedule.num_steps

        self.model = model if model is not None else build_model_from_config(cfg)
        self._ckpt_meta = _unet_meta(self.model, cfg)

        steps_per_epoch = dataset.num_batches(cfg.batch_size)
        total_steps = max(1, steps_per_epoch * cfg.num_epochs)
        self.lr_schedule = build_lr_schedule(
            cfg.lr_scheduler, cfg.lr,
            cfg.lr_warmup_steps * cfg.gradient_accumulation_steps,
            total_steps, cfg.lr_cycle,
        )
        self.tx = build_optimizer(
            cfg.optim, self.lr_schedule, 1.0, cfg.gradient_accumulation_steps
        )

        init_key = jax.random.PRNGKey(cfg.seed)
        sample_shape = (cfg.batch_size, cfg.data_size, cfg.data_size, cfg.in_channel)
        self.state = create_train_state(
            self.model, init_key, sample_shape, self.tx, use_ema=cfg.use_ema
        )
        self.state = self._place_state(self.state)

        self._step_cache: Dict[tuple, callable] = {}
        self._epoch_cache: Dict[tuple, callable] = {}
        self._sample_cache: Dict[tuple, callable] = {}
        self._visuals_cache: Dict[tuple, callable] = {}
        self._interp_cache: Dict[tuple, callable] = {}
        self._last_batch = None  # np.ndarray (host-fed) or jax.Array (device-resident)
        self._data_dev = None
        self._gather_fn = None
        self.lr_list: List[float] = []
        self.loss_mean_epoch: List[float] = []
        self.global_step = 0
        self.timesteps_used_epoch = None
        self.n_params = count_params(self.state.params)

    def _place_state(self, state: TrainState) -> TrainState:
        """Put the TrainState onto the mesh: with --mesh_model > 1, wide
        kernels + their adamw moments and EMA leaves channel-shard over the
        'model' axis (parallel/tp.py); otherwise everything replicates.
        With --mesh_spatial the model axis shards ACTIVATIONS instead
        (parallel/sp.py), so the state replicates exactly as in pure DP."""
        if self.mesh_plan is None:
            return state
        if self.mesh_plan.model_size > 1 and not self.cfg.mesh_spatial:
            from masked_diffusion_tpu.parallel.tp import shard_tree

            return shard_tree(self.mesh_plan, state, self.cfg.tp_min_features)
        return jax.device_put(state, self.mesh_plan.replicated)

    def _batch_sharding(self):
        """Sharding for NHWC batches/latents: P('data') for DP/TP, or
        P('data','model') under --mesh_spatial (parallel/sp.py)."""
        if self.mesh_plan is None:
            return None
        if self.cfg.mesh_spatial:
            from masked_diffusion_tpu.parallel.sp import activation_sharding

            return activation_sharding(self.mesh_plan)
        return self.mesh_plan.batch_sharding

    # ------------------------------------------------------------------ resume
    def restore(self, path: str) -> int:
        """Full-state resume: params, EMA, optimizer state, the micro-step
        counter (which drives the EMA decay warmup and the reported lr), and
        the loss/lr history for curve continuity. The analog of
        accelerator.load_state's complete round-trip
        (main_train_masked.py:195-225,250-277 — EMA optimization_step +
        lr-scheduler state included). Returns the restored global step."""
        from masked_diffusion_tpu.io.checkpoint import load_checkpoint

        params, ema, opt_state, meta = load_checkpoint(
            path, self.state.params, self.state.ema_params, self.state.opt_state
        )
        # full-state resume is the invariant (bitwise-equal continuation):
        # a checkpoint missing an expected tree must fail LOUDLY — silently
        # re-initializing EMA/Adam state corrupts the run undetectably
        missing = [
            name
            for name, expected, got in (
                ("unet_ema", self.state.ema_params, ema),
                ("optimizer", self.state.opt_state, opt_state),
            )
            if expected is not None and got is None
        ]
        if missing:
            raise ValueError(
                f"checkpoint {path} is missing {missing}; resuming would "
                "silently re-initialize that state. Use --method sample for "
                "params-only checkpoints, or point at a complete checkpoint."
            )
        global_step = int(meta.get("global_step", 0))
        self.state = self._place_state(self.state.replace(
            step=jnp.asarray(global_step, jnp.int32),
            params=params,
            ema_params=ema if ema is not None else self.state.ema_params,
            opt_state=opt_state if opt_state is not None else self.state.opt_state,
        ))
        hist = meta.get("history", {})
        self.loss_mean_epoch = [float(v) for v in hist.get("loss_mean_epoch", [])]
        self.lr_list = [float(v) for v in hist.get("lr_list", [])]
        self.global_step = global_step
        return global_step

    # ------------------------------------------------------------------ steps
    def _get_step_fn(self, used: np.ndarray):
        key = tuple(int(t) for t in used)
        if key not in self._step_cache:
            self._step_cache[key] = make_train_step(
                self.model, self.schedule, self.cfg, self.tx, used,
                self.lr_schedule,
                activation_sharding=(
                    self._batch_sharding() if self.cfg.mesh_spatial else None
                ),
                mesh=self.mesh_plan.mesh if self.mesh_plan is not None else None,
            )
        return self._step_cache[key]

    def _get_epoch_fn(self, used: np.ndarray, n_batches: int):
        key = (tuple(int(t) for t in used), int(n_batches))
        if key not in self._epoch_cache:
            from masked_diffusion_tpu.train.step import make_train_epoch

            self._epoch_cache[key] = make_train_epoch(
                self.model, self.schedule, self.cfg, self.tx, used,
                self.lr_schedule,
                activation_sharding=(
                    self._batch_sharding() if self.cfg.mesh_spatial else None
                ),
                mesh=self.mesh_plan.mesh if self.mesh_plan is not None else None,
                batch_sharding=(
                    self._batch_sharding() if self.mesh_plan is not None else None
                ),
            )
        return self._epoch_cache[key]

    def _use_epoch_scan(self) -> bool:
        """Whole-epoch lax.scan training (train/step.py:make_train_epoch):
        one program per epoch instead of one dispatch per step. The caller
        additionally requires the device-resident data path (the scan gathers
        batches in-program). Explicit cfg.epoch_scan wins; MDT_EPOCH_SCAN=1/0
        forces the auto rule; auto = TPU (where the ~28 ms-RTT per-step
        dispatch is the measured gap between wall and the roofline-saturated
        device, docs/PERFORMANCE.md trace attribution). Single-host SIGTERM
        preemption coarsens to epoch granularity while it is on."""
        if self.cfg.epoch_scan is not None:
            return bool(self.cfg.epoch_scan)
        env = os.environ.get("MDT_EPOCH_SCAN", "").lower()
        if env in ("1", "true"):
            return True
        if env in ("0", "false"):
            return False
        return jax.default_backend() == "tpu"

    def _get_sample_fn(self, used: np.ndarray, capture: Optional[bool] = None):
        if capture is None:
            capture = self.cfg.capture_trajectory
        key = (tuple(int(t) for t in used), bool(capture))
        if key not in self._sample_cache:
            self._sample_cache[key] = make_sample_fn(
                self.model, self.schedule, self.cfg, used,
                capture_trajectory=capture,
                # only _save_trajectory_grids' n_items are ever rendered; the
                # in-scan slice keeps trajectory HBM bounded at flagship T
                capture_items=4 if capture else 0,
                activation_sharding=(
                    self._batch_sharding() if self.cfg.mesh_spatial else None
                ),
                mesh=self.mesh_plan.mesh if self.mesh_plan is not None else None,
            )
        return self._sample_cache[key]

    def _get_visuals_fn(self, used: np.ndarray):
        key = tuple(int(t) for t in used)
        if key not in self._visuals_cache:
            self._visuals_cache[key] = make_train_visuals_fn(
                self.model, self.schedule, self.cfg, used
            )
        return self._visuals_cache[key]

    def _put_batch(self, batch):
        if isinstance(batch, jax.Array):
            return batch  # device-resident path: already gathered + sharded
        if self.mesh_plan is not None:
            from masked_diffusion_tpu.parallel.mesh import put_global_batch

            return put_global_batch(
                self.mesh_plan, batch, sharding=self._batch_sharding()
            )
        return jnp.asarray(batch)

    # ------------------------------------------------- device-resident data
    def _use_device_data(self) -> bool:
        """Keep the whole (subset) dataset in HBM and gather batches on
        device, so only the ~batch_size int64 indices cross the host↔device
        link per step instead of the batch tensor. On the axon tunnel
        (28 ms RTT, CLAUDE.md) the per-step host push is a real tax; the
        reference's workloads train on 128–2048-image subsets
        (script_main.sh data_subset_num), well under the cap.

        Auto-on when single-process and the fp32 data fits the byte cap
        (MDT_DEVICE_DATA_CAP_MB, default 512 — the chip also holds the
        ~2.3 GB train state + activations). MDT_DEVICE_DATA=1/0 forces.
        Multi-process ALWAYS stays on put_global_batch (the guard precedes
        the env force): _gather_batch device_puts this host's array and jits
        over host-local index arrays, neither of which is a global array in
        a multi-controller run — forcing it there would be silently wrong,
        not just slow."""
        if host.process_count() > 1:
            return False
        env = os.environ.get("MDT_DEVICE_DATA")
        if env is not None:
            return env == "1"
        cap_mb = float(os.environ.get("MDT_DEVICE_DATA_CAP_MB", 512))
        return self.dataset.data.nbytes <= cap_mb * 1e6

    def _gather_batch(self, sel: np.ndarray):
        """Device-side batch gather: data stays resident (replicated under a
        mesh), the output lands directly in the step's batch sharding."""
        if self._data_dev is None:
            if self.mesh_plan is not None:
                self._data_dev = jax.device_put(
                    jnp.asarray(self.dataset.data), self.mesh_plan.replicated
                )
            else:
                self._data_dev = jnp.asarray(self.dataset.data)
            self._gather_fn = jax.jit(
                lambda d, i: jnp.take(d, i, axis=0),
                out_shardings=self._batch_sharding(),
            )
        return self._gather_fn(self._data_dev, jnp.asarray(sel))

    # ------------------------------------------------------------------ train
    def train(
        self,
        epoch_start: int = 0,
        epoch_length: Optional[int] = None,
        resume_step: int = 0,
        global_step: int = 0,
        dirs=None,
        visualizer=None,
    ) -> Dict:
        cfg = self.cfg
        epoch_length = cfg.num_epochs if epoch_length is None else epoch_length
        visualizer = visualizer or self.visualizer
        self.global_step = global_step

        # preemption-safe shutdown (beyond the reference, SURVEY §5 failure
        # detection): TPU pods get SIGTERM'd on eviction; catch it, finish the
        # in-flight step, save a resumable checkpoint, and exit cleanly
        # instead of losing everything since the last save cadence
        import signal

        self._preempt_requested = False

        def _on_sigterm(*_):
            self._preempt_requested = True

        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:  # not in the main thread; run unprotected
            prev_handler = None
        # rng streams are derived per-epoch from (seed, epoch), not carried
        # sequentially: a resumed run at an epoch boundary then replays the
        # exact shuffles and step keys of the uninterrupted run, which is what
        # makes checkpoint->resume bitwise-reproducible (the reference only
        # gets cold resume, accelerator.load_state main_train_masked.py:250-277)
        root_key = jax.random.PRNGKey(cfg.seed + 1)

        # profile the first post-warmup epoch: epoch 0 pays the compile, so
        # its trace is all XLA compilation; trace epoch_start+1 instead
        profile_epoch = epoch_start + 1 if epoch_length > 1 else epoch_start

        last_metrics = {}
        try:
            last_metrics = self._train_epochs(
                epoch_start, epoch_length, root_key, profile_epoch,
                resume_step, dirs, visualizer
            )
        finally:
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)
            # drain in-flight async checkpoint writes before returning —
            # an abandoned background write would leave only a tmp dir.
            # A failed drain must not MASK an in-flight exception (e.g. the
            # non-finite-loss FloatingPointError) with its own: re-raise only
            # on the clean-exit path
            import sys as _sys

            from masked_diffusion_tpu.io.checkpoint import wait_for_async_saves

            # capture BEFORE the nested try: inside the except handler below,
            # exc_info() reports drain_err itself (never None), so testing it
            # there would silently downgrade clean-exit drain failures
            unwinding = _sys.exc_info()[0] is not None
            try:
                wait_for_async_saves()
            except Exception as drain_err:
                if not unwinding:
                    raise
                print(
                    "WARNING: async checkpoint drain failed while unwinding "
                    f"another exception: {drain_err}",
                    flush=True,
                )
        return {"loss_mean_epoch": self.loss_mean_epoch, "last_metrics": last_metrics}

    def _train_epochs(
        self, epoch_start, epoch_length, root_key, profile_epoch,
        resume_step, dirs, visualizer
    ) -> Dict:
        cfg = self.cfg
        # SIGTERM delivery is per-process; on a single host the flag is acted
        # on per batch, on multi-host only at epoch boundaries after all
        # processes agree (host.any_flag) — acting on the local flag mid-epoch
        # would desynchronize the collective step/checkpoint sequence
        single_process = host.process_count() <= 1
        last_metrics = {}
        # the timestep curriculum is a function of the CONFIGURED total epoch
        # count (cfg.num_epochs), never the loop bounds — a resumed run
        # passing only its remaining epochs, or a deliberately-shortened
        # partial run, must see the same timesteps_for_epoch program at epoch
        # e as the uninterrupted run (bitwise-resume invariant; matters when
        # scheduler_num_scale_timesteps > 1)
        epoch_total = max(cfg.num_epochs, epoch_start + epoch_length)
        for epoch in range(epoch_start, epoch_start + epoch_length):
            t_start = time.perf_counter()
            rng = np.random.default_rng([cfg.seed, epoch])
            data_key = jax.random.fold_in(root_key, epoch)
            used = self.schedule.timesteps_for_epoch(
                epoch, epoch_total, cfg.scheduler_num_scale_timesteps
            )
            self.timesteps_used_epoch = used

            losses = []
            n_batches = self.dataset.num_batches(cfg.batch_size)
            # mid-epoch resume (a preemption checkpoint): replay the epoch's
            # key stream without re-training the first resume_step batches —
            # the shuffle comes from rng(seed, epoch) and the step keys from
            # the split chain, so the continued run sees exactly the
            # batches/keys the preempted run never reached; skipped batches
            # are never materialized (epoch_batches start=)
            skip = resume_step if epoch == epoch_start else 0
            # device-resident fast path: iterate index batches and gather on
            # device (same rng stream as epoch_batches -> same membership,
            # bitwise-equal losses; tests/test_trainer_e2e.py pins it)
            use_dev_data = self._use_device_data()
            use_scan = use_dev_data and self._use_epoch_scan()
            if use_scan:
                # whole-epoch scan: identical batch membership and step-key
                # stream as the loop below (rows come from the same rng; the
                # scan body splits data_key per row exactly like the loop,
                # and skipped rows only advance the chain)
                rows = list(
                    self.dataset.epoch_index_batches(rng, cfg.batch_size, start=skip)
                )
                n_skip = sum(r is None for r in rows)
                for _ in range(n_skip):
                    data_key = jax.random.split(data_key)[0]
                sel_rows = [r for r in rows if r is not None]
                if sel_rows:
                    # initializes self._data_dev and doubles as the cadence
                    # visuals' last batch
                    self._last_batch = self._gather_batch(sel_rows[-1])
                    sel = jnp.asarray(np.stack(sel_rows).astype(np.int32))
                    epoch_fn = self._get_epoch_fn(used, len(sel_rows))
                    with trace(cfg.profile_dir if epoch == profile_epoch else None):
                        self.state, data_key, stacked = epoch_fn(
                            self.state, self._data_dev, sel, data_key
                        )
                    self.global_step += len(sel_rows)
                    mkeys = list(stacked.keys())
                    mat = np.asarray(jnp.stack([stacked[k] for k in mkeys], axis=1))
                    losses = [
                        {k: float(v) for k, v in zip(mkeys, row)} for row in mat
                    ]
            else:
                step_fn = self._get_step_fn(used)
                batches = (
                    self.dataset.epoch_index_batches(rng, cfg.batch_size, start=skip)
                    if use_dev_data
                    else self.dataset.epoch_batches(rng, cfg.batch_size, start=skip)
                )
                with trace(cfg.profile_dir if epoch == profile_epoch else None):
                    for i, batch in enumerate(batches):
                        data_key, step_key = jax.random.split(data_key)
                        if batch is None:
                            continue
                        if use_dev_data:
                            batch = self._gather_batch(batch)
                        self.state, metrics = step_fn(
                            self.state, self._put_batch(batch), step_key
                        )
                        losses.append(metrics)
                        self.global_step += 1
                        self._last_batch = batch
                        if single_process and self._preempt_requested:
                            break

                # host sync once per epoch — as ONE stacked transfer: fetching
                # each scalar individually costs a full host<->device round
                # trip (28 ms over the axon tunnel), and an epoch's worth of
                # metric dicts (~6 scalars x n_batches) was measured to
                # dominate small epochs (3.5 vs ~13 steps/s on the 14-batch
                # digits workload); the stacks below dispatch asynchronously
                # and only the final np.asarray synchronizes
                if losses:
                    keys = list(losses[0].keys())
                    mat = np.asarray(
                        jnp.stack([jnp.stack([m[k] for k in keys]) for m in losses])
                    )
                    losses = [
                        {k: float(v) for k, v in zip(keys, row)} for row in mat
                    ]
            # failure detection (absent in the reference, SURVEY.md §5): a
            # non-finite loss poisons params, EMA, and every later checkpoint;
            # save a post-mortem checkpoint and stop instead of training on
            if losses and not all(np.isfinite(m["train_loss"]) for m in losses):
                if dirs is not None:
                    save_checkpoint(
                        dirs.list_dir["checkpoint"], epoch, self.global_step,
                        self.state.params, self.state.ema_params,
                        self.state.opt_state,
                        extra_meta={**self._ckpt_meta, "non_finite_loss": True},
                    )
                raise FloatingPointError(
                    f"non-finite train loss at epoch {epoch} "
                    f"(global step {self.global_step}); post-mortem checkpoint saved"
                )
            loss_mean = statistics.mean(m["train_loss"] for m in losses) if losses else 0.0
            self.loss_mean_epoch.append(loss_mean)
            self.lr_list.extend(m.get("lr", 0.0) for m in losses)
            last_metrics = losses[-1] if losses else {}
            epoch_time = time.perf_counter() - t_start

            if host.any_flag(self._preempt_requested):
                partial = self.global_step % max(1, n_batches) != 0
                if partial:
                    # the interrupted epoch's mean covers only its leading
                    # batches; drop it — the resumed run re-enters this epoch
                    # at resume_step and appends the tail's mean instead
                    self.loss_mean_epoch.pop()
                if dirs is not None:
                    save_checkpoint(
                        dirs.list_dir["checkpoint"], epoch, self.global_step,
                        self.state.params, self.state.ema_params,
                        self.state.opt_state,
                        extra_meta={**self._ckpt_meta, "preempted": True},
                        history={
                            "loss_mean_epoch": self.loss_mean_epoch,
                            "lr_list": self.lr_list,
                        },
                        keep_last=cfg.keep_last_checkpoints,
                    )
                print(
                    f"SIGTERM: resumable checkpoint saved at epoch {epoch} "
                    f"(global step {self.global_step}); exiting cleanly",
                    flush=True,
                )
                return last_metrics

            if visualizer is not None and losses:
                # epoch_time includes the device sync above, so imgs/sec is a
                # true device-throughput figure after the compile epoch
                visualizer.plot_current_losses(
                    epoch,
                    {
                        **last_metrics,
                        "epoch_time_s": epoch_time,
                        "steps_per_sec": len(losses) / max(epoch_time, 1e-9),
                        "imgs_per_sec": len(losses) * cfg.batch_size / max(epoch_time, 1e-9),
                    },
                    "value",
                )

            if self._on_save_cadence(epoch, epoch_start, epoch_length):
                # the jitted compute below (EMA sampling scan, visuals
                # forward) is collective over the mesh — every process must
                # dispatch it; only the host-side artifact writes inside the
                # _save_* helpers are process-0-gated (utils/host.py policy
                # == trainer_masked_mean_shift.py:242)
                if dirs is not None:
                    if host.is_main_process():
                        self._save_learning_curve(dirs)
                    self._save_train_visuals(dirs, epoch, used, data_key, visualizer)
                    if cfg.use_ema:
                        # --sampling dispatch (trainer_masked_mean_shift.py:
                        # 254-260): 'base' additionally captures and renders
                        # the per-step trajectory (the reference's base arm is
                        # broken by a stale 7-value unpack of Sampler.sample's
                        # 2 returns, :381 — this rebuilds the INTENDED
                        # behavior: trajectory grids + trajectory means)
                        if cfg.sampling == "base":
                            self._save_ema_sample(dirs, epoch, visualizer)
                        else:
                            self._save_ema_momentum_sample(dirs, epoch, visualizer)
                    # interpolation rendering is independent of EMA:
                    # _save_interpolation_sample falls back to raw params
                    # when use_ema is off
                    if cfg.interpolation_shift is not None:
                        self._save_interpolation_sample(dirs, epoch, visualizer)
                if dirs is not None:
                    # collective on purpose: every process calls the orbax
                    # save (it coordinates per-shard writes); the meta/history
                    # sidecars inside are process-0-gated
                    save_checkpoint(
                        dirs.list_dir["checkpoint"], epoch, self.global_step,
                        self.state.params, self.state.ema_params, self.state.opt_state,
                        extra_meta=self._ckpt_meta or None,
                        history={
                            "loss_mean_epoch": self.loss_mean_epoch,
                            "lr_list": self.lr_list,
                        },
                        # opt-in retention; the non-finite post-mortem save
                        # above never prunes (forensic state stays put)
                        keep_last=cfg.keep_last_checkpoints,
                        # cadence saves may write in background (the
                        # preemption/post-mortem saves above stay sync: they
                        # must commit before the process exits)
                        async_save=cfg.async_checkpoints,
                    )

        return last_metrics

    def _on_save_cadence(self, epoch: int, epoch_start: int, epoch_length: int) -> bool:
        cfg = self.cfg
        # trainer_masked_mean_shift.py:252 cadence expression; scale_period
        # derives from the CONFIGURED total epoch count so resumed runs keep
        # the uninterrupted run's cadence; the loop's own last epoch always
        # saves so shortened runs leave a resumable checkpoint
        epoch_total = max(cfg.num_epochs, epoch_start + epoch_length)
        scale_period = max(1, int(epoch_total / max(1, cfg.scheduler_num_scale_timesteps)))
        return (
            (epoch > 0 and (epoch + 1) % cfg.save_images_epochs == 0)
            or epoch == (epoch_start + epoch_length - 1)
            or (epoch + 1) % scale_period == 0
        )

    # ------------------------------------------------------------------ artifacts
    def _save_learning_curve(self, dirs) -> None:
        """3-panel loss/lr/schedule PNG (trainer_masked.py:275-297)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:  # pragma: no cover
            return
        path = os.path.join(dirs.list_dir["train_loss"], "loss.png")
        fig = plt.figure(figsize=(24, 8))
        plt.subplot(1, 3, 1)
        plt.plot(np.asarray(self.loss_mean_epoch), color="red")
        plt.title("loss")
        plt.subplot(1, 3, 2)
        plt.plot(np.asarray(self.lr_list), color="red")
        plt.title("learning rate")
        plt.subplot(1, 3, 3)
        ratios = np.asarray(self.schedule.ratios)
        plt.plot(ratios, color="red")
        plt.title(f"degrade black area num = {len(ratios)}")
        plt.tight_layout()
        plt.savefig(path, bbox_inches="tight", dpi=100)
        plt.close(fig)

    # tensor name -> run-directory key (utils/dirs.py == dirutils.py:77-101).
    # 'noisy_img' is the degraded image (scheduler.py:260 names its output
    # noisy_img); 'noise_img' holds the network's predicted residual (the
    # reference calls it 'mask', trainer_masked_mean_shift.py:140).
    _VISUAL_DIRS = {
        "input": "train_img",
        "degraded_img": "noisy_img",
        "degrade_binary_masks": "mask_img",
        "degradation_mask": "mask_img",
        "mean_pixel": "img",
        "mask": "noise_img",
        "reconstructed_img": "predict_img",
        "inverse_shift_reconstructed_img": "predict_img",
        "shift": "shift_img",
        "shifted_degrade_img": "shift_noisy",
    }

    def _save_train_visuals(self, dirs, epoch: int, used, key, visualizer=None) -> None:
        """Render the last batch's train-time tensors as global+local grids
        into the run tree and the visualizer — the reference's
        get_current_visuals/display_current_results path
        (trainer_masked.py:58-80,300-342, trainer_masked_mean_shift.py:264).
        One forward-only jitted call per save cadence; never in the hot loop."""
        if self._last_batch is None:
            return
        visuals_fn = self._get_visuals_fn(used)
        out = visuals_fn(self.state.params, self._put_batch(self._last_batch), key)
        # collective fetch of every rendered tensor before the p0 gate
        out = {name: host.fetch(tensor) for name, tensor in out.items()}
        if not host.is_main_process():
            return  # compute was collective; writes are process-0-only
        display = {}
        for name, tensor in out.items():
            d = dirs.list_dir.get(self._VISUAL_DIRS.get(name, "img"))
            if d is None or not os.path.isdir(d):
                continue
            arr = tensor
            g_global = save_image_grid(arr, "global", d, f"{name}_{epoch:05d}_global.png")
            g_local = save_image_grid(arr, "image", d, f"{name}_{epoch:05d}_local.png")
            display[f"{name}_normalize_global"] = g_global
            display[f"{name}_normalize_local"] = g_local
        if visualizer is not None and display:
            visualizer.display_current_results(epoch, display)

    def _cadence_latent(self, key, num: int):
        """Latent batch for cadence sampling, mesh-correct: rounded up to a
        multiple of the mesh's data size and committed onto the batch
        sharding — the same placement generate_images gives its latents
        (sample/generate.py:54-56,82-83). Without this, a default
        sample_num=100 on an 8-way mesh is an uncommitted host array whose
        placement is left to GSPMD. Returns (latent, real_num)."""
        from masked_diffusion_tpu.parallel.mesh import round_up

        padded = num
        if self.mesh_plan is not None:
            padded = round_up(num, self.mesh_plan.data_size)
        latent = latent_initial(
            key, padded, self.cfg.out_channel, self.cfg.data_size,
            self.cfg.sample_latent_shape, self.cfg.mean_area, self.dataset_hist,
        )
        if self.mesh_plan is not None:
            latent = jax.device_put(latent, self._batch_sharding())
        return latent, num

    def sample_ema(
        self, key, sample_num: Optional[int] = None, capture: Optional[bool] = None
    ):
        """Sample with EMA params (no parameter swapping needed). The result
        batch is trimmed back to the requested sample_num after any mesh
        padding (trajectory ys are item-sliced in-scan and unaffected)."""
        cfg = self.cfg
        used = self.timesteps_used_epoch
        if used is None:
            used = self.schedule.timesteps_for_epoch(
                0, cfg.num_epochs, cfg.scheduler_num_scale_timesteps
            )
        sample_fn = self._get_sample_fn(used, capture)
        k_lat, k_samp = jax.random.split(key)
        latent, num = self._cadence_latent(k_lat, sample_num or cfg.sample_num)
        params = self.state.ema_params if cfg.use_ema else self.state.params
        out = sample_fn(params, latent, k_samp)
        if isinstance(out, tuple):
            return out[0][:num], out[1]
        return out[:num]

    def _save_ema_momentum_sample(self, dirs, epoch: int, visualizer=None) -> None:
        """EMA sampling + global/local grids
        (trainer_masked_mean_shift.py:409-429); with capture_trajectory on,
        per-item step trajectories also land in sample_all_t (the reference's
        visual_list grids, sampler.py:390-417)."""
        out = self.sample_ema(jax.random.PRNGKey(self.cfg.seed + epoch))
        # host.fetch is collective on multi-host (allgather) — fetch BEFORE
        # the process-0 gate, write after
        if isinstance(out, tuple):
            sample = host.fetch(out[0])
            traj_np = self._fetch_trajectory(out[1])
        else:
            sample, traj_np = host.fetch(out), None
        if not host.is_main_process():
            return  # the sampling scan was collective; writes are p0-only
        if traj_np is not None:
            self._save_trajectory_grids(dirs, epoch, traj_np)
        d = dirs.list_dir["ema_sample_img"]
        g_global = save_image_grid(
            sample, "global", d, f"ema_sample_{epoch:05d}_global.png"
        )
        g_local = save_image_grid(
            sample, "image", d, f"ema_sample_{epoch:05d}_local.png"
        )
        if visualizer is not None:
            visualizer.display_current_results(
                epoch,
                {
                    "ema_sample_result_normalize_global": g_global,
                    "ema_sample_result_normalize_local": g_local,
                },
            )

    def _fetch_trajectory(self, trajectory: dict, n_items: int = 4) -> dict:
        """Collective host fetch of the trajectory image buffers, sliced to
        the first n_items on-device BEFORE transfer: the full trajectory is
        ~3GB at the flagship config — and only n_items are ever rendered.
        Device buffers are (T, k, H*W*C) flattened rows (sample/loop.py
        capture comment: 5-D NHWC ys tile-pad 42x on TPU and OOM at
        T=1000 64²); images are rebuilt host-side.
        Returns {field: (n_items, T, H, W, C) numpy}."""
        from masked_diffusion_tpu.sample.loop import trajectory_images

        cfg = self.cfg
        out = {}
        for key, buf in trajectory.items():
            if key == "means":  # per-step scalars, not an image buffer
                continue
            flat = host.fetch(buf[:, :n_items])
            imgs = trajectory_images(
                flat, cfg.data_size, cfg.data_size, cfg.out_channel
            )
            out[key] = imgs.transpose(1, 0, 2, 3, 4)
        return out

    def _save_trajectory_grids(self, dirs, epoch: int, trajectory: dict) -> None:
        """One per-item grid over timesteps for EVERY captured field — the
        reference's visual_list covers all 11 buffers (sampler.py:116-126,
        390-417); the ys are already paid for in HBM so render them all.
        Takes the numpy dict from _fetch_trajectory (process 0 only)."""
        from masked_diffusion_tpu.utils.grids import save_multi_index_image_grid, save_png

        d = dirs.list_dir["sample_all_t"]
        for key, traj in trajectory.items():
            grids = save_multi_index_image_grid(traj, normalization="image")
            for i, g in enumerate(grids):
                save_png(
                    np.clip(g, 0.0, 1.0),
                    os.path.join(d, f"{key}_{epoch:05d}_item{i}.png"),
                )

    def _save_ema_sample(self, dirs, epoch: int, visualizer=None) -> None:
        """--sampling base: EMA sampling WITH trajectory capture — result
        grids plus per-step trajectory grids and trajectory means
        (ema_sample_t_mean / ema_sample_0_mean / shift variants), rebuilding
        the intent of _save_ema_sample (trainer_masked_mean_shift.py:374-404;
        the reference arm crashes on a stale unpack, see module doc)."""
        out = self.sample_ema(
            jax.random.PRNGKey(self.cfg.seed + epoch), capture=True
        )
        sample, trajectory = out
        # full-batch trajectory means carried as per-step scalars by the scan
        # (loop.py 'means' ys) — NOT from the capture_items-sliced image
        # buffers, which would make the logged statistic cover only 4 samples.
        # All of this (the means reductions, the trajectory fetch, the sample
        # fetch) runs on EVERY process — eager ops/fetches on sharded global
        # arrays are collective; only the writes below are process-0-gated.
        m = trajectory["means"]
        means = {
            "ema_sample_mean": float(jnp.mean(sample)),
            "ema_sample_t_mean": float(jnp.mean(m["sample_t"])),
            "ema_sample_0_mean": float(jnp.mean(m["sample_0"])),
            "ema_sample_shift_t_mean": float(jnp.mean(m["shifted"])),
            "ema_sample_0_shift_mean": float(jnp.mean(m["shifted_result"])),
        }
        traj_np = self._fetch_trajectory(trajectory)
        sample = host.fetch(sample)
        if not host.is_main_process():
            return  # the sampling scan was collective; writes are p0-only
        self._save_trajectory_grids(dirs, epoch, traj_np)
        d = dirs.list_dir["ema_sample_img"]
        g_global = save_image_grid(
            sample, "global", d, f"ema_sample_{epoch:05d}_global.png"
        )
        g_local = save_image_grid(
            sample, "image", d, f"ema_sample_{epoch:05d}_local.png"
        )
        if visualizer is not None:
            visualizer.plot_current_losses(epoch, means, "value")
            visualizer.display_current_results(
                epoch,
                {
                    "ema_sample_result_normalize_global": g_global,
                    "ema_sample_result_normalize_local": g_local,
                },
            )

    def _save_interpolation_sample(self, dirs, epoch: int, visualizer=None) -> None:
        """--interpolation_shift route to the interpolation sampler
        (Sampler.sample's third argument, sampler.py:102-106,264-366 — dead
        code in the reference, reachable here)."""
        from masked_diffusion_tpu.sample.interpolation import make_interpolation_sample_fn

        cfg = self.cfg
        used = self.timesteps_used_epoch
        if used is None:
            used = self.schedule.timesteps_for_epoch(
                0, cfg.num_epochs, cfg.scheduler_num_scale_timesteps
            )
        key = (tuple(int(t) for t in used), float(cfg.interpolation_shift))
        if key not in self._interp_cache:
            self._interp_cache[key] = make_interpolation_sample_fn(
                self.model, self.schedule, cfg, used,
                float(cfg.interpolation_shift), mesh_plan=self.mesh_plan,
            )
        params = self.state.ema_params if cfg.use_ema else self.state.params
        sample, _mu = self._interp_cache[key](
            params, jax.random.PRNGKey(cfg.seed + epoch + 1)
        )
        sample = host.fetch(sample)  # collective; before the p0 gate
        if not host.is_main_process():
            return  # collective compute done; writes are p0-only
        d = dirs.list_dir["ema_sample_img"]
        g = save_image_grid(
            sample, "global", d, f"ema_interpolation_{epoch:05d}.png"
        )
        if visualizer is not None:
            visualizer.display_current_results(
                epoch, {"ema_interpolation_sample": g}
            )
