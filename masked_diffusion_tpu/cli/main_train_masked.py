"""CLI entry point — flag-compatible with the reference main_train_masked.py.

Same flag names, defaults, and method dispatch (base / mean_shift / test,
main_train_masked.py:327-333,346-419); the implementation is the TPU-native
stack. Launch directly (no accelerate wrapper needed):

    python -m masked_diffusion_tpu.cli.main_train_masked --method mean_shift \
        --data_name synthetic --data_size 32 ...

Multi-chip data parallelism comes from the device mesh instead of process
replication; on multi-host pods call jax.distributed via --multihost.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def str2bool(v) -> bool:
    # the reference uses type=eval for booleans (main_train_masked.py:351)
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("true", "1", "yes")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    # ---- dirutils inputs (main_train_masked.py:347-367)
    p.add_argument("--use_wandb", type=str2bool, default=True)
    p.add_argument("--use_mlflow", type=str2bool, default=True)
    p.add_argument("--task", type=str, choices=["train", "sample", "dataset"], default="train")
    p.add_argument("--content", type=str, default="test_code")
    p.add_argument("--dir_work", type=str, default="./")
    p.add_argument("--dir_dataset", type=str, default="/nas2/dataset")
    p.add_argument("--data_name", type=str, default="mnist")
    p.add_argument("--data_set", type=str, default="train")
    p.add_argument("--data_size", type=int, default=64)
    p.add_argument("--data_subset", type=str2bool, default=False)
    p.add_argument("--data_subset_num", type=int, default=1000)
    # single-class filter for mnist/cifar10 (utils/datasetutils.py:223-243)
    p.add_argument("--data_subset_label", type=int, default=None)
    p.add_argument("--date", type=str, default="")
    p.add_argument("--time", type=str, default="")
    p.add_argument("--wandb_name", type=str, default="diffusion")
    p.add_argument("--method", type=str, default="base")
    p.add_argument("--test_method", type=str, default="base")
    p.add_argument("--title", type=str, default="")
    # ---- model / optim (:369-381)
    p.add_argument("--model", type=str, default="default")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--in_channel", type=int, default=3)
    p.add_argument("--out_channel", type=int, default=3)
    p.add_argument("--num_attention", type=int, default=1)
    p.add_argument("--num_epochs", type=int, default=1000)
    p.add_argument("--optim", type=str, choices=["adam", "adamw", "sgd"], default="adamw")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr_scheduler", type=str, default="linear")
    p.add_argument("--lr_warmup_steps", type=int, default=500)
    p.add_argument("--lr_cycle", type=float, default=0.5)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--mixed_precision", type=str, default="no", choices=["no", "fp16", "bf16"])
    # ---- ema / process (:383-401)
    p.add_argument("--use_ema", type=str2bool, default=True)
    p.add_argument("--ema_inv_gamma", type=float, default=1.0)
    p.add_argument("--ema_power", type=float, default=3 / 4)
    p.add_argument("--ema_max_decay", type=float, default=0.9999)
    p.add_argument("--loss_weight_use", type=str2bool, default=False)
    p.add_argument("--loss_weight_power_base", type=float, default=10.0)
    p.add_argument("--loss_space", type=str, default="x_0")
    p.add_argument("--ddpm_num_steps", type=int, default=1000)
    p.add_argument("--updated_ddpm_num_steps", type=int, default=1000)
    p.add_argument("--ddpm_schedule", type=str, default="linear")
    p.add_argument("--ddpm_schedule_base", type=float, default=10.0)
    p.add_argument("--scheduler_num_scale_timesteps", type=int, default=1)
    p.add_argument("--select_degrade_pixel", default="indexing")
    p.add_argument("--degrade_channel", type=str, default="1-channel")
    p.add_argument("--mean_option", default=0)
    p.add_argument("--mean_area", default="image-wise", choices=["channel-wise", "image-wise"])
    p.add_argument("--mean_value_accumulate", type=str2bool, default=False)
    p.add_argument(
        "--shift_type", type=str, default="noise_with_perturbation",
        choices=[
            "1-d_constant", "3-d_constant", "noise_reduction",
            "noise_std_reduction", "noise_with_perturbation", "non_shift",
        ],
    )
    p.add_argument("--noise_mean", type=float, default=0)
    # ---- sampling (:403-415)
    p.add_argument(
        "--sample_latent_shape", type=str, default="data",
        choices=["data", "zero", "normal", "uniform", "grid"],
    )
    p.add_argument("--sampling", type=str, default="base")
    p.add_argument(
        "--momentum_adaptive", type=str, default="base_momentum",
        choices=["base_momentum", "base_sampling", "momentum", "boosting"],
    )
    p.add_argument("--adaptive_decay_rate", type=float, default=0.999)
    p.add_argument("--adaptive_momentum_rate", type=float, default=0.9)
    p.add_argument(
        "--sampling_mask_dependency", type=str, default="independent",
        choices=["dependent_prev", "independent", "dependent_t"],
    )
    p.add_argument("--sample_num", type=int, default=100)
    p.add_argument("--sample_epoch_ratio", type=float, default=0.2)
    p.add_argument("--resume_from_checkpoint", default="False")
    p.add_argument("--num_workers", type=int, default=32)
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--save_images_epochs", type=int, default=10)
    p.add_argument("--output_dir", type=str, default=None)
    # ---- test (:417)
    p.add_argument("--test_model_path", type=str, default=None)
    # ---- TPU-native extensions
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mesh_data", type=int, default=-1)
    p.add_argument("--mesh_model", type=int, default=1)
    p.add_argument(
        "--tp_min_features", type=int, default=256,
        help="narrowest output-feature width that channel-shards over the "
        "'model' axis when --mesh_model > 1 (parallel/tp.py)",
    )
    p.add_argument(
        "--mesh_spatial", type=str2bool, default=False,
        help="shard activations along image height over the 'model' axis "
        "(parallel/sp.py spatial partitioning, for images too large for one "
        "chip's HBM) instead of channel-sharding params; needs "
        "--mesh_model > 1",
    )
    p.add_argument("--multihost", type=str2bool, default=False)
    p.add_argument("--capture_trajectory", type=str2bool, default=False)
    p.add_argument(
        "--interpolation_shift", type=float, default=None,
        help="enable interpolation sampling on the save cadence "
        "(Sampler.sample's third argument, sampler.py:102-106,264-366)",
    )
    p.add_argument(
        "--block_out_channels", type=str, default=None,
        help="comma-separated UNet level widths, e.g. 64,64,128 (default: "
        "the reference's 128,128,256,256,512,512)",
    )
    p.add_argument("--layers_per_block", type=int, default=2)
    p.add_argument(
        "--remat", type=str2bool, default=False,
        help="rematerialize UNet blocks on backward (flax nn.remat): ~11% "
        "slower steps for a large activation-memory cut — for memory-bound "
        "configs (docs/PERFORMANCE.md)",
    )
    p.add_argument(
        "--attention_chunk", type=int, default=None,
        help="exact chunked attention: lax.map over query blocks of this "
        "size bounds live scores to (B, heads, chunk, S) — escape hatch for "
        "placements whose full (S, S) scores don't fit HBM (0/unset = "
        "materialized-scores einsum, the measured-faster path at S <= 1024)",
    )
    p.add_argument(
        "--tinyhead_attention", type=str2bool, default=None,
        help="head-major Pallas flash attention for the family's 8-wide "
        "heads: VMEM-resident scores, zero lane padding; exact, falls back "
        "to the einsum at S < 128 (ops/pallas/tinyhead_attention.py). "
        "Unset = AUTO: on for single-device TPU (measured 2.4-2.5x vs the "
        "einsum at S=256/1024); true/false forces",
    )
    p.add_argument(
        "--epoch_scan", type=str2bool, default=None,
        help="train each epoch as ONE compiled lax.scan over its batches "
        "(device-resident data required; removes the per-step host dispatch "
        "between roofline-saturated device steps). Unset = AUTO (on for TPU "
        "when device data is in use); true/false forces. Single-host SIGTERM "
        "preemption coarsens to epoch granularity while on",
    )
    p.add_argument(
        "--encoder_reuse", type=int, default=0,
        help="sampling-only: run the UNet encoder every K-th reverse step "
        "and replay its cached activations between (Faster Diffusion, "
        "arXiv:2312.09608) — an approximation trading sample fidelity for "
        "per-step cost; 0/1 = exact sampling (default)",
    )
    p.add_argument("--profile_dir", type=str, default=None)
    p.add_argument(
        "--keep_last_checkpoints", type=int, default=0,
        help="keep only the N newest checkpoint-epoch-* dirs (0 = keep all, "
        "the reference behavior)",
    )
    p.add_argument(
        "--async_checkpoints", type=str2bool, default=False,
        help="commit cadence checkpoint writes in background threads instead "
        "of stalling the train loop (orbax async save; preemption and "
        "post-mortem saves stay synchronous)",
    )
    return p


def config_from_args(args) -> "Config":
    from masked_diffusion_tpu.config import Config
    import dataclasses

    fields = {f.name for f in dataclasses.fields(Config)}
    kw = {k: v for k, v in vars(args).items() if k in fields}
    if kw.get("block_out_channels"):
        kw["block_out_channels"] = tuple(
            int(c) for c in str(kw["block_out_channels"]).split(",")
        )
    return Config(**kw)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    # MDT_PLATFORM=cpu forces the jax backend (CI / machines without the TPU
    # tunnel); must happen before ANY other jax use (utils/platform.py)
    plat = os.environ.get("MDT_PLATFORM")
    if plat:
        from masked_diffusion_tpu.utils.platform import force_platform

        force_platform(plat)

    if args.multihost:
        from masked_diffusion_tpu.parallel.mesh import init_distributed

        init_distributed()

    import jax

    from masked_diffusion_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()

    from masked_diffusion_tpu.data.datasets import get_dataset
    from masked_diffusion_tpu.data.histogram import compute_mean_histogram, empty_histogram
    from masked_diffusion_tpu.parallel.mesh import make_mesh
    from masked_diffusion_tpu.utils import host
    from masked_diffusion_tpu.utils.dirs import Dir
    from masked_diffusion_tpu.utils.visualizer import Visualizer

    cfg = config_from_args(args)

    # multi-host write discipline (utils/host.py; the reference's
    # is_main_process gates, trainer_masked_mean_shift.py:242): one agreed
    # timestamp, dirs + option.ini + visualizer only on process 0
    main_process = host.is_main_process()
    if host.process_count() > 1 and not (cfg.date and cfg.time):
        cfg.date, cfg.time = host.synced_timestamp()
    dirs = Dir(
        task=cfg.task, content=cfg.content, dir_work=cfg.dir_work,
        dir_dataset=cfg.dir_dataset, data_name=cfg.data_name, data_set=cfg.data_set,
        data_size=cfg.data_size, date=cfg.date, time=cfg.time,
        method=cfg.method, title=cfg.title, make_dirs=main_process,
    )
    np.random.seed(cfg.seed)  # host-side seeding (main_train_masked.py:441-445)
    # the sample-task tree (utils/dirs.py:100-113) has no option/log dirs
    if main_process and "option" in dirs.list_dir:
        cfg.save_option(dirs.list_dir["option"])

    # ---- data (+ mean histogram, main_train_masked.py:46-89)
    dataset = get_dataset(
        cfg.dir_dataset, cfg.data_name, cfg.data_size, cfg.data_set,
        cfg.data_subset, cfg.data_subset_num, seed=cfg.seed,
        # label filter is gated on data_subset, matching the reference's
        # mnist class filter (datasetutils.py:223-243) and the legacy GAN
        # entry point's data_subset_use gating — one convention everywhere
        label_filter=cfg.data_subset_label if cfg.data_subset else None,
    )
    if cfg.sample_latent_shape.lower() == "data":
        dataset_hist = compute_mean_histogram(dataset.data, cfg.sample_num, cfg.mean_area)
    else:
        dataset_hist = empty_histogram()

    mesh_plan = make_mesh(cfg.mesh_data, cfg.mesh_model)
    if cfg.mesh_spatial:
        # fail fast on topologies spatial sharding cannot serve, before any
        # data/model work (parallel/sp.py)
        from masked_diffusion_tpu.parallel.sp import validate_spatial

        validate_spatial(mesh_plan, cfg.data_size)
    # always-on JSONL metrics sink (log/metrics.jsonl); wandb only if enabled;
    # instantiated main-process-only like the reference
    # (main_train_masked.py:313-319)
    visualizer = (
        Visualizer(cfg, dirs.list_dir["log"])
        if main_process and "log" in dirs.list_dir
        else None
    )

    print(
        f"***** Running {cfg.method} *****\n"
        f"  Num examples = {len(dataset)}\n"
        f"  Num epochs = {cfg.num_epochs}\n"
        f"  Batch size per step = {cfg.batch_size}"
        f" (x{mesh_plan.data_size} data-parallel shards)\n"
        f"  Gradient accumulation = {cfg.gradient_accumulation_steps}",
        flush=True,
    )

    method = cfg.method.lower()
    if method in ("base", "mean_shift"):
        from masked_diffusion_tpu.io.checkpoint import find_resume_checkpoint
        from masked_diffusion_tpu.train.trainer import Trainer

        trainer = Trainer(cfg, dataset, dataset_hist, mesh_plan, visualizer)
        global_step, first_epoch, resume_step = 0, 0, 0
        if str(cfg.resume_from_checkpoint) != "False":
            path = find_resume_checkpoint(
                cfg.output_dir or dirs.list_dir["checkpoint"], cfg.resume_from_checkpoint
            )
            if path is not None:
                # full-state resume: params/EMA/optimizer, the micro-step
                # counter (EMA decay warmup + reported lr), loss/lr history
                global_step = trainer.restore(path)
                steps_per_epoch = max(1, dataset.num_batches(cfg.batch_size))
                first_epoch = global_step // steps_per_epoch
                resume_step = global_step % steps_per_epoch
                print(f"Resuming from checkpoint {path} (epoch {first_epoch})")
            else:
                print(
                    f"Checkpoint '{cfg.resume_from_checkpoint}' does not exist. "
                    "Starting a new training run."
                )
        # reference semantics: num_epochs is the TOTAL epoch count — a
        # resumed run completes epochs first_epoch..num_epochs-1, it does not
        # train num_epochs more (main_train_masked.py:285-335 runs
        # range(first_epoch, num_epochs))
        remaining = max(0, cfg.num_epochs - first_epoch)
        trainer.train(first_epoch, remaining, resume_step, global_step, dirs, visualizer)
    elif method == "test":
        from masked_diffusion_tpu.io.checkpoint import load_checkpoint
        from masked_diffusion_tpu.tester import Tester
        from masked_diffusion_tpu.train.step import create_train_state
        from masked_diffusion_tpu.train.optim import build_lr_schedule, build_optimizer
        from masked_diffusion_tpu.train.trainer import build_model_from_config

        model = build_model_from_config(cfg)
        tx = build_optimizer("adamw", build_lr_schedule("constant", cfg.lr, 0, 1))
        state = create_train_state(
            model, jax.random.PRNGKey(cfg.seed),
            (1, cfg.data_size, cfg.data_size, cfg.in_channel), tx, cfg.use_ema,
        )
        if not cfg.test_model_path:
            raise SystemExit("--test_model_path is required for --method test")
        params, ema, _, _ = load_checkpoint(
            cfg.test_model_path, state.params, state.ema_params, None
        )
        tester = Tester(
            cfg, dataset, model, params, ema, dataset_hist=dataset_hist,
            mesh_plan=mesh_plan,
        )
        tester.run(dirs)
    elif method == "sample":
        # standalone generation (serving path, sample/generate.py): the
        # reference has no checkpoint->images entry point — its only sampling
        # runs inside training (trainer_masked_mean_shift.py:409-429) or the
        # Tester loop (tester.py:57-133)
        from masked_diffusion_tpu.io.checkpoint import (
            find_resume_checkpoint,
            load_checkpoint,
        )
        from masked_diffusion_tpu.ops.schedule import build_schedule
        from masked_diffusion_tpu.sample.generate import generate_images
        from masked_diffusion_tpu.train.step import create_train_state
        from masked_diffusion_tpu.train.optim import build_lr_schedule, build_optimizer
        from masked_diffusion_tpu.train.trainer import build_model_from_config

        ckpt_path = cfg.test_model_path
        if not ckpt_path and str(cfg.resume_from_checkpoint) != "False":
            ckpt_dir = cfg.output_dir or dirs.list_dir.get("checkpoint")
            if ckpt_dir:
                ckpt_path = find_resume_checkpoint(ckpt_dir, cfg.resume_from_checkpoint)
        if not ckpt_path:
            raise SystemExit(
                "--method sample needs --test_model_path (or "
                "--resume_from_checkpoint latest with --output_dir)"
            )
        model = build_model_from_config(cfg)
        tx = build_optimizer("adamw", build_lr_schedule("constant", cfg.lr, 0, 1))
        state = create_train_state(
            model, jax.random.PRNGKey(cfg.seed),
            (1, cfg.data_size, cfg.data_size, cfg.in_channel), tx, cfg.use_ema,
        )
        params, ema, _, _ = load_checkpoint(
            ckpt_path, state.params, state.ema_params, None
        )
        schedule = build_schedule(
            cfg.ddpm_schedule, cfg.ddpm_num_steps, cfg.data_size,
            cfg.select_degrade_pixel, cfg.ddpm_schedule_base,
        )
        cfg.updated_ddpm_num_steps = schedule.num_steps
        out_dir = dirs.list_dir.get("sample") or dirs.list_dir["test_sample_img"]
        stats = generate_images(
            cfg, model,
            ema if (cfg.use_ema and ema is not None) else params,
            schedule, dataset_hist, mesh_plan,
            out_dir=out_dir if main_process else None,
        )
        print(
            f"sampled {len(stats['images'])} images in {stats['batches']} "
            f"batch(es) -> {out_dir} ({stats['images_per_sec']:.2f} imgs/s)",
            flush=True,
        )
    else:
        raise SystemExit(f"unknown --method {cfg.method!r}")

    if visualizer is not None:
        visualizer.finish()
    return 0


if __name__ == "__main__":
    sys.exit(main())
