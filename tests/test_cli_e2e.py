"""CLI end-to-end on the virtual CPU mesh: fresh train run, resume from
latest checkpoint (main_train_masked.py:250-277 semantics), and the error
surfaces (bad method, invalid schedule coupling)."""

import glob
import json
import os

import pytest

from masked_diffusion_tpu.cli.main_train_masked import main


def _args(tmp_path, title, extra=()):
    return [
        "--method", "base", "--data_name", "synthetic", "--data_size", "8",
        "--data_subset", "True", "--data_subset_num", "32",
        "--batch_size", "8", "--ddpm_schedule", "log", "--ddpm_num_steps", "6",
        "--select_degrade_pixel", "indexing", "--mean_option", "degraded_area",
        "--shift_type", "non_shift", "--num_epochs", "2",
        "--save_images_epochs", "2", "--sample_num", "2",
        "--sample_latent_shape", "zero",
        "--use_wandb", "False", "--use_mlflow", "False",
        "--lr", "1e-3", "--lr_warmup_steps", "0",
        "--block_out_channels", "8,16", "--layers_per_block", "1",
        "--dir_work", str(tmp_path), "--content", "cli", "--title", title,
        *extra,
    ]


def test_cli_train_then_resume(tmp_path):
    assert main(_args(tmp_path, "first")) == 0
    runs = glob.glob(str(tmp_path / "result/cli/synthetic/base/*/first"))
    assert len(runs) == 1
    ckpt_dir = os.path.join(runs[0], "checkpoint")
    ckpts = sorted(os.listdir(ckpt_dir))
    assert ckpts, "no checkpoints written"
    with open(os.path.join(ckpt_dir, ckpts[-1], "meta.json")) as f:
        first_meta = json.load(f)
    assert first_meta["global_step"] > 0

    # resume: global_step continues from the restored checkpoint
    assert main(_args(
        tmp_path, "resumed",
        ("--resume_from_checkpoint", "latest", "--output_dir", ckpt_dir,
         "--num_epochs", "3"),
    )) == 0
    runs2 = glob.glob(str(tmp_path / "result/cli/synthetic/base/*/resumed"))
    ckpt_dir2 = os.path.join(runs2[0], "checkpoint")
    metas = []
    for c in sorted(os.listdir(ckpt_dir2)):
        with open(os.path.join(ckpt_dir2, c, "meta.json")) as f:
            metas.append(json.load(f))
    # EVERY resumed checkpoint must sit past the restored step — a silent
    # fresh start would also eventually exceed it, but not from the first one
    assert min(m["global_step"] for m in metas) > first_meta["global_step"]

    # option.ini dumped for both runs
    assert os.path.exists(os.path.join(runs2[0], "option", "option.ini"))


def test_cli_sampling_base_and_interpolation(tmp_path):
    """--sampling base (trajectory-capturing EMA-sample arm,
    trainer_masked_mean_shift.py:254-260 intent) and --interpolation_shift
    (the interpolation sampler route, sampler.py:102-106,264-366) are both
    reachable from the CLI and leave their artifacts."""
    # interpolation masks are ratio thresholds, so the run must use
    # thresholding (indexing + interpolation now raises at config time —
    # config.py:validate_sampling_modes, tests/test_mode_grid.py)
    assert main(_args(
        tmp_path, "basearm",
        ("--method", "mean_shift", "--shift_type", "1-d_constant",
         "--ddpm_schedule", "linear", "--select_degrade_pixel", "thresholding",
         "--sampling", "base", "--interpolation_shift", "0.5"),
    )) == 0
    runs = glob.glob(str(tmp_path / "result/cli/synthetic/mean_shift/*/basearm"))
    assert len(runs) == 1
    # trajectory grids from the base arm (all captured fields rendered)
    traj = os.listdir(os.path.join(runs[0], "train", "image", "sample_all_t"))
    assert any(f.startswith("sample_t_") for f in traj)
    assert any(f.startswith("degraded_t_") for f in traj)
    # interpolation sweep grid next to the EMA samples
    ema = os.listdir(os.path.join(runs[0], "train", "image", "ema_sample_img"))
    assert any(f.startswith("ema_interpolation_") for f in ema)
    assert any(f.startswith("ema_sample_") for f in ema)
    # trajectory means logged by the base arm
    with open(os.path.join(runs[0], "log", "metrics.jsonl")) as f:
        keys = set()
        for line in f:
            keys |= set(json.loads(line))
    assert {"ema_sample_t_mean", "ema_sample_0_mean"} <= keys


def test_cli_tensor_parallel_train_resume(tmp_path):
    """--mesh_model 2: training (and resume) run with wide kernels
    channel-sharded over the model axis (parallel/tp.py wired through
    Trainer._place_state); loss stays finite and checkpoints round-trip."""
    tp = ("--mesh_data", "4", "--mesh_model", "2", "--tp_min_features", "8")
    assert main(_args(tmp_path, "tprun", tp)) == 0
    runs = glob.glob(str(tmp_path / "result/cli/synthetic/base/*/tprun"))
    assert len(runs) == 1
    ckpt_dir = os.path.join(runs[0], "checkpoint")
    with open(os.path.join(ckpt_dir, sorted(os.listdir(ckpt_dir))[-1], "meta.json")) as f:
        meta = json.load(f)
    assert meta["global_step"] > 0

    assert main(_args(
        tmp_path, "tpresumed",
        (*tp, "--resume_from_checkpoint", "latest", "--output_dir", ckpt_dir,
         "--num_epochs", "3"),
    )) == 0
    runs2 = glob.glob(str(tmp_path / "result/cli/synthetic/base/*/tpresumed"))
    ckpt_dir2 = os.path.join(runs2[0], "checkpoint")
    with open(os.path.join(ckpt_dir2, sorted(os.listdir(ckpt_dir2))[-1], "meta.json")) as f:
        meta2 = json.load(f)
    assert meta2["global_step"] > meta["global_step"]


def test_cli_standalone_sample(tmp_path):
    """--method sample: the checkpoint->images serving path
    (sample/generate.py — absent in the reference, whose only sampling runs
    inside training or the Tester loop)."""
    assert main(_args(tmp_path, "trainrun")) == 0
    runs = glob.glob(str(tmp_path / "result/cli/synthetic/base/*/trainrun"))
    ckpt_dir = os.path.join(runs[0], "checkpoint")
    ckpt = os.path.join(ckpt_dir, sorted(os.listdir(ckpt_dir))[-1])

    assert main(_args(
        tmp_path, "sampled",
        ("--method", "sample", "--test_model_path", ckpt,
         "--sample_num", "5", "--batch_size", "4", "--mesh_data", "2"),
    )) == 0
    out = glob.glob(str(tmp_path / "result/cli/synthetic/sample/*/sampled"))
    assert len(out) == 1
    files = os.listdir(os.path.join(out[0], "test", "sample"))
    # 5 images in 2 batches of 4 -> 5 per-image PNGs + 2 batch grids
    assert sum(f.startswith("sample_0") for f in files) == 5
    assert sum(f.startswith("sample_grid_") for f in files) == 2

    # latest-scan route through --output_dir works too
    assert main(_args(
        tmp_path, "sampled2",
        ("--method", "sample", "--resume_from_checkpoint", "latest",
         "--output_dir", ckpt_dir, "--sample_num", "2", "--batch_size", "2",
         "--use_ema", "False"),
    )) == 0
    out2 = glob.glob(str(tmp_path / "result/cli/synthetic/sample/*/sampled2"))
    files2 = os.listdir(os.path.join(out2[0], "test", "sample"))
    assert sum(f.startswith("sample_0") for f in files2) == 2


def test_cli_zoo_model_train_and_sample(tmp_path):
    """--model unet3 (zoo family, models_Unet.py:17 surface): trains,
    checkpoints, and the standalone sample arm serves from the zoo
    checkpoint — the --model flag must round-trip through create_train_state
    templates on both paths."""
    zoo = ("--model", "unet3", "--data_size", "16", "--num_epochs", "1",
           "--save_images_epochs", "1")
    assert main(_args(tmp_path, "zoorun", zoo)) == 0
    runs = glob.glob(str(tmp_path / "result/cli/synthetic/base/*/zoorun"))
    ckpt_dir = os.path.join(runs[0], "checkpoint")
    ckpt = os.path.join(ckpt_dir, sorted(os.listdir(ckpt_dir))[-1])

    assert main(_args(
        tmp_path, "zoosampled",
        (*zoo, "--method", "sample", "--test_model_path", ckpt,
         "--sample_num", "2", "--batch_size", "2"),
    )) == 0
    out = glob.glob(str(tmp_path / "result/cli/synthetic/sample/*/zoosampled"))
    files = os.listdir(os.path.join(out[0], "test", "sample"))
    assert sum(f.startswith("sample_0") for f in files) == 2


def test_cli_memory_knobs_parse_to_config():
    """--remat / --attention_chunk (TPU-native extensions) map into Config —
    the flags are the CLI surface of the memory escape hatches documented in
    docs/PERFORMANCE.md (remat row, chunked-attention section)."""
    from masked_diffusion_tpu.cli.main_train_masked import (
        build_parser, config_from_args,
    )

    cfg = config_from_args(build_parser().parse_args(
        ["--remat", "True", "--attention_chunk", "512", "--encoder_reuse", "3"]
    ))
    assert cfg.remat is True and cfg.attention_chunk == 512
    assert cfg.encoder_reuse == 3
    cfg = config_from_args(build_parser().parse_args([]))
    assert cfg.remat is False and cfg.attention_chunk is None
    assert cfg.encoder_reuse == 0


def test_cli_bad_method(tmp_path):
    with pytest.raises(SystemExit):
        main(_args(tmp_path, "bad", ("--method", "bogus")))


def test_cli_invalid_schedule_coupling(tmp_path):
    # linear ratios + exact-count indexing is the documented drift class
    # (SURVEY.md §0); the CLI must fail fast with the named error
    with pytest.raises(ValueError, match="indexing"):
        main(_args(tmp_path, "badsched", ("--ddpm_schedule", "linear")))


def test_legacy_gan_cli(tmp_path):
    """Legacy GAN entry point runs end-to-end (the reference's main_train.py
    is broken as checked in; ours trains)."""
    import main_train

    rc = main_train.main([
        "--data_name", "synthetic", "--data_size", "32",
        "--data_subset_use", "False", "--data_subset_num", "32",
        "--batch_size", "8", "--dim_feature", "4", "--dim_latent", "8",
        "--epoch_length", "1", "--save_every", "1",
        "--dir_work", str(tmp_path), "--content", "gan",
    ])
    assert rc == 0
