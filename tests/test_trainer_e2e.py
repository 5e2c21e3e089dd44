"""End-to-end integration: train a tiny model for a few epochs on synthetic
data, sample, checkpoint, and run the tester loop (SURVEY.md §4 integration
tier)."""

import os

import jax
import numpy as np
import pytest

from masked_diffusion_tpu.config import Config
from masked_diffusion_tpu.data.datasets import get_dataset
from masked_diffusion_tpu.data.histogram import compute_mean_histogram
from masked_diffusion_tpu.train.trainer import Trainer
from masked_diffusion_tpu.utils.dirs import Dir

SIZE = 8


def _cfg(tmp, **kw):
    base = dict(
        method="mean_shift", data_name="synthetic", data_size=SIZE,
        data_subset=True, data_subset_num=32, batch_size=8, num_epochs=3,
        ddpm_schedule="log", ddpm_num_steps=6, select_degrade_pixel="indexing",
        degrade_channel="1-channel", mean_option="degraded_area",
        mean_area="image-wise", shift_type="1-d_constant", use_ema=True,
        lr=1e-3, lr_scheduler="constant", lr_warmup_steps=0,
        sample_num=4, sample_latent_shape="data", save_images_epochs=2,
        use_wandb=False, use_mlflow=False, dir_work=str(tmp),
        block_out_channels=(8, 16), layers_per_block=1, num_attention=1,
        scheduler_num_scale_timesteps=1,
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    cfg = _cfg(tmp)
    dataset = get_dataset("", "synthetic", SIZE, data_subset=True, num_data=32)
    hist = compute_mean_histogram(dataset.data, cfg.sample_num, cfg.mean_area)
    dirs = Dir(task="train", content="test", dir_work=str(tmp),
               data_name="synthetic", data_size=SIZE, method=cfg.method)
    trainer = Trainer(cfg, dataset, hist)
    result = trainer.train(0, cfg.num_epochs, dirs=dirs)
    return cfg, dataset, hist, dirs, trainer, result


class TestTrainEndToEnd:
    def test_loss_decreases(self, run):
        *_, result = run
        losses = result["loss_mean_epoch"]
        assert len(losses) == 3
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()

    def test_checkpoint_written(self, run):
        _, _, _, dirs, _, _ = run
        ckpts = os.listdir(dirs.list_dir["checkpoint"])
        assert any(c.startswith("checkpoint-epoch-") for c in ckpts)
        latest = sorted(ckpts)[-1]
        base = os.path.join(dirs.list_dir["checkpoint"], latest)
        assert os.path.isdir(os.path.join(base, "unet"))
        assert os.path.isdir(os.path.join(base, "unet_ema"))

    def test_sample_grids_written(self, run):
        _, _, _, dirs, _, _ = run
        pngs = os.listdir(dirs.list_dir["ema_sample_img"])
        assert any(p.endswith("_global.png") for p in pngs)
        assert any(p.endswith("_local.png") for p in pngs)

    def test_train_visuals_written(self, run):
        """Train-time visual dumps (VERDICT r1 missing #1): degraded / mask /
        prediction / shift grids from the last batch land in the run tree on
        the save cadence (trainer_masked.py:58-80,300-342)."""
        _, _, _, dirs, _, _ = run
        for key, stem in [
            ("mask_img", "degrade_binary_masks"),
            ("noisy_img", "degraded_img"),
            ("predict_img", "reconstructed_img"),
            ("train_img", "input"),
            ("noise_img", "mask"),
            ("shift_img", "shift"),           # mean_shift run: shift dirs live
            ("shift_noisy", "shifted_degrade_img"),
        ]:
            files = os.listdir(dirs.list_dir[key])
            assert any(f.startswith(stem) and f.endswith("_global.png") for f in files), (
                key, stem, files,
            )
            assert any(f.startswith(stem) and f.endswith("_local.png") for f in files)

    def test_loss_curve_written(self, run):
        _, _, _, dirs, _, _ = run
        assert os.path.exists(os.path.join(dirs.list_dir["train_loss"], "loss.png"))

    def test_sampling_produces_finite(self, run):
        _, _, _, _, trainer, _ = run
        out = trainer.sample_ema(jax.random.PRNGKey(0), sample_num=4)
        sample = np.asarray(out[0] if isinstance(out, tuple) else out)
        assert sample.shape == (4, SIZE, SIZE, 3)
        assert np.isfinite(sample).all()


class TestTester:
    def test_diversity_loop(self, run, tmp_path):
        from masked_diffusion_tpu.tester import Tester

        cfg, dataset, hist, _, trainer, _ = run
        tcfg = cfg.replace(data_subset_num=8, sample_num=8, method="test")
        dirs = Dir(task="train", content="tester", dir_work=str(tmp_path),
                   data_name="synthetic", data_size=SIZE, method="test")
        tester = Tester(
            tcfg, dataset, trainer.model, trainer.state.params,
            trainer.state.ema_params, trainer.schedule, hist,
        )
        out = tester.run(dirs, max_rounds=3)
        assert out["rounds"] >= 1
        assert len(out["num_unique_history"]) == out["rounds"]
        # unique counts are monotone non-decreasing
        assert all(
            b >= a for a, b in zip(out["num_unique_history"], out["num_unique_history"][1:])
        )
        assert os.path.exists(
            os.path.join(dirs.list_dir["test_sample_num"], "number_of_sample.png")
        )


class TestDedupUnits:
    def test_greedy_dedup(self):
        from masked_diffusion_tpu.tester import dedup_against, greedy_dedup

        rng = np.random.default_rng(0)
        a = rng.normal(size=(1, SIZE, SIZE, 3)).astype(np.float32)
        b = rng.normal(size=(1, SIZE, SIZE, 3)).astype(np.float32)
        batch = np.concatenate([a, a * 1.001, b, a], axis=0)  # 3 near-copies of a
        unique = greedy_dedup(batch)
        assert len(unique) == 2
        fresh = dedup_against(unique, a)
        assert len(fresh) == 1  # only b survives


def test_sigterm_saves_resumable_checkpoint(tmp_path):
    """Preemption safety (beyond the reference): SIGTERM mid-training saves a
    resumable checkpoint marked preempted=True and train() returns cleanly
    instead of dying at the default handler."""
    import json
    import os
    import signal
    import threading

    from masked_diffusion_tpu.config import Config
    from masked_diffusion_tpu.data.datasets import InMemoryDataset, make_synthetic
    from masked_diffusion_tpu.train.trainer import Trainer
    from masked_diffusion_tpu.utils.dirs import Dir

    cfg = Config(
        method="base", data_size=8, batch_size=4, num_epochs=10_000,
        ddpm_schedule="log", ddpm_num_steps=4, select_degrade_pixel="indexing",
        mean_option="degraded_area", shift_type="non_shift", use_ema=True,
        use_wandb=False, block_out_channels=(8, 16), layers_per_block=1,
        lr_warmup_steps=0, sample_latent_shape="zero", sample_num=2,
        save_images_epochs=1_000_000,  # never reach the normal save cadence
    )
    data, labels = make_synthetic(16, 8, seed=0)
    trainer = Trainer(cfg, InMemoryDataset(data, labels))
    dirs = Dir(task="train", content="preempt", dir_work=str(tmp_path),
               dir_dataset="", data_name="synthetic", data_set="train",
               data_size=8, method="base", title="t")

    # no-op outer handler: if the timer fires after train() restored the
    # previous handler but before killer.cancel(), the default handler would
    # kill the whole pytest process
    def _noop(*_):
        pass

    outer = signal.signal(signal.SIGTERM, _noop)
    killer = threading.Timer(3.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
    killer.start()
    try:
        trainer.train(0, cfg.num_epochs, dirs=dirs)  # returns, doesn't die
    finally:
        killer.cancel()
        restored = signal.getsignal(signal.SIGTERM)
        signal.signal(signal.SIGTERM, outer)

    ckpts = sorted(os.listdir(dirs.list_dir["checkpoint"]))
    assert ckpts, "no preemption checkpoint written"
    with open(os.path.join(dirs.list_dir["checkpoint"], ckpts[-1], "meta.json")) as f:
        meta = json.load(f)
    assert meta.get("preempted") is True
    assert meta["global_step"] == trainer.global_step > 0
    # train() restored the handler it found installed (the no-op outer one)
    assert restored is _noop


def test_trajectory_grids_saved(tmp_path):
    """capture_trajectory=True writes per-item step grids to sample_all_t
    (the reference's visual_list artifacts, sampler.py:390-417)."""
    import glob
    import os

    import jax
    import numpy as np

    from masked_diffusion_tpu.config import Config
    from masked_diffusion_tpu.data.datasets import InMemoryDataset, make_synthetic
    from masked_diffusion_tpu.train.trainer import Trainer
    from masked_diffusion_tpu.utils.dirs import Dir

    cfg = Config(
        method="base", data_size=8, batch_size=4, num_epochs=1,
        ddpm_schedule="log", ddpm_num_steps=4, select_degrade_pixel="indexing",
        mean_option="degraded_area", shift_type="non_shift", use_ema=True,
        use_wandb=False, block_out_channels=(8, 16), layers_per_block=1,
        lr_warmup_steps=0, sample_latent_shape="zero", sample_num=2,
        capture_trajectory=True, save_images_epochs=1,
    )
    data, labels = make_synthetic(8, 8, seed=0)
    trainer = Trainer(cfg, InMemoryDataset(data, labels))
    dirs = Dir(task="train", content="traj", dir_work=str(tmp_path),
               dir_dataset="", data_name="synthetic", data_set="train",
               data_size=8, method="base", title="t")
    trainer.train(0, 1, dirs=dirs)
    pngs = glob.glob(os.path.join(dirs.list_dir["sample_all_t"], "*.png"))
    assert any("sample_t_" in p for p in pngs)
    assert any("sample_0_" in p for p in pngs)


def test_device_resident_data_bitwise(tmp_path, monkeypatch):
    """The device-resident data fast path (trainer._use_device_data: dataset
    in HBM + on-device index gather, replacing the per-step host push) must
    be invisible to training: same rng stream, same batch membership, and
    bitwise-equal per-epoch losses vs the host-fed path."""
    from masked_diffusion_tpu.data.datasets import InMemoryDataset, make_synthetic

    def losses(env_val, tag):
        monkeypatch.setenv("MDT_DEVICE_DATA", env_val)
        cfg = _cfg(tmp_path, num_epochs=2, save_images_epochs=99,
                   sample_latent_shape="zero")
        data, labels = make_synthetic(32, SIZE, seed=0)
        trainer = Trainer(cfg, InMemoryDataset(data, labels))
        dirs = Dir(task="train", content=f"feed_{tag}", dir_work=str(tmp_path),
                   data_name="synthetic", data_size=SIZE, method=cfg.method)
        result = trainer.train(0, cfg.num_epochs, dirs=dirs)
        # the device path must actually have engaged (or not)
        assert (trainer._data_dev is not None) == (env_val == "1")
        return result["loss_mean_epoch"]

    host_fed = losses("0", "host")
    device_res = losses("1", "dev")
    assert host_fed == device_res  # bitwise: same floats, not just close


def test_epoch_scan_matches_loop(tmp_path, monkeypatch):
    """Whole-epoch lax.scan training (trainer._use_epoch_scan ->
    train/step.py:make_train_epoch) must be invisible to training semantics:
    the scan body splits the SAME data_key chain and gathers the SAME index
    rows as the per-step loop, so per-epoch losses and final weights match
    the loop path (same device-resident feed, scan forced off vs on)."""
    from masked_diffusion_tpu.data.datasets import InMemoryDataset, make_synthetic

    def run(scan_env, tag, resume_step=0):
        monkeypatch.setenv("MDT_DEVICE_DATA", "1")
        monkeypatch.setenv("MDT_EPOCH_SCAN", scan_env)
        cfg = _cfg(tmp_path, num_epochs=2, save_images_epochs=99,
                   sample_latent_shape="zero")
        data, labels = make_synthetic(32, SIZE, seed=0)
        trainer = Trainer(cfg, InMemoryDataset(data, labels))
        dirs = Dir(task="train", content=f"scan_{tag}", dir_work=str(tmp_path),
                   data_name="synthetic", data_size=SIZE, method=cfg.method)
        result = trainer.train(0, cfg.num_epochs, resume_step=resume_step,
                               dirs=dirs)
        assert bool(trainer._epoch_cache) == (scan_env == "1")
        leaf = np.asarray(jax.tree.leaves(trainer.state.ema_params)[0])
        return result["loss_mean_epoch"], leaf, trainer.global_step

    loop_losses, loop_leaf, loop_steps = run("0", "loop")
    scan_losses, scan_leaf, scan_steps = run("1", "scan")
    assert loop_steps == scan_steps
    np.testing.assert_allclose(scan_losses, loop_losses, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(scan_leaf, loop_leaf, rtol=1e-6, atol=1e-7)

    # mid-epoch resume replay: skipping the first batch must advance the key
    # chain identically on both paths (the scan fast-forwards the skipped
    # rows' splits; the loop consumes None placeholders)
    loop_r = run("0", "loop_r", resume_step=1)
    scan_r = run("1", "scan_r", resume_step=1)
    assert loop_r[2] == scan_r[2]
    np.testing.assert_allclose(scan_r[0], loop_r[0], rtol=1e-6, atol=1e-7)
