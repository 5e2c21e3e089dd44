"""Checkpoint layout + resume semantics (main_train_masked.py:195-225,250-277)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from masked_diffusion_tpu.io.checkpoint import (
    find_resume_checkpoint,
    load_checkpoint,
    save_checkpoint,
)


def _tree(seed):
    k = jax.random.PRNGKey(seed)
    return {
        "layer": {"kernel": jax.random.normal(k, (4, 4)), "bias": jnp.ones((4,))},
        "scale": jnp.float32(seed),
    }


class TestSaveLoad:
    def test_roundtrip_layout(self, tmp_path):
        params, ema = _tree(1), _tree(2)
        opt = {"mu": _tree(3)}
        path = save_checkpoint(str(tmp_path), 7, 1234, params, ema, opt)
        assert os.path.basename(path) == "checkpoint-epoch-7"
        # reference layout contract: unet/ + unet_ema/ subfolders
        assert os.path.isdir(os.path.join(path, "unet"))
        assert os.path.isdir(os.path.join(path, "unet_ema"))
        assert os.path.isdir(os.path.join(path, "optimizer"))

        template = jax.tree.map(jnp.zeros_like, params)
        p2, e2, o2, meta = load_checkpoint(
            path, template, jax.tree.map(jnp.zeros_like, ema),
            jax.tree.map(jnp.zeros_like, opt),
        )
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(ema), jax.tree.leaves(e2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert meta == {
            "epoch": 7, "global_step": 1234,
            "items": ["unet", "unet_ema", "optimizer"],
        }

    def test_load_without_ema(self, tmp_path):
        params = _tree(1)
        path = save_checkpoint(str(tmp_path), 0, 10, params)
        p2, e2, o2, meta = load_checkpoint(path, jax.tree.map(jnp.zeros_like, params))
        assert e2 is None and o2 is None
        assert meta["global_step"] == 10


class TestResumeScan:
    def test_latest_scan(self, tmp_path):
        params = _tree(0)
        for epoch in (3, 11, 7):
            save_checkpoint(str(tmp_path), epoch, epoch * 10, params)
        latest = find_resume_checkpoint(str(tmp_path), "latest")
        assert latest.endswith("checkpoint-epoch-11")

    def test_explicit_path(self, tmp_path):
        params = _tree(0)
        p = save_checkpoint(str(tmp_path), 2, 20, params)
        assert find_resume_checkpoint(str(tmp_path), p) == p

    def test_no_checkpoints(self, tmp_path):
        assert find_resume_checkpoint(str(tmp_path), "latest") is None
        assert find_resume_checkpoint(str(tmp_path / "nope"), "latest") is None

    def test_latest_skips_incomplete(self, tmp_path):
        """A crashed (or still-writing async) save leaves a dir without a
        finalized unet/ — the latest-scan must fall back to the newest
        COMPLETE checkpoint instead of resuming from garbage."""
        params = _tree(0)
        save_checkpoint(str(tmp_path), 3, 30, params)
        # epoch 9: dir exists, unet/ never committed (crash mid-write)
        os.makedirs(tmp_path / "checkpoint-epoch-9")
        # epoch 12: only an orbax tmp dir (async write in flight)
        os.makedirs(
            tmp_path / "checkpoint-epoch-12" / "unet.orbax-checkpoint-tmp-123"
        )
        latest = find_resume_checkpoint(str(tmp_path), "latest")
        assert latest.endswith("checkpoint-epoch-3")


class TestAsyncSave:
    def test_async_roundtrip_bitwise(self, tmp_path):
        """async_save returns before the disk write commits;
        wait_for_async_saves drains it and the checkpoint loads bitwise."""
        from masked_diffusion_tpu.io.checkpoint import wait_for_async_saves

        params, ema = _tree(1), _tree(2)
        opt = {"mu": _tree(3)}
        path = save_checkpoint(
            str(tmp_path), 4, 400, params, ema, opt, async_save=True
        )
        wait_for_async_saves()
        assert find_resume_checkpoint(str(tmp_path), "latest") == path
        p2, e2, o2, meta = load_checkpoint(
            path, jax.tree.map(jnp.zeros_like, params),
            jax.tree.map(jnp.zeros_like, ema),
            jax.tree.map(jnp.zeros_like, opt),
        )
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(ema), jax.tree.leaves(e2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(opt), jax.tree.leaves(o2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert meta["global_step"] == 400

    def test_async_back_to_back_saves(self, tmp_path):
        """Consecutive async saves are safe, and retention under async lags
        one save behind: the possibly-uncommitted newest never counts toward
        the quota, so every prune leaves keep_last COMMITTED checkpoints on
        disk (crash-safe by construction). A later sync save, whose commit
        precedes its prune, converges retention to exactly keep_last."""
        from masked_diffusion_tpu.io.checkpoint import wait_for_async_saves

        for epoch in (1, 2, 3):
            save_checkpoint(
                str(tmp_path), epoch, epoch, _tree(epoch),
                keep_last=2, async_save=True,
            )
        wait_for_async_saves()
        dirs = sorted(d for d in os.listdir(tmp_path) if d.startswith("checkpoint"))
        # epoch 3 was (potentially) in flight at its own prune, so epochs
        # 1 and 2 both survive as the keep_last=2 committed set
        assert dirs == [
            "checkpoint-epoch-1", "checkpoint-epoch-2", "checkpoint-epoch-3"
        ]
        latest = find_resume_checkpoint(str(tmp_path), "latest")
        assert latest.endswith("checkpoint-epoch-3")

        save_checkpoint(str(tmp_path), 4, 4, _tree(4), keep_last=2)
        dirs = sorted(d for d in os.listdir(tmp_path) if d.startswith("checkpoint"))
        assert dirs == ["checkpoint-epoch-3", "checkpoint-epoch-4"]


class TestPruneSafety:
    def test_inflight_newest_does_not_displace_complete(self, tmp_path):
        """An uncommitted (in-flight async) newest checkpoint never counts
        toward the retention quota: pruning must keep the committed ones —
        deleting them would leave a crash window with ZERO resumable
        checkpoints."""
        from masked_diffusion_tpu.io.checkpoint import _prune_checkpoints

        params = _tree(0)
        save_checkpoint(str(tmp_path), 10, 100, params)
        save_checkpoint(str(tmp_path), 20, 200, params)
        # epoch 30: dir exists, write still in flight (only a tmp dir);
        # save_checkpoint passes its own path as `protect` right after
        # dispatching — mirror that contract here
        os.makedirs(
            tmp_path / "checkpoint-epoch-30" / "unet.orbax-checkpoint-tmp-1"
        )
        _prune_checkpoints(
            str(tmp_path), keep_last=1,
            protect=str(tmp_path / "checkpoint-epoch-30"),
        )
        left = sorted(d for d in os.listdir(tmp_path) if d.startswith("checkpoint"))
        # newest COMPLETE (epoch 20) survives; in-flight epoch 30 untouched
        assert left == ["checkpoint-epoch-20", "checkpoint-epoch-30"]
        latest = find_resume_checkpoint(str(tmp_path), "latest")
        assert latest.endswith("checkpoint-epoch-20")

    def test_inflight_protected_despite_stale_higher_epochs(self, tmp_path):
        """A previous run's leftover HIGHER-numbered dirs must not get the
        in-flight save rmtree'd: protection is by explicit path, not by
        max-epoch inference (advisor r03). The stale higher-numbered
        incomplete garbage is deleted; the dispatched dir survives."""
        from masked_diffusion_tpu.io.checkpoint import _prune_checkpoints

        params = _tree(0)
        save_checkpoint(str(tmp_path), 3, 30, params)
        # previous run left a crashed higher-numbered dir (epoch 99)
        os.makedirs(
            tmp_path / "checkpoint-epoch-99" / "unet.orbax-checkpoint-tmp-9"
        )
        # current run dispatches epoch 5 (async, still in flight)
        os.makedirs(
            tmp_path / "checkpoint-epoch-5" / "unet.orbax-checkpoint-tmp-1"
        )
        _prune_checkpoints(
            str(tmp_path), keep_last=2,
            protect=str(tmp_path / "checkpoint-epoch-5"),
        )
        left = sorted(d for d in os.listdir(tmp_path) if d.startswith("checkpoint"))
        assert left == ["checkpoint-epoch-3", "checkpoint-epoch-5"]

    def test_crashed_garbage_is_deleted_not_retained(self, tmp_path):
        """Older incomplete dirs are crashed-save leftovers: deleted outright,
        never occupying retention slots that push out real checkpoints."""
        from masked_diffusion_tpu.io.checkpoint import _prune_checkpoints

        params = _tree(0)
        save_checkpoint(str(tmp_path), 10, 100, params)
        os.makedirs(tmp_path / "checkpoint-epoch-15")  # crashed: no unet at all
        save_checkpoint(str(tmp_path), 20, 200, params)
        _prune_checkpoints(str(tmp_path), keep_last=2)
        left = sorted(d for d in os.listdir(tmp_path) if d.startswith("checkpoint"))
        assert left == ["checkpoint-epoch-10", "checkpoint-epoch-20"]

    def test_partial_commit_is_incomplete(self, tmp_path):
        """A dir whose unet committed but whose meta-declared ema/optimizer
        items did not is INCOMPLETE — resuming from it would silently
        re-initialize EMA/Adam state."""
        import json as _json

        from masked_diffusion_tpu.io.checkpoint import is_complete_checkpoint

        params, ema = _tree(1), _tree(2)
        path = save_checkpoint(str(tmp_path), 5, 50, params, ema)
        assert is_complete_checkpoint(path)
        # simulate the crash window: unet_ema never finalized
        import shutil

        shutil.rmtree(os.path.join(path, "unet_ema"))
        assert not is_complete_checkpoint(path)
        # and without meta.json, a stray orbax tmp dir is enough to reject
        os.remove(os.path.join(path, "meta.json"))
        assert is_complete_checkpoint(path)  # unet finalized, no tmp dirs
        os.makedirs(os.path.join(path, "optimizer.orbax-checkpoint-tmp-9"))
        assert not is_complete_checkpoint(path)

    def test_trainer_restore_rejects_partial_checkpoint(self, tmp_path):
        """Trainer.restore fails loudly when the checkpoint lacks an expected
        tree instead of silently re-initializing it."""
        from masked_diffusion_tpu.config import Config
        from masked_diffusion_tpu.data.datasets import get_dataset
        from masked_diffusion_tpu.train.trainer import Trainer

        size = 8
        cfg = Config(
            method="base", data_name="synthetic", data_size=size,
            data_subset=True, data_subset_num=8, batch_size=8, num_epochs=1,
            ddpm_schedule="log", ddpm_num_steps=4,
            select_degrade_pixel="indexing", mean_option="degraded_area",
            mean_area="image-wise", shift_type="non_shift", use_ema=True,
            block_out_channels=(8, 16), layers_per_block=1,
            use_wandb=False, use_mlflow=False, dir_work=str(tmp_path),
        )
        dataset = get_dataset("", "synthetic", size, data_subset=True, num_data=8)
        trainer = Trainer(cfg, dataset)
        # params-only checkpoint (no unet_ema / optimizer)
        path = save_checkpoint(str(tmp_path), 3, 3, trainer.state.params)
        with pytest.raises(ValueError, match="unet_ema"):
            trainer.restore(path)


class TestTrainerResumeEquivalence:
    def test_resume_matches_uninterrupted(self, tmp_path):
        """Full-state resume (VERDICT r1 #2): a train -> checkpoint -> fresh
        Trainer -> restore -> train run yields BITWISE-identical params and
        EMA params to an uninterrupted run, and continues the loss/lr history.
        Matches accelerate.load_state's complete round-trip
        (main_train_masked.py:195-225,250-277)."""
        from masked_diffusion_tpu.config import Config
        from masked_diffusion_tpu.data.datasets import get_dataset
        from masked_diffusion_tpu.io.checkpoint import find_resume_checkpoint
        from masked_diffusion_tpu.train.trainer import Trainer
        from masked_diffusion_tpu.utils.dirs import Dir

        size = 8
        cfg = Config(
            method="mean_shift", data_name="synthetic", data_size=size,
            data_subset=True, data_subset_num=16, batch_size=8, num_epochs=4,
            ddpm_schedule="log", ddpm_num_steps=6,
            select_degrade_pixel="indexing", degrade_channel="1-channel",
            mean_option="degraded_area", mean_area="image-wise",
            shift_type="1-d_constant", use_ema=True, lr=1e-3,
            lr_scheduler="constant", lr_warmup_steps=0, sample_num=2,
            sample_latent_shape="zero", save_images_epochs=100,
            use_wandb=False, block_out_channels=(8, 16), layers_per_block=1,
            # scale > 1 makes the per-epoch timestep curriculum depend on the
            # TOTAL epoch count — a resumed run that derived its curriculum
            # from the remaining-epoch loop length would train a different
            # step program and fail the bitwise comparison below
            scheduler_num_scale_timesteps=2,
        )
        dataset = get_dataset("", "synthetic", size, data_subset=True, num_data=16)

        def dirs_for(sub):
            return Dir(task="train", content=sub, dir_work=str(tmp_path / sub),
                       data_name="synthetic", data_size=size, method=cfg.method)

        t_full = Trainer(cfg, dataset)
        t_full.train(0, 4, dirs=dirs_for("full"))

        t_half = Trainer(cfg, dataset)
        dirs_half = dirs_for("half")
        t_half.train(0, 2, dirs=dirs_half)

        path = find_resume_checkpoint(dirs_half.list_dir["checkpoint"], "latest")
        assert path is not None
        t_resumed = Trainer(cfg, dataset)
        gs = t_resumed.restore(path)
        assert gs == t_half.global_step
        assert int(t_resumed.state.step) == gs
        # history continuity (loss/lr curves resume, not restart)
        assert t_resumed.loss_mean_epoch == pytest.approx(t_half.loss_mean_epoch)
        t_resumed.train(2, 2, global_step=gs, dirs=dirs_for("resumed"))

        assert len(t_resumed.loss_mean_epoch) == 4
        for a, b in zip(
            jax.tree.leaves(t_full.state.params), jax.tree.leaves(t_resumed.state.params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(t_full.state.ema_params),
            jax.tree.leaves(t_resumed.state.ema_params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # the loss trajectory itself matches the uninterrupted run
        np.testing.assert_allclose(
            t_resumed.loss_mean_epoch, t_full.loss_mean_epoch, rtol=0, atol=0
        )


class TestMidEpochPreemptionResume:
    def test_preempt_resume_matches_uninterrupted(self, tmp_path):
        """SIGTERM mid-run -> preemption checkpoint -> restore -> continue
        with resume_step replays the uninterrupted run bitwise: the resumed
        epoch re-derives the same shuffle (rng(seed, epoch)) and step-key
        chain, skipping exactly the batches already trained."""
        import os
        import signal
        import threading

        from masked_diffusion_tpu.config import Config
        from masked_diffusion_tpu.data.datasets import get_dataset
        from masked_diffusion_tpu.io.checkpoint import find_resume_checkpoint
        from masked_diffusion_tpu.train.trainer import Trainer
        from masked_diffusion_tpu.utils.dirs import Dir

        size = 8
        total_epochs = 3
        cfg = Config(
            method="base", data_name="synthetic", data_size=size,
            data_subset=True, data_subset_num=16, batch_size=4, num_epochs=total_epochs,
            ddpm_schedule="log", ddpm_num_steps=4,
            select_degrade_pixel="indexing", degrade_channel="1-channel",
            mean_option="degraded_area", mean_area="image-wise",
            shift_type="non_shift", use_ema=True, lr=1e-3,
            lr_scheduler="constant", lr_warmup_steps=0, sample_num=2,
            sample_latent_shape="zero", save_images_epochs=100,
            use_wandb=False, block_out_channels=(8, 16), layers_per_block=1,
        )
        dataset = get_dataset("", "synthetic", size, data_subset=True, num_data=16)
        spe = dataset.num_batches(cfg.batch_size)

        def dirs_for(sub):
            return Dir(task="train", content=sub, dir_work=str(tmp_path / sub),
                       data_name="synthetic", data_size=size, method=cfg.method)

        t_full = Trainer(cfg, dataset)
        t_full.train(0, total_epochs, dirs=dirs_for("full"))

        t_pre = Trainer(cfg, dataset)
        dirs_pre = dirs_for("pre")
        # a no-op outer handler closes the race where the timer fires AFTER
        # train() restored the previous handler but BEFORE killer.cancel() —
        # with the default handler that window would kill the pytest process
        outer = signal.signal(signal.SIGTERM, lambda *_: None)
        # fires during the first epoch's compile -> break after an early step
        killer = threading.Timer(2.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
        killer.start()
        try:
            t_pre.train(0, total_epochs, dirs=dirs_pre)
        finally:
            killer.cancel()
            signal.signal(signal.SIGTERM, outer)
        gs_pre = t_pre.global_step
        if gs_pre >= total_epochs * spe:
            pytest.skip("run finished before SIGTERM landed")

        path = find_resume_checkpoint(dirs_pre.list_dir["checkpoint"], "latest")
        assert path is not None
        t_res = Trainer(cfg, dataset)
        gs = t_res.restore(path)
        assert gs == gs_pre
        first_epoch, resume_step = gs // spe, gs % spe
        t_res.train(
            first_epoch, total_epochs - first_epoch, resume_step, gs,
            dirs=dirs_for("resumed"),
        )

        assert t_res.global_step == total_epochs * spe
        for a, b in zip(
            jax.tree.leaves(t_full.state.params), jax.tree.leaves(t_res.state.params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(t_full.state.ema_params),
            jax.tree.leaves(t_res.state.ema_params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestResumeTraining:
    def test_resume_continues_bitwise(self, tmp_path):
        """checkpoint -> restore -> one more step == uninterrupted two steps."""
        from masked_diffusion_tpu.config import Config
        from masked_diffusion_tpu.models import build_unet
        from masked_diffusion_tpu.ops.schedule import build_schedule
        from masked_diffusion_tpu.train import (
            build_lr_schedule,
            build_optimizer,
            create_train_state,
            make_train_step,
        )

        size, batch = 8, 4
        cfg = Config(
            method="base", data_size=size, ddpm_schedule="log", ddpm_num_steps=6,
            select_degrade_pixel="indexing", mean_option="degraded_area",
            mean_area="image-wise", use_ema=True,
        )
        schedule = build_schedule("log", 6, size, "indexing")
        model = build_unet(
            dim_channel=3, dim_height=size, dim_width=size, num_attention=1,
            block_out_channels=(8, 16), layers_per_block=1,
        )
        lr = build_lr_schedule("constant", 1e-3, 0, 100)
        tx = build_optimizer("adamw", lr)
        state = create_train_state(model, jax.random.PRNGKey(0), (batch, size, size, 3), tx)
        used = schedule.timesteps_for_epoch(0, 10, 1)
        step = make_train_step(model, schedule, cfg, tx, used, lr, donate=False)
        data = jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (batch, size, size, 3)).astype(np.float32)
        )

        s1, _ = step(state, data, jax.random.PRNGKey(1))
        path = save_checkpoint(
            str(tmp_path), 0, int(s1.step), s1.params, s1.ema_params, s1.opt_state
        )
        s2_direct, _ = step(s1, data, jax.random.PRNGKey(2))

        p, e, o, meta = load_checkpoint(path, s1.params, s1.ema_params, s1.opt_state)
        restored = s1.replace(params=p, ema_params=e, opt_state=o,
                              step=jnp.asarray(meta["global_step"], jnp.int32))
        s2_resumed, _ = step(restored, data, jax.random.PRNGKey(2))

        for a, b in zip(
            jax.tree.leaves(s2_direct.params), jax.tree.leaves(s2_resumed.params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(s2_direct.ema_params), jax.tree.leaves(s2_resumed.ema_params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestRetention:
    def test_keep_last_prunes_oldest(self, tmp_path):
        """keep_last=N retains only the N newest checkpoint-epoch-* dirs;
        default (0) keeps everything (reference behavior)."""
        params = _tree(0)
        for epoch in (1, 3, 5):
            save_checkpoint(str(tmp_path), epoch, epoch * 10, params)
        assert len(os.listdir(tmp_path)) == 3
        save_checkpoint(str(tmp_path), 7, 70, params, keep_last=2)
        kept = sorted(os.listdir(tmp_path))
        assert kept == ["checkpoint-epoch-5", "checkpoint-epoch-7"]
        # the survivors still load
        restored, _, _, meta = load_checkpoint(
            os.path.join(tmp_path, "checkpoint-epoch-7"), params
        )
        assert meta["epoch"] == 7

    def test_keep_last_zero_keeps_all(self, tmp_path):
        params = _tree(0)
        for epoch in (1, 2, 3):
            save_checkpoint(str(tmp_path), epoch, epoch, params, keep_last=0)
        assert len(os.listdir(tmp_path)) == 3


def test_host_fetch_single_process():
    """host.fetch is np.asarray single-process (the multi-process allgather
    branch is exercised by the 2-process integration test)."""
    import jax.numpy as jnp

    from masked_diffusion_tpu.utils import host

    x = jnp.arange(6.0).reshape(2, 3)
    out = host.fetch(x)
    assert isinstance(out, np.ndarray)
    np.testing.assert_array_equal(out, np.arange(6.0).reshape(2, 3))
