"""Distributed tests on the virtual 8-device CPU mesh (SURVEY.md §4):
data-parallel sharding, replication, parity with single-device execution,
and the driver's dryrun_multichip contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from masked_diffusion_tpu.parallel.mesh import make_mesh, pad_to_multiple


class TestMesh:
    def test_eight_devices(self):
        assert len(jax.devices()) == 8

    def test_make_mesh_all(self):
        plan = make_mesh()
        assert plan.data_size == 8
        assert plan.model_size == 1

    def test_make_mesh_shapes(self):
        plan = make_mesh(data=4, model=2)
        assert plan.mesh.shape == {"data": 4, "model": 2}

    def test_small_mesh_uses_device_prefix(self):
        # an explicit smaller topology runs on a prefix of the devices
        plan = make_mesh(data=3, model=2)
        assert plan.mesh.shape == {"data": 3, "model": 2}
        assert plan.mesh.size == 6

    def test_oversubscribed_mesh_raises(self):
        with pytest.raises(ValueError):
            make_mesh(data=16, model=1)

    def test_batch_sharding(self):
        plan = make_mesh()
        x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
        xs = jax.device_put(x, plan.batch_sharding)
        assert len(xs.sharding.device_set) == 8
        np.testing.assert_array_equal(np.asarray(xs), x)

    def test_replicated_tree(self):
        plan = make_mesh()
        tree = {"w": jnp.ones((4, 4))}
        rep = jax.device_put(tree, plan.replicated)
        assert len(rep["w"].sharding.device_set) == 8

    def test_pad_to_multiple(self):
        x = np.ones((10, 3))
        padded, real = pad_to_multiple(x, 8)
        assert padded.shape[0] == 16 and real == 10
        padded, real = pad_to_multiple(np.ones((16, 3)), 8)
        assert padded.shape[0] == 16 and real == 16


class TestShardedCompute:
    def test_sharded_matmul_matches(self):
        plan = make_mesh()
        x = np.random.default_rng(0).normal(size=(16, 8)).astype(np.float32)
        w = np.random.default_rng(1).normal(size=(8, 4)).astype(np.float32)
        xs = jax.device_put(x, plan.batch_sharding)
        ws = jax.device_put(w, plan.replicated)
        out = jax.jit(lambda a, b: a @ b)(xs, ws)
        np.testing.assert_allclose(np.asarray(out), x @ w, rtol=1e-4, atol=1e-5)

    def test_mean_reduction_crosses_shards(self):
        # a batch-mean over a sharded axis forces an XLA all-reduce
        plan = make_mesh()
        x = np.random.default_rng(0).normal(size=(16, 4)).astype(np.float32)
        xs = jax.device_put(x, plan.batch_sharding)
        out = jax.jit(jnp.mean)(xs)
        assert float(out) == pytest.approx(float(x.mean()), rel=1e-5)


class TestDryrunContract:
    def test_dryrun_multichip(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_train_step_sharded_matches_single_device(self):
        """DP invariance: one jitted step on an 8-way sharded batch produces
        the same params as the same step on one device."""
        from masked_diffusion_tpu.config import Config
        from masked_diffusion_tpu.models import build_unet
        from masked_diffusion_tpu.ops.schedule import build_schedule
        from masked_diffusion_tpu.train import (
            build_lr_schedule,
            build_optimizer,
            create_train_state,
            make_train_step,
        )

        size, batch = 8, 8
        cfg = Config(
            method="base", data_size=size, ddpm_schedule="log", ddpm_num_steps=6,
            select_degrade_pixel="indexing", degrade_channel="1-channel",
            mean_option="degraded_area", mean_area="image-wise", use_ema=True,
        )
        schedule = build_schedule("log", 6, size, "indexing")
        model = build_unet(
            dim_channel=3, dim_height=size, dim_width=size, num_attention=1,
            block_out_channels=(8, 16), layers_per_block=1,
        )
        lr = build_lr_schedule("constant", 1e-3, 0, 100)
        tx = build_optimizer("adamw", lr)
        state = create_train_state(
            model, jax.random.PRNGKey(0), (batch, size, size, 3), tx
        )
        used = schedule.timesteps_for_epoch(0, 10, 1)
        step = make_train_step(model, schedule, cfg, tx, used, lr, donate=False)

        batch_host = np.random.default_rng(0).uniform(-1, 1, (batch, size, size, 3)).astype(
            np.float32
        )
        key = jax.random.PRNGKey(7)

        s_single, m_single = step(state, jnp.asarray(batch_host), key)

        plan = make_mesh()
        state_r = jax.device_put(state, plan.replicated)
        batch_s = jax.device_put(batch_host, plan.batch_sharding)
        key_r = jax.device_put(key, plan.replicated)
        s_shard, m_shard = step(state_r, batch_s, key_r)

        assert float(m_single["train_loss"]) == pytest.approx(
            float(m_shard["train_loss"]), rel=1e-4
        )
        for a, b in zip(jax.tree.leaves(s_single.params), jax.tree.leaves(s_shard.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def test_sample_scan_sharded_matches_single_device(self):
        """DP sampling invariance: the full reverse scan on an 8-way sharded
        batch matches the same scan on one device — the BASELINE large-batch
        sampling sweep (config 5) is the workload DP serves."""
        from masked_diffusion_tpu.config import Config
        from masked_diffusion_tpu.models import build_unet
        from masked_diffusion_tpu.ops.schedule import build_schedule
        from masked_diffusion_tpu.sample import make_sample_fn

        size, batch = 8, 8
        cfg = Config(
            method="mean_shift", data_size=size, ddpm_schedule="log",
            ddpm_num_steps=6, select_degrade_pixel="indexing",
            degrade_channel="1-channel", mean_option="degraded_area",
            mean_area="image-wise", shift_type="1-d_constant",
            momentum_adaptive="base_momentum",
            sampling_mask_dependency="independent",
        )
        schedule = build_schedule("log", 6, size, "indexing")
        model = build_unet(
            dim_channel=3, dim_height=size, dim_width=size, num_attention=1,
            block_out_channels=(8, 16), layers_per_block=1,
        )
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), jnp.zeros((1,))
        )
        used = schedule.timesteps_for_epoch(0, 10, 1)
        sample_fn = make_sample_fn(model, schedule, cfg, used)
        latent = np.full((batch, size, size, 3), 0.1, np.float32)
        key = jax.random.PRNGKey(3)

        out_single = np.asarray(sample_fn(params, jnp.asarray(latent), key))

        plan = make_mesh()
        out_shard = np.asarray(sample_fn(
            jax.device_put(params, plan.replicated),
            jax.device_put(latent, plan.batch_sharding),
            jax.device_put(key, plan.replicated),
        ))
        np.testing.assert_allclose(out_single, out_shard, atol=2e-5)

    def test_encoder_reuse_sharded_matches_single_device(self):
        """--encoder_reuse under DP: the cached-encoder carry (a pytree of
        batch-leading activations behind a lax.cond refresh) must shard over
        'data' like every other carry — sharded and single-device runs agree.
        Perturbed params so the cache actually shapes the output."""
        from masked_diffusion_tpu.config import Config
        from masked_diffusion_tpu.models import build_unet
        from masked_diffusion_tpu.ops.schedule import build_schedule
        from masked_diffusion_tpu.sample import make_sample_fn

        size, batch = 8, 8
        cfg = Config(
            method="mean_shift", data_size=size, ddpm_schedule="log",
            ddpm_num_steps=6, select_degrade_pixel="indexing",
            degrade_channel="1-channel", mean_option="degraded_area",
            mean_area="image-wise", shift_type="1-d_constant",
            momentum_adaptive="base_sampling",
            sampling_mask_dependency="independent",
            encoder_reuse=2,
        )
        schedule = build_schedule("log", 6, size, "indexing")
        model = build_unet(
            dim_channel=3, dim_height=size, dim_width=size, num_attention=1,
            block_out_channels=(8, 16), layers_per_block=1,
        )
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), jnp.zeros((1,))
        )
        params = jax.tree.map(lambda p: p + 0.02, params)
        used = schedule.timesteps_for_epoch(0, 10, 1)
        sample_fn = make_sample_fn(model, schedule, cfg, used)
        latent = np.full((batch, size, size, 3), 0.1, np.float32)
        key = jax.random.PRNGKey(3)

        out_single = np.asarray(sample_fn(params, jnp.asarray(latent), key))

        plan = make_mesh()
        out_shard = np.asarray(sample_fn(
            jax.device_put(params, plan.replicated),
            jax.device_put(latent, plan.batch_sharding),
            jax.device_put(key, plan.replicated),
        ))
        np.testing.assert_allclose(out_single, out_shard, atol=2e-5)


class TestTensorParallel:
    """The 'model' axis made real (parallel/tp.py): wide output-feature axes
    sharded Megatron-style, GSPMD inserting the collectives; numerics match
    the replicated run."""

    def _setup(self, batch=8, size=8):
        from masked_diffusion_tpu.config import Config
        from masked_diffusion_tpu.models import build_unet
        from masked_diffusion_tpu.ops.schedule import build_schedule
        from masked_diffusion_tpu.train import (
            build_lr_schedule,
            build_optimizer,
            create_train_state,
            make_train_step,
        )

        cfg = Config(
            method="mean_shift", data_size=size, ddpm_schedule="log",
            ddpm_num_steps=6, select_degrade_pixel="indexing",
            degrade_channel="1-channel", mean_option="degraded_area",
            mean_area="image-wise", shift_type="1-d_constant",
            momentum_adaptive="base_momentum",
            sampling_mask_dependency="independent", use_ema=True,
        )
        schedule = build_schedule("log", 6, size, "indexing")
        model = build_unet(
            dim_channel=3, dim_height=size, dim_width=size, num_attention=1,
            block_out_channels=(8, 16), layers_per_block=1,
        )
        lr = build_lr_schedule("constant", 1e-3, 0, 100)
        tx = build_optimizer("adamw", lr)
        state = create_train_state(
            model, jax.random.PRNGKey(0), (batch, size, size, 3), tx
        )
        used = schedule.timesteps_for_epoch(0, 10, 1)
        step = make_train_step(model, schedule, cfg, tx, used, lr, donate=False)
        return cfg, schedule, model, tx, state, used, step

    def test_wide_kernels_shard_narrow_replicate(self):
        from jax.sharding import PartitionSpec as P
        from masked_diffusion_tpu.parallel.tp import shard_tree, sharded_fraction

        _, _, _, _, state, _, _ = self._setup()
        plan = make_mesh(data=2, model=4)
        # min_features=8: the 8- and 16-wide kernels of the tiny model shard
        st = shard_tree(plan, state, min_features=8)
        specs = {
            tuple(leaf.shape): leaf.sharding.spec
            for leaf in jax.tree.leaves(st.params)
        }
        # conv kernels (3,3,Cin,16): last axis sharded over 'model'
        assert specs[(3, 3, 16, 16)] == P(None, None, None, "model")
        # the 3-channel output conv stays replicated (3 % 4 != 0)
        assert specs[(3, 3, 8, 3)] == P()
        # scalars (step counter) replicate
        assert st.step.sharding.spec == P()
        assert sharded_fraction(plan, state.params, min_features=8) > 0.5

    def test_tp_train_step_matches_replicated(self):
        """Two train steps with params/moments/EMA channel-sharded over a
        2x4 ('data','model') mesh match the single-device run — the Megatron
        identity, via GSPMD instead of hand-written collectives."""
        from masked_diffusion_tpu.parallel.tp import shard_tree

        batch, size = 8, 8
        _, _, _, _, state, _, step = self._setup(batch, size)
        batch_host = np.random.default_rng(0).uniform(
            -1, 1, (batch, size, size, 3)
        ).astype(np.float32)
        k1, k2 = jax.random.PRNGKey(7), jax.random.PRNGKey(8)

        s_single, m_single = step(state, jnp.asarray(batch_host), k1)
        s_single, m2_single = step(s_single, jnp.asarray(batch_host), k2)

        plan = make_mesh(data=2, model=4)
        st = shard_tree(plan, state, min_features=8)
        batch_s = jax.device_put(batch_host, plan.batch_sharding)
        s_tp, m_tp = step(st, batch_s, jax.device_put(k1, plan.replicated))
        s_tp, m2_tp = step(s_tp, batch_s, jax.device_put(k2, plan.replicated))

        assert float(m2_single["train_loss"]) == pytest.approx(
            float(m2_tp["train_loss"]), rel=1e-4
        )
        for a, b in zip(
            jax.tree.leaves(s_single.params), jax.tree.leaves(s_tp.params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
        for a, b in zip(
            jax.tree.leaves(s_single.ema_params), jax.tree.leaves(s_tp.ema_params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def test_tp_sample_scan_matches_replicated(self):
        from masked_diffusion_tpu.sample import make_sample_fn
        from masked_diffusion_tpu.parallel.tp import shard_tree

        batch, size = 8, 8
        cfg, schedule, model, _, state, used, _ = self._setup(batch, size)
        sample_fn = make_sample_fn(model, schedule, cfg, used)
        latent = np.full((batch, size, size, 3), 0.1, np.float32)
        key = jax.random.PRNGKey(3)

        out_single = np.asarray(sample_fn(state.params, jnp.asarray(latent), key))

        plan = make_mesh(data=2, model=4)
        out_tp = np.asarray(sample_fn(
            shard_tree(plan, state.params, min_features=8),
            jax.device_put(latent, plan.batch_sharding),
            jax.device_put(key, plan.replicated),
        ))
        np.testing.assert_allclose(out_single, out_tp, atol=2e-5)


class TestSpatialPartition:
    """The model axis's OTHER use (parallel/sp.py): activations sharded along
    image height, params replicated — the SURVEY §5 extension path for images
    whose activations outgrow one chip's HBM. GSPMD inserts the conv halo
    exchanges; numerics must match the single-device run."""

    def _setup(self, batch=8, size=16):
        from masked_diffusion_tpu.config import Config
        from masked_diffusion_tpu.models import build_unet
        from masked_diffusion_tpu.ops.schedule import build_schedule
        from masked_diffusion_tpu.train import (
            build_lr_schedule,
            build_optimizer,
            create_train_state,
            make_train_step,
        )

        cfg = Config(
            method="mean_shift", data_size=size, ddpm_schedule="log",
            ddpm_num_steps=6, select_degrade_pixel="indexing",
            degrade_channel="1-channel", mean_option="degraded_area",
            mean_area="image-wise", shift_type="1-d_constant",
            momentum_adaptive="base_momentum",
            sampling_mask_dependency="independent", use_ema=True,
            mesh_spatial=True,
        )
        schedule = build_schedule("log", 6, size, "indexing")
        model = build_unet(
            dim_channel=3, dim_height=size, dim_width=size, num_attention=1,
            block_out_channels=(8, 16), layers_per_block=1,
        )
        lr = build_lr_schedule("constant", 1e-3, 0, 100)
        tx = build_optimizer("adamw", lr)
        state = create_train_state(
            model, jax.random.PRNGKey(0), (batch, size, size, 3), tx
        )
        used = schedule.timesteps_for_epoch(0, 10, 1)
        return cfg, schedule, model, tx, state, used, make_train_step, lr

    def test_validate_spatial_errors(self):
        from masked_diffusion_tpu.parallel.sp import validate_spatial

        with pytest.raises(ValueError, match="mesh_model"):
            validate_spatial(make_mesh(data=8, model=1), 16)
        with pytest.raises(ValueError, match="divisible"):
            validate_spatial(make_mesh(data=2, model=4), 10)
        validate_spatial(make_mesh(data=2, model=4), 16)  # ok

    def test_spatial_batch_placement(self):
        from jax.sharding import PartitionSpec as P
        from masked_diffusion_tpu.parallel.mesh import put_global_batch
        from masked_diffusion_tpu.parallel.sp import activation_sharding

        plan = make_mesh(data=2, model=4)
        sp = activation_sharding(plan)
        assert sp.spec == P("data", "model")
        x = np.arange(4 * 16 * 16 * 3, dtype=np.float32).reshape(4, 16, 16, 3)
        xs = put_global_batch(plan, x, sharding=sp)
        assert len(xs.addressable_shards) == 8
        # each shard holds a (batch/2, H/4) tile
        assert xs.addressable_shards[0].data.shape == (2, 4, 16, 3)
        np.testing.assert_array_equal(np.asarray(xs), x)

    def test_sp_train_step_matches_single_device(self):
        """Two SP train steps (batch over 'data', H over 'model', params
        replicated) match the single-device run — XLA's halo exchanges and
        cross-shard norm/loss reductions must not change the math."""
        from masked_diffusion_tpu.parallel.sp import activation_sharding

        batch, size = 8, 16
        cfg, schedule, model, tx, state, used, make_step, lr = self._setup(
            batch, size
        )
        batch_host = np.random.default_rng(0).uniform(
            -1, 1, (batch, size, size, 3)
        ).astype(np.float32)
        k1, k2 = jax.random.PRNGKey(7), jax.random.PRNGKey(8)

        step_ref = make_step(model, schedule, cfg, tx, used, lr, donate=False)
        s_single, _ = step_ref(state, jnp.asarray(batch_host), k1)
        s_single, m2_single = step_ref(s_single, jnp.asarray(batch_host), k2)

        plan = make_mesh(data=2, model=4)
        sp = activation_sharding(plan)
        step_sp = make_step(
            model, schedule, cfg, tx, used, lr, donate=False,
            activation_sharding=sp,
        )
        st = jax.device_put(state, plan.replicated)
        batch_s = jax.device_put(batch_host, sp)
        s_sp, _ = step_sp(st, batch_s, jax.device_put(k1, plan.replicated))
        s_sp, m2_sp = step_sp(s_sp, batch_s, jax.device_put(k2, plan.replicated))

        assert float(m2_single["train_loss"]) == pytest.approx(
            float(m2_sp["train_loss"]), rel=1e-4
        )
        for a, b in zip(
            jax.tree.leaves(s_single.params), jax.tree.leaves(s_sp.params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def test_sp_sample_scan_matches_single_device(self):
        from masked_diffusion_tpu.parallel.sp import activation_sharding
        from masked_diffusion_tpu.sample import make_sample_fn

        batch, size = 8, 16
        cfg, schedule, model, _, state, used, _, _ = self._setup(batch, size)
        latent = np.full((batch, size, size, 3), 0.1, np.float32)
        key = jax.random.PRNGKey(3)

        fn_ref = make_sample_fn(model, schedule, cfg, used)
        out_single = np.asarray(fn_ref(state.params, jnp.asarray(latent), key))

        plan = make_mesh(data=2, model=4)
        sp = activation_sharding(plan)
        fn_sp = make_sample_fn(
            model, schedule, cfg, used, activation_sharding=sp
        )
        out_sp = np.asarray(fn_sp(
            jax.device_put(state.params, plan.replicated),
            jax.device_put(latent, sp),
            jax.device_put(key, plan.replicated),
        ))
        np.testing.assert_allclose(out_single, out_sp, atol=2e-5)

    def test_trainer_sp_end_to_end(self, tmp_path):
        """A Trainer under --mesh_spatial trains an epoch and runs the EMA
        cadence sampling with SP-placed latents — the full cadence path, not
        just the step/scan primitives."""
        from jax.sharding import PartitionSpec as P
        from masked_diffusion_tpu.config import Config
        from masked_diffusion_tpu.data.datasets import get_dataset
        from masked_diffusion_tpu.train.trainer import Trainer

        size = 16
        cfg = Config(
            method="base", data_name="synthetic", data_size=size,
            data_subset=True, data_subset_num=16, batch_size=8, num_epochs=1,
            ddpm_schedule="log", ddpm_num_steps=4,
            select_degrade_pixel="indexing", degrade_channel="1-channel",
            mean_option="degraded_area", mean_area="image-wise",
            shift_type="non_shift", sample_latent_shape="zero", sample_num=5,
            use_ema=True, block_out_channels=(8, 16), layers_per_block=1,
            num_attention=1, use_wandb=False, use_mlflow=False,
            dir_work=str(tmp_path), mesh_spatial=True, lr_warmup_steps=0,
        )
        dataset = get_dataset("", "synthetic", size, data_subset=True, num_data=16)
        plan = make_mesh(data=2, model=4)
        trainer = Trainer(cfg, dataset, mesh_plan=plan)

        # params replicate under SP (the model axis shards activations)
        leaf = jax.tree.leaves(trainer.state.params)[0]
        assert leaf.sharding.spec == P()

        out = trainer.train(0, 1)
        assert np.isfinite(out["loss_mean_epoch"]).all()

        latent, num = trainer._cadence_latent(jax.random.PRNGKey(0), cfg.sample_num)
        assert num == 5 and latent.shape[0] == 6  # rounded to data size 2...
        assert latent.sharding.spec == P("data", "model")
        sample = trainer.sample_ema(jax.random.PRNGKey(1))
        sample = sample[0] if isinstance(sample, tuple) else sample
        assert sample.shape == (5, size, size, 3)
        assert np.isfinite(np.asarray(sample)).all()

    def test_trainer_rejects_bad_spatial_topology(self, tmp_path):
        from masked_diffusion_tpu.config import Config
        from masked_diffusion_tpu.data.datasets import get_dataset
        from masked_diffusion_tpu.train.trainer import Trainer

        size = 8
        cfg = Config(
            method="base", data_name="synthetic", data_size=size,
            data_subset=True, data_subset_num=16, batch_size=8, num_epochs=1,
            ddpm_schedule="log", ddpm_num_steps=4,
            select_degrade_pixel="indexing", mean_option="degraded_area",
            mean_area="image-wise", shift_type="non_shift",
            block_out_channels=(8, 16), layers_per_block=1,
            use_wandb=False, use_mlflow=False, dir_work=str(tmp_path),
            mesh_spatial=True,
        )
        dataset = get_dataset("", "synthetic", size, data_subset=True, num_data=16)
        with pytest.raises(ValueError, match="mesh_model"):
            Trainer(cfg, dataset, mesh_plan=make_mesh())  # model axis = 1


def test_any_flag_single_process():
    from masked_diffusion_tpu.utils.host import any_flag

    assert any_flag(True) is True
    assert any_flag(False) is False


def test_generate_images_rounds_batch_to_mesh(tmp_path):
    """generate_images rounds the batch up to a data-axis multiple and still
    returns exactly num_images, writing per-image PNGs + batch grids."""
    import os

    from masked_diffusion_tpu.config import Config
    from masked_diffusion_tpu.models import build_unet
    from masked_diffusion_tpu.ops.schedule import build_schedule
    from masked_diffusion_tpu.sample.generate import generate_images

    size = 8
    cfg = Config(
        method="base", data_size=size, ddpm_schedule="log", ddpm_num_steps=4,
        select_degrade_pixel="indexing", degrade_channel="1-channel",
        mean_option="degraded_area", mean_area="image-wise",
        shift_type="non_shift", momentum_adaptive="base_momentum",
        sampling_mask_dependency="independent", sample_latent_shape="zero",
        sample_num=5, batch_size=3,
    )
    schedule = build_schedule("log", 4, size, "indexing")
    model = build_unet(dim_channel=3, dim_height=size, dim_width=size,
                       num_attention=1, block_out_channels=(8, 16),
                       layers_per_block=1)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), jnp.zeros((1,))
    )
    plan = make_mesh(data=2, model=1)
    out = generate_images(
        cfg, model, params, schedule, mesh_plan=plan, out_dir=str(tmp_path)
    )
    # batch 3 -> rounded to 4 over the 2-way data axis; 5 images need 2 batches
    assert out["batches"] == 2
    assert out["images"].shape == (5, size, size, 3)
    files = os.listdir(tmp_path)
    assert sum(f.startswith("sample_0") for f in files) == 5
    assert sum(f.startswith("sample_grid_") for f in files) == 2

    # the serving path under spatial partitioning: latents P('data','model')
    out_sp = generate_images(
        cfg.replace(mesh_spatial=True), model, params, schedule,
        mesh_plan=make_mesh(data=2, model=4),
    )
    assert out_sp["images"].shape == (5, size, size, 3)
    assert np.isfinite(out_sp["images"]).all()


def test_put_global_batch_single_process():
    """put_global_batch shards the batch over the data axis (single-process
    path; the multi-host path is the same sharding assembled from per-process
    slices)."""
    import numpy as np
    from masked_diffusion_tpu.parallel.mesh import make_mesh, put_global_batch

    plan = make_mesh()
    batch = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    arr = put_global_batch(plan, batch)
    assert arr.shape == (16, 4)
    np.testing.assert_array_equal(np.asarray(arr), batch)
    assert len(arr.addressable_shards) == plan.data_size


def test_cadence_sampling_is_mesh_sharded(tmp_path):
    """Trainer.sample_ema's latents are rounded to the mesh's data size and
    committed onto batch_sharding (VERDICT r2 weak #4: the cadence scan
    previously got an uncommitted 100-row host array on an 8-way mesh),
    and the returned sample is trimmed back to sample_num."""
    from masked_diffusion_tpu.config import Config
    from masked_diffusion_tpu.data.datasets import get_dataset
    from masked_diffusion_tpu.train.trainer import Trainer

    size = 8
    cfg = Config(
        method="base", data_name="synthetic", data_size=size,
        data_subset=True, data_subset_num=16, batch_size=8, num_epochs=1,
        ddpm_schedule="log", ddpm_num_steps=4, select_degrade_pixel="indexing",
        degrade_channel="1-channel", mean_option="degraded_area",
        mean_area="image-wise", shift_type="non_shift",
        sample_latent_shape="zero", sample_num=5, use_ema=True,
        block_out_channels=(8, 16), layers_per_block=1, num_attention=1,
        use_wandb=False, use_mlflow=False, dir_work=str(tmp_path),
    )
    dataset = get_dataset("", "synthetic", size, data_subset=True, num_data=16)
    plan = make_mesh()  # 8-way data axis
    trainer = Trainer(cfg, dataset, mesh_plan=plan)

    latent, num = trainer._cadence_latent(jax.random.PRNGKey(0), cfg.sample_num)
    assert num == 5
    assert latent.shape[0] == 8  # rounded up to the data-axis multiple
    assert latent.sharding == plan.batch_sharding
    assert len(latent.addressable_shards) == 8

    out = trainer.sample_ema(jax.random.PRNGKey(1))
    sample = out[0] if isinstance(out, tuple) else out
    assert sample.shape == (5, size, size, 3)  # trimmed back


def test_tester_sampling_is_mesh_sharded():
    """Tester._sample_batch rounds its latent batch to the mesh data size,
    commits it onto batch_sharding, and trims back to sample_num — the same
    mesh discipline as Trainer._cadence_latent / generate_images."""
    import jax.numpy as jnp
    from masked_diffusion_tpu.config import Config
    from masked_diffusion_tpu.data.datasets import get_dataset
    from masked_diffusion_tpu.models import build_unet
    from masked_diffusion_tpu.tester import Tester

    size = 8
    cfg = Config(
        method="base", data_name="synthetic", data_size=size,
        data_subset=True, data_subset_num=8, batch_size=8,
        ddpm_schedule="log", ddpm_num_steps=4, select_degrade_pixel="indexing",
        degrade_channel="1-channel", mean_option="degraded_area",
        mean_area="image-wise", shift_type="non_shift",
        sample_latent_shape="zero", sample_num=5,
        block_out_channels=(8, 16), layers_per_block=1,
    )
    dataset = get_dataset("", "synthetic", size, data_subset=True, num_data=8)
    model = build_unet(dim_channel=3, dim_height=size, dim_width=size,
                       num_attention=1, block_out_channels=(8, 16),
                       layers_per_block=1)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), jnp.zeros((1,))
    )
    plan = make_mesh()  # 8-way data axis; sample_num=5 doesn't divide it
    tester = Tester(cfg, dataset, model, params, mesh_plan=plan)
    # params committed replicated across the mesh
    leaf = jax.tree.leaves(tester.params)[0]
    assert len(leaf.sharding.device_set) == 8
    batch = tester._sample_batch(jax.random.PRNGKey(1))
    assert batch.shape == (5, size, size, 3)  # trimmed back to sample_num
    assert np.isfinite(batch).all()

    # TP mesh: params channel-shard exactly as generate_images places them
    from jax.sharding import PartitionSpec as P

    plan_tp = make_mesh(data=2, model=4)
    tester_tp = Tester(
        cfg.replace(tp_min_features=8), dataset, model, params,
        mesh_plan=plan_tp,
    )
    specs = {leaf.sharding.spec for leaf in jax.tree.leaves(tester_tp.params)}
    assert P(None, None, None, "model") in specs  # wide conv kernels sharded
    batch = tester_tp._sample_batch(jax.random.PRNGKey(2))
    assert batch.shape == (5, size, size, 3)

    # SP mesh: latents carry P('data','model') and the scan still runs
    plan_sp = make_mesh(data=2, model=4)
    tester_sp = Tester(
        cfg.replace(mesh_spatial=True), dataset, model, params,
        mesh_plan=plan_sp,
    )
    assert tester_sp._latent_sharding.spec == P("data", "model")
    batch = tester_sp._sample_batch(jax.random.PRNGKey(3))
    assert batch.shape == (5, size, size, 3)
    assert np.isfinite(batch).all()


def test_interpolation_sampler_mesh_sharded(tmp_path):
    """make_interpolation_sample_fn pads the latent grid to the mesh and trims
    the returned sweep back to sample_num."""
    from masked_diffusion_tpu.config import Config
    from masked_diffusion_tpu.models import build_unet
    from masked_diffusion_tpu.ops.schedule import build_schedule
    from masked_diffusion_tpu.sample.interpolation import make_interpolation_sample_fn

    size = 8
    cfg = Config(
        method="base", data_size=size, ddpm_schedule="linear", ddpm_num_steps=4,
        select_degrade_pixel="thresholding", mean_option="degraded_area",
        mean_area="image-wise", shift_type="non_shift",
        momentum_adaptive="base_momentum", sample_num=5,
    )
    schedule = build_schedule("linear", 4, size, "thresholding")
    used = schedule.timesteps_for_epoch(0, 1, 1)
    model = build_unet(dim_channel=3, dim_height=size, dim_width=size,
                       num_attention=1, block_out_channels=(8, 16),
                       layers_per_block=1)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), jnp.zeros((1,))
    )
    plan = make_mesh()
    fn = make_interpolation_sample_fn(model, schedule, cfg, used, 0.2,
                                      mesh_plan=plan)
    sample, mu = fn(params, jax.random.PRNGKey(2))
    assert sample.shape == (5, size, size, 3)
    assert mu.shape[0] == 5
    assert np.isfinite(np.asarray(sample)).all()

    # SP mesh: the interpolation scan also pins the H-sharded layout
    plan_sp = make_mesh(data=2, model=4)
    fn_sp = make_interpolation_sample_fn(
        model, schedule, cfg.replace(mesh_spatial=True), used, 0.2,
        mesh_plan=plan_sp,
    )
    sample_sp, mu_sp = fn_sp(params, jax.random.PRNGKey(2))
    assert sample_sp.shape == (5, size, size, 3)
    assert np.isfinite(np.asarray(sample_sp)).all()
