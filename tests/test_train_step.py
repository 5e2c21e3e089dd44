"""Jitted train step: learning, EMA, accumulation, mean-shift path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from masked_diffusion_tpu.config import Config
from masked_diffusion_tpu.models import build_unet
from masked_diffusion_tpu.ops.schedule import build_schedule
from masked_diffusion_tpu.train import (
    build_lr_schedule,
    build_optimizer,
    create_train_state,
    make_train_step,
)

SIZE = 8
BATCH = 4


def _cfg(**kw):
    base = dict(
        method="base", data_size=SIZE, ddpm_schedule="log", ddpm_num_steps=10,
        select_degrade_pixel="indexing", degrade_channel="1-channel",
        mean_option="degraded_area", mean_area="image-wise",
        shift_type="1-d_constant", use_ema=True, mixed_precision="no",
        lr=1e-3, lr_scheduler="constant", lr_warmup_steps=0,
        gradient_accumulation_steps=1, loss_weight_use=False,
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    schedule = build_schedule(
        cfg.ddpm_schedule, cfg.ddpm_num_steps, cfg.data_size, cfg.select_degrade_pixel
    )
    model = build_unet(
        dim_channel=3, dim_height=SIZE, dim_width=SIZE, num_attention=1,
        block_out_channels=(8, 16), layers_per_block=1,
    )
    lr_sched = build_lr_schedule(cfg.lr_scheduler, cfg.lr, cfg.lr_warmup_steps, 1000)
    tx = build_optimizer(cfg.optim, lr_sched, 1.0, cfg.gradient_accumulation_steps)
    state = create_train_state(model, jax.random.PRNGKey(0), (BATCH, SIZE, SIZE, 3), tx)
    used = schedule.timesteps_for_epoch(0, 10, scale=1)
    batch = jax.random.uniform(
        jax.random.PRNGKey(42), (BATCH, SIZE, SIZE, 3), minval=-1.0, maxval=1.0
    )
    return cfg, schedule, model, tx, state, used, lr_sched, batch


class TestTrainStep:
    def test_loss_decreases(self, setup):
        # per-step losses are dominated by timestep/mask draw noise, so
        # compare fixed-key eval losses before and after training
        cfg, schedule, model, tx, state, used, lr_sched, batch = setup
        step = make_train_step(model, schedule, cfg, tx, used, lr_sched, donate=False)
        eval_key = jax.random.PRNGKey(999)
        _, m0 = step(state, batch, eval_key)
        for i in range(120):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            assert np.isfinite(float(metrics["train_loss"]))
        _, m1 = step(state, batch, eval_key)
        assert float(m1["train_loss"]) < float(m0["train_loss"])

    def test_metrics_keys(self, setup):
        cfg, schedule, model, tx, state, used, lr_sched, batch = setup
        step = make_train_step(model, schedule, cfg, tx, used, lr_sched, donate=False)
        _, metrics = step(state, batch, jax.random.PRNGKey(0))
        for key in (
            "train_loss", "degraded_train_mean", "shifted_degrade_img_mean",
            "reconstruct_train_mean", "inverse_reconstruct_train_mean", "lr",
        ):
            assert key in metrics
        assert float(metrics["lr"]) == pytest.approx(1e-3)

    def test_first_step_ema_copies_params(self, setup):
        cfg, schedule, model, tx, state, used, lr_sched, batch = setup
        step = make_train_step(model, schedule, cfg, tx, used, lr_sched, donate=False)
        new_state, _ = step(state, batch, jax.random.PRNGKey(0))
        for e, p in zip(
            jax.tree.leaves(new_state.ema_params), jax.tree.leaves(new_state.params)
        ):
            np.testing.assert_allclose(np.asarray(e), np.asarray(p), atol=1e-7)

    def test_step_counter(self, setup):
        cfg, schedule, model, tx, state, used, lr_sched, batch = setup
        step = make_train_step(model, schedule, cfg, tx, used, lr_sched, donate=False)
        s1, _ = step(state, batch, jax.random.PRNGKey(0))
        s2, _ = step(s1, batch, jax.random.PRNGKey(1))
        assert int(s2.step) == 2

    def test_zero_init_loss_is_degradation_mse(self, setup):
        # with a zero-residual model, recon == degraded input, so the loss is
        # exactly mse(degraded, input)
        cfg, schedule, model, tx, state, used, lr_sched, batch = setup
        step = make_train_step(model, schedule, cfg, tx, used, lr_sched, donate=False)
        _, metrics = step(state, batch, jax.random.PRNGKey(3))
        assert float(metrics["train_loss"]) > 0


class TestMeanShift:
    def test_mean_shift_runs(self, setup):
        _, schedule, model, tx, state, used, lr_sched, batch = setup
        cfg = _cfg(method="mean_shift", shift_type="1-d_constant")
        step = make_train_step(model, schedule, cfg, tx, used, lr_sched, donate=False)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["train_loss"]))
        # shift changes the network input but the loss is in unshifted space:
        # with a zero-residual model the loss equals the base loss
        cfg_b = _cfg(method="base")
        step_b = make_train_step(model, schedule, cfg_b, tx, used, lr_sched, donate=False)
        _, m_b = step_b(state, batch, jax.random.PRNGKey(0))
        assert float(metrics["train_loss"]) == pytest.approx(
            float(m_b["train_loss"]), rel=1e-4
        )

    def test_shifted_mean_differs(self, setup):
        _, schedule, model, tx, state, used, lr_sched, batch = setup
        cfg = _cfg(method="mean_shift", shift_type="3-d_constant")
        step = make_train_step(model, schedule, cfg, tx, used, lr_sched, donate=False)
        _, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert float(metrics["shifted_degrade_img_mean"]) != pytest.approx(
            float(metrics["degraded_train_mean"]), abs=1e-6
        )


class TestAccumulation:
    def test_params_update_only_on_sync(self, setup):
        cfg0, schedule, model, _, state0, used, lr_sched, batch = setup
        cfg = _cfg(gradient_accumulation_steps=2)
        tx = build_optimizer(cfg.optim, lr_sched, 1.0, 2)
        state = create_train_state(model, jax.random.PRNGKey(0), (BATCH, SIZE, SIZE, 3), tx)
        step = make_train_step(model, schedule, cfg, tx, used, lr_sched, donate=False)
        s1, _ = step(state, batch, jax.random.PRNGKey(0))
        # micro-step 1: params unchanged
        diffs = [
            float(jnp.abs(a - b).max())
            for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(s1.params))
        ]
        assert max(diffs) == 0.0
        s2, _ = step(s1, batch, jax.random.PRNGKey(1))
        diffs = [
            float(jnp.abs(a - b).max())
            for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(s2.params))
        ]
        assert max(diffs) > 0.0


class TestLossWeight:
    def test_weighting_changes_loss(self, setup):
        _, schedule, model, tx, state, used, lr_sched, batch = setup
        cfg_w = _cfg(loss_weight_use=True, loss_weight_power_base=10.0)
        cfg_n = _cfg(loss_weight_use=False)
        step_w = make_train_step(model, schedule, cfg_w, tx, used, lr_sched, donate=False)
        step_n = make_train_step(model, schedule, cfg_n, tx, used, lr_sched, donate=False)
        _, mw = step_w(state, batch, jax.random.PRNGKey(0))
        _, mn = step_n(state, batch, jax.random.PRNGKey(0))
        # weights in [1, 10] scale the per-pixel loss up
        assert float(mw["train_loss"]) > float(mn["train_loss"])
