"""Optimizer / LR-schedule semantics vs main_train_masked.py:134-165."""

import jax.numpy as jnp
import numpy as np
import pytest

from masked_diffusion_tpu.train.optim import build_lr_schedule, build_optimizer


class TestLRSchedules:
    def test_warmup_linear_rise(self):
        s = build_lr_schedule("constant", 1e-3, warmup_steps=100, total_steps=1000)
        assert float(s(0)) == 0.0
        assert float(s(50)) == pytest.approx(5e-4)
        assert float(s(100)) == pytest.approx(1e-3)
        assert float(s(999)) == pytest.approx(1e-3)

    def test_linear_decay_to_zero(self):
        s = build_lr_schedule("linear", 1e-3, warmup_steps=0, total_steps=1000)
        assert float(s(0)) == pytest.approx(0.0, abs=1e-9) or float(s(0)) == pytest.approx(1e-3)
        assert float(s(500)) == pytest.approx(5e-4, rel=1e-2)
        assert float(s(1000)) == pytest.approx(0.0, abs=1e-9)

    def test_cosine_half_cycle(self):
        # num_cycles=0.5: cos(pi * progress), ends at 0
        s = build_lr_schedule("cosine", 1.0, warmup_steps=0, total_steps=1000, num_cycles=0.5)
        assert float(s(1000)) == pytest.approx(0.0, abs=1e-6)
        assert float(s(500)) == pytest.approx(0.5, rel=1e-2)

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            build_lr_schedule("bogus", 1e-3, 0, 10)


class TestOptimizers:
    @pytest.mark.parametrize("name", ["sgd", "adam", "adamw"])
    def test_builds_and_steps(self, name):
        s = build_lr_schedule("constant", 1e-2, 0, 100)
        tx = build_optimizer(name, s)
        params = {"w": jnp.ones((4,))}
        state = tx.init(params)
        grads = {"w": jnp.ones((4,))}
        updates, _ = tx.update(grads, state, params)
        assert np.all(np.asarray(updates["w"]) < 0)  # descent direction

    def test_grad_clipping(self):
        s = build_lr_schedule("constant", 1.0, 0, 100)
        tx = build_optimizer("sgd", s, grad_clip_norm=1.0)
        params = {"w": jnp.zeros((4,))}
        state = tx.init(params)
        huge = {"w": jnp.full((4,), 1e6)}
        updates, _ = tx.update(huge, state, params)
        norm = float(jnp.linalg.norm(np.asarray(updates["w"])))
        assert norm <= 1.0 + 1e-5

    def test_unknown_raises(self):
        s = build_lr_schedule("constant", 1e-2, 0, 100)
        with pytest.raises(ValueError):
            build_optimizer("rmsprop", s)
