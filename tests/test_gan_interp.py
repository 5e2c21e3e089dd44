"""Legacy GAN path and interpolation sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from masked_diffusion_tpu.config import Config
from masked_diffusion_tpu.data.datasets import get_dataset
from masked_diffusion_tpu.models import build_unet
from masked_diffusion_tpu.models.gan import Discriminator, Generator
from masked_diffusion_tpu.ops.schedule import build_schedule
from masked_diffusion_tpu.sample.interpolation import make_interpolation_sample_fn
from masked_diffusion_tpu.train.gan_trainer import GANTrainer


class TestGANModels:
    def test_generator_shape(self):
        G = Generator(dim_features=8, out_channels=1)
        z = jnp.zeros((2, 16))
        params = G.init(jax.random.PRNGKey(0), z)
        out = G.apply(params, z)
        assert out.shape == (2, 32, 32, 1)
        o = np.asarray(out)
        assert o.min() >= 0.0 and o.max() <= 1.0  # sigmoid output

    def test_discriminator_shape(self):
        D = Discriminator(dim_features=8)
        x = jnp.zeros((2, 32, 32, 1))
        params = D.init(jax.random.PRNGKey(0), x)
        assert D.apply(params, x).shape == (2,)


class TestGANTrainer:
    def test_steps_run_and_losses_finite(self):
        ds = get_dataset("", "synthetic", 32, data_subset=True, num_data=16)
        # synthetic is 3-channel
        tr = GANTrainer(
            dim_latent=8, dim_features=4, out_channels=3,
            total_steps=20, weight_reg=0.01, seed=0,
        )
        out = tr.train(ds, batch_size=8, num_epochs=2)
        assert len(out["history"]) == 2
        for h in out["history"]:
            assert np.isfinite(h["loss_g"]) and np.isfinite(h["loss_d"])
        sample = np.asarray(tr.sample(jax.random.PRNGKey(1), n=4))
        assert sample.shape == (4, 32, 32, 3)

    def test_langevin_refinement_runs(self):
        ds = get_dataset("", "synthetic", 32, data_subset=True, num_data=8)
        tr = GANTrainer(
            dim_latent=8, dim_features=4, out_channels=3, total_steps=10,
            langevin_length=3, langevin_lr=0.01, langevin_noise_lr=0.001,
        )
        out = tr.train(ds, batch_size=8, num_epochs=1)
        assert np.isfinite(out["history"][0]["loss_g"])


class TestInterpolationSampler:
    @pytest.mark.parametrize("shift", [0.0, 0.5])
    def test_runs_and_fixed_point(self, shift):
        size = 8
        cfg = Config(
            method="mean_shift", data_size=size, ddpm_schedule="log",
            ddpm_num_steps=5, select_degrade_pixel="thresholding",
            degrade_channel="1-channel", mean_option="degraded_area",
            mean_area="image-wise", sample_num=3, out_channel=3,
            momentum_adaptive="base_momentum",
        )
        schedule = build_schedule("log", 5, size, "thresholding")
        model = build_unet(
            dim_channel=3, dim_height=size, dim_width=size, num_attention=1,
            block_out_channels=(8, 16), layers_per_block=1,
        )
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((3, size, size, 3)), jnp.zeros((3,))
        )
        used = schedule.timesteps_for_epoch(0, 10, 1)
        fn = make_interpolation_sample_fn(model, schedule, cfg, used, shift)
        out, mu = fn(params, jax.random.PRNGKey(1))
        assert out.shape == (3, size, size, 3)
        assert np.isfinite(np.asarray(out)).all()
        assert mu.shape == (3,)

    def test_invalid_rule_raises(self):
        size = 8
        cfg = Config(momentum_adaptive="base_sampling", data_size=size, sample_num=2)
        schedule = build_schedule("log", 5, size, "indexing")
        model = build_unet(dim_channel=3, dim_height=size, dim_width=size,
                           block_out_channels=(8, 16), layers_per_block=1)
        with pytest.raises(ValueError):
            make_interpolation_sample_fn(
                model, schedule, cfg, schedule.timesteps_for_epoch(0, 10, 1), 0.0
            )
