"""Legacy GAN models (reference models/models_Mnist.py:6-100).

Generator: latent -> dense -> 1x1 feature map -> 5x (bilinear upsample +
3x3 conv + LeakyReLU) -> sigmoid, producing 32x32 images.
Discriminator: 5x stride-2 3x3 conv + LeakyReLU -> 2 dense -> logit.
(The reference's BatchNorm layers are commented out; kept out here too.)

NHWC / Flax. Served by main_train.py — the reference's legacy entry point,
whose own trainer module is missing from the repo (SURVEY.md §0); the
training loop lives in train/gan_trainer.py.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class Discriminator(nn.Module):
    dim_features: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.dim_features
        h = x.astype(self.dtype)
        for i, mult in enumerate((1, 2, 4, 8, 16)):
            h = nn.Conv(
                f * mult, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                dtype=self.dtype, name=f"conv{i + 1}",
            )(h)
            h = nn.leaky_relu(h, 0.01)
        h = h.reshape(h.shape[0], -1)
        h = nn.Dense(f * 8, use_bias=False, dtype=self.dtype, name="linear1")(h)
        h = nn.leaky_relu(h, 0.01)
        h = nn.Dense(1, use_bias=False, dtype=self.dtype, name="linear2")(h)
        return jnp.squeeze(h, axis=-1)


class Generator(nn.Module):
    dim_features: int = 32
    out_channels: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        import jax

        f = self.dim_features
        h = nn.Dense(f * 16, use_bias=False, dtype=self.dtype, name="linear")(
            z.astype(self.dtype)
        )
        h = h.reshape(h.shape[0], 1, 1, f * 16)

        def up(x):
            b, hh, ww, c = x.shape
            return jax.image.resize(x, (b, hh * 2, ww * 2, c), method="bilinear")

        for i, mult in enumerate((8, 4, 2, 1)):
            h = up(h)
            h = nn.Conv(
                f * mult, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                name=f"conv{i + 1}",
            )(h)
            h = nn.leaky_relu(h, 0.01)
        h = up(h)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="conv5",
        )(h)
        return nn.sigmoid(h)
