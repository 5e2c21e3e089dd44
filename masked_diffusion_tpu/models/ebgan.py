"""EBGAN toy models (reference models/models_simple.py:8-96, after the
public eriklindernoren/PyTorch-GAN EBGAN example).

Capability surface, NHWC / Flax:
  Generator     : z (62,) -> dense -> 8x8x128 map -> 2x (up2 + conv + norm +
                  LeakyReLU) -> conv -> tanh, 32x32x1 images.
  Discriminator : energy model — stride-2 conv encoder, a 32-d embedding
                  bottleneck, dense expansion, and an upsample+conv decoder;
                  returns (reconstruction, embedding) for the EBGAN
                  energy + pull-away terms.
  AutoEncoder   : conv encoder to z_dim, dense+deconv decoder (28x28 MNIST).

The reference's BatchNorm layers become GroupNorm: batch statistics create a
cross-device dependency under data parallelism (a psum per norm layer per
step), while GroupNorm is batch-independent and keeps the jitted step
collective-free outside the gradient all-reduce.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _up2(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")


class EBGenerator(nn.Module):
    latent_dim: int = 62
    out_channels: int = 1
    image_size: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        init_size = self.image_size // 4
        h = nn.Dense(128 * init_size * init_size, dtype=self.dtype, name="l1")(
            z.astype(self.dtype)
        )
        h = h.reshape(h.shape[0], init_size, init_size, 128)
        h = _up2(h)
        h = nn.Conv(128, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(num_groups=32, dtype=self.dtype, name="norm1")(h)
        h = nn.leaky_relu(h, 0.2)
        h = _up2(h)
        h = nn.Conv(64, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        h = nn.GroupNorm(num_groups=32, dtype=self.dtype, name="norm2")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv3")(h)
        return jnp.tanh(h)


class EBDiscriminator(nn.Module):
    in_channels: int = 1
    embedding_dim: int = 32
    image_size: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img):
        down_size = self.image_size // 2
        h = nn.Conv(
            64, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype, name="down"
        )(img.astype(self.dtype))
        h = nn.relu(h)
        flat = h.reshape(h.shape[0], -1)
        embedding = nn.Dense(self.embedding_dim, dtype=self.dtype, name="embedding")(flat)

        h = nn.GroupNorm(num_groups=8, dtype=self.dtype, name="fc_norm1")(embedding)
        h = nn.relu(h)
        h = nn.Dense(down_size * down_size * 64, dtype=self.dtype, name="fc")(h)
        h = nn.GroupNorm(num_groups=32, dtype=self.dtype, name="fc_norm2")(h)
        h = nn.relu(h)
        h = h.reshape(h.shape[0], down_size, down_size, 64)
        h = _up2(h)
        recon = nn.Conv(
            self.in_channels, (3, 3), padding=1, dtype=self.dtype, name="up"
        )(h)
        return recon, embedding


class AutoEncoder(nn.Module):
    z_dim: int = 2
    in_channels: int = 1
    image_size: int = 28
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        bottleneck = self.image_size // 4
        h = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype, name="enc1")(
            x.astype(self.dtype)
        )
        h = nn.leaky_relu(h, 0.01)
        h = nn.Conv(64, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype, name="enc2")(h)
        h = nn.leaky_relu(h, 0.01)
        h = nn.Conv(64, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype, name="enc3")(h)
        h = nn.leaky_relu(h, 0.01)
        z = nn.Dense(self.z_dim, dtype=self.dtype, name="enc_fc")(
            h.reshape(h.shape[0], -1)
        )
        z = nn.leaky_relu(z, 0.01)

        h = nn.Dense(64 * bottleneck * bottleneck, dtype=self.dtype, name="dec_fc")(z)
        h = h.reshape(h.shape[0], bottleneck, bottleneck, 64)
        h = nn.leaky_relu(h, 0.01)
        h = nn.ConvTranspose(
            64, (3, 3), strides=(2, 2), padding="SAME", dtype=self.dtype, name="dec1"
        )(h)
        h = nn.leaky_relu(h, 0.01)
        h = nn.ConvTranspose(
            32, (3, 3), strides=(2, 2), padding="SAME", dtype=self.dtype, name="dec2"
        )(h)
        h = nn.leaky_relu(h, 0.01)
        return nn.Conv(
            self.in_channels, (3, 3), padding=1, dtype=self.dtype, name="dec3"
        )(h)
