"""Saliency EBM stack — native rebuild of the reference's legacy saliency
models (models/models_Saliency.py:11-30 dispatch; models/ResNet/
ResNet_models.py: GeneratorLatent :90, GeneratorBaseLine :400, Descriptor
:38; backbone.py: PAM_Module :51, CAM_Module :22; HolisticAttention.py HA
:31). The stack is disconnected from the diffusion path (SURVEY.md §2.2) but
part of the repo's capability surface: a latent-conditioned saliency
generator, an energy Descriptor over (image, saliency) pairs, position/
channel attention modules, and the Gaussian-blur holistic attention op.

Rebuilt compactly and TPU-first:
  * the reference's B2-ResNet50 backbone (ResNet.py:82) becomes a strided
    residual encoder of configurable width — same role (multi-scale feature
    pyramid), no torchvision-pretrained weights (none are loadable here);
  * PAM/CAM are batched einsums; HA is a depthwise conv with a fixed
    Gaussian kernel;
  * everything is NHWC and jit-friendly (static shapes, no Python loops).
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


def gaussian_kernel_2d(size: int = 31, sigma: float = 4.0) -> jnp.ndarray:
    """Normalized 2-D Gaussian (HolisticAttention.gkern, :14-21)."""
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    k1 = jnp.exp(-0.5 * (x / sigma) ** 2)
    k2 = jnp.sqrt(jnp.outer(k1, k1))
    return k2 / jnp.sum(k2)


def holistic_attention(attention: Array, x: Array, size: int = 31, sigma: float = 4.0) -> Array:
    """HA op (HolisticAttention.py:31-43): blur the attention map with a
    Gaussian, floor it against itself (max(soft, att)), gate the features."""
    kernel = gaussian_kernel_2d(size, sigma)[:, :, None, None]  # HWIO
    soft = jax.lax.conv_general_dilated(
        attention.astype(jnp.float32), kernel,
        window_strides=(1, 1), padding=[(size // 2, size // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    soft = jnp.maximum(soft, attention)
    return soft * x


class PositionAttention(nn.Module):
    """PAM (backbone.py:51-84): spatial self-attention with C//8 projections
    and a learned residual scale."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        q = nn.Conv(max(1, c // 8), (1, 1), dtype=self.dtype, name="query")(x)
        k = nn.Conv(max(1, c // 8), (1, 1), dtype=self.dtype, name="key")(x)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="value")(x)
        q = q.reshape(b, h * w, -1)
        k = k.reshape(b, h * w, -1)
        v = v.reshape(b, h * w, c)
        attn = jax.nn.softmax(
            jnp.einsum("bsd,btd->bst", q, k, preferred_element_type=jnp.float32),
            axis=-1,
        ).astype(v.dtype)
        out = jnp.einsum("bst,btc->bsc", attn, v).reshape(b, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return gamma * out + x


class ChannelAttention(nn.Module):
    """CAM (backbone.py:22-49): channel-to-channel attention with the
    max-subtracted energy trick and a learned residual scale."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        flat = x.reshape(b, h * w, c).astype(jnp.float32)
        energy = jnp.einsum("bsc,bsd->bcd", flat, flat)
        energy = jnp.max(energy, axis=-1, keepdims=True) - energy
        attn = jax.nn.softmax(energy, axis=-1)
        out = jnp.einsum("bcd,bsd->bsc", attn, flat).reshape(x.shape)
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return (gamma * out + x).astype(x.dtype)


class ResidualStage(nn.Module):
    out_channels: int
    stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.Conv(
            self.out_channels, (3, 3), strides=(self.stride, self.stride),
            padding=1, dtype=self.dtype, name="conv1",
        )(x)
        h = nn.GroupNorm(num_groups=min(32, self.out_channels), dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        skip = nn.Conv(
            self.out_channels, (1, 1), strides=(self.stride, self.stride),
            dtype=self.dtype, name="skip",
        )(x)
        return nn.relu(h + skip)


class SaliencyEncoder(nn.Module):
    """Multi-scale feature pyramid standing in for the B2-ResNet backbone
    (ResNet.py:82-142): 4 strided residual stages -> (x1, x2, x3, x4)."""

    width: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array, Array, Array]:
        w = self.width
        x1 = ResidualStage(w, stride=2, dtype=self.dtype, name="stage1")(x)
        x2 = ResidualStage(w * 2, stride=2, dtype=self.dtype, name="stage2")(x1)
        x3 = ResidualStage(w * 4, stride=2, dtype=self.dtype, name="stage3")(x2)
        x4 = ResidualStage(w * 8, stride=2, dtype=self.dtype, name="stage4")(x3)
        return x1, x2, x3, x4


class GeneratorLatent(nn.Module):
    """Latent-conditioned saliency generator (ResNet_models.py:90-103 +
    Saliency_feat_encoder :148-222): encoder pyramid, latent broadcast-concat
    at the deepest stage, PAM+CAM refinement, top-down decoder to a 1-channel
    saliency map at input resolution."""

    width: int = 32
    latent_dim: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, z: Array) -> Array:
        b, H, W, _ = x.shape
        x1, x2, x3, x4 = SaliencyEncoder(self.width, self.dtype, name="encoder")(x)

        zmap = jnp.broadcast_to(
            z[:, None, None, :].astype(self.dtype),
            (b, x4.shape[1], x4.shape[2], z.shape[-1]),
        )
        h = jnp.concatenate([x4, zmap], axis=-1)
        h = nn.Conv(self.width * 8, (3, 3), padding=1, dtype=self.dtype, name="fuse_z")(h)
        h = nn.relu(h)
        h = PositionAttention(dtype=self.dtype, name="pam")(h)
        h = ChannelAttention(name="cam")(h)

        for i, skip in enumerate((x3, x2, x1)):
            bb, hh, ww, cc = skip.shape
            h = jax.image.resize(h, (bb, hh, ww, h.shape[-1]), method="bilinear")
            h = jnp.concatenate([h, skip], axis=-1)
            h = nn.Conv(cc, (3, 3), padding=1, dtype=self.dtype, name=f"dec{i}")(h)
            h = nn.relu(h)
        h = jax.image.resize(h, (b, H, W, h.shape[-1]), method="bilinear")
        return nn.Conv(1, (3, 3), padding=1, dtype=self.dtype, name="pred")(h)


class GeneratorBaseLine(nn.Module):
    """No-latent variant (ResNet_models.py:400-412): same pyramid + decoder
    without the latent concat."""

    width: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, H, W, _ = x.shape
        x1, x2, x3, x4 = SaliencyEncoder(self.width, self.dtype, name="encoder")(x)
        h = PositionAttention(dtype=self.dtype, name="pam")(x4)
        h = ChannelAttention(name="cam")(h)
        for i, skip in enumerate((x3, x2, x1)):
            bb, hh, ww, cc = skip.shape
            h = jax.image.resize(h, (bb, hh, ww, h.shape[-1]), method="bilinear")
            h = jnp.concatenate([h, skip], axis=-1)
            h = nn.Conv(cc, (3, 3), padding=1, dtype=self.dtype, name=f"dec{i}")(h)
            h = nn.relu(h)
        h = jax.image.resize(h, (b, H, W, h.shape[-1]), method="bilinear")
        return nn.Conv(1, (3, 3), padding=1, dtype=self.dtype, name="pred")(h)


class Descriptor(nn.Module):
    """Energy model over (image, saliency-map) pairs
    (ResNet_models.py:38-88): concat -> strided conv stack -> scalar energy."""

    width: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image: Array, seg: Array) -> Array:
        h = jnp.concatenate([image.astype(self.dtype), seg.astype(self.dtype)], axis=-1)
        for i, mult in enumerate((1, 2, 4, 8)):
            h = nn.Conv(
                self.width * mult, (3, 3), strides=(2, 2), padding=1,
                dtype=self.dtype, name=f"conv{i + 1}",
            )(h)
            h = nn.leaky_relu(h, 0.2)
        h = jnp.mean(h, axis=(1, 2))
        h = nn.Dense(self.width * 4, dtype=self.dtype, name="fc1")(h)
        h = nn.leaky_relu(h, 0.2)
        return jnp.squeeze(nn.Dense(1, dtype=self.dtype, name="fc2")(h), axis=-1)


def SaliencyModel(work: str, method: str = "from_latent", width: int = 32, latent_dim: int = 8):
    """Dispatch mirroring models_Saliency.Model (models_Saliency.py:11-30)."""
    if work == "generator":
        if method == "from_latent":
            return GeneratorLatent(width=width, latent_dim=latent_dim)
        if method == "from_image":
            return GeneratorBaseLine(width=width)
        raise NotImplementedError("model selection error")
    if work == "descriptor":
        return Descriptor(width=width)
    raise NotImplementedError("model selection error")
