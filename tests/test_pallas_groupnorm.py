"""Fused Pallas GroupNorm+SiLU: kernel (TPU interpreter) matches the jnp
reference, gradients flow through the custom VJP, and eligibility gating
holds. The same reference implementation is what the UNet uses off-TPU, so
flax-GroupNorm equivalence is covered by the torch parity tests."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from masked_diffusion_tpu.ops.pallas.groupnorm import (
    _gn_reference,
    fits_vmem,
    group_norm_silu,
    pallas_norm_supported,
)


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    x = rng.normal(0.3, 1.7, size=(2, 8, 8, 256)).astype(np.float32)
    scale = rng.normal(1.0, 0.1, size=(256,)).astype(np.float32)
    bias = rng.normal(0.0, 0.1, size=(256,)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias)


@pytest.mark.parametrize("silu", [True, False])
def test_kernel_matches_reference(data, silu):
    x, scale, bias = data
    ref = _gn_reference(x, scale, bias, groups=32, eps=1e-5, silu=silu)
    out = group_norm_silu(x, scale, bias, 32, 1e-5, silu, True)  # interpret
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_reference_matches_flax_groupnorm(data):
    x, scale, bias = data
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5)
    params = {"params": {"scale": scale, "bias": bias}}
    ref_flax = gn.apply(params, x)
    mine = _gn_reference(x, scale, bias, groups=32, eps=1e-5, silu=False)
    np.testing.assert_allclose(np.asarray(mine), np.asarray(ref_flax), atol=2e-5, rtol=2e-5)


def test_custom_vjp_matches_autodiff(data):
    x, scale, bias = data

    def f_kernel(x_, s_, b_):
        return jnp.sum(group_norm_silu(x_, s_, b_, 32, 1e-5, True, True) ** 2)

    def f_ref(x_, s_, b_):
        return jnp.sum(_gn_reference(x_, s_, b_, 32, 1e-5, True) ** 2)

    gk = jax.grad(f_kernel, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4)


def test_bf16_roundtrip(data):
    x, scale, bias = data
    out = group_norm_silu(x.astype(jnp.bfloat16), scale, bias, 32, 1e-5, True, True)
    assert out.dtype == jnp.bfloat16
    ref = _gn_reference(x.astype(jnp.bfloat16), scale, bias, 32, 1e-5, True)
    # kernel normalizes in fp32, reference in bf16 — expect ~1 bf16 ulp
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=8e-2, rtol=2e-2,
    )


@pytest.mark.parametrize("batch,expect_nb", [(16, 8), (6, 2), (5, 1), (8, 8)])
def test_multi_image_blocks_match_reference(batch, expect_nb):
    """Round-4 multi-image grid cells (_images_per_block): per-image stats
    must be independent — image i's output equals the single-image call."""
    from masked_diffusion_tpu.ops.pallas.groupnorm import _images_per_block

    rng = np.random.default_rng(batch)
    x = jnp.asarray(rng.normal(0.1, 1.3, size=(batch, 4, 4, 256)), jnp.float32)
    scale = jnp.asarray(rng.normal(1.0, 0.1, size=(256,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0.0, 0.1, size=(256,)), jnp.float32)
    assert _images_per_block(batch, 16, 256) == expect_nb
    out = group_norm_silu(x, scale, bias, 32, 1e-5, True, True)
    ref = _gn_reference(x, scale, bias, groups=32, eps=1e-5, silu=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)
    # image independence: one image alone == that image inside the block
    one = group_norm_silu(x[:1], scale, bias, 32, 1e-5, True, True)
    np.testing.assert_allclose(
        np.asarray(one[0]), np.asarray(out[0]), atol=1e-6, rtol=1e-6
    )


def test_images_per_block_respects_vmem():
    """The cap budgets the WORKING SET (~12-16 B/elem live in VMEM: staging +
    fp32 temporaries + out), not just the fp32 input bytes."""
    from masked_diffusion_tpu.ops.pallas.groupnorm import _images_per_block

    assert _images_per_block(64, 64 * 64, 128) == 2  # 2 MB fp32-input/img
    assert _images_per_block(64, 128 * 128, 128) == 1
    assert _images_per_block(64, 16 * 16, 512) == 8


def test_eligibility_gating():
    assert not pallas_norm_supported(8, 8, 256, 32)  # cpu backend in tests
    assert fits_vmem(64 * 64, 128)
    assert not fits_vmem(256 * 256, 128)


def test_unet_param_tree_unchanged():
    # GroupNormAct must keep nn.GroupNorm's (scale, bias) leaves so existing
    # checkpoints load
    from masked_diffusion_tpu.models import build_unet

    model = build_unet(
        dim_channel=3, dim_height=16, dim_width=16, num_attention=1,
        block_out_channels=(64, 128), layers_per_block=1,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,)))
    norm1 = params["params"]["down_0_res_0"]["norm1"]
    assert set(norm1.keys()) == {"scale", "bias"}
    assert norm1["scale"].shape == (64,)
