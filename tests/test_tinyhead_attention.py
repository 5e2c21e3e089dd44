"""Tiny-head flash attention (ops/pallas/tinyhead_attention.py).

The kernel is exact (no online-softmax approximation): interpret mode on CPU
must match the einsum formulation (models/unet.py:244-248) to bf16-matmul
tolerance — both paths do bf16 matmuls with fp32 accumulation and an fp32
softmax, so agreement is tight. Padding paths (S % 128, S % q_block, D < 8)
are pinned explicitly; the custom VJP must differentiate like the einsum.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from masked_diffusion_tpu.ops.pallas.tinyhead_attention import (
    tinyhead_attention,
    tinyhead_supported,
)


def _einsum_attention(q, k, v, scale):
    a = jnp.einsum("bhsd,bhtd->bhst", q, k, preferred_element_type=jnp.float32)
    a = jax.nn.softmax(a * scale, axis=-1).astype(v.dtype)
    return jnp.einsum("bhst,bhtd->bhsd", a, v)


def _qkv(b, h, s, d, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(b, h, s, d)), dtype)
    return mk(), mk(), mk()


class TestKernel:
    @pytest.mark.parametrize(
        "b,h,s,d",
        [
            (2, 4, 128, 8),    # minimal lane-exact case
            (1, 8, 256, 8),    # zoo 128^2 placement shape (S=16^2... scaled)
            (2, 2, 384, 8),    # S % q_block(256) != 0 -> padded query rows
            (1, 2, 200, 8),    # S % 128 != 0 -> masked padded keys
            (1, 2, 128, 4),    # D < 8 -> zero-padded head rows
        ],
    )
    def test_matches_einsum(self, b, h, s, d):
        q, k, v = _qkv(b, h, s, d)
        scale = 1.0 / math.sqrt(d)
        got = tinyhead_attention(q, k, v, scale, 256, True)
        want = _einsum_attention(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), scale,
        ).astype(jnp.float32)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2
        )
        assert got.shape == (b, h, s, d)
        assert got.dtype == q.dtype

    def test_bf16_inputs_keep_dtype(self):
        q, k, v = _qkv(1, 2, 128, 8, dtype=jnp.bfloat16)
        out = tinyhead_attention(q, k, v, 0.35355, 256, True)
        assert out.dtype == jnp.bfloat16
        want = _einsum_attention(q, k, v, 0.35355)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(want, np.float32),
            atol=3e-2, rtol=3e-2,
        )

    def test_unsupported_shapes_raise(self):
        q, k, v = _qkv(1, 2, 64, 8)
        assert not tinyhead_supported(64, 8)
        assert not tinyhead_supported(256, 16)
        with pytest.raises(ValueError, match="tinyhead"):
            tinyhead_attention(q, k, v, 1.0, 256, True)

    def test_grad_matches_einsum(self):
        """The custom VJP recomputes with the einsum formulation — grads must
        equal differentiating the einsum directly."""
        q, k, v = _qkv(1, 2, 128, 8, seed=3)
        scale = 1.0 / math.sqrt(8)

        def loss_kernel(q_, k_, v_):
            return jnp.sum(tinyhead_attention(q_, k_, v_, scale, 256, True) ** 2)

        def loss_einsum(q_, k_, v_):
            return jnp.sum(_einsum_attention(q_, k_, v_, scale) ** 2)

        g_k = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
        g_e = jax.grad(loss_einsum, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_k, g_e):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-2, rtol=5e-2
            )


class TestModuleRouting:
    def test_attention_block_tiny_flash_matches_einsum(self, monkeypatch):
        """UNet AttentionBlock with tiny_flash routes through the kernel
        (CPU interpreter via the MDT_TINYHEAD_INTERPRET test hook — production
        routing is TPU-only) and matches the einsum block; at S < 128 it
        silently falls back (same params, same output)."""
        from masked_diffusion_tpu.models.unet import AttentionBlock

        monkeypatch.setenv("MDT_TINYHEAD_INTERPRET", "1")

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 32)), jnp.float32)  # S=256
        blk = AttentionBlock(head_dim=8, norm_groups=8)
        blk_tiny = AttentionBlock(head_dim=8, norm_groups=8, tiny_flash=True)
        params = blk.init(jax.random.PRNGKey(0), x)
        out = blk.apply(params, x)
        out_tiny = blk_tiny.apply(params, x)
        # an fp32 module's einsum does fp32 matmuls; the kernel always runs
        # its matmuls in bf16 (the production dtype) — bf16-rounding tolerance
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(out_tiny), atol=3e-2, rtol=3e-2
        )

        x_small = jnp.asarray(rng.normal(size=(2, 8, 8, 32)), jnp.float32)
        p2 = blk.init(jax.random.PRNGKey(1), x_small)
        np.testing.assert_array_equal(  # fallback is the einsum path itself
            np.asarray(blk.apply(p2, x_small)),
            np.asarray(blk_tiny.apply(p2, x_small)),
        )

    def test_unet_config_plumbs_flag(self, monkeypatch):
        from masked_diffusion_tpu.models import build_unet

        monkeypatch.setenv("MDT_TINYHEAD_INTERPRET", "1")
        m = build_unet(dim_channel=3, dim_height=32, dim_width=32,
                       num_attention=1, block_out_channels=(8, 16),
                       tinyhead_attention=True)
        assert m.config.tinyhead_attention
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32))
        y = m.apply(params, x, jnp.zeros((1,), jnp.int32))
        assert y.shape == x.shape
        assert bool(jnp.all(jnp.isfinite(y)))

    def test_off_tpu_without_hook_falls_back_to_einsum(self):
        """Production discipline: off-TPU the tiny_flash flag must route to
        the einsum (never interpret-mode emulation in a hot path)."""
        from masked_diffusion_tpu.models.unet import AttentionBlock

        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 32)), jnp.float32)
        blk = AttentionBlock(head_dim=8, norm_groups=8)
        blk_tiny = AttentionBlock(head_dim=8, norm_groups=8, tiny_flash=True)
        params = blk.init(jax.random.PRNGKey(0), x)
        np.testing.assert_array_equal(  # identical = the einsum path itself
            np.asarray(blk.apply(params, x)),
            np.asarray(blk_tiny.apply(params, x)),
        )


class TestAutoResolution:
    """tinyhead_attention=None (the default) resolves per backend at trace
    time — the r4 measured win (docs/PERFORMANCE.md b2) makes single-device
    TPU auto-ON; everything else stays on the einsum unless forced."""

    def test_tinyhead_auto_env_and_backend(self, monkeypatch):
        import jax as jax_mod

        from masked_diffusion_tpu.models.unet import _tinyhead_auto

        monkeypatch.delenv("MDT_TINYHEAD", raising=False)
        assert not _tinyhead_auto()  # CPU test backend
        monkeypatch.setattr(jax_mod, "default_backend", lambda: "tpu")
        monkeypatch.setattr(jax_mod, "device_count", lambda: 1)
        assert _tinyhead_auto()
        monkeypatch.setattr(jax_mod, "device_count", lambda: 8)
        assert not _tinyhead_auto()  # no GSPMD rule for pallas_call
        # env force wins in both directions
        monkeypatch.setenv("MDT_TINYHEAD", "1")
        assert _tinyhead_auto()
        monkeypatch.setattr(jax_mod, "device_count", lambda: 1)
        monkeypatch.setenv("MDT_TINYHEAD", "0")
        assert not _tinyhead_auto()

    def test_factory_preserves_explicit_false(self):
        """`--tinyhead_attention false` must stay a force-off, not collapse
        to None/auto (the r3 `or None` coercion would have)."""
        from masked_diffusion_tpu.models import build_unet
        from masked_diffusion_tpu.models.zoo import Model

        m = build_unet(dim_channel=3, dim_height=32, dim_width=32,
                       num_attention=1, block_out_channels=(8, 16),
                       tinyhead_attention=False)
        assert m.config.tinyhead_attention is False
        m2 = build_unet(dim_channel=3, dim_height=32, dim_width=32,
                        num_attention=1, block_out_channels=(8, 16))
        assert m2.config.tinyhead_attention is None
        z = Model("unet6", 3, 32, 32, tinyhead_attention=False)
        assert z.config.tinyhead_attention is False

    def test_auto_resolves_inside_call(self, monkeypatch):
        """End-to-end through UNet2D: config None + MDT_TINYHEAD=1 (+ the
        CPU interpret hook) routes attention through the kernel; =0 stays on
        the einsum. Same params; outputs match to bf16-matmul tolerance and
        DIFFER bitwise (proving the kernel actually engaged)."""
        import jax as jax_mod

        from masked_diffusion_tpu.models import build_unet

        monkeypatch.setenv("MDT_TINYHEAD_INTERPRET", "1")
        m = build_unet(dim_channel=3, dim_height=32, dim_width=32,
                       num_attention=1, block_out_channels=(8, 16))
        assert m.config.tinyhead_attention is None
        x = jnp.asarray(
            np.random.default_rng(3).normal(size=(2, 32, 32, 3)), jnp.float32
        )
        t = jnp.zeros((2,), jnp.int32)
        params = m.init(jax.random.PRNGKey(0), x, t)
        # conv_out is ZERO-init (the unet6 convention): the whole model
        # output at init is 0 regardless of the attention path — give it
        # weight so the two attention routes are observable at the output
        params = jax.tree_util.tree_map_with_path(
            lambda path, p: p + 0.05 if "conv_out" in str(path) else p, params
        )
        monkeypatch.setenv("MDT_TINYHEAD", "0")
        y_einsum = m.apply(params, x, t)
        monkeypatch.setenv("MDT_TINYHEAD", "1")
        y_kernel = m.apply(params, x, t)
        np.testing.assert_allclose(
            np.asarray(y_einsum), np.asarray(y_kernel), atol=3e-2, rtol=3e-2
        )
        assert not np.array_equal(np.asarray(y_einsum), np.asarray(y_kernel))
