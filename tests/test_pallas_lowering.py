"""Mosaic lowering regression tests: every Pallas kernel must LOWER for TPU.

The CPU suite runs the kernels through the TPU interpreter, which executes
the jaxpr directly — it never exercises the Mosaic lowering pass, so a
kernel body using a primitive Mosaic cannot lower (e.g. cumsum, which has no
TC lowering rule) passes every CPU test and then crashes the first real TPU
run (this happened to the r3 tie-correction fix: the r4 driver bench died in
`fused_degrade_update` at the indexing section).

jax's AOT API lowers for an arbitrary platform without needing its devices:
`jax.jit(f).trace(*args).lower(lowering_platforms=("tpu",))` runs the full
StableHLO + Mosaic module pipeline on the CPU backend and raises the same
NotImplementedError a TPU run would. Compilation (to executable) still needs
real hardware; lowering is the stage where unsupported primitives surface.

Every kernel entry point reachable from the sampling/training paths is
lowered here at a representative shape, forward and (where a custom_vjp
exists) backward.
"""

import functools

import jax
import jax.numpy as jnp
import pytest


def _lower_tpu(fn, *args):
    jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


class TestFusedDegradeLowers:
    @pytest.mark.parametrize("select", ["indexing", "thresholding"])
    @pytest.mark.parametrize("mean_mode", ["image-wise", "const"])
    @pytest.mark.parametrize("rule", ["base_momentum", "base_sampling"])
    def test_fused_degrade_update(self, select, mean_mode, rule):
        from masked_diffusion_tpu.ops.pallas.fused_degrade import (
            fused_degrade_update,
        )

        b, s = 8, 64  # the headline 64² shape
        fn = functools.partial(
            fused_degrade_update, select=select, mean_mode=mean_mode,
            mean_value=0.1, rule=rule,
        )
        amt = jnp.full((b,), 100.0 if select == "indexing" else 0.3)
        _lower_tpu(
            fn, jax.random.PRNGKey(0),
            jnp.zeros((b, s, s, 1)), jnp.ones((b, s, s, 1)), amt, amt,
        )

    def test_fused_degrade_update_3ch_sub8_batch(self):
        """Channel lane-concat + row padding paths."""
        from masked_diffusion_tpu.ops.pallas.fused_degrade import (
            fused_degrade_update,
        )

        b, s = 5, 32
        fn = functools.partial(
            fused_degrade_update, select="indexing",
            mean_mode="image-wise", rule="base_momentum",
        )
        amt = jnp.full((b,), 64.0)
        _lower_tpu(
            fn, jax.random.PRNGKey(0),
            jnp.zeros((b, s, s, 3)), jnp.ones((b, s, s, 3)), amt, amt,
        )


class TestKmaskLowers:
    def test_exact_count_masks(self):
        from masked_diffusion_tpu.ops.pallas.kmask import (
            exact_count_masks_pallas,
        )

        counts = jnp.arange(4, dtype=jnp.int32) * 100
        fn = functools.partial(exact_count_masks_pallas, batch=4, height=128,
                               width=128)
        jax.jit(
            lambda key, c: fn(key, counts=c)
        ).trace(jax.random.PRNGKey(0), counts).lower(
            lowering_platforms=("tpu",)
        )


class TestGroupNormLowers:
    def test_forward_and_grad(self):
        from masked_diffusion_tpu.ops.pallas.groupnorm import group_norm_silu

        b, s, c, g = 8, 16, 128, 32
        x = jnp.zeros((b, s, s, c))
        scale = jnp.ones((c,))
        bias = jnp.zeros((c,))
        fn = functools.partial(group_norm_silu, groups=g)
        _lower_tpu(fn, x, scale, bias)
        _lower_tpu(
            jax.grad(lambda *a: jnp.sum(fn(*a)), argnums=(0, 1, 2)),
            x, scale, bias,
        )


class TestTinyheadAttentionLowers:
    def test_forward_and_grad(self):
        from masked_diffusion_tpu.ops.pallas.tinyhead_attention import (
            tinyhead_attention,
        )

        b, h, s, d = 4, 4, 256, 8
        q = jnp.zeros((b, h, s, d), jnp.bfloat16)
        fn = functools.partial(tinyhead_attention, scale=d ** -0.5)
        _lower_tpu(fn, q, q, q)
        _lower_tpu(
            jax.grad(
                lambda a, b, c: jnp.sum(fn(a, b, c).astype(jnp.float32)),
                argnums=(0, 1, 2),
            ),
            q, q, q,
        )
