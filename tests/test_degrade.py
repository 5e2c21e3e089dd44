"""Degrade-op semantics vs reference scheduler.py:266-598."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from masked_diffusion_tpu.ops import degrade


def _img(key, b=4, h=8, w=8, c=3):
    return jax.random.normal(key, (b, h, w, c))


class TestMaskGeneration:
    def test_exact_count(self):
        key = jax.random.PRNGKey(0)
        counts = jnp.array([0, 1, 32, 64])
        masks = degrade.exact_count_masks(key, 4, 8, 8, counts)
        assert masks.shape == (4, 8, 8, 1)
        black = 64 - masks.sum(axis=(1, 2, 3))
        np.testing.assert_array_equal(np.asarray(black), np.asarray(counts))

    def test_exact_count_randomness(self):
        # different keys give different masks; same key reproduces
        counts = jnp.array([10, 10])
        m1 = degrade.exact_count_masks(jax.random.PRNGKey(1), 2, 8, 8, counts)
        m2 = degrade.exact_count_masks(jax.random.PRNGKey(2), 2, 8, 8, counts)
        m1b = degrade.exact_count_masks(jax.random.PRNGKey(1), 2, 8, 8, counts)
        assert not np.array_equal(np.asarray(m1), np.asarray(m2))
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m1b))

    def test_exact_count_under_ties(self):
        """Tied uniforms must still produce EXACTLY counts[i] degraded
        pixels, selected identically to the stable double-argsort ranks —
        fp32 draws collide at real image sizes (~hw^2/2^24 per row), and a
        value-threshold formulation keeps both tied pixels."""
        rng = np.random.default_rng(0)
        hw = 64
        # heavy ties: only 4 distinct values
        u = jnp.asarray(rng.integers(0, 4, (8, hw)) / 4.0, jnp.float32)
        counts = jnp.asarray(rng.integers(0, hw + 1, 8), jnp.int32)
        keep = degrade.masks_from_uniforms(u, counts)
        np.testing.assert_array_equal(
            hw - np.asarray(keep.sum(axis=1)), np.asarray(counts)
        )
        ranks = jnp.argsort(jnp.argsort(u, axis=1, stable=True), axis=1, stable=True)
        expected = (ranks >= counts[:, None]).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(keep), np.asarray(expected))

    def test_threshold_ratio(self):
        key = jax.random.PRNGKey(0)
        ratios = jnp.array([0.0, 0.5, 1.0])
        masks = degrade.threshold_masks(key, 3, 32, 32, 3, ratios, per_channel=False)
        assert masks.shape == (3, 32, 32, 1)
        frac_black = 1 - np.asarray(masks.mean(axis=(1, 2, 3)))
        assert frac_black[0] == 0.0
        assert abs(frac_black[1] - 0.5) < 0.05
        assert frac_black[2] == 1.0

    def test_threshold_per_channel(self):
        key = jax.random.PRNGKey(0)
        ratios = jnp.array([0.5])
        masks = degrade.threshold_masks(key, 1, 16, 16, 3, ratios, per_channel=True)
        assert masks.shape == (1, 16, 16, 3)
        # channels are independent
        assert not np.array_equal(np.asarray(masks[..., 0]), np.asarray(masks[..., 1]))

    def test_nested_masks(self):
        key = jax.random.PRNGKey(0)
        ra, rb = jnp.array([0.7]), jnp.array([0.3])
        ma, mb = degrade.nested_threshold_masks(key, 1, 16, 16, 3, ra, rb, False)
        # larger ratio => more black; black(a) superset of black(b)
        assert np.all(np.asarray(ma) <= np.asarray(mb))


class TestMeanFill:
    def test_const_mean(self):
        img = _img(jax.random.PRNGKey(0))
        masks = jnp.ones_like(img)
        mean = degrade.compute_mean_pixel(img, masks, 0.25, "image-wise")
        assert mean.shape == (4, 1, 1, 3)
        np.testing.assert_allclose(np.asarray(mean), 0.25)

    def test_string_zero_mean(self):
        img = _img(jax.random.PRNGKey(0))
        masks = jnp.ones_like(img)
        mean = degrade.compute_mean_pixel(img, masks, "0", "image-wise")
        np.testing.assert_allclose(np.asarray(mean), 0.0)

    def test_degraded_area_image_wise(self):
        img = _img(jax.random.PRNGKey(3))
        key = jax.random.PRNGKey(1)
        masks = degrade.generate_masks(key, img, jnp.array([20, 20, 20, 20]), "indexing", "1-channel")
        mean = degrade.compute_mean_pixel(img, masks, "degraded_area", "image-wise")
        inv = 1 - np.asarray(masks)
        ref = (np.asarray(img) * inv).sum(axis=(1, 2, 3), keepdims=True) / inv.sum(
            axis=(1, 2, 3), keepdims=True
        )
        np.testing.assert_allclose(np.asarray(mean), ref, rtol=1e-5)

    def test_degraded_area_channel_wise(self):
        img = _img(jax.random.PRNGKey(3))
        masks = degrade.generate_masks(
            jax.random.PRNGKey(1), img, jnp.array([20] * 4), "indexing", "1-channel"
        )
        mean = degrade.compute_mean_pixel(img, masks, "degraded_area", "channel-wise")
        assert mean.shape == (4, 1, 1, 3)
        inv = 1 - np.asarray(masks)
        ref = (np.asarray(img) * inv).sum(axis=(1, 2), keepdims=True) / inv.sum(
            axis=(1, 2), keepdims=True
        )
        np.testing.assert_allclose(np.asarray(mean), ref, rtol=1e-5)

    def test_non_degraded_area_sign_flip(self):
        # reference scheduler.py:311-314: -(sum of kept)/(count of degraded)
        img = _img(jax.random.PRNGKey(3))
        masks = degrade.generate_masks(
            jax.random.PRNGKey(1), img, jnp.array([20] * 4), "indexing", "1-channel"
        )
        mean = degrade.compute_mean_pixel(img, masks, "non_degraded_area", "channel-wise")
        m = np.asarray(masks)
        ref = (np.asarray(img) * m).sum(axis=(1, 2), keepdims=True) / (1 - m).sum(
            axis=(1, 2), keepdims=True
        ) * -1
        np.testing.assert_allclose(np.asarray(mean), ref, rtol=1e-5)

    def test_non_degraded_area_nan_guard(self):
        img = _img(jax.random.PRNGKey(3))
        masks = jnp.ones_like(img)  # nothing degraded -> 0/0 in reference, NaN->0
        mean = degrade.compute_mean_pixel(img, masks, "non_degraded_area", "channel-wise")
        assert np.all(np.isfinite(np.asarray(mean)))
        np.testing.assert_allclose(np.asarray(mean), 0.0)


class TestDegradeTraining:
    def test_composition_identity(self):
        # D(x) = (1-m)*mu + m*x exactly (scheduler.py:319)
        img = _img(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(7)
        out, masks, degrade_mask, mean_mask = degrade.degrade_training(
            key, img, jnp.array([10, 20, 30, 40]), "indexing", "1-channel",
            "degraded_area", "image-wise",
        )
        m = np.asarray(masks)
        mu = np.asarray(mean_mask)
        np.testing.assert_allclose(np.asarray(out), (1 - m) * mu + m * np.asarray(img), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(degrade_mask), (1 - m) * mu + m, rtol=1e-5)

    def test_kept_pixels_untouched(self):
        img = _img(jax.random.PRNGKey(0))
        out, masks, _, _ = degrade.degrade_training(
            jax.random.PRNGKey(7), img, jnp.array([10, 20, 30, 40]),
            "indexing", "1-channel", 0, "image-wise",
        )
        m = np.asarray(masks).astype(bool)
        np.testing.assert_allclose(np.asarray(out)[m], np.asarray(img)[m])

    def test_full_degradation_is_constant_image(self):
        img = _img(jax.random.PRNGKey(0))
        out, masks, _, _ = degrade.degrade_training(
            jax.random.PRNGKey(7), img, jnp.array([64] * 4),
            "indexing", "1-channel", "degraded_area", "image-wise",
        )
        # every pixel replaced by the image mean
        ref = np.asarray(img).mean(axis=(1, 2, 3), keepdims=True)
        np.testing.assert_allclose(np.asarray(out), np.broadcast_to(ref, img.shape), rtol=1e-4)

    def test_jit_compatible(self):
        img = _img(jax.random.PRNGKey(0))
        fn = jax.jit(
            lambda k, x, a: degrade.degrade_training(
                k, x, a, "indexing", "1-channel", "degraded_area", "image-wise"
            )
        )
        out = fn(jax.random.PRNGKey(1), img, jnp.array([10, 20, 30, 40]))
        assert out[0].shape == img.shape


class TestSamplingVariants:
    def test_independent_returns_binary_mask(self):
        img = _img(jax.random.PRNGKey(0))
        out, mask, mean_mask = degrade.degrade_independent_base_sampling(
            jax.random.PRNGKey(1), img, jnp.array([10] * 4),
            "indexing", "1-channel", "degraded_area", "image-wise",
        )
        assert set(np.unique(np.asarray(mask))) <= {0.0, 1.0}

    def test_dependent_nested(self):
        img = _img(jax.random.PRNGKey(0))
        out = degrade.degrade_dependent_base_sampling(
            jax.random.PRNGKey(1), img, jnp.array([0.8] * 4), jnp.array([0.4] * 4),
            "1-channel", "degraded_area", "image-wise",
        )
        _, mask_t, _, _, mask_next, _ = out
        assert np.all(np.asarray(mask_t) <= np.asarray(mask_next))

    def test_degrade_with_mask_matches_manual(self):
        img = _img(jax.random.PRNGKey(0))
        masks = degrade.generate_masks(
            jax.random.PRNGKey(2), img, jnp.array([15] * 4), "indexing", "1-channel"
        )
        out = degrade.degrade_with_mask(img, masks, "degraded_area", "image-wise")
        mu = degrade.compute_mean_pixel(img, masks, "degraded_area", "image-wise")
        ref = (1 - np.asarray(masks)) * np.asarray(mu) + np.asarray(masks) * np.asarray(img)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5)

    def test_index_sampling_prefix(self):
        img = _img(jax.random.PRNGKey(0), b=2)
        hw = 64
        idx = jnp.stack([jax.random.permutation(jax.random.PRNGKey(i), hw) for i in range(2)])
        out, masks, _ = degrade.degrade_index_sampling(
            idx, jnp.array([12, 12]), img, 0, "image-wise"
        )
        # exactly the first 12 permutation entries are black
        m = np.asarray(masks)[..., 0].reshape(2, hw)
        for i in range(2):
            black_pixels = set(np.where(m[i] == 0)[0].tolist())
            assert black_pixels == set(np.asarray(idx[i][:12]).tolist())

    def test_dependent_momentum_regions(self):
        b, h, w, c = 2, 8, 8, 3
        hw = h * w
        k = jax.random.PRNGKey(0)
        sample_t = jax.random.normal(k, (b, h, w, c))
        sample_0 = jax.random.normal(jax.random.fold_in(k, 1), (b, h, w, c))
        idx = jnp.stack([jax.random.permutation(jax.random.PRNGKey(i), hw) for i in range(b)])
        out, mean_masks, _ = degrade.degrade_dependent_momentum_sampling(
            sample_t, sample_0, idx, 10, 20, 0
        )
        out = np.asarray(out).reshape(b, hw, c)
        st = np.asarray(sample_t).reshape(b, hw, c)
        s0 = np.asarray(sample_0).reshape(b, hw, c)
        for i in range(b):
            p = np.asarray(idx[i])
            np.testing.assert_allclose(out[i, p[:10]], st[i, p[:10]], rtol=1e-5)
            np.testing.assert_allclose(out[i, p[10:20]], s0[i, p[10:20]], rtol=1e-5)
            np.testing.assert_allclose(out[i, p[20:]], 0.0, atol=1e-6)

    def test_interpolation_shared_mask(self):
        img = _img(jax.random.PRNGKey(0), b=3)
        out, masks, _ = degrade.degrade_interpolation_sampling(
            jax.random.PRNGKey(1), img, jnp.array([0.5] * 3), 0
        )
        m = np.asarray(masks)
        np.testing.assert_array_equal(m[0], m[1])
        np.testing.assert_array_equal(m[1], m[2])
