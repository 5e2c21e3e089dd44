"""Fused pallas degrade+update: row math on CPU with injected bits.

The TPU interpreter stubs pltpu.prng_random_bits, so (like the kmask tests)
the PRNG-driven kernel is exercised end-to-end only on hardware
(benchmarks/check_pallas_tpu.py); here the pure-jnp `fused_rows` — mask
generation from given bits, masked means, fills, and the update rule — is
checked for exactness against the ops/degrade.py composition on the SAME
masks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from masked_diffusion_tpu.ops import degrade as degrade_ops
from masked_diffusion_tpu.ops.pallas.fused_degrade import (
    exact_k_degrade,
    fused_rows,
    rowwise_kth_threshold,
)

R, H, W = 4, 8, 8
HW = H * W


def _bits(seed, shape=(R, HW)):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 2**32, size=shape, dtype=np.uint32))


def _imgs(seed, c):
    rng = np.random.default_rng(seed)
    xt = rng.normal(size=(R, c * HW)).astype(np.float32)
    x0 = rng.normal(size=(R, c * HW)).astype(np.float32)
    return jnp.asarray(xt), jnp.asarray(x0)


def _to_nhwc(rows, c):
    return np.asarray(rows).reshape(R, c, H, W).transpose(0, 2, 3, 1)


class TestRowwiseKth:
    def test_matches_per_row_order_statistic(self):
        bits = _bits(0)
        k = jnp.asarray([[0], [5], [30], [64]], jnp.int32)
        thr = np.asarray(rowwise_kth_threshold(bits, k))
        for r in range(R):
            sel = int((np.asarray(bits[r]) < thr[r, 0]).sum())
            assert sel == int(k[r, 0])


class TestExactKTies:
    def test_exact_counts_under_heavy_ties(self):
        """Draws quantized to 8 distinct values force boundary ties at nearly
        every k; exact_k_degrade must still return EXACTLY k per row (the
        bare bit-scan threshold under-degrades by the tie deficit —
        advisor r03). Ties are broken by lane order among the boundary
        value's occurrences."""
        rng = np.random.default_rng(7)
        bits = jnp.asarray(
            (rng.integers(0, 8, size=(R, HW), dtype=np.uint32)) << 29
        )
        for kval in (0, 1, 7, 13, 32, HW - 1, HW):
            k = jnp.full((R, 1), kval, jnp.int32)
            deg = np.asarray(exact_k_degrade(bits, k))
            assert (deg.sum(axis=1) == kval).all(), kval
            # selection is still order-correct: every degraded bit value is
            # <= every kept bit value OR they tie at the boundary
            for r in range(R):
                if 0 < kval < HW:
                    assert np.asarray(bits)[r][deg[r]].max() <= \
                        np.asarray(bits)[r][~deg[r]].min()

    def test_all_equal_bits(self):
        """The degenerate all-tied row: exactly k lane-first pixels."""
        bits = jnp.full((R, HW), np.uint32(1 << 31))
        k = jnp.asarray([[0], [5], [HW // 2], [HW]], jnp.int32)
        deg = np.asarray(exact_k_degrade(bits, k))
        for r in range(R):
            kval = int(k[r, 0])
            assert deg[r].sum() == kval
            np.testing.assert_array_equal(deg[r][:kval], True)
            np.testing.assert_array_equal(deg[r][kval:], False)


class TestFusedRowsExactness:
    @pytest.mark.parametrize("c", [1, 3])
    @pytest.mark.parametrize("mean_mode,mean_value", [
        ("const", 0.0), ("const", 0.25), ("degraded_area", 0.0),
    ])
    @pytest.mark.parametrize("rule", ["base_momentum", "base_sampling"])
    def test_thresholding_matches_xla_composition(self, c, mean_mode,
                                                  mean_value, rule):
        bits_t, bits_n = _bits(1), _bits(2)
        xt, x0 = _imgs(3, c)
        ratios = jnp.asarray([[0.1], [0.4], [0.7], [0.95]], jnp.float32)
        out, mask_n = fused_rows(
            bits_t, bits_n, xt, x0, ratios, ratios * 0.5,
            channels=c, select="thresholding", mean_mode=mean_mode,
            mean_value=mean_value, rule=rule,
        )
        # rebuild the masks the same way (top 24 bits -> f32, the
        # Mosaic-supported cast), then compose with ops/degrade.py
        u_t = (np.asarray(bits_t) >> 8).astype(np.float32) * np.float32(1 / 2**24)
        u_n = (np.asarray(bits_n) >> 8).astype(np.float32) * np.float32(1 / 2**24)
        keep_t = (u_t > np.asarray(ratios)).astype(np.float32)
        keep_n = (u_n > np.asarray(ratios) * 0.5).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(mask_n), keep_n)

        x0_nhwc = _to_nhwc(x0, c)
        xt_nhwc = _to_nhwc(xt, c)
        mo = mean_value if mean_mode == "const" else "degraded_area"
        d_t = degrade_ops.degrade_with_mask(
            jnp.asarray(x0_nhwc),
            jnp.broadcast_to(
                jnp.asarray(keep_t).reshape(R, H, W, 1), (R, H, W, c)
            ),
            mo, "image-wise",
        )
        d_n = degrade_ops.degrade_with_mask(
            jnp.asarray(x0_nhwc),
            jnp.broadcast_to(
                jnp.asarray(keep_n).reshape(R, H, W, 1), (R, H, W, c)
            ),
            mo, "image-wise",
        )
        if rule == "base_momentum":
            expect = xt_nhwc - np.asarray(d_t) + np.asarray(d_n)
        else:
            expect = np.asarray(d_n)
        np.testing.assert_allclose(_to_nhwc(out, c), expect, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("c", [1, 3])
    def test_indexing_exact_counts(self, c):
        bits_t, bits_n = _bits(4), _bits(5)
        xt, x0 = _imgs(6, c)
        counts = jnp.asarray([[0], [7], [32], [64]], jnp.float32)
        out, mask_n = fused_rows(
            bits_t, bits_n, xt, x0, counts, counts,
            channels=c, select="indexing", mean_mode="degraded_area",
            mean_value=0.0, rule="base_momentum",
        )
        # exactly k degraded pixels per row, and they are the k smallest bits
        for r in range(R):
            k = int(counts[r, 0])
            degraded = 1.0 - np.asarray(mask_n[r])
            assert int(degraded.sum()) == k
            if 0 < k < HW:
                order = np.sort(np.asarray(bits_n[r]))
                assert np.asarray(bits_n[r])[degraded.astype(bool)].max() <= order[k - 1]
        assert np.isfinite(np.asarray(out)).all()

    def test_update_rule_identity(self):
        """base_momentum with identical masks at t and t-1 is a no-op
        (D_t == D_n -> out == sample_t)."""
        bits = _bits(7)
        xt, x0 = _imgs(8, 1)
        ratios = jnp.full((R, 1), 0.5, jnp.float32)
        out, _ = fused_rows(
            bits, bits, xt, x0, ratios, ratios,
            channels=1, select="thresholding", mean_mode="degraded_area",
            mean_value=0.0, rule="base_momentum",
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(xt), atol=1e-6)


class TestLoopGating:
    def test_fused_gate_mode_coverage(self, monkeypatch):
        from masked_diffusion_tpu.config import Config
        from masked_diffusion_tpu.sample.loop import _use_fused_degrade

        cfg = Config(
            select_degrade_pixel="thresholding", degrade_channel="1-channel",
            mean_option="degraded_area", mean_area="image-wise",
        )
        monkeypatch.setenv("MDT_PALLAS_FUSED", "1")
        assert _use_fused_degrade(cfg, "independent", "base_momentum", False)
        # uncovered modes never fuse, even when forced
        assert not _use_fused_degrade(cfg, "dependent_prev", "base_momentum", False)
        assert not _use_fused_degrade(cfg, "independent", "momentum", False)
        assert not _use_fused_degrade(cfg, "independent", "base_momentum", True)
        cfg3 = cfg.replace(degrade_channel="3-channel")
        assert not _use_fused_degrade(cfg3, "independent", "base_momentum", False)
        cfgc = cfg.replace(mean_option="non_degraded_area")
        assert not _use_fused_degrade(cfgc, "independent", "base_momentum", False)
        monkeypatch.setenv("MDT_PALLAS_FUSED", "0")
        assert not _use_fused_degrade(cfg, "independent", "base_momentum", False)

    def test_fused_gate_vmem_budget(self, monkeypatch):
        """Shapes whose 8-image block exceeds the VMEM budget (256²x3+)
        never fuse — Mosaic cannot lower sub-8 sublane blocks, so there is
        no smaller-group fallback (fused_supported)."""
        import jax

        from masked_diffusion_tpu.config import Config
        from masked_diffusion_tpu.ops.pallas.fused_degrade import fused_supported
        from masked_diffusion_tpu.sample.loop import _use_fused_degrade

        assert fused_supported(4, 128, 128, 3)
        assert not fused_supported(4, 256, 256, 3)
        cfg = Config(
            select_degrade_pixel="indexing", degrade_channel="1-channel",
            mean_option="degraded_area", mean_area="image-wise",
            data_size=256, out_channel=3,
        )
        monkeypatch.setenv("MDT_PALLAS_FUSED", "1")  # even forced
        assert not _use_fused_degrade(cfg, "independent", "base_momentum", False)
        monkeypatch.delenv("MDT_PALLAS_FUSED", raising=False)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(jax, "device_count", lambda: 1)
        assert not _use_fused_degrade(cfg, "independent", "base_momentum", False)
        assert _use_fused_degrade(
            cfg.replace(data_size=128), "independent", "base_momentum", False
        )

    def test_fused_update_pads_sub8_batches(self):
        """Batches not divisible by 8 are row-padded (Mosaic rejects sublane
        blocks < 8); outputs are sliced back to the real batch. Interpret
        mode stubs the PRNG (all-zero bits -> every draw TIES, so the
        exact_k_degrade tie correction selects exactly k lane-first pixels),
        checking shape plumbing + exact-k counts, not mask distributions
        (those are covered on real TPUs by benchmarks/check_fused_tpu.py)."""
        import jax
        import jax.numpy as jnp

        from masked_diffusion_tpu.ops.pallas.fused_degrade import (
            fused_degrade_update,
        )

        b, s = 5, 16
        xt = jnp.full((b, s, s, 3), 2.0)
        x0 = jnp.ones((b, s, s, 3))
        amt = jnp.full((b,), float(s * s // 2))
        amn = jnp.full((b,), float(s * s // 3))
        out, mask = fused_degrade_update(
            jax.random.PRNGKey(0), xt, x0, amt, amn, select="indexing",
            mean_mode="degraded_area", rule="base_momentum", interpret=True,
        )
        assert out.shape == (b, s, s, 3)
        assert mask.shape == (b, s, s, 3)
        # zero-bit PRNG stub: all draws tie, so exact_k_degrade degrades the
        # first k lane-order pixels. x0 is CONSTANT 1, so the image-wise
        # degraded-area mean is 1 and D(x0,t) == D(x0,t-1) == x0 regardless
        # of the masks — the cold-diffusion update collapses to out == xt
        np.testing.assert_allclose(np.asarray(out), np.asarray(xt), atol=1e-6)
        kn = s * s // 3
        mask_np = np.asarray(mask)
        flat = mask_np[..., 0].reshape(b, s * s)
        np.testing.assert_array_equal(flat[:, :kn], 0.0)  # exact-k lane-first
        np.testing.assert_array_equal(flat[:, kn:], 1.0)
        # channel broadcast intact
        np.testing.assert_array_equal(mask_np[..., 1], mask_np[..., 0])
        np.testing.assert_array_equal(mask_np[..., 2], mask_np[..., 0])

    def test_fused_gate_auto_on_indexing_single_tpu(self, monkeypatch):
        """Auto-on (no env): indexing + TPU + single device only — the
        measured in-loop win (docs/PERFORMANCE.md: 14.04 vs 14.51 ms/step);
        thresholding tied and stays off; multi-device meshes stay on the
        XLA path (pallas_call has no GSPMD partitioning rule)."""
        import jax

        from masked_diffusion_tpu.config import Config
        from masked_diffusion_tpu.sample import loop as loop_mod

        cfg = Config(
            select_degrade_pixel="indexing", degrade_channel="1-channel",
            mean_option="degraded_area", mean_area="image-wise",
        )
        monkeypatch.delenv("MDT_PALLAS_FUSED", raising=False)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(jax, "device_count", lambda: 1)
        assert loop_mod._use_fused_degrade(cfg, "independent", "base_momentum", False)
        cfg_thr = cfg.replace(select_degrade_pixel="thresholding")
        assert not loop_mod._use_fused_degrade(cfg_thr, "independent", "base_momentum", False)
        monkeypatch.setattr(jax, "device_count", lambda: 8)
        assert not loop_mod._use_fused_degrade(cfg, "independent", "base_momentum", False)
        monkeypatch.setattr(jax, "device_count", lambda: 1)
        monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
        assert not loop_mod._use_fused_degrade(cfg, "independent", "base_momentum", False)
        # env force wins over platform gating in both directions
        monkeypatch.setenv("MDT_PALLAS_FUSED", "1")
        assert loop_mod._use_fused_degrade(cfg, "independent", "base_momentum", False)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setenv("MDT_PALLAS_FUSED", "0")
        assert not loop_mod._use_fused_degrade(cfg, "independent", "base_momentum", False)
