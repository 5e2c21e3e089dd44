"""Pallas k-mask kernel: threshold-search logic on CPU (injected bits) and,
when a TPU is present, the compiled kernel's exactness.

The TPU interpreter stubs pltpu.prng_random_bits to zeros, so the PRNG-driven
kernel can only be exercised end-to-end on hardware; the greedy order-
statistic search — the part that replaces the argsorts — is pure jnp and
tested here directly. Hardware checks live in benchmarks/check_pallas_tpu.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from masked_diffusion_tpu.ops.pallas.kmask import greedy_kth_threshold


class TestGreedyThreshold:
    @pytest.mark.parametrize("k", [0, 1, 7, 63, 64])
    def test_matches_order_statistic(self, k):
        rng = np.random.default_rng(0)
        s = rng.integers(0, 2**32, size=(8, 8), dtype=np.uint32)
        t = np.uint32(greedy_kth_threshold(jnp.asarray(s), jnp.int32(k)))
        selected = int((s < t).sum())
        assert selected == min(k, s.size)
        if k < s.size:
            # T is exactly the k-th smallest value (0-indexed)
            assert t == np.sort(s.ravel())[k]

    def test_with_padding_sentinels(self):
        rng = np.random.default_rng(1)
        s = rng.integers(0, 2**31, size=(8, 16), dtype=np.uint32)
        s_pad = s.copy()
        s_pad[:, 12:] = np.uint32(0xFFFFFFFF)  # 32 padded slots
        real = s_pad[:, :12]
        k = 10
        t = np.uint32(greedy_kth_threshold(jnp.asarray(s_pad), jnp.int32(k)))
        assert int((s_pad < t).sum()) == k
        # only real slots selected
        assert int((s_pad[:, 12:] < t).sum()) == 0

    def test_select_all_real(self):
        rng = np.random.default_rng(2)
        s = rng.integers(0, 2**31, size=(8, 16), dtype=np.uint32)
        s[:, 12:] = np.uint32(0xFFFFFFFF)
        k = 8 * 12  # every real slot
        t = np.uint32(greedy_kth_threshold(jnp.asarray(s), jnp.int32(k)))
        assert int((s < t).sum()) == k


class TestAutoOnGating:
    """_use_pallas_kmask: auto-on at hw >= 16384 on TPU only (measured
    crossover, docs/PERFORMANCE.md); MDT_PALLAS_KMASK=1/0 forces."""

    def test_cpu_backend_never_uses_kernel(self, monkeypatch):
        from masked_diffusion_tpu.ops.degrade import _use_pallas_kmask

        # tests run on the CPU backend: even forced-on or above-threshold
        # shapes stay on the XLA path
        monkeypatch.setenv("MDT_PALLAS_KMASK", "1")
        assert _use_pallas_kmask(1 << 20) is False

    def test_env_and_threshold_logic(self, monkeypatch):
        import masked_diffusion_tpu.ops.degrade as degrade_mod

        # isolate the pure gating logic from the backend/device checks
        monkeypatch.setattr("jax.default_backend", lambda: "tpu", raising=True)
        monkeypatch.setattr("jax.device_count", lambda: 1, raising=True)
        monkeypatch.delenv("MDT_PALLAS_KMASK", raising=False)
        assert degrade_mod._use_pallas_kmask(128 * 128) is True
        assert degrade_mod._use_pallas_kmask(64 * 64) is False
        monkeypatch.setenv("MDT_PALLAS_KMASK", "0")
        assert degrade_mod._use_pallas_kmask(128 * 128) is False
        monkeypatch.setenv("MDT_PALLAS_KMASK", "1")
        assert degrade_mod._use_pallas_kmask(64 * 64) is True

    def test_multi_device_mesh_disables_auto_on(self, monkeypatch):
        """pallas_call has no GSPMD partitioning rule: auto-on is gated to a
        single visible device (ADVICE r2); the env override still forces."""
        import masked_diffusion_tpu.ops.degrade as degrade_mod

        monkeypatch.setattr("jax.default_backend", lambda: "tpu", raising=True)
        monkeypatch.setattr("jax.device_count", lambda: 8, raising=True)
        monkeypatch.delenv("MDT_PALLAS_KMASK", raising=False)
        assert degrade_mod._use_pallas_kmask(128 * 128) is False
        monkeypatch.setenv("MDT_PALLAS_KMASK", "1")
        assert degrade_mod._use_pallas_kmask(128 * 128) is True
