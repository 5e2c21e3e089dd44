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
