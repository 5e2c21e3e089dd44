"""Schedule-table semantics vs reference scheduler.py:27-192,780-794."""

import numpy as np
import pytest

from masked_diffusion_tpu.ops.schedule import (
    build_schedule,
    exponential_schedule,
    linear_schedule,
    log_schedule,
    sigmoid_schedule,
)


class TestScheduleTables:
    def test_linear_endpoints(self):
        t = linear_schedule(100)
        assert t[0] == pytest.approx(1e-3)
        assert t[-1] == pytest.approx(1.0)
        assert len(t) == 100
        assert np.all(np.diff(t) > 0)

    def test_exponential_endpoints(self):
        t = exponential_schedule(100, base=10.0)
        assert t[-1] == pytest.approx(1.0)
        assert t[0] == pytest.approx(0.1)  # base**0 / base**1
        assert np.all(np.diff(t) > 0)

    def test_log_dedup_and_endpoint(self):
        # 32x32 image, request 1000 steps -> dedup shrinks T below 1000
        t = log_schedule(1000, image_size=32 * 32)
        assert t.dtype.kind == "i" or np.issubdtype(t.dtype, np.integer)
        assert len(t) < 1000
        assert len(set(t.tolist())) == len(t)  # unique
        assert np.all(np.diff(t) > 0)  # strictly increasing
        assert t[-1] == 32 * 32  # forced last = image_size
        assert t[0] >= 1

    def test_log_reference_values_small(self):
        # Hand-checked against the reference formula for T=10 on a 4x4 image
        image_size = 16
        x = np.linspace(1, image_size, 10)
        v = np.log(x)
        v = v - v.min() + 1
        v = v * (image_size / v.max())
        expected = np.array(sorted(set(np.asarray(v, dtype=int).tolist())))
        expected[-1] = image_size
        got = log_schedule(10, image_size)
        np.testing.assert_array_equal(got, expected)

    def test_sigmoid_endpoints(self):
        t = sigmoid_schedule(1000, base=1.5, image_size=64 * 64)
        assert t[0] == 1
        assert t[-1] == 64 * 64
        assert np.all(np.diff(t) > 0)

    def test_log_too_many_steps_raises(self):
        with pytest.raises(ValueError):
            log_schedule(17, image_size=16)


class TestBuildSchedule:
    def test_log_ratio_list_is_counts_over_size(self):
        s = build_schedule("log", 100, data_size=32)
        np.testing.assert_allclose(s.ratios, s.table / (32 * 32))
        assert s.num_steps == len(s.table)

    def test_sigmoid_ratio_list_is_counts(self):
        # reference scheduler.py:54-58: only log divides by image_size
        s = build_schedule("sigmoid", 100, data_size=32)
        np.testing.assert_array_equal(s.ratios, s.table)

    def test_indexing_with_linear_raises(self):
        with pytest.raises(ValueError):
            build_schedule("linear", 100, 32, select_degrade_pixel="indexing")

    def test_thresholding_with_sigmoid_raises(self):
        with pytest.raises(ValueError):
            build_schedule("sigmoid", 100, 32, select_degrade_pixel="thresholding")

    def test_degrade_amount_one_indexed(self):
        s = build_schedule("log", 100, data_size=32)
        amt = np.asarray(s.degrade_amount(np.array([1, s.num_steps])))
        assert amt[0] == s.table[0]
        assert amt[1] == s.table[-1] == 32 * 32

    def test_thresholding_amount_is_ratio(self):
        s = build_schedule("linear", 50, data_size=8, select_degrade_pixel="thresholding")
        amt = np.asarray(s.degrade_amount(np.array([1, 50])))
        assert amt[0] == pytest.approx(1e-3)
        assert amt[1] == pytest.approx(1.0)


class TestCurriculum:
    def test_scale_one_uses_all(self):
        s = build_schedule("log", 100, data_size=32)
        used = s.timesteps_for_epoch(0, epoch_length=10, scale=1)
        np.testing.assert_array_equal(used, np.arange(1, s.num_steps + 1))

    def test_last_forced_to_T(self):
        s = build_schedule("log", 200, data_size=32)
        for epoch in range(10):
            used = s.timesteps_for_epoch(epoch, epoch_length=10, scale=3)
            assert used[-1] == s.num_steps

    def test_hierarchical_doubling(self):
        s = build_schedule("sigmoid", 500, data_size=32)
        T = s.num_steps
        # scale=3, epoch_length=9: sections are epochs 0-2 / 3-5 / 6-8
        early = s.timesteps_for_epoch(0, 9, scale=3)  # every 4th
        mid = s.timesteps_for_epoch(3, 9, scale=3)  # every 2nd
        late = s.timesteps_for_epoch(6, 9, scale=3)  # every step
        expected_early = [i for i in range(1, T + 1) if i % 4 == 0]
        expected_early[-1] = T
        np.testing.assert_array_equal(early, expected_early)
        assert len(late) == T
        assert len(mid) < len(late)
        assert len(early) < len(mid)

    def test_section_overflow_falls_back_to_every_step(self):
        # reference scheduler.py:185-188 ValueError fallback
        s = build_schedule("log", 100, data_size=32)
        used = s.timesteps_for_epoch(99, epoch_length=10, scale=2)
        assert len(used) == s.num_steps


class TestLossWeights:
    def test_weight_endpoints(self):
        s = build_schedule("log", 100, data_size=32)
        table = np.asarray(s.loss_weight_table(10.0))
        assert table[0] == pytest.approx(10.0)
        assert table[-1] == pytest.approx(1.0)
        assert np.all(np.diff(table) < 0)

    def test_indexed_by_timeindex(self):
        s = build_schedule("log", 100, data_size=32)
        w = np.asarray(s.loss_weights(np.array([0, s.num_steps - 1]), 2.0))
        assert w[0] == pytest.approx(2.0)
        assert w[1] == pytest.approx(1.0)
