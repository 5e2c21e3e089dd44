"""Data layer: synthetic dataset, transforms, batching, histogram."""

import numpy as np
import pytest

from masked_diffusion_tpu.data.datasets import (
    InMemoryDataset,
    get_dataset,
    make_synthetic,
    normalize_global,
    resize_center_crop,
    whiten,
)
from masked_diffusion_tpu.data.histogram import compute_mean_histogram, empty_histogram


class TestSynthetic:
    def test_deterministic(self):
        a, la = make_synthetic(8, 16, seed=3)
        b, lb = make_synthetic(8, 16, seed=3)
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(la, lb)

    def test_range_and_shape(self):
        d, l = make_synthetic(4, 16)
        assert d.shape == (4, 16, 16, 3)
        assert d.min() >= 0.0 and d.max() <= 1.0


class TestTransforms:
    def test_resize_center_crop_identity(self):
        img = np.random.default_rng(0).uniform(0, 1, (16, 16, 3)).astype(np.float32)
        out = resize_center_crop(img, 16)
        np.testing.assert_allclose(out, img)

    def test_resize_center_crop_shrinks(self):
        img = (np.random.default_rng(0).uniform(0, 1, (28, 28, 1)) * 255).astype(np.uint8)
        out = resize_center_crop(img, 16)
        assert out.shape == (16, 16, 1)
        assert 0.0 <= out.min() and out.max() <= 1.0

    def test_resize_nonsquare_short_side(self):
        img = (np.random.default_rng(0).uniform(0, 1, (40, 80, 3)) * 255).astype(np.uint8)
        out = resize_center_crop(img, 20)
        assert out.shape == (20, 20, 3)

    def test_normalize_global(self):
        x = np.array([0.0, 0.5, 1.0])
        np.testing.assert_allclose(normalize_global(x), [-1.0, 0.0, 1.0])

    def test_whiten(self):
        img = np.random.default_rng(0).uniform(0, 1, (8, 8, 3)).astype(np.float32)
        w = whiten(img)
        assert abs(w.mean()) < 1e-5
        assert abs(w.std() - 1.0) < 1e-4


class TestInMemoryDataset:
    def test_getitem_triple(self):
        ds = get_dataset("", "synthetic", 16, data_subset=True, num_data=32)
        data, label, random = ds[0]
        assert data.shape == (16, 16, 3)
        assert random.shape == (1,)  # fixed per-item random vector
        assert -1.0 <= data.min() and data.max() <= 1.0

    def test_epoch_batches_drop_last(self):
        ds = get_dataset("", "synthetic", 16, data_subset=True, num_data=10)
        rng = np.random.default_rng(0)
        batches = list(ds.epoch_batches(rng, batch_size=4))
        assert len(batches) == 2
        assert all(b.shape == (4, 16, 16, 3) for b in batches)
        assert ds.num_batches(4) == 2

    def test_shuffle_uses_rng(self):
        ds = get_dataset("", "synthetic", 16, data_subset=True, num_data=16)
        b1 = next(ds.epoch_batches(np.random.default_rng(1), 16))
        b2 = next(ds.epoch_batches(np.random.default_rng(2), 16))
        b1r = next(ds.epoch_batches(np.random.default_rng(1), 16))
        assert not np.array_equal(b1, b2)
        np.testing.assert_array_equal(b1, b1r)

    def test_missing_dataset_raises(self):
        with pytest.raises(FileNotFoundError):
            get_dataset("/nonexistent", "mnist", 32)


class TestHistogram:
    def test_image_wise(self):
        data = np.random.default_rng(0).uniform(-1, 1, (50, 8, 8, 3)).astype(np.float32)
        shape, edges, cum = compute_mean_histogram(data, bins=10, mean_area="image-wise")
        assert shape == (10,)
        assert len(edges) == 1 and edges[0].shape == (11,)
        assert cum.shape == (10,)
        assert cum[-1] == pytest.approx(1.0)
        assert np.all(np.diff(cum) >= 0)

    def test_channel_wise(self):
        data = np.random.default_rng(0).uniform(-1, 1, (50, 8, 8, 3)).astype(np.float32)
        shape, edges, cum = compute_mean_histogram(data, bins=4, mean_area="channel-wise")
        assert shape == (4, 4, 4)
        assert len(edges) == 3
        assert cum.shape == (64,)

    def test_empty(self):
        assert compute_mean_histogram.__module__  # sanity
        assert empty_histogram() == (None, None, None)


class TestDigitsDataset:
    """sklearn-digits family: the zero-egress MNIST stand-in used by the
    convergence demo (RESULTS.md)."""

    def test_load_and_preprocess(self):
        from masked_diffusion_tpu.data.datasets import get_dataset

        ds = get_dataset("", "digits", 32, data_subset=True, num_data=64)
        assert ds.data.shape == (64, 32, 32, 1)
        assert ds.data.min() >= -1.0 and ds.data.max() <= 1.0
        # real digit strokes, not blanks
        assert ds.data.std() > 0.2

    def test_label_filter(self):
        from masked_diffusion_tpu.data.datasets import get_dataset

        ds = get_dataset("", "digits", 16, data_subset=True, num_data=50,
                         label_filter=3)
        assert (ds.labels == 3).all()
