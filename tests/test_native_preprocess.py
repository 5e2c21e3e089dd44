"""Native C++ preprocessing library: builds via g++, matches the numpy
bilinear reference, and survives toolchain absence (fallback contract)."""

import numpy as np
import pytest

from masked_diffusion_tpu import native
from masked_diffusion_tpu.data.datasets import _bilinear_resize


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("no native toolchain in this environment")
    return True


def test_single_image_matches_numpy(lib_available):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (37, 53, 3), dtype=np.uint8)
    out = native.resize_center_crop_native(img, 16)
    assert out.shape == (16, 16, 3)

    # numpy reference: same short-side resize + center crop + [0,1]
    h, w = img.shape[:2]
    size = 16
    nh, nw = size, max(size, int(round(w * size / h)))
    ref = _bilinear_resize(img.astype(np.float32), nh, nw) / 255.0
    top = (ref.shape[0] - size) // 2
    left = (ref.shape[1] - size) // 2
    ref = ref[top : top + size, left : left + size]
    np.testing.assert_allclose(out, ref, atol=2e-2)  # uint8 rounding paths


def test_upscale_border_matches_numpy(lib_available):
    """Regression: weights must be computed AFTER index clamping — an
    upscale's border rows/cols replicate the edge, never blend it with its
    neighbor (28->32 mnist-style upscale, the default training path)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (28, 28, 1), dtype=np.uint8)
    out = native.resize_center_crop_native(img, 32)
    ref = _bilinear_resize(img.astype(np.float32), 32, 32) / 255.0
    np.testing.assert_allclose(out, ref, atol=1e-2)


def test_batch_matches_single(lib_available):
    rng = np.random.default_rng(1)
    batch = rng.integers(0, 255, (8, 28, 28, 1), dtype=np.uint8)
    out = native.preprocess_batch_native(batch, 32, to_pm1=True)
    assert out.shape == (8, 32, 32, 1)
    one = native.resize_center_crop_native(batch[0], 32, to_pm1=True)
    np.testing.assert_allclose(out[0], one, atol=1e-6)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_grayscale_and_float_inputs(lib_available):
    img = np.random.default_rng(2).uniform(0, 1, (20, 20)).astype(np.float32)
    out = native.resize_center_crop_native(img, 8)
    assert out.shape == (8, 8, 1)
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_disable_env(monkeypatch):
    # fallback contract: with the native path disabled the loaders still work
    monkeypatch.setenv("MDT_DISABLE_NATIVE", "1")
    monkeypatch.setattr(native, "_TRIED", False)
    monkeypatch.setattr(native, "_LIB", None)
    assert native.get_lib() is None
    assert native.resize_center_crop_native(np.zeros((8, 8, 3), np.uint8), 4) is None
    monkeypatch.setattr(native, "_TRIED", False)
