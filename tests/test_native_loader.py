"""Native frameproc tests: builds, matches the numpy path, and is used as
the transform fast path."""

import numpy as np
import pytest

from videotuna_tpu.data import native_loader


@pytest.fixture(scope="module")
def have_native():
    ok = native_loader.native_available()
    if not ok:
        pytest.skip("native toolchain unavailable")
    return ok


class TestNative:
    def test_normalize_matches_numpy(self, have_native):
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 256, (3, 16, 16, 3), dtype=np.uint8)
        out = native_loader.normalize(frames)
        ref = frames.astype(np.float32) / 127.5 - 1.0
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_crop_resize_range_and_shape(self, have_native):
        rng = np.random.default_rng(1)
        frames = rng.integers(0, 256, (4, 37, 53, 3), dtype=np.uint8)
        out = native_loader.crop_resize_normalize(frames, (32, 32))
        assert out.shape == (4, 32, 32, 3)
        assert out.dtype == np.float32
        assert out.min() >= -1.0 and out.max() <= 1.0

    def test_resize_identity_when_same_size(self, have_native):
        rng = np.random.default_rng(2)
        frames = rng.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8)
        out = native_loader.crop_resize_normalize(frames, (16, 16))
        ref = frames.astype(np.float32) / 127.5 - 1.0
        np.testing.assert_allclose(out, ref, atol=2e-2)

    def test_constant_image_resize_exact(self, have_native):
        frames = np.full((1, 40, 60, 3), 200, np.uint8)
        out = native_loader.crop_resize_normalize(frames, (24, 24))
        np.testing.assert_allclose(out, 200 / 127.5 - 1.0, atol=1e-5)

    def test_threads_consistent(self, have_native):
        rng = np.random.default_rng(3)
        frames = rng.integers(0, 256, (8, 33, 47, 3), dtype=np.uint8)
        a = native_loader.crop_resize_normalize(frames, (16, 16), threads=1)
        b = native_loader.crop_resize_normalize(frames, (16, 16), threads=8)
        np.testing.assert_array_equal(a, b)
