"""Device prefetcher tests: order, device residency, error propagation,
overlap."""

import time

import jax
import numpy as np
import pytest

from videotuna_tpu.data.prefetch import DevicePrefetcher


class TestPrefetcher:
    def test_order_and_residency(self):
        batches = [{"x": np.full((2, 4), i, np.float32)} for i in range(5)]
        out = list(DevicePrefetcher(batches, depth=2))
        assert len(out) == 5
        for i, b in enumerate(out):
            assert isinstance(b["x"], jax.Array)
            np.testing.assert_array_equal(np.asarray(b["x"]), i)

    def test_prepare_hook(self):
        batches = [{"x": np.ones((2,), np.float32)}] * 3
        pf = DevicePrefetcher(batches, depth=1,
                              prepare=lambda b: {"x": b["x"] * 2})
        for b in pf:
            np.testing.assert_array_equal(np.asarray(b["x"]), 2.0)

    def test_error_propagates(self):
        def gen():
            yield {"x": np.zeros((1,), np.float32)}
            raise ValueError("decode exploded")

        it = iter(DevicePrefetcher(gen(), depth=2))
        next(it)
        with pytest.raises(ValueError, match="decode exploded"):
            next(it)

    def test_overlap_hides_host_latency(self):
        """With prefetch depth 2, slow host batches overlap consumer work:
        total time ≈ max(host, consume)·N, not (host+consume)·N."""
        def slow_gen():
            for i in range(4):
                time.sleep(0.05)
                yield {"x": np.zeros((1,), np.float32)}

        t0 = time.perf_counter()
        for b in DevicePrefetcher(slow_gen(), depth=2):
            time.sleep(0.05)  # consumer work
        overlapped = time.perf_counter() - t0
        assert overlapped < 4 * 0.1 * 0.9, overlapped  # < serial time
