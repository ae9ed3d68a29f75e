"""Profiling helper tests."""

import time

import pytest

from videotuna_tpu.core.profiling import (StepClock, flops_estimate_dit, mfu)


class TestStepClock:
    def test_summary_excludes_warmup(self):
        clock = StepClock(warmup=1)
        durations = [0.2, 0.01, 0.01, 0.01]
        for d in durations:
            with clock:
                time.sleep(d)
        s = clock.summary()
        assert s["steps"] == 3
        assert s["mean_s"] < 0.1          # warmup excluded
        assert s["p50_s"] <= s["p90_s"]
        assert s["steps_per_sec"] > 5


class TestFlops:
    def test_dit_estimate_scales(self):
        small = flops_estimate_dit(1, 1024, 512, 12)
        big = flops_estimate_dit(1, 1024, 1024, 12)
        assert big > 3 * small            # ~quadratic in dim

    def test_mfu_bounds(self):
        # 100 TFLOP step in 1s on a 197 TFLOP/s chip → ~0.51 MFU
        assert abs(mfu(100e12, 1.0) - 0.5076) < 1e-3


def test_measure_mfu_and_compiled_flops():
    import jax.numpy as jnp
    from videotuna_tpu.core.profiling import compiled_flops, measure_mfu

    def f(a, b):
        return a @ b

    a = jnp.ones((128, 256))
    b = jnp.ones((256, 64))
    fl = compiled_flops(f, a, b)
    if fl is not None:                   # CPU backend provides a cost model
        assert fl >= 2 * 128 * 256 * 64 * 0.5
    res = measure_mfu(f, (a, b), n_steps=3, flops_per_step=fl)
    assert res["steps_per_sec"] > 0
    if fl is not None:
        assert 0 < res["mfu"] < 1e6
