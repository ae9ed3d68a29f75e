"""bench.py north-star suite: the harness must run end-to-end at tiny dims
on CPU (the real numbers come from the driver's on-TPU run)."""

import sys


def test_bench_suite_tiny_dims():
    sys.path.insert(0, ".")
    from bench import (_bench_cogvideox5b, _bench_hunyuan13b,
                       _bench_vae_decode, _dit_flops)
    r = _bench_cogvideox5b(depth=1, n_steps=1, frames=1, hh=4, ww=4,
                           dim=32, heads=4)
    assert r["value"] > 0 and r["mfu"] >= 0

    r2 = _bench_hunyuan13b(double=1, single=2, n_steps=1, frames=1,
                           hh=4, ww=4, dim=32, heads=4)
    assert r2["value"] > 0 and r2["full_depth_steps_per_sec"] > 0

    r3 = _bench_vae_decode(frames=2, hh=4, ww=4, n_reps=1)
    assert r3["value"] > 0

    # flops formula sanity: quadratic attention term dominates at long seq
    assert _dit_flops(10_000, 64, 1, 1) > _dit_flops(1_000, 64, 1, 1) * 10


def test_bench_hunyuan_fp8_resident_tiny_dims():
    """The fp8-resident full-depth harness (chunked stages + in-jit
    dequant) must run end-to-end at tiny dims on CPU."""
    sys.path.insert(0, ".")
    from bench import _bench_hunyuan13b_fp8
    r = _bench_hunyuan13b_fp8(n_steps=1, frames=2, hh=4, ww=4, dim=32,
                              heads=4, double=4, single=8, d_chunk=2,
                              s_chunk=4)
    assert r["value"] > 0 and r["fp8_resident_gb"] >= 0
