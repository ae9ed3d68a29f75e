"""Profiling & tracing — the upgrade over the reference's wall-clock-only
monitoring (SURVEY.md §5.1: no torch.profiler/nsight anywhere in the tree).

- ``trace(logdir)``: jax.profiler trace context (XPlane, viewable in
  TensorBoard/Perfetto) around any region — training steps, a sampler loop.
- ``annotate(name)``: named TraceAnnotation for device-timeline labels.
- ``step_metrics``: per-step wall time + derived throughput columns used by
  the Trainer's metrics history and bench.py.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device+host profile into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region on the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepClock:
    """Per-step timing with warmup exclusion and percentile summary."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: list = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        self._t0 = None

    def summary(self) -> Dict[str, float]:
        steady = self.times[self.warmup:] or self.times
        if not steady:
            return {}
        s = sorted(steady)
        n = len(s)
        return {
            "steps": n,
            "mean_s": sum(s) / n,
            "p50_s": s[n // 2],
            "p90_s": s[min(int(n * 0.9), n - 1)],
            "steps_per_sec": n / sum(s),
        }


def flops_estimate_dit(batch: int, seq: int, dim: int, layers: int,
                       mlp_ratio: float = 4.0,
                       text_len: int = 0) -> float:
    """Rough forward FLOPs for a DiT: attention + MLP per layer (used to
    report MFU next to step time)."""
    s = seq + text_len
    attn = 4 * batch * s * dim * dim + 2 * batch * s * s * dim
    mlp = 2 * batch * s * dim * int(dim * mlp_ratio) * 2
    return float(layers * (attn + mlp))


def mfu(flops_per_step: float, step_time_s: float,
        peak_flops: float = 197e12) -> float:
    """Model FLOPs utilization vs chip peak (default: v5e bf16 197 TFLOPs)."""
    return flops_per_step / (step_time_s * peak_flops)


def compiled_flops(fn, *args, **kwargs) -> Optional[float]:
    """XLA's own FLOP count for ``jax.jit(fn)`` at these shapes (via
    ``compiled.cost_analysis()``) — the measured-MFU companion to the
    analytic ``flops_estimate_dit``. Returns None when the backend
    provides no cost model."""
    import jax
    try:
        compiled = jax.jit(fn).lower(*args, **kwargs).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):              # some backends: per-device
            cost = cost[0] if cost else {}
        f = cost.get("flops")
        return float(f) if f and f > 0 else None
    except Exception:
        return None


def measure_mfu(fn, args, n_steps: int = 10,
                peak_flops: float = 197e12,
                flops_per_step: Optional[float] = None) -> Dict[str, float]:
    """Time a jitted step and report measured MFU: XLA-counted (or given)
    FLOPs / elapsed / peak."""
    import time as _time

    import jax
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = _time.perf_counter()
    for _ in range(n_steps):
        out = jfn(*args)
    jax.block_until_ready(out)
    dt = (_time.perf_counter() - t0) / n_steps
    fl = flops_per_step or compiled_flops(fn, *args)
    res = {"step_time_s": dt, "steps_per_sec": 1.0 / dt}
    if fl:
        res["flops_per_step"] = fl
        res["mfu"] = mfu(fl, dt, peak_flops)
    return res
