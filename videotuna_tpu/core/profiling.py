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
