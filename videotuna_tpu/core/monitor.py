"""Resource monitoring & run metrics.

Parity with the reference's ``monitor_resources`` decorator and metric.json
persistence (videotuna/utils/common_utils.py:157-216,
base/inference_base.py:117-128), upgraded for TPU: wall time, host RSS delta,
and per-device HBM stats from ``jax.local_devices()[i].memory_stats()``.
"""

from __future__ import annotations

import functools
import json
import os
import time
from typing import Any, Callable, Dict, Optional

import jax

try:
    import psutil
except ImportError:  # pragma: no cover
    psutil = None


def device_memory_stats() -> Dict[str, Any]:
    stats: Dict[str, Any] = {}
    try:
        for i, d in enumerate(jax.local_devices()):
            ms = d.memory_stats()
            if ms:
                stats[f"device_{i}"] = {
                    "bytes_in_use": ms.get("bytes_in_use"),
                    "peak_bytes_in_use": ms.get("peak_bytes_in_use"),
                    "bytes_limit": ms.get("bytes_limit"),
                }
    except Exception:
        pass
    return stats


def monitor_resources(return_metrics: bool = True) -> Callable:
    """Decorator capturing wall time / RSS delta / peak HBM per call."""

    def deco(fn: Callable) -> Callable:
        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            rss0 = psutil.Process().memory_info().rss if psutil else 0
            t0 = time.perf_counter()
            result = fn(*args, **kwargs)
            elapsed = time.perf_counter() - t0
            rss1 = psutil.Process().memory_info().rss if psutil else 0
            metrics = {
                "time_sec": round(elapsed, 3),
                "cpu_rss_delta_mb": round((rss1 - rss0) / 1e6, 1),
                "device_memory": device_memory_stats(),
            }
            if return_metrics:
                return result, metrics
            return result
        return wrapped

    return deco


def save_metrics(metrics: Dict[str, Any], savedir: str,
                 config: Optional[Dict[str, Any]] = None,
                 filename: str = "metric.json") -> str:
    """Write metric.json per run (reference inference_base.py:117-128)."""
    os.makedirs(savedir, exist_ok=True)
    payload = dict(metrics)
    if config is not None:
        payload["config"] = _jsonable(config)
    path = os.path.join(savedir, filename)
    with open(path, "w") as f:
        json.dump(payload, f, indent=2, default=str)
    return path


def _jsonable(obj: Any) -> Any:
    try:
        json.dumps(obj)
        return obj
    except TypeError:
        if isinstance(obj, dict):
            return {k: _jsonable(v) for k, v in obj.items()}
        if isinstance(obj, (list, tuple)):
            return [_jsonable(v) for v in obj]
        return str(obj)


class StepTimer:
    """Per-step timing with compile-step exclusion; feeds bench.py."""

    def __init__(self):
        self.times: list[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is not None:
            self.times.append(time.perf_counter() - self._t0)
            self._t0 = None

    def steady_state_mean(self, skip: int = 1) -> float:
        ts = self.times[skip:] if len(self.times) > skip else self.times
        return sum(ts) / max(len(ts), 1)
