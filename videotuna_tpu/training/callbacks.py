"""Training callbacks: sample logging, metric CSV/TensorBoard, LR monitor.

Capability parity with the reference's callback suite
(/root/reference/videotuna/utils/callbacks.py: ``ImageLogger`` :224 renders
sample grids/videos every N batches rank-zero-only; ``CUDACallback`` :346
epoch time + peak memory; utils/train_utils.py:76-124 LearningRateMonitor +
TensorBoard/CSV loggers) re-expressed for the jit train loop: callbacks are
plain callables invoked by the Trainer at step boundaries — no framework
inversion of control.
"""

from __future__ import annotations

import csv
import json
import os
import time
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional

import jax
import numpy as np

Callback = Callable[[int, Dict[str, Any], Any], None]


class CSVMetricsLogger:
    """metrics.csv with a stable header (the reference's CSVLogger path)."""

    def __init__(self, workdir: str, filename: str = "metrics.csv"):
        self.path = Path(workdir) / filename
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._header: Optional[List[str]] = None

    def __call__(self, step: int, metrics: Dict[str, Any], state=None):
        row = {"step": step,
               **{k: float(v) for k, v in metrics.items()
                  if np.isscalar(v) or getattr(v, "ndim", 1) == 0}}
        new = self._header is None
        if new:
            self._header = list(row)
        with open(self.path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._header,
                               extrasaction="ignore")
            if new:
                w.writeheader()
            w.writerow(row)


class SampleVideoLogger:
    """Render sample videos every N steps (the ImageLogger analogue):
    calls ``sample_fn(params, step) -> (B, T, H, W, 3)`` under the flow and
    writes mp4s to ``workdir/samples``."""

    def __init__(self, workdir: str, sample_fn: Callable,
                 every_n_steps: int = 500, fps: int = 8):
        self.dir = Path(workdir) / "samples"
        self.sample_fn = sample_fn
        self.every = every_n_steps
        self.fps = fps

    def __call__(self, step: int, metrics: Dict[str, Any], state=None):
        if step % self.every != 0:
            return
        from videotuna_tpu.data.video_io import save_video
        try:
            videos = np.asarray(jax.device_get(
                self.sample_fn(state, step)))
        except Exception as e:
            print(f"[sample-logger] skipped at step {step}: {e}")
            return
        self.dir.mkdir(parents=True, exist_ok=True)
        for i, v in enumerate(videos):
            save_video(v, str(self.dir / f"step{step:07d}_{i}.mp4"),
                       fps=self.fps)


class ThroughputMonitor:
    """Step time + device memory every N steps (CUDACallback analogue)."""

    def __init__(self, workdir: str, every_n_steps: int = 50):
        self.path = Path(workdir) / "throughput.jsonl"
        self.every = every_n_steps
        self._last_time = time.perf_counter()
        self._last_step = 0

    def __call__(self, step: int, metrics: Dict[str, Any], state=None):
        if step % self.every != 0:
            return
        from videotuna_tpu.core.monitor import device_memory_stats
        now = time.perf_counter()
        ds = max(step - self._last_step, 1)
        rec = {"step": step,
               "steps_per_sec": ds / max(now - self._last_time, 1e-9),
               "device_memory": device_memory_stats()}
        self._last_time, self._last_step = now, step
        self.path.parent.mkdir(parents=True, exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


class LearningRateMonitor:
    """Record the schedule value (LearningRateMonitor analogue)."""

    def __init__(self, schedule: Callable[[int], float]):
        self.schedule = schedule
        self.history: List[tuple] = []

    def __call__(self, step: int, metrics: Dict[str, Any], state=None):
        lr = float(self.schedule(step)) if callable(self.schedule) \
            else float(self.schedule)
        metrics["lr"] = lr
        self.history.append((step, lr))
