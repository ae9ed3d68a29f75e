"""Multi-aspect bucketing + precomputed-embedding caches.

Capability parity with the reference's vendored SimpleTuner data stack
(/root/reference/videotuna/third_party/flux/multiaspect/sampler.py:639 —
aspect-ratio bucket sampler; caching/vae.py:1106 + caching/text_embeds.py:
1428 — precomputed VAE latents and text embeddings) and the joint
image+video co-training loaders (videotuna/data/lightningdata.py:112-125).

TPU framing: static shapes are mandatory under jit, so bucketing is not an
optimization here but the mechanism that makes mixed-aspect datasets
trainable at all — each bucket is its own (H, W) jit specialization, batches
never mix buckets. The caches turn the input pipeline into pure array loads
(the reference encodes inside training_step, serializing VAE+text encoders
with the DiT step — SURVEY.md hard part #6).
"""

from __future__ import annotations

import hashlib
import json
import os
import random
from pathlib import Path
from typing import (Any, Callable, Dict, Iterator, List, Optional,
                    Sequence, Tuple)

import numpy as np

# (height, width) buckets ~1MP and below, the SimpleTuner default family
DEFAULT_BUCKETS: Tuple[Tuple[int, int], ...] = (
    (1024, 1024), (1152, 896), (896, 1152), (1216, 832), (832, 1216),
    (768, 1344), (1344, 768), (512, 512), (576, 448), (448, 576),
    (640, 384), (384, 640),
)


def nearest_bucket(h: int, w: int,
                   buckets: Sequence[Tuple[int, int]] = DEFAULT_BUCKETS
                   ) -> Tuple[int, int]:
    """Bucket with the closest log-aspect ratio (area tie-break)."""
    ar = np.log(h / w)
    return min(buckets,
               key=lambda b: (abs(np.log(b[0] / b[1]) - ar),
                              abs(b[0] * b[1] - h * w)))


class AspectBucketSampler:
    """Group sample indices by bucket; yield single-bucket batches.

    ``meta`` gives (h, w) per sample (from the CSV's height/width columns or
    probed lazily). Incomplete tail batches are dropped per bucket (static
    shapes)."""

    def __init__(self, sizes: Sequence[Tuple[int, int]], batch_size: int,
                 buckets: Sequence[Tuple[int, int]] = DEFAULT_BUCKETS,
                 seed: int = 0, shuffle: bool = True):
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.assignment: Dict[Tuple[int, int], List[int]] = {}
        for idx, (h, w) in enumerate(sizes):
            b = nearest_bucket(h, w, buckets)
            self.assignment.setdefault(b, []).append(idx)
        self._epoch = 0

    def __iter__(self) -> Iterator[Tuple[Tuple[int, int], List[int]]]:
        rng = random.Random(self.seed + self._epoch)
        self._epoch += 1
        batches = []
        for bucket, idxs in self.assignment.items():
            idxs = list(idxs)
            if self.shuffle:
                rng.shuffle(idxs)
            for i in range(0, len(idxs) - self.batch_size + 1,
                           self.batch_size):
                batches.append((bucket, idxs[i:i + self.batch_size]))
        if self.shuffle:
            rng.shuffle(batches)
        return iter(batches)

    def __len__(self) -> int:
        return sum(len(v) // self.batch_size
                   for v in self.assignment.values())


# ---------------------------------------------------------------------------
# Precompute caches
# ---------------------------------------------------------------------------

class ArrayCache:
    """Disk cache of numpy arrays keyed by content hash (the VAE-latent /
    text-embedding cache pattern)."""

    def __init__(self, cache_dir: str):
        self.dir = Path(cache_dir)
        self.dir.mkdir(parents=True, exist_ok=True)

    @staticmethod
    def key_of(*parts: str) -> str:
        return hashlib.sha1("||".join(parts).encode()).hexdigest()[:24]

    def path(self, key: str) -> Path:
        return self.dir / f"{key}.npy"

    def get(self, key: str) -> Optional[np.ndarray]:
        p = self.path(key)
        return np.load(p) if p.exists() else None

    def put(self, key: str, value: np.ndarray) -> None:
        np.save(self.path(key), np.asarray(value))

    def get_or_compute(self, key: str,
                       fn: Callable[[], np.ndarray]) -> np.ndarray:
        v = self.get(key)
        if v is None:
            v = np.asarray(fn())
            self.put(key, v)
        return v


def precompute_text_embeddings(flow, prompts: Sequence[str],
                               cache_dir: str) -> Dict[str, str]:
    """Encode unique prompts once; returns {prompt: cache key}."""
    cache = ArrayCache(cache_dir)
    mapping = {}
    for p in sorted(set(prompts)):
        key = cache.key_of("text", p)
        if cache.get(key) is None:
            cond = flow.encode_text(flow.params, [p])
            cache.put(key, np.asarray(cond["y"][0]))
        mapping[p] = key
    return mapping


def precompute_latents(flow, dataset, cache_dir: str,
                       max_items: Optional[int] = None) -> int:
    """VAE-encode dataset videos once (mode, not sample — deterministic)."""
    import jax
    cache = ArrayCache(cache_dir)
    n = 0
    total = len(dataset) if max_items is None else min(len(dataset),
                                                       max_items)
    for i in range(total):
        item = dataset[i]
        key = cache.key_of("latent", item["path"],
                           str(item["video"].shape))
        if cache.get(key) is None:
            z = flow.encode_video(flow.params, item["video"][None],
                                  jax.random.key(0))
            cache.put(key, np.asarray(z[0]))
            n += 1
    return n


class JointLoader:
    """Interleave batches from several datasets (image + video co-training,
    reference lightningdata.py:112-125): each __iter__ round-robins the
    child loaders by the given ratios."""

    def __init__(self, loaders: Sequence, ratios: Optional[Sequence[int]]
                 = None):
        self.loaders = list(loaders)
        self.ratios = list(ratios or [1] * len(loaders))

    def __iter__(self):
        iters = [iter(l) for l in self.loaders]
        alive = [True] * len(iters)
        while any(alive):
            for li, (it, r) in enumerate(zip(iters, self.ratios)):
                if not alive[li]:
                    continue
                for _ in range(r):
                    try:
                        yield next(it)
                    except StopIteration:
                        alive[li] = False
                        break

    def __len__(self):
        return sum(len(l) for l in self.loaders)
