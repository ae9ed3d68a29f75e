"""Datasets: CSV-annotated videos/images + file-list format + loaders.

Parity with the reference data layer (SURVEY.md §2.4):
- ``DatasetFromCSV`` (reference data/datasets.py:28): CSV of
  ``path,caption[,fps,frames,height,width]``, multi-CSV concat, multi-res
  metadata, train/val split, bad-sample retry with safe-list
  (datasets.py:210-230), i2v first-frame extraction.
- ``VideoDataset`` file-list format (data/cogvideo_dataset.py:14):
  ``videos.txt`` + ``labels.txt`` [+ frame skip/limit, 4k+1 truncation].
- A simple epoch loader with shuffling and static-shape batching
  (replaces Lightning's DataLoader assembly, data/lightningdata.py:70).
"""

from __future__ import annotations

import os
import random
from pathlib import Path
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from videotuna_tpu.core.registry import register
from videotuna_tpu.data.transforms import (Compose, LoadDummyImage,
                                           LoadDummyVideo, LoadImage,
                                           LoadVideo, get_transforms_image,
                                           get_transforms_video)

VIDEO_EXTS = {".mp4", ".avi", ".mov", ".mkv", ".webm", ".npy"}
IMAGE_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}

MAX_RETRIES = 100  # reference datasets.py:210-230


def _read_csv(path: str) -> List[Dict[str, Any]]:
    import csv
    rows: List[Dict[str, Any]] = []
    with open(path, newline="") as f:
        reader = csv.DictReader(f)
        for row in reader:
            rows.append(dict(row))
    return rows


@register("videotuna_tpu.data.DatasetFromCSV",
          aliases=["videotuna.data.datasets.DatasetFromCSV"])
class DatasetFromCSV:
    """CSV-annotated dataset with failure-tolerant __getitem__.

    ``csv_path`` may be one path or a list (concat, reference
    datasets.py multi-CSV). Media type is inferred per row from the
    extension. ``loader``/``image_loader`` default to real decoders but tests
    swap in Load{Dummy}Video/Image (the reference pattern,
    tests/datasets/test_dataset_from_csv.py:16-19).
    """

    def __init__(self,
                 csv_path,
                 data_root: str = "",
                 num_frames: int = 16,
                 frame_interval: int = 1,
                 resolution=(256, 256),
                 split: str = "all",
                 train_ratio: float = 0.9,
                 seed: int = 0,
                 transform: Optional[Callable] = None,
                 image_transform: Optional[Callable] = None,
                 loader: Optional[Callable] = None,
                 image_loader: Optional[Callable] = None,
                 first_frame_as_cond: bool = False,
                 dummy: bool = False,
                 dummy_probs_fail: float = 0.0):
        if dummy:
            # YAML-selectable dummy loaders (the reference swaps these in
            # from tests only; exposing them in config makes CLI smoke runs
            # media-free)
            loader = loader or LoadDummyVideo(
                num_frames=max(num_frames * 2, 8),
                height=resolution[0], width=resolution[1],
                probs_fail=dummy_probs_fail)
            image_loader = image_loader or LoadDummyImage(
                height=resolution[0], width=resolution[1],
                probs_fail=dummy_probs_fail)
        paths = [csv_path] if isinstance(csv_path, (str, Path)) else \
            list(csv_path)
        self.samples: List[Dict[str, Any]] = []
        for p in paths:
            self.samples.extend(_read_csv(str(p)))
        if split in ("train", "val"):
            rng = random.Random(seed)
            idx = list(range(len(self.samples)))
            rng.shuffle(idx)
            cut = int(len(idx) * train_ratio)
            sel = idx[:cut] if split == "train" else idx[cut:]
            self.samples = [self.samples[i] for i in sorted(sel)]
        self.data_root = data_root
        self.num_frames = num_frames
        self.resolution = tuple(resolution)
        self.transform = transform or get_transforms_video(
            self.resolution, num_frames, frame_interval)
        self.image_transform = image_transform or get_transforms_image(
            self.resolution, num_frames)
        self.loader = loader or LoadVideo()
        self.image_loader = image_loader or LoadImage()
        self.first_frame_as_cond = first_frame_as_cond
        self.safe_list: List[int] = []
        self._rng = random.Random(seed)

    def __len__(self) -> int:
        return len(self.samples)

    def _path_of(self, row: Dict[str, Any]) -> str:
        p = row.get("path") or row.get("video") or row.get("file")
        return os.path.join(self.data_root, p) if self.data_root else p

    def _load_one(self, index: int) -> Dict[str, Any]:
        row = self.samples[index]
        path = self._path_of(row)
        ext = os.path.splitext(path)[1].lower()
        is_image = ext in IMAGE_EXTS
        if is_image:
            raw = self.image_loader(path)
            video = self.image_transform(raw)
        else:
            raw = self.loader(path)
            video = self.transform(raw)
        out = {
            "video": video.astype(np.float32),
            "caption": row.get("caption", row.get("text", "")),
            "path": path,
            "is_image": is_image,
        }
        if self.first_frame_as_cond:
            out["cond_image"] = video[:1].copy()
        return out

    def __getitem__(self, index: int) -> Dict[str, Any]:
        """Retry up to MAX_RETRIES on decode/shape errors, resampling from the
        safe list when available (reference datasets.py:210-230)."""
        for attempt in range(MAX_RETRIES):
            try:
                item = self._load_one(index)
                if index not in self.safe_list:
                    self.safe_list.append(index)
                return item
            except Exception:
                if self.safe_list:
                    index = self._rng.choice(self.safe_list)
                else:
                    index = self._rng.randrange(len(self.samples))
        raise RuntimeError(f"Failed to load a sample after {MAX_RETRIES} "
                           "retries")


@register("videotuna_tpu.data.VideoDataset",
          aliases=["videotuna.data.cogvideo_dataset.VideoDataset"])
class VideoDataset(DatasetFromCSV):
    """File-list format: ``videos.txt`` + ``labels.txt`` under
    ``instance_data_root`` (reference cogvideo_dataset.py:14); frames are
    truncated to 4k+1 as CogVideoX's causal VAE requires."""

    def __init__(self, instance_data_root: str, num_frames: int = 49,
                 **kwargs):
        root = Path(instance_data_root)
        videos = (root / "videos.txt").read_text().splitlines()
        labels_file = root / "labels.txt"
        prompts_file = root / "prompts.txt"
        lf = labels_file if labels_file.exists() else prompts_file
        labels = lf.read_text().splitlines() if lf.exists() \
            else [""] * len(videos)
        # 4k+1 frame truncation
        nf = ((num_frames - 1) // 4) * 4 + 1
        import csv
        import tempfile
        tmp = tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False,
                                          newline="")
        writer = csv.writer(tmp)
        writer.writerow(["path", "caption"])
        for v, l in zip(videos, labels):
            writer.writerow([v.strip(), l.strip()])
        tmp.close()
        super().__init__(tmp.name, data_root=str(root), num_frames=nf,
                         **kwargs)


class EpochLoader:
    """Shuffling batcher yielding dict-of-stacked-numpy batches.

    Static shapes per batch (drop_last) keep jit caches warm — the JAX
    replacement for Lightning's DataLoader+DataModule assembly."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self._epoch).shuffle(idx)
        self._epoch += 1
        batch: List[Dict[str, Any]] = []
        for i in idx:
            batch.append(self.dataset[i])
            if len(batch) == self.batch_size:
                yield collate(batch)
                batch = []
        if batch and not self.drop_last:
            yield collate(batch)


def collate(items: List[Dict[str, Any]]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        if isinstance(vals[0], np.ndarray):
            out[k] = np.stack(vals)
        else:
            out[k] = vals
    return out


def make_toy_csv(path: str, n: int = 128, caption: str = "toy clip",
                 ext: str = ".mp4") -> str:
    """Toy annotation file mirroring videotuna/data/anno_files."""
    import csv
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["path", "caption"])
        for i in range(n):
            w.writerow([f"toy_videos/clip_{i:03d}{ext}", f"{caption} {i}"])
    return path
