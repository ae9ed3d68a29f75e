"""Host-side video/image IO.

Replaces the reference's decord/torchvision/imageio stack
(videotuna/utils/save_video.py:68-150, data/datasets_utils.py) with OpenCV —
the only codec-capable library in this image. All device arrays are
channel-last float in [-1, 1]; conversion to uint8 happens here on host.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def to_uint8(video: np.ndarray) -> np.ndarray:
    """float [-1,1] (T, H, W, 3) → uint8 RGB."""
    video = np.asarray(video, dtype=np.float32)
    video = (np.clip(video, -1.0, 1.0) + 1.0) * 127.5
    return video.astype(np.uint8)


def save_video(video: np.ndarray, path: str, fps: int = 8) -> str:
    """(T, H, W, 3) float [-1,1] or uint8 → mp4 (reference tensor_to_mp4,
    save_video.py:68). Falls back to .npy when no codec is available."""
    path = str(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = video if video.dtype == np.uint8 else to_uint8(video)
    t, h, w, _ = arr.shape
    if cv2 is not None:
        writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                                 fps, (w, h))
        if writer.isOpened():
            for frame in arr:
                writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
            writer.release()
            return path
    np.save(path + ".npy", arr)
    return path + ".npy"


def save_image(img: np.ndarray, path: str) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = img if img.dtype == np.uint8 else to_uint8(img[None])[0]
    if cv2 is not None:
        cv2.imwrite(str(path), cv2.cvtColor(arr, cv2.COLOR_RGB2BGR))
        return str(path)
    np.save(str(path) + ".npy", arr)
    return str(path) + ".npy"


def load_video(path: str, num_frames: Optional[int] = None,
               stride: int = 1) -> np.ndarray:
    """mp4 → (T, H, W, 3) uint8 RGB."""
    if str(path).endswith(".npy"):
        return np.load(path)
    if cv2 is None:
        raise RuntimeError("cv2 unavailable; cannot decode video")
    cap = cv2.VideoCapture(str(path))
    frames: List[np.ndarray] = []
    idx = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if idx % stride == 0:
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        idx += 1
        if num_frames is not None and len(frames) >= num_frames:
            break
    cap.release()
    if not frames:
        raise ValueError(f"No frames decoded from {path}")
    return np.stack(frames)


def load_image(path: str) -> np.ndarray:
    if str(path).endswith(".npy"):
        return np.load(path)
    if cv2 is None:
        raise RuntimeError("cv2 unavailable")
    img = cv2.imread(str(path))
    if img is None:
        raise ValueError(f"Failed to read image {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def video_grid(videos: Sequence[np.ndarray], ncols: int = 4) -> np.ndarray:
    """Stack N same-shape videos into one grid video (reference
    save_video.py frame grids)."""
    videos = [v if v.dtype == np.uint8 else to_uint8(v) for v in videos]
    n = len(videos)
    ncols = min(ncols, n)
    nrows = (n + ncols - 1) // ncols
    t, h, w, c = videos[0].shape
    grid = np.zeros((t, nrows * h, ncols * w, c), np.uint8)
    for i, v in enumerate(videos):
        r, col = divmod(i, ncols)
        grid[:, r * h:(r + 1) * h, col * w:(col + 1) * w] = v
    return grid
