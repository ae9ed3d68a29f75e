"""Dataset-construction tools: scene cutting, captioning hooks, comparison
grids.

Capability parity with the reference ``tools/`` stack (SURVEY.md §1 L7):
- PySceneDetect scene cutting (tools/data_process/scenecut.py) → a
  content-difference detector over decoded frames (no external dep);
- LLaVA video captioning (tools/data_process/caption/, ~20k vendored LoC) →
  a captioner *hook*: any callable (frames → str); the vendored LLaVA is
  replaced by whatever VLM the deployment provides;
- side-by-side comparison grids (tools/video_comparison/combine.py).
"""

from __future__ import annotations

import csv
import os
from pathlib import Path
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from videotuna_tpu.data.video_io import load_video, save_video, video_grid

Captioner = Callable[[np.ndarray], str]


def detect_scenes(video: np.ndarray, threshold: float = 30.0,
                  min_scene_len: int = 8) -> List[Tuple[int, int]]:
    """Content-aware scene boundaries: mean absolute frame difference in
    uint8 space exceeding ``threshold`` starts a new scene (the
    PySceneDetect ContentDetector recipe without the dependency)."""
    if video.dtype != np.uint8:
        video = ((np.clip(video, -1, 1) + 1) * 127.5).astype(np.uint8)
    t = video.shape[0]
    diffs = np.mean(np.abs(np.diff(video.astype(np.int16), axis=0)),
                    axis=(1, 2, 3))
    cuts = [0]
    for i, d in enumerate(diffs):
        if d > threshold and (i + 1 - cuts[-1]) >= min_scene_len:
            cuts.append(i + 1)
    scenes = [(cuts[i], cuts[i + 1]) for i in range(len(cuts) - 1)]
    if t - cuts[-1] >= 1:
        scenes.append((cuts[-1], t))
    return scenes


def cut_video_into_scenes(video_path: str, out_dir: str,
                          threshold: float = 30.0,
                          min_scene_len: int = 8,
                          fps: int = 24) -> List[str]:
    """Decode → detect scenes → write one clip per scene."""
    video = load_video(video_path)
    scenes = detect_scenes(video, threshold, min_scene_len)
    os.makedirs(out_dir, exist_ok=True)
    stem = Path(video_path).stem
    paths = []
    for i, (a, b) in enumerate(scenes):
        p = save_video(video[a:b], os.path.join(out_dir,
                                                f"{stem}_scene{i:03d}.mp4"),
                       fps=fps)
        paths.append(p)
    return paths


def build_annotation_csv(clips_dir: str, out_csv: str,
                         captioner: Optional[Captioner] = None) -> str:
    """Clips dir → ``path,caption`` CSV (the dataset-construction output
    format consumed by DatasetFromCSV). The captioner hook replaces the
    vendored LLaVA pipeline."""
    clips = sorted(p for p in Path(clips_dir).iterdir()
                   if p.suffix in (".mp4", ".avi", ".mkv", ".npy"))
    os.makedirs(os.path.dirname(out_csv) or ".", exist_ok=True)
    with open(out_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["path", "caption"])
        for p in clips:
            caption = ""
            if captioner is not None:
                try:
                    caption = captioner(load_video(str(p), num_frames=8))
                except Exception:
                    caption = ""
            w.writerow([str(p), caption])
    return out_csv


def combine_videos_side_by_side(video_paths: Sequence[str], out_path: str,
                                labels: Optional[Sequence[str]] = None,
                                ncols: Optional[int] = None,
                                fps: int = 8) -> str:
    """Comparison grid of N videos (reference tools/video_comparison/
    combine.py). Videos are truncated to the shortest and resized to the
    first video's frame size."""
    vids = [load_video(p) for p in video_paths]
    t_min = min(v.shape[0] for v in vids)
    h, w = vids[0].shape[1:3]
    norm = []
    for v in vids:
        v = v[:t_min]
        if v.shape[1:3] != (h, w):
            try:
                import cv2
                v = np.stack([cv2.resize(f, (w, h)) for f in v])
            except ImportError:
                v = v[:, :h, :w]
        norm.append(v)
    grid = video_grid(norm, ncols=ncols or len(norm))
    return save_video(grid, out_path, fps=fps)


def convert_vript_annotations(input_jsonl: str, output_csv: str,
                              video_root: str) -> int:
    """Vript dataset annotations → training CSV (reference
    tools/vript_anno_converter.py:1-94): scan the two-level clip layout
    for ``<name>_cut_meta.json`` files, read per-clip video metadata with
    cv2, join against the captions jsonl (captions concatenated with
    period normalization), and write the standard columns
    path,caption,fps,frames,height,width. Returns the row count."""
    import json

    import cv2

    root = Path(video_root)
    video_dict = {}
    for sub in sorted(p for p in root.iterdir() if p.is_dir()):
        for clip_dir in sorted(p for p in sub.iterdir() if p.is_dir()):
            meta_file = clip_dir / f"{clip_dir.name}_cut_meta.json"
            if not meta_file.exists():
                continue
            try:
                with open(meta_file) as f:
                    video_meta = json.load(f)
                for clip in video_meta.get("clips", []):
                    vpath = clip_dir / clip["clip_id"]
                    cap = cv2.VideoCapture(str(vpath))
                    frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
                    if not cap.isOpened() or frames <= 0:
                        # missing/corrupt clip: VideoCapture never raises,
                        # it just reports zeros — skip instead of writing
                        # a frames=0 row that breaks training samplers
                        cap.release()
                        continue
                    meta = {
                        "path": str(vpath.relative_to(root)),
                        "fps": cap.get(cv2.CAP_PROP_FPS),
                        "frames": frames,
                        "height": int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
                        "width": int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
                    }
                    cap.release()
                    video_dict[os.path.splitext(clip["clip_id"])[0]] = meta
            except Exception:  # noqa: BLE001 — skip broken clip dirs
                continue

    rows = []
    with open(input_jsonl) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            data = json.loads(line)
            meta = video_dict.get(data.get("clip_id"))
            if meta is None:
                continue
            caption = ""
            for text in data.get("caption", {}).values():
                text = str(text)
                if not text.endswith("."):
                    text += "."
                caption += text + " "
            rows.append({**meta, "caption": caption})

    cols = ["path", "caption", "fps", "frames", "height", "width"]
    with open(output_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=cols)
        w.writeheader()
        for r in rows:
            w.writerow({k: r[k] for k in cols})
    return len(rows)
