"""Tools tests: scene cutting, annotation CSV, comparison grids, ckpt CLI."""

import numpy as np
import pytest

from videotuna_tpu.data.video_io import save_video
from videotuna_tpu.tools.dataset_tools import (build_annotation_csv,
                                               combine_videos_side_by_side,
                                               cut_video_into_scenes,
                                               detect_scenes)


def synth_video_with_cut(t1=12, t2=12):
    a = np.full((t1, 32, 32, 3), 30, np.uint8)
    b = np.full((t2, 32, 32, 3), 220, np.uint8)
    return np.concatenate([a, b])


class TestSceneCut:
    def test_detects_hard_cut(self):
        v = synth_video_with_cut()
        scenes = detect_scenes(v, threshold=30.0, min_scene_len=4)
        assert len(scenes) == 2
        assert scenes[0] == (0, 12)
        assert scenes[1] == (12, 24)

    def test_no_cut_single_scene(self):
        v = np.full((10, 16, 16, 3), 128, np.uint8)
        scenes = detect_scenes(v)
        assert scenes == [(0, 10)]

    def test_cut_and_write(self, tmp_path):
        src = save_video(synth_video_with_cut(), str(tmp_path / "in.mp4"))
        clips = cut_video_into_scenes(src, str(tmp_path / "scenes"),
                                      threshold=30.0, min_scene_len=4)
        assert len(clips) == 2


class TestAnnotation:
    def test_csv_with_captioner(self, tmp_path):
        d = tmp_path / "clips"
        d.mkdir()
        for i in range(3):
            save_video(np.zeros((4, 16, 16, 3), np.uint8),
                       str(d / f"c{i}.mp4"))
        csv_path = build_annotation_csv(
            str(d), str(tmp_path / "anno.csv"),
            captioner=lambda frames: f"clip with {frames.shape[0]} frames")
        import csv as csvmod
        rows = list(csvmod.DictReader(open(csv_path)))
        assert len(rows) == 3
        assert rows[0]["caption"].startswith("clip with")


class TestComparison:
    def test_side_by_side(self, tmp_path):
        p1 = save_video(np.zeros((6, 16, 16, 3), np.uint8),
                        str(tmp_path / "a.mp4"))
        p2 = save_video(np.full((8, 16, 16, 3), 255, np.uint8),
                        str(tmp_path / "b.mp4"))
        out = combine_videos_side_by_side([p1, p2],
                                          str(tmp_path / "grid.mp4"))
        from videotuna_tpu.data.video_io import load_video
        grid = load_video(out)
        assert grid.shape[0] == 6          # truncated to shortest
        assert grid.shape[2] == 32         # two side by side


class TestCkptCLI:
    def test_inspect_roundtrip(self, tmp_path, capsys):
        from videotuna_tpu.core import checkpoint as ckpt_lib
        from videotuna_tpu.tools.ckpt_tools import main
        tree = {"dense": {"kernel": np.zeros((4, 4), np.float32)}}
        ckpt_lib.save_components(str(tmp_path), 5, {"denoiser": tree})
        main(["inspect", "--path", str(tmp_path)])
        out = capsys.readouterr().out
        assert "denoiser" in out and "tensors" in out


class TestVriptConverter:
    def test_vript_layout_to_csv(self, tmp_path):
        import json
        from videotuna_tpu.tools.dataset_tools import \
            convert_vript_annotations

        root = tmp_path / "clips"
        clip_dir = root / "batch_0" / "vid_a"
        clip_dir.mkdir(parents=True)
        frames = (np.random.rand(6, 16, 16, 3) * 255).astype(np.uint8)
        save_video(frames / 255.0, str(clip_dir / "vid_a-Scene-001.mp4"),
                   fps=4)
        (clip_dir / "vid_a_cut_meta.json").write_text(json.dumps(
            {"clips": [{"clip_id": "vid_a-Scene-001.mp4"}]}))
        # a clip dir without meta must be skipped, not crash
        (root / "batch_0" / "empty").mkdir()

        anno = tmp_path / "captions.jsonl"
        anno.write_text(
            json.dumps({"clip_id": "vid_a-Scene-001",
                        "caption": {"content": "a cat runs",
                                    "shot": "wide shot."}}) + "\n"
            + json.dumps({"clip_id": "missing", "caption": {}}) + "\n")

        out = tmp_path / "out.csv"
        n = convert_vript_annotations(str(anno), str(out), str(root))
        assert n == 1
        import csv as csvmod
        rows = list(csvmod.DictReader(open(out)))
        assert rows[0]["caption"] == "a cat runs. wide shot. "
        assert rows[0]["path"].endswith("vid_a-Scene-001.mp4")
        assert int(rows[0]["frames"]) == 6
        assert int(rows[0]["height"]) == 16
