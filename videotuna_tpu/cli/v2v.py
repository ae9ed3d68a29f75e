"""Video-to-video enhancement CLI — parity with the reference's
``inference-v2v-ms`` command (/root/reference/scripts/inference_v2v_ms.py:17-30,
scripts/__init__.py:399-407): read every video under ``input_dir``, enhance,
write to ``output_dir``.

The reference shells into the ModelScope enhancement pipeline; here the
enhancement is the in-framework SDEdit path (``GenerationFlow.enhance``)
so it runs on TPU through the same jitted denoise loop as generation.

Usage:
    python -m videotuna_tpu.cli.v2v --config configs/011_v2v/v2v_ms.yaml \
        [--input-dir DIR] [--output-dir DIR] [--strength 0.4] [overrides...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import List, Optional

import jax
import numpy as np

from videotuna_tpu.core.config import load_configs
from videotuna_tpu.core.registry import instantiate, populate

VIDEO_EXTS = (".mp4", ".avi", ".mov", ".mkv", ".webm")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("videotuna-tpu v2v")
    p.add_argument("--config", "-b", action="append", required=True)
    p.add_argument("--input-dir", default=None)
    p.add_argument("--output-dir", default=None)
    p.add_argument("--prompt", default=None,
                   help="guidance prompt (default: per-video .txt sidecar "
                        "or empty prompt)")
    p.add_argument("--strength", type=float, default=None)
    p.add_argument("--ckpt", default=None)
    p.add_argument("overrides", nargs="*")
    return p


def run_v2v(argv: Optional[List[str]] = None) -> dict:
    from videotuna_tpu.data.video_io import load_video, save_video

    args = build_parser().parse_args(argv)
    config = load_configs(args.config, args.overrides)
    inf = config.setdefault("inference", {})
    input_dir = args.input_dir or inf.get("input_dir", "inputs/v2v/001")
    output_dir = args.output_dir or inf.get("savedir", "results/v2v")
    strength = (args.strength if args.strength is not None
                else float(inf.get("strength", 0.4)))
    cfg_scale = float(inf.get("unconditional_guidance_scale", 7.5))
    fps = int(inf.get("fps", 8))
    seed = int(inf.get("seed", 42))

    populate()
    flow = instantiate(config["flow"])
    ckpt = args.ckpt or config["flow"].get("pretrained")
    if ckpt:
        flow.from_pretrained(ckpt)
    elif not flow.params:
        print("[videotuna-tpu] no checkpoint given — using random init",
              file=sys.stderr)
        flow.init_params(seed=seed)

    videos = sorted(
        f for f in os.listdir(input_dir)
        if f.lower().endswith(VIDEO_EXTS)) if os.path.isdir(input_dir) else []
    if not videos:
        raise FileNotFoundError(f"no videos found under {input_dir!r}")
    os.makedirs(output_dir, exist_ok=True)

    params = flow.params
    key = jax.random.PRNGKey(seed)
    results, t0 = [], time.perf_counter()
    for name in videos:
        path = os.path.join(input_dir, name)
        video = load_video(path)  # (T, H, W, 3) uint8
        if video.dtype == np.uint8:
            video = video.astype(np.float32) / 127.5 - 1.0
        # per-video prompt sidecar: <name>.txt next to the video
        sidecar = os.path.splitext(path)[0] + ".txt"
        if args.prompt is not None:
            prompt = args.prompt
        elif os.path.isfile(sidecar):
            prompt = open(sidecar).read().strip()
        else:
            prompt = str(inf.get("prompt", ""))
        cond = flow.encode_text(params, [prompt])
        uncond = flow.encode_text(params, [""]) if cfg_scale != 1.0 else None
        key, sub = jax.random.split(key)
        out = flow.enhance(params, video[None], cond, sub,
                           strength=strength, cfg_scale=cfg_scale,
                           uncond=uncond)
        out = np.asarray(jax.device_get(out))[0]
        results.append(save_video(out, os.path.join(output_dir, name),
                                  fps=fps))
    print(f"[videotuna-tpu] enhanced {len(results)} video(s) in "
          f"{time.perf_counter() - t0:.1f}s → {output_dir}")
    return {"videos": results}


if __name__ == "__main__":
    run_v2v()
