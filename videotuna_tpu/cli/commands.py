"""Per-model command registry — the poetry-scripts surface.

Parity with the reference's ~40 console commands
(/root/reference/pyproject.toml:88-126 → scripts/__init__.py:126-860), each
binding a canonical config + entry point:

    videotuna-tpu inference-wanvideo-t2v-720p [overrides...]
    videotuna-tpu train-hunyuan-t2v-lora [overrides...]
    videotuna-tpu list

Commands resolve to (mode, config paths, extra overrides) and dispatch to
cli.inference / cli.train / evalkit.runner; unknown configs fail with the
available-command list rather than shelling out to subprocesses (the
reference spawns ``python scripts/<entry>.py`` per command).
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

CONFIG_ROOT = "configs"


@dataclass
class Command:
    name: str
    mode: str                    # inference | train | eval
    configs: List[str]
    overrides: List[str] = field(default_factory=list)
    description: str = ""


def _c(name, mode, cfg, desc="", overrides=None):
    return Command(name, mode, [f"{CONFIG_ROOT}/{cfg}"],
                   overrides or [], desc)


COMMANDS: Dict[str, Command] = {c.name: c for c in [
    # tiny smoke commands (runnable anywhere)
    _c("inference-tiny-t2v", "inference", "000_tiny/tiny_t2v.yaml",
       "tiny STDiT T2V smoke run"),
    _c("train-tiny-t2v", "train", "000_tiny/tiny_t2v.yaml",
       "tiny STDiT training smoke run"),
    _c("inference-tiny-cogvideox", "inference",
       "000_tiny/tiny_cogvideox.yaml", "tiny CogVideoX smoke run"),
    _c("inference-tiny-hunyuan", "inference", "000_tiny/tiny_hunyuan.yaml",
       "tiny HunyuanVideo smoke run"),
    # VideoCrafter family (reference: inference-vc2-t2v-320-512 …)
    _c("inference-vc2-t2v-320-512", "inference",
       "001_videocrafter2/vc2_t2v_320x512.yaml",
       "VideoCrafter2 T2V 320x512"),
    _c("train-videocrafter-v2", "train",
       "001_videocrafter2/vc2_t2v_320x512.yaml",
       "VideoCrafter2 full fine-tune"),
    _c("train-videocrafter-lora", "train",
       "001_videocrafter2/vc2_t2v_lora.yaml",
       "VideoCrafter2 LoRA fine-tune"),
    _c("inference-dc-i2v-576-1024", "inference",
       "002_dynamicrafter/dc_i2v_576x1024.yaml", "DynamiCrafter I2V"),
    # Open-Sora
    _c("inference-opensora-v10-16x256x256", "inference",
       "003_opensora/opensorav10_256x256.yaml", "Open-Sora v1.0 T2V"),
    _c("train-opensorav10", "train",
       "003_opensora/opensorav10_256x256.yaml", "Open-Sora v1.0 training"),
    # CogVideoX
    _c("inference-cogvideo-t2v-diffusers", "inference",
       "004_cogvideox/cogvideo2b.yaml", "CogVideoX-2b T2V"),
    _c("inference-cogvideox1.5-5b-t2v", "inference",
       "005_cogvideox1.5/cogvideox1.5_5b_t2v.yaml", "CogVideoX-1.5 5B T2V"),
    _c("inference-cogvideox1.5-5b-i2v", "inference",
       "005_cogvideox1.5/cogvideox1.5_5b_i2v.yaml", "CogVideoX-1.5 5B I2V"),
    _c("train-cogvideox-t2v-lora", "train",
       "004_cogvideox/cogvideo2b_lora.yaml", "CogVideoX LoRA"),
    _c("train-cogvideox-t2v-fullft", "train",
       "004_cogvideox/cogvideo2b.yaml", "CogVideoX full fine-tune"),
    # HunyuanVideo
    _c("inference-hunyuan-t2v-720p", "inference",
       "007_hunyuanvideo/hunyuanvideo_t2v.yaml", "HunyuanVideo T2V 720p"),
    _c("inference-hunyuan-i2v-720p", "inference",
       "007_hunyuanvideo/hunyuanvideo_i2v.yaml", "HunyuanVideo I2V 720p"),
    _c("train-hunyuan-t2v-lora", "train",
       "007_hunyuanvideo/hunyuanvideo_t2v_lora.yaml",
       "HunyuanVideo T2V LoRA"),
    # Wan
    _c("inference-wanvideo-t2v-720p", "inference",
       "008_wanvideo/wan2_1_t2v_14B.yaml", "Wan2.1 T2V 14B 720p"),
    _c("inference-wanvideo-t2v-1-3B", "inference",
       "008_wanvideo/wan2_1_t2v_1_3B.yaml", "Wan2.1 T2V 1.3B"),
    _c("inference-wanvideo-i2v-720p", "inference",
       "008_wanvideo/wan2_1_i2v_14B.yaml", "Wan2.1 I2V 14B 720p"),
    # StepVideo
    _c("inference-stepvideo-t2v-544x992", "inference",
       "009_stepvideo/stepvideo_t2v.yaml", "StepVideo T2V 544x992"),
    # Mochi (reference: scripts/inference_mochi.py)
    _c("inference-mochi", "inference", "010_mochi/mochi_t2v.yaml",
       "Mochi-1 T2V 480x848"),
    # VideoCrafter1 (reference configs/000_videocrafter)
    _c("inference-vc1-t2v-576-1024", "inference",
       "000_videocrafter/vc1_t2v_576x1024.yaml",
       "VideoCrafter1 T2V 576x1024"),
    _c("inference-vc1-i2v-320-512", "inference",
       "000_videocrafter/vc1_i2v_320x512.yaml",
       "VideoCrafter1 I2V 320x512"),
    # Flux
    _c("inference-flux-dev", "inference", "006_flux/flux_dev.yaml",
       "Flux-dev T2I"),
    _c("inference-flux-schnell", "inference", "006_flux/flux_schnell.yaml",
       "Flux-schnell T2I"),
    _c("train-flux-lora", "train", "006_flux/flux_lora.yaml", "Flux LoRA"),
]}


def list_commands() -> str:
    width = max(len(n) for n in COMMANDS) + 2
    lines = ["available commands:"]
    for name, cmd in sorted(COMMANDS.items()):
        lines.append(f"  {name.ljust(width)}{cmd.description}")
    lines.append("  eval <videos_dir>".ljust(width + 2)
                 + "  VBench-style evaluation")
    lines.append("  serve --config <yaml>".ljust(width + 2)
                 + "  HTTP inference server")
    return "\n".join(lines)


def main(argv: Optional[Sequence[str]] = None) -> int:
    argv = list(argv if argv is not None else sys.argv[1:])
    if not argv or argv[0] in ("-h", "--help", "list"):
        print(list_commands())
        return 0
    name, rest = argv[0], argv[1:]
    if name == "serve":
        from videotuna_tpu.cli.serve import main as serve_main
        serve_main(rest)
        return 0
    if name == "eval":
        from videotuna_tpu.evalkit.runner import main as eval_main
        eval_main(["--videos", *rest] if rest and not
                  rest[0].startswith("--") else rest)
        return 0
    cmd = COMMANDS.get(name)
    if cmd is None:
        print(f"unknown command {name!r}\n\n{list_commands()}",
              file=sys.stderr)
        return 2
    args = []
    for cfg in cmd.configs:
        args += ["--config", cfg]
    args += cmd.overrides + rest
    if cmd.mode == "inference":
        from videotuna_tpu.cli.inference import run_inference
        run_inference(args)
    else:
        from videotuna_tpu.cli.train import run_train
        run_train(args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
