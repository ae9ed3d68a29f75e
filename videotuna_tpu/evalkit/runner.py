"""VBench-style evaluation runner + VBench-format output.

Parity:
- save_videos_vbench writes ``<prompt>-<n>.mp4`` + info.json
  (/root/reference/videotuna/base/inference_base.py:131-161,
  scripts/inference.py:318-328);
- the runner walks a results dir, scores each mp4 over the requested
  dimensions, writes ``final_results.json``
  (eval/scripts/evaluation.py) and a tabular summary
  (eval/scripts/tabular_score.py).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from videotuna_tpu.data.video_io import load_video, save_video
from videotuna_tpu.evalkit.metrics import STANDARD_DIMENSIONS, evaluate_video


def save_videos_vbench(videos: Sequence[np.ndarray],
                       prompts: Sequence[str], savedir: str,
                       n_per_prompt: int = 1, fps: int = 8) -> List[str]:
    """``<prompt>-<idx>.mp4`` naming + info.json prompt mapping."""
    os.makedirs(savedir, exist_ok=True)
    info = []
    paths = []
    for i, prompt in enumerate(prompts):
        for n in range(n_per_prompt):
            vid = videos[i * n_per_prompt + n]
            name = f"{prompt}-{n}.mp4".replace("/", "_")
            path = save_video(vid, os.path.join(savedir, name), fps=fps)
            paths.append(path)
        info.append({"prompt_en": prompt,
                     "video_list": [f"{prompt}-{n}.mp4"
                                    for n in range(n_per_prompt)]})
    with open(os.path.join(savedir, "info.json"), "w") as f:
        json.dump(info, f, indent=2)
    return paths


def _load_info(vdir: Path) -> Dict[str, Dict]:
    """info.json (save_videos_vbench format) → {video_name: {prompt,
    auxiliary_info}}."""
    info_path = vdir / "info.json"
    if not info_path.exists():
        return {}
    with open(info_path) as f:
        entries = json.load(f)
    mapping: Dict[str, Dict] = {}
    for e in entries:
        for name in e.get("video_list", []):
            mapping[name] = {"prompt": e.get("prompt_en", ""),
                             "aux": e.get("auxiliary_info")}
    return mapping


def evaluate_directory(videos_dir: str,
                       dimensions: Optional[List[str]] = None,
                       output_path: Optional[str] = None,
                       max_frames: int = 64,
                       scorer=None,
                       aesthetic_params=None,
                       raft_params=None,
                       amt_params=None,
                       dino_params=None,
                       viclip_scorer=None,
                       umt_scorer=None,
                       tag2text_captioner=None,
                       grit_detector=None,
                       musiq_params=None) -> Dict:
    """Score every video in a directory; write final_results.json.

    With ``scorer`` (a ``CLIPScorer``) and an ``info.json`` prompt map in
    the directory, the semantic dimensions + real aesthetic_quality are
    emitted too — all 16 VBench dimensions (proxies suffixed
    ``_proxy``)."""
    dims = dimensions
    results: Dict[str, Dict[str, float]] = {}
    vdir = Path(videos_dir)
    info = _load_info(vdir) if scorer is not None else {}
    files = sorted([p for p in vdir.iterdir()
                    if p.suffix in (".mp4", ".avi", ".mkv", ".npy")])
    for p in files:
        try:
            video = load_video(str(p), num_frames=max_frames)
        except Exception as e:
            results[p.name] = {"error": str(e)}
            continue
        meta = info.get(p.name, {})
        results[p.name] = evaluate_video(
            video, dims, scorer=scorer, prompt=meta.get("prompt"),
            aux=meta.get("aux"), aesthetic_params=aesthetic_params,
            raft_params=raft_params, amt_params=amt_params,
            dino_params=dino_params,
            viclip_scorer=viclip_scorer, umt_scorer=umt_scorer,
            tag2text_captioner=tag2text_captioner,
            grit_detector=grit_detector, musiq_params=musiq_params,
            video_name=p.name)

    all_dims = sorted({d for r in results.values() for d in r
                       if d != "error"})
    summary = {}
    for d in all_dims:
        vals = [r[d] for r in results.values() if d in r]
        summary[d] = float(np.mean(vals)) if vals else None
    final = {"per_video": results, "summary": summary,
             "leaderboard": leaderboard_score(summary),
             "num_videos": len(files)}
    out = output_path or str(vdir / "final_results.json")
    with open(out, "w") as f:
        json.dump(final, f, indent=2)
    return final


# VBench leaderboard constants (reference eval/scripts/tabular_score.py
# :10-68 — published normalization bounds and dimension weights)
QUALITY_LIST = ["subject consistency", "background consistency",
                "temporal flickering", "motion smoothness",
                "aesthetic quality", "imaging quality", "dynamic degree"]
SEMANTIC_LIST = ["object class", "multiple objects", "human action",
                 "color", "spatial relationship", "scene",
                 "appearance style", "temporal style",
                 "overall consistency"]
NORMALIZE_DIC = {
    "subject consistency": (0.1462, 1.0),
    "background consistency": (0.2615, 1.0),
    "temporal flickering": (0.6293, 1.0),
    "motion smoothness": (0.706, 0.9975),
    "dynamic degree": (0.0, 1.0),
    "aesthetic quality": (0.0, 1.0),
    "imaging quality": (0.0, 1.0),
    "object class": (0.0, 1.0),
    "multiple objects": (0.0, 1.0),
    "human action": (0.0, 1.0),
    "color": (0.0, 1.0),
    "spatial relationship": (0.0, 1.0),
    "scene": (0.0, 0.8222),
    "appearance style": (0.0009, 0.2855),
    "temporal style": (0.0, 0.364),
    "overall consistency": (0.0, 0.364),
}
DIM_WEIGHT = {d: 1.0 for d in NORMALIZE_DIC}
DIM_WEIGHT["dynamic degree"] = 0.5
QUALITY_WEIGHT, SEMANTIC_WEIGHT = 4.0, 1.0


def leaderboard_score(summary: Dict[str, float]) -> Dict[str, float]:
    """VBench leaderboard scaling (tabular_score.py:93-124): per-dimension
    min-max normalization × dimension weight, then weighted quality /
    semantic means and the 4:1 total. ``*_proxy`` dimensions scale under
    their base name but flag the result as partial; quality/semantic/total
    appear only when every member dimension was evaluated."""
    scaled: Dict[str, float] = {}
    proxies = []
    for key, val in summary.items():
        if val is None:
            continue
        base = key[:-6] if key.endswith("_proxy") else key
        dim = base.replace("_", " ")
        if dim not in NORMALIZE_DIC:
            continue
        lo, hi = NORMALIZE_DIC[dim]
        scaled[dim] = (float(val) - lo) / (hi - lo) * DIM_WEIGHT[dim]
        if key.endswith("_proxy"):
            proxies.append(dim)
    out: Dict[str, float] = dict(scaled)
    if all(d in scaled for d in QUALITY_LIST):
        out["quality score"] = (sum(scaled[d] for d in QUALITY_LIST)
                                / sum(DIM_WEIGHT[d] for d in QUALITY_LIST))
    if all(d in scaled for d in SEMANTIC_LIST):
        out["semantic score"] = (sum(scaled[d] for d in SEMANTIC_LIST)
                                 / sum(DIM_WEIGHT[d]
                                       for d in SEMANTIC_LIST))
    if "quality score" in out and "semantic score" in out:
        out["total score"] = (
            out["quality score"] * QUALITY_WEIGHT
            + out["semantic score"] * SEMANTIC_WEIGHT
        ) / (QUALITY_WEIGHT + SEMANTIC_WEIGHT)
    if proxies:
        out["_proxy_dimensions"] = proxies
    return out


def tabular_score(final_results: Dict) -> str:
    """Aligned text table of dimension scores (eval/scripts/
    tabular_score.py analogue), followed by the leaderboard-scaled
    quality/semantic/total block when all member dimensions exist."""
    rows = [(k, v) for k, v in final_results["summary"].items()
            if v is not None]
    width = max((len(k) for k, _ in rows), default=10) + 2
    lines = [f"{'dimension'.ljust(width)}score",
             "-" * (width + 6)]
    for k, v in rows:
        lines.append(f"{k.ljust(width)}{v:.4f}")
    if rows:
        mean = float(np.mean([v for _, v in rows]))
        lines.append("-" * (width + 6))
        lines.append(f"{'mean'.ljust(width)}{mean:.4f}")
    lb = leaderboard_score(final_results["summary"])
    picks = [k for k in ("total score", "quality score", "semantic score")
             if k in lb]
    if picks:
        lines.append("-" * (width + 6))
        for k in picks:
            lines.append(f"{k.ljust(width)}{lb[k] * 100:.2f}%")
        if lb.get("_proxy_dimensions"):
            lines.append("(proxy dims in aggregate: "
                         + ", ".join(lb["_proxy_dimensions"]) + ")")
    return "\n".join(lines)


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser("videotuna-tpu eval")
    ap.add_argument("--videos", required=True)
    ap.add_argument("--dimensions", nargs="*", default=None)
    ap.add_argument("--output", default=None)
    ap.add_argument("--clip_vision", default=None,
                    help="HF CLIPVisionModelWithProjection ckpt "
                         "(enables semantic dims + real aesthetic)")
    ap.add_argument("--clip_text", default=None,
                    help="HF CLIPTextModelWithProjection ckpt")
    ap.add_argument("--aesthetic", default=None,
                    help="LAION aesthetic-MLP ckpt")
    ap.add_argument("--tokenizer", default=None)
    ap.add_argument("--raft", default=None,
                    help="RAFT checkpoint (raft-things.pth); enables the "
                         "faithful dynamic_degree instead of its proxy")
    ap.add_argument("--amt", default=None,
                    help="AMT-S checkpoint (amt-s.pth); enables the "
                         "faithful motion_smoothness instead of its proxy")
    ap.add_argument("--dino", default=None,
                    help="DINO checkpoint (dino_vitbase16_pretrain.pth); "
                         "enables the faithful subject_consistency "
                         "instead of its proxy")
    ap.add_argument("--viclip", default=None,
                    help="ViCLIP checkpoint (ViClip-InternVid-10M-FLT"
                         ".pth); enables the faithful "
                         "overall_consistency / temporal_style")
    ap.add_argument("--umt", default=None,
                    help="UMT K400 checkpoint (l16_ptk710_ftk710_ftk400"
                         "_f16_res224.pth); enables the faithful "
                         "human_action")
    ap.add_argument("--tag2text", default=None,
                    help="Tag2Text checkpoint (tag2text_swin_14m.pth); "
                         "enables the faithful scene dimension")
    ap.add_argument("--bert_vocab", default=None,
                    help="bert-base-uncased vocab.txt (required with "
                         "--tag2text or --grit)")
    ap.add_argument("--grit", default=None,
                    help="GRiT checkpoint (grit_b_densecap_objectdet"
                         ".pth); enables the faithful object_class / "
                         "multiple_objects / spatial_relationship / "
                         "color dimensions")
    ap.add_argument("--musiq", default=None,
                    help="MUSIQ checkpoint (converted to this repo's "
                         "naming — see evalkit/musiq.py HONESTY NOTE); "
                         "enables the learned imaging_quality instead "
                         "of its proxy")
    args = ap.parse_args(argv)
    scorer = None
    aes = None
    raft = None
    amt = None
    dino = None
    viclip = None
    umt = None
    tag2text = None
    grit = None
    if args.grit:
        if not args.bert_vocab:
            raise SystemExit("--grit requires --bert_vocab")
        from videotuna_tpu.evalkit.grit import (GRiTDetector,
                                                convert_grit_state_dict)
        from videotuna_tpu.tools.convert_weights import \
            load_torch_state_dict
        with open(args.bert_vocab) as f:
            vocab = [line.rstrip("\n") for line in f]
        grit = GRiTDetector(
            convert_grit_state_dict(load_torch_state_dict(args.grit)),
            vocab)
    if args.tag2text:
        if not args.bert_vocab:
            raise SystemExit("--tag2text requires --bert_vocab")
        from videotuna_tpu.evalkit.tag2text import (
            Tag2TextCaptioner, convert_tag2text_state_dict)
        from videotuna_tpu.evalkit.wordpiece import WordPieceTokenizer
        from videotuna_tpu.tools.convert_weights import \
            load_torch_state_dict
        tag2text = Tag2TextCaptioner(
            convert_tag2text_state_dict(
                load_torch_state_dict(args.tag2text)),
            WordPieceTokenizer(args.bert_vocab))
    if args.umt:
        from videotuna_tpu.evalkit.umt import (UMTActionScorer,
                                               convert_umt_state_dict)
        from videotuna_tpu.tools.convert_weights import \
            load_torch_state_dict
        umt = UMTActionScorer(
            convert_umt_state_dict(load_torch_state_dict(args.umt)))
    if args.viclip:
        from videotuna_tpu.evalkit.viclip import (ViCLIPScorer,
                                                  convert_viclip_state_dict)
        from videotuna_tpu.tools.convert_weights import \
            load_torch_state_dict
        sd = load_torch_state_dict(args.viclip)
        viclip = ViCLIPScorer(*convert_viclip_state_dict(sd))
    if args.raft:
        from videotuna_tpu.evalkit.raft import convert_raft_state_dict
        from videotuna_tpu.tools.convert_weights import \
            load_torch_state_dict
        raft = convert_raft_state_dict(load_torch_state_dict(args.raft))
    if args.amt:
        from videotuna_tpu.evalkit.amt import convert_amt_state_dict
        from videotuna_tpu.tools.convert_weights import \
            load_torch_state_dict
        amt = convert_amt_state_dict(load_torch_state_dict(args.amt))
    if args.dino:
        from videotuna_tpu.evalkit.dino import convert_dino_state_dict
        from videotuna_tpu.tools.convert_weights import \
            load_torch_state_dict
        dino = convert_dino_state_dict(load_torch_state_dict(args.dino))
    musiq = None
    if args.musiq:
        from videotuna_tpu.evalkit.musiq import convert_musiq_state_dict
        from videotuna_tpu.tools.convert_weights import \
            load_torch_state_dict
        musiq = convert_musiq_state_dict(
            load_torch_state_dict(args.musiq))
    if args.clip_vision and args.clip_text:
        from videotuna_tpu.evalkit.semantic import CLIPScorer
        scorer = CLIPScorer.from_pretrained(args.clip_vision,
                                            args.clip_text,
                                            tokenizer=args.tokenizer)
        if args.aesthetic:
            from videotuna_tpu.tools.convert_weights import (
                aesthetic_map, load_torch_state_dict)
            aes = aesthetic_map().convert(
                load_torch_state_dict(args.aesthetic))
    final = evaluate_directory(args.videos, args.dimensions, args.output,
                               scorer=scorer, aesthetic_params=aes,
                               raft_params=raft, amt_params=amt,
                               dino_params=dino,
                               viclip_scorer=viclip, umt_scorer=umt,
                               tag2text_captioner=tag2text,
                               grit_detector=grit, musiq_params=musiq)
    print(tabular_score(final))
    return final


if __name__ == "__main__":
    main()
