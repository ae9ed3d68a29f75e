"""Checkpoint tools CLI: torch→orbax conversion and inspection.

Capability parity with the reference's offline converters:
- tools/deepspeed_checkpoint_converter.py (zero shards → fp32 state dict) —
  here the ``module.`` stripping + consolidation lives in convert_weights;
- tools/convert_checkpoint.py / videocrafter_checkpoint_converter.py —
  family-specific torch→native conversion;
- inspection of orbax component dirs.

Usage:
    python -m videotuna_tpu.tools.ckpt_tools convert \
        --src model.ckpt --family stdit --out ckpts/opensora --heads 16
    python -m videotuna_tpu.tools.ckpt_tools inspect --path ckpts/opensora
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Any, Dict

import numpy as np

from videotuna_tpu.core import checkpoint as ckpt_lib
from videotuna_tpu.tools import convert_weights as cw

# family → (map builder, state-dict preprocessor). Preprocessors split the
# torch checkpoints' fused projections before rule mapping.
FAMILIES = {
    "stdit": (lambda a: cw.stdit_map(heads=a.heads),
              lambda sd: cw.preprocess_split_fused(
                  cw.preprocess_split_fused_qkv(
                      sd, r"attn\.qkv|attn_temp\.qkv"),
                  r"cross_attn\.kv_linear", "kv_linear",
                  ("k_linear", "v_linear"))),
    "wan": (lambda a: cw.wan_map(heads=a.heads), None),
    "hunyuan": (lambda a: cw.hunyuan_map(heads=a.heads),
                lambda sd: cw.preprocess_split_fused_qkv(
                    sd, r"attn_qkv")),
    "cogvideox": (lambda a: cw.cogvideox_map(heads=a.heads), None),
    "mochi": (lambda a: cw.mochi_map(heads=a.heads), None),
    "mochi_vae": (lambda a: __import__(
        "videotuna_tpu.models.mochi_vae", fromlist=["mochi_vae_map"]
    ).mochi_vae_map(), None),
    "raft": (lambda a: __import__(
        "videotuna_tpu.evalkit.raft", fromlist=["raft_map"]
    ).raft_map(), None),
    "amt": (lambda a: __import__(
        "videotuna_tpu.evalkit.amt", fromlist=["amt_s_map"]
    ).amt_s_map(), None),
    "flux": (lambda a: cw.flux_map(heads=a.heads),
             lambda sd: cw.preprocess_split_fused_qkv(
                 sd, r"(img|txt)_attn\.qkv")),
    "wan_vae": (lambda a: cw.wan_vae_map(), None),
    "hunyuan_vae": (lambda a: cw.hunyuan_vae_map(), None),
    "cogvideox_vae": (lambda a: cw.cogvideox_vae_map(), None),
    "t5": (lambda a: cw.t5_map(heads=a.heads), None),
    "clip_text": (lambda a: cw.clip_text_map(heads=a.heads), None),
    "clip_vision": (lambda a: cw.clip_vision_map(heads=a.heads), None),
    "llama": (lambda a: cw.llama_map(heads=a.heads,
                                     kv_heads=a.kv_heads), None),
    "stepllm": (lambda a: cw.stepllm_map(), None),
    "stepvideo": (lambda a: cw.stepvideo_map(heads=a.heads),
                  lambda sd, a: _stepvideo_preprocess(sd, a)),
    "aesthetic": (lambda a: cw.aesthetic_map(), None),
    "llava_projector": (lambda a: cw.llava_projector_map(), None),
    "lvdm": (lambda a: cw.lvdm_map(addition_attention=True), None),
    "lvdm_vc1": (lambda a: cw.lvdm_map(addition_attention=True,
                                       use_relative_position=True), None),
}


def _stepvideo_preprocess(sd, args):
    """Self-calibrating headwise split: the checkpoint's per-head
    q_norm.weight length IS the head_dim, so heads is derived from the
    fused wqkv rows instead of trusting --heads (a wrong value would
    reshape cleanly and corrupt the interleave silently)."""
    qn = next((v for k, v in sd.items()
               if k.endswith("attn1.q_norm.weight")), None)
    wq = next((v for k, v in sd.items()
               if k.endswith("attn1.wqkv.weight")), None)
    heads = args.heads
    if qn is not None and wq is not None:
        hd = int(qn.shape[0])
        derived = wq.shape[0] // (3 * hd)
        if derived != heads:
            print(f"[stepvideo] deriving heads={derived} from the "
                  f"checkpoint (head_dim {hd}); ignoring --heads {heads}")
            heads = derived
            args.heads = derived          # the map builder uses it too
    sd = cw.preprocess_split_headwise(sd, r"attn1\.wqkv", "wqkv",
                                      ("wq", "wk", "wv"), heads=heads)
    return cw.preprocess_split_headwise(sd, r"attn2\.wkv", "wkv",
                                        ("wk", "wv"), heads=heads)


def cmd_convert(args) -> None:
    sd = cw.load_torch_state_dict(args.src)
    print(f"loaded {len(sd)} torch tensors from {args.src}")
    if getattr(args, "split_source", None):
        comps = cw.split_lightning_components(sd)
        if args.split_source not in comps:
            raise SystemExit(
                f"--split-source {args.split_source!r} not found; "
                f"components present: {sorted(comps)}")
        sd = comps[args.split_source]
        print(f"split monolithic checkpoint: using component "
              f"{args.split_source!r} ({len(sd)} tensors)")
    if args.family not in FAMILIES:
        raise SystemExit(f"unknown family {args.family!r}; "
                         f"available: {sorted(FAMILIES)}")
    builder, preprocess = FAMILIES[args.family]
    if preprocess is not None:
        import inspect
        n_params = len(inspect.signature(preprocess).parameters)
        sd = preprocess(sd, args) if n_params == 2 else preprocess(sd)
    cmap = builder(args)
    tree = cmap.convert(sd, strict=args.strict)
    if args.scan_layout:
        tree = cw.stack_blocks_for_scan(tree)
    n = sum(np.size(x) for x in _leaves(tree))
    print(f"converted tree: {n/1e6:.1f}M params")
    ckpt_lib.save_components(args.out, step=0, components={args.component:
                                                           tree})
    print(f"wrote {args.out}/step_0/{args.component}")


def cmd_inspect(args) -> None:
    root = Path(args.path)
    step_dir = root if (root / "denoiser").exists() or \
        any(root.glob("*/")) else None
    latest = ckpt_lib.latest_step_dir(str(root))
    target = Path(latest) if latest else root
    print(f"checkpoint: {target}")
    for comp in sorted(p for p in target.iterdir() if p.is_dir()):
        try:
            tree = ckpt_lib.restore_tree(str(comp))
            n = sum(np.size(x) for x in _leaves(tree))
            print(f"  {comp.name}: {n/1e6:.2f}M params, "
                  f"{_count_leaves(tree)} tensors")
        except Exception as e:
            print(f"  {comp.name}: unreadable ({e})")


def _leaves(tree: Any):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


def _count_leaves(tree: Any) -> int:
    return sum(1 for _ in _leaves(tree))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser("videotuna-tpu ckpt tools")
    sub = ap.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("convert")
    c.add_argument("--src", required=True)
    c.add_argument("--family", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--component", default="denoiser")
    c.add_argument("--heads", type=int, default=16)
    c.add_argument("--kv_heads", type=int, default=None)
    c.add_argument("--strict", action="store_true")
    c.add_argument("--scan-layout", action="store_true")
    c.add_argument("--split-source", default=None, dest="split_source",
                   help="for monolithic Lightning checkpoints: pick one "
                        "component (denoiser/first_stage/cond_stage) "
                        "before mapping")
    i = sub.add_parser("inspect")
    i.add_argument("--path", required=True)
    args = ap.parse_args(argv)
    {"convert": cmd_convert, "inspect": cmd_inspect}[args.cmd](args)


if __name__ == "__main__":
    main()
