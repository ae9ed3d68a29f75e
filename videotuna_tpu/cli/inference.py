"""Unified inference CLI — parity with scripts/inference_new.py
(/root/reference/scripts/inference_new.py:203-228): YAML+CLI merge →
flow instantiation → from_pretrained → monitored flow.inference(config).

Usage:
    python -m videotuna_tpu.cli.inference --config configs/.../x.yaml \
        [--config more.yaml] [--ckpt path] [key.sub=value ...]
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from videotuna_tpu.core.config import (apply_inference_mapping, check_required,
                                       format_config, load_configs)
from videotuna_tpu.core.monitor import monitor_resources
from videotuna_tpu.core.registry import instantiate, populate


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("videotuna-tpu inference")
    p.add_argument("--config", "-b", action="append", required=True,
                   help="YAML config file(s), merged left to right")
    p.add_argument("--ckpt", default=None,
                   help="checkpoint dir (overrides flow.pretrained)")
    p.add_argument("--lora", default=None, metavar="PATH",
                   help="LoRA-only checkpoint to merge into the loaded "
                        "params (reference --lorackpt, "
                        "scripts/__init__.py:564-592)")
    p.add_argument("--lora-alpha", type=float, default=None,
                   help="merge scale (default: train.lora.alpha or 1.0)")
    p.add_argument("--savedir", default=None)
    p.add_argument("--prompt", default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--shard", default=None, metavar="I/N",
                   help="process only the i-th of N prompt shards "
                        "(multi-process DP inference, reference "
                        "scripts/inference_ddp.py)")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("overrides", nargs="*",
                   help="dotlist overrides key.sub=value")
    return p


def run_inference(argv: Optional[List[str]] = None) -> dict:
    args = build_parser().parse_args(argv)
    config = load_configs(args.config, args.overrides)
    config = apply_inference_mapping(config)
    inf = config.setdefault("inference", {})
    for k in ("savedir", "prompt", "seed"):
        v = getattr(args, k)
        if v is not None:
            inf[k] = v
    if args.shard:
        # prompt-list DP over processes (P8): shard i of N
        i, _, n = args.shard.partition("/")
        from videotuna_tpu.flows.generation import load_prompts
        prompts = load_prompts(inf)
        inf["prompts_list"] = prompts[int(i)::int(n)]
    check_required(config, ["flow.target"])
    if not args.quiet:
        print(format_config(config, "inference config"))

    populate()
    flow = instantiate(config["flow"])
    ckpt = args.ckpt or config["flow"].get("pretrained")
    if ckpt:
        flow.from_pretrained(ckpt)
    elif not flow.params:
        print("[videotuna-tpu] no checkpoint given — using random init",
              file=sys.stderr)
        flow.init_params(seed=int(inf.get("seed", 0)))

    if args.lora:
        # merge a LoRA-only checkpoint (Trainer.save's `lora` component or
        # any {component: delta_tree} saved via core.checkpoint) — the
        # reference's --lorackpt path (scripts/__init__.py:564-592)
        import os as _os
        from videotuna_tpu.core.checkpoint import restore_tree
        from videotuna_tpu.training.lora import merge_lora
        path = args.lora
        if _os.path.isdir(_os.path.join(path, "lora")):
            path = _os.path.join(path, "lora")
        lora_tree = restore_tree(path)
        alpha = args.lora_alpha
        if alpha is None:
            alpha = float(config.get("train", {}).get("lora", {})
                          .get("alpha", 1.0))
        merged_any = False
        for comp, delta in lora_tree.items():
            if comp in flow.params:
                flow.params[comp] = merge_lora(flow.params[comp], delta,
                                               alpha)
                merged_any = True
        if not merged_any:
            raise ValueError(
                f"LoRA checkpoint {args.lora!r} has no components matching "
                f"the flow's params ({sorted(flow.params)})")

    if str(inf.get("quantize", "")) == "int8":
        # w8a8 serving (tools/int8.py): int8-resident denoiser, matmuls
        # on the int8 MXU; applied AFTER any LoRA merge
        flow.quantize_int8()

    # multi-chip inference: inference.mesh {dp, fsdp, sp, tp} builds the
    # global mesh; sp>1 routes long attention through ulysses/ring SP
    import contextlib
    ctx = contextlib.nullcontext()
    mesh_cfg = inf.get("mesh") or {}
    if mesh_cfg:
        import jax
        from videotuna_tpu.core.mesh import MeshConfig, make_mesh, use_mesh
        from videotuna_tpu.kernels.attention import sequence_parallel
        from videotuna_tpu.parallel.sharding import shard_params
        mesh = make_mesh(MeshConfig(**mesh_cfg))
        # params must actually be SHARDED (fsdp axis) — a 13B model does
        # not fit replicated; GSPMD propagates from these placements
        flow.params = jax.device_put(flow.params,
                                     shard_params(flow.params, mesh))
        stack = contextlib.ExitStack()
        stack.enter_context(use_mesh(mesh))
        if mesh.shape.get("sp", 1) > 1:
            stack.enter_context(sequence_parallel(mesh))
        ctx = stack

    with ctx:
        result, metrics = monitor_resources()(flow.inference)(config)
    if not args.quiet:
        print(f"[videotuna-tpu] wrote {len(result['videos'])} video(s) "
              f"in {metrics['time_sec']}s → {inf.get('savedir')}")
    return result


if __name__ == "__main__":
    run_inference()
