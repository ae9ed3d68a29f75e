"""Unified training CLI — parity with scripts/train_new.py
(/root/reference/scripts/train_new.py:100-233): config merge → flow + data
instantiation → Trainer.fit with auto-resume.

Usage:
    python -m videotuna_tpu.cli.train --config configs/.../x.yaml \
        [--resume] [key.sub=value ...]
"""

from __future__ import annotations

import argparse
from typing import List, Optional

from videotuna_tpu.core.config import (check_required, format_config,
                                       load_configs)
from videotuna_tpu.core.mesh import MeshConfig, make_mesh
from videotuna_tpu.core.registry import instantiate, populate
from videotuna_tpu.data.datasets import EpochLoader
from videotuna_tpu.training.trainer import TrainConfig, Trainer


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("videotuna-tpu train")
    p.add_argument("--config", "-b", action="append", required=True)
    p.add_argument("--workdir", default=None)
    p.add_argument("--resume", "--auto_resume", action="store_true",
                   help="resume from newest checkpoint in workdir")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--quiet", action="store_true")
    p.add_argument("overrides", nargs="*")
    return p


def run_train(argv: Optional[List[str]] = None):
    args = build_parser().parse_args(argv)
    config = load_configs(args.config, args.overrides)
    check_required(config, ["flow.target", "train"])
    if not args.quiet:
        print(format_config(config, "train config"))

    populate()
    flow = instantiate(config["flow"])
    ckpt = config["flow"].get("pretrained")
    if ckpt:
        flow.from_pretrained(ckpt)
    elif not flow.params:
        flow.init_params(seed=int(config.get("train", {}).get("seed", 42)))

    tcfg_raw = dict(config.get("train", {}))
    mesh_cfg = tcfg_raw.pop("mesh", {})
    seed = int(tcfg_raw.pop("seed", 42))
    data_cfg = config.get("data", {})
    tcfg_fields = {f.name for f in
                   __import__("dataclasses").fields(TrainConfig)}
    tcfg = TrainConfig(**{k: v for k, v in tcfg_raw.items()
                          if k in tcfg_fields})

    mesh = make_mesh(MeshConfig(**mesh_cfg)) if mesh_cfg else make_mesh()
    workdir = args.workdir or config.get("workdir", "logs/run")
    if args.max_steps:
        tcfg.max_steps = args.max_steps

    dataset = instantiate(data_cfg["dataset"]) if "dataset" in data_cfg \
        else None
    if dataset is None:
        raise ValueError("train config needs data.dataset: {target:, params:}")
    loader = EpochLoader(dataset,
                         batch_size=int(data_cfg.get("batch_size", 1)),
                         seed=seed)

    trainer = Trainer(flow, tcfg, mesh, workdir=workdir, seed=seed)
    state = trainer.init_state()
    if args.resume:
        state = trainer.maybe_resume(state)
    state = trainer.fit(loader, state)
    if not args.quiet and trainer.metrics_history:
        last = trainer.metrics_history[-1]
        print(f"[videotuna-tpu] done at step {last['step']}: "
              f"loss={last['loss']:.4f} "
              f"({last['steps_per_sec']:.2f} steps/s)")
    return state


if __name__ == "__main__":
    run_train()
