"""Checkpointing: orbax-backed, per-component trees + auto-resume.

Mirrors the reference's checkpoint design (SURVEY.md §5.4):
- whole-flow + selected-component-only saves (VideoTunaModelCheckpoint,
  utils/callbacks.py:56-221) → here: one orbax dir per component
  (``denoiser/``, ``first_stage/``, ``cond_stage/``, ``opt_state/``…);
- auto-resume from the newest step dir (train_utils.py:251-288);
- LoRA-only checkpoints are just the lora sub-tree (callbacks.py:28-53).

Torch-checkpoint import converters live in tools/convert_weights.py.
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

STEP_RE = re.compile(r"^step_(\d+)$")


def save_tree(path: str, tree: Any) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def restore_tree(path: str, target: Optional[Any] = None) -> Any:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        return ckptr.restore(path, abstract)
    return ckptr.restore(path)


def save_components(root: str, step: int, components: Dict[str, Any],
                    keep: Optional[int] = None) -> str:
    """Save ``{name: tree}`` under ``root/step_<N>/<name>``."""
    step_dir = os.path.join(os.path.abspath(root), f"step_{step}")
    for name, tree in components.items():
        if tree is not None:
            save_tree(os.path.join(step_dir, name), tree)
    if keep:
        prune_old_steps(root, keep)
    return step_dir


def restore_components(step_dir: str,
                       targets: Dict[str, Any]) -> Dict[str, Any]:
    out = {}
    for name, target in targets.items():
        p = os.path.join(step_dir, name)
        if os.path.isdir(p):
            out[name] = restore_tree(p, target)
    return out


def latest_step_dir(root: str) -> Optional[str]:
    """Auto-resume discovery (reference get_autoresume_path)."""
    root_p = Path(root)
    if not root_p.is_dir():
        return None
    steps = []
    for child in root_p.iterdir():
        m = STEP_RE.match(child.name)
        if m and child.is_dir():
            steps.append((int(m.group(1)), child))
    if not steps:
        return None
    return str(max(steps)[1])


def step_of(step_dir: str) -> int:
    m = STEP_RE.match(Path(step_dir).name)
    return int(m.group(1)) if m else 0


def prune_old_steps(root: str, keep: int) -> None:
    root_p = Path(root)
    if not root_p.is_dir():
        return
    steps = sorted(
        [(int(m.group(1)), c) for c in root_p.iterdir()
         if (m := STEP_RE.match(c.name)) and c.is_dir()])
    import shutil
    for _, child in steps[:-keep]:
        shutil.rmtree(child, ignore_errors=True)
