"""Collective-communication accounting from compiled HLO.

The reference's distributed layer (NCCL via torch.distributed / xfuser /
DeepSpeed) exposes no per-step communication accounting; profiling-by-hand
is the norm. Here GSPMD inserts every collective, so the compiled HLO *is*
the ground truth: this module parses it and returns per-opcode op counts
and payload bytes. ``dryrun_multichip`` and tests/test_multichip_comm.py
use it to BOUND the fsdp train step's all-gather volume by the parameter
size — the signature of replicate-then-repartition thrash (the "involuntary
full rematerialization" class of regressions) is all-gather traffic far
above the param bytes being unsharded.
"""

from __future__ import annotations

import re
from typing import Dict

_BYTES = {"pred": 1, "s8": 1, "u8": 1, "s4": 1, "u4": 1,
          "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
          "s32": 4, "u32": 4, "f32": 4,
          "s64": 8, "u64": 8, "f64": 8, "c64": 8, "c128": 16,
          "f8e4m3fn": 1, "f8e5m2": 1, "f8e4m3b11fnuz": 1}

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([\d,]*)\]")
# `%name = <shape-or-tuple> <opcode>(...)`; async collectives lower to
# -start/-done pairs — count the -start (it carries the payload shape)
_OP_RE = re.compile(
    r"=\s+((?:\([^=]*?\)|\S+))\s+"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(-start)?\(")


def _shape_bytes(s: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(s):
        if dt not in _BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _BYTES[dt]
    return total


def collective_stats(hlo_text: str) -> Dict[str, Dict[str, int]]:
    """Per-opcode ``{count, bytes}`` from compiled HLO text (the result
    shape of each collective — for tuples, the sum over elements)."""
    out: Dict[str, Dict[str, int]] = {}
    for m in _OP_RE.finditer(hlo_text):
        shape, op = m.group(1), m.group(2)
        d = out.setdefault(op, {"count": 0, "bytes": 0})
        d["count"] += 1
        d["bytes"] += _shape_bytes(shape)
    return out


def format_stats(stats: Dict[str, Dict[str, int]]) -> str:
    if not stats:
        return "no collectives"
    return ", ".join(f"{op} ×{d['count']} {d['bytes'] / 1e6:.2f} MB"
                     for op, d in sorted(stats.items()))


def tree_bytes(tree) -> int:
    import jax
    import numpy as np
    return sum(np.size(x) * np.dtype(x.dtype).itemsize
               for x in jax.tree.leaves(tree))
