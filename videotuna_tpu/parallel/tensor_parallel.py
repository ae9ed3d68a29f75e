"""Tensor parallelism: Megatron-style param sharding via pjit specs.

Replaces the reference's two TP mechanisms (SURVEY.md P6):
- StepVideo: xfuser ``TensorParallelApplicator`` rewriting linear layers
  (/root/reference/videotuna/flow/stepvideo.py:37,68-70),
- CogVideoX-SAT: SwissArmyTransformer ``mpu.initialize_model_parallel``
  (models/cogvideo_sat/arguments.py:107).

TPU-native: no module rewriting — parameters are *placed* with column/row
PartitionSpecs over the mesh ``tp`` axis and GSPMD partitions the matmuls,
inserting the all-reduces Megatron does by hand. Rules are path-regex →
spec; attention QKV and MLP-in are column-sharded (output features), the
projections back are row-sharded (input features), so each block needs one
all-reduce per attention + one per MLP — the Megatron minimum.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, spec builder) — applied to 2D kernels; 3D DenseGeneral
# kernels (in, heads, head_dim) column-shard the heads axis.
DEFAULT_TP_RULES: Tuple[Tuple[str, str], ...] = (
    (r"(self_|cross_|img_|txt_)?(q|k|v)(_proj)?/kernel$", "col"),
    (r"(attn|self|cross)_out/kernel$", "row"),
    (r"(ffn1|fc1|mlp1|wi_0|wi_1|gate|up|linear1)/kernel$", "col"),
    (r"(ffn2|fc2|mlp2|wo|down|linear2)/kernel$", "row"),
)


def _spec_for(kind: str, ndim: int) -> P:
    if kind == "col":
        if ndim == 2:
            return P(None, "tp")
        if ndim == 3:             # DenseGeneral (in, heads, head_dim)
            return P(None, "tp", None)
    if kind == "row":
        if ndim == 2:
            return P("tp", None)
        if ndim == 3:             # (heads, head_dim, out) — rare
            return P("tp", None, None)
    return P()


def tp_specs(params: Any, tp_size: int,
             rules: Sequence[Tuple[str, str]] = DEFAULT_TP_RULES,
             fsdp_size: int = 1) -> Any:
    """PartitionSpec tree for a param tree: TP rules first, FSDP fallback
    for the rest (compose both axes for large kernels)."""
    from videotuna_tpu.parallel.sharding import fsdp_spec

    def walk(tree, prefix):
        if isinstance(tree, dict):
            return {k: walk(v, prefix + (str(k),)) for k, v in tree.items()}
        path = "/".join(prefix)
        if tp_size > 1:
            for pattern, kind in rules:
                if re.search(pattern, path):
                    spec = _spec_for(kind, tree.ndim)
                    # shardability check
                    for dim, name in zip(tree.shape, spec):
                        if name == "tp" and dim % tp_size != 0:
                            break
                    else:
                        return spec
        return fsdp_spec(tree, fsdp_size)

    return walk(params, ())


def apply_tp(params: Any, mesh: Mesh,
             rules: Sequence[Tuple[str, str]] = DEFAULT_TP_RULES) -> Any:
    """Place params on the mesh with TP(+FSDP) shardings."""
    tp_size = mesh.shape.get("tp", 1)
    fsdp_size = mesh.shape.get("fsdp", 1)
    specs = tp_specs(params, tp_size, rules, fsdp_size)
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs, is_leaf=lambda s: isinstance(s, P))
    return jax.device_put(params, shardings)
