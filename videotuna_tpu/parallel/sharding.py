"""Sharding rules: the pjit replacement for DeepSpeed/FSDP/TP bookkeeping.

Covers SURVEY.md §2.5 P1-P3/P6: data-parallel batch sharding over ``dp``,
FSDP-style parameter/optimizer sharding over ``fsdp``, and Megatron-style
tensor-parallel specs over ``tp``. XLA inserts the all-gathers /
reduce-scatters that DeepSpeed ZeRO-3 and torch FSDP do by hand
(reference models/wan/wan/distributed/fsdp.py:11-33, configs/007.../
hunyuanvideo_t2v_diffuser_lora.yaml:109-128).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def fsdp_spec(param: jax.Array, fsdp_size: int,
              min_size: int = 2 ** 12) -> P:
    """Shard the largest axis divisible by ``fsdp_size``; replicate small
    params (norms, biases) — same policy torch FSDP applies via its wrap
    granularity."""
    if fsdp_size <= 1 or param.size < min_size:
        return P()
    dims = list(param.shape)
    order = sorted(range(len(dims)), key=lambda i: -dims[i])
    for i in order:
        if dims[i] % fsdp_size == 0 and dims[i] >= fsdp_size:
            spec = [None] * len(dims)
            spec[i] = "fsdp"
            return P(*spec)
    return P()


def shard_params(params: Any, mesh: Mesh,
                 min_size: int = 2 ** 12) -> Any:
    """Tree of NamedShardings implementing FSDP over the ``fsdp`` axis."""
    fsdp_size = mesh.shape.get("fsdp", 1)

    def spec_of(p):
        return NamedSharding(mesh, fsdp_spec(p, fsdp_size, min_size))

    return jax.tree.map(spec_of, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim over (dp, fsdp) — fsdp participates in data parallelism for
    activations, as in ZeRO."""
    return NamedSharding(mesh, P(("dp", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch dict onto the mesh, batch-dim sharded."""
    bs = batch_sharding(mesh)
    rep = replicated(mesh)

    def place(x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return x
        try:
            return jax.device_put(x, bs)
        except ValueError:
            return jax.device_put(x, rep)

    return jax.tree.map(place, batch)


# ---------------------------------------------------------------------------
# Tensor-parallel specs (Megatron column/row) — used by StepVideo-class DiTs.
# ---------------------------------------------------------------------------

def tp_col_spec() -> P:
    """Column parallel: shard output features over tp."""
    return P(None, "tp")


def tp_row_spec() -> P:
    """Row parallel: shard input features over tp."""
    return P("tp", None)


def logical_to_mesh(spec_tree: Any, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s) if isinstance(s, P) else s,
        spec_tree, is_leaf=lambda s: isinstance(s, P))
