"""Pipeline parallelism: GPipe-style microbatched layer pipelining.

The reference has no pipeline parallelism (SURVEY.md §2.5 lists dp/zero/
fsdp/sp/tp only) — but pp is part of this framework's mesh vocabulary for
serving ultra-deep DiT stacks (48-layer StepVideo, 60-block Hunyuan) across
chips when TP's per-block all-reduces would saturate ICI.

Design: the layer stack lives as scan-stacked params sharded over the ``pp``
axis (each rank owns L/P contiguous layers). ``pipeline_apply`` runs inside
``shard_map``: a ``lax.scan`` over (M + P − 1) pipeline ticks where each
rank, per tick, (1) receives the previous rank's activation via ``ppermute``
(XLA collective-permute over ICI, overlapped with compute), (2) applies its
local layers to the microbatch currently resident, (3) forwards it. Rank 0
injects microbatch m at tick m; the last rank's outputs are collected on the
matching schedule. The bubble is the standard GPipe (P−1)/(M+P−1).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

# block_fn(layer_params, x) -> x  applied per layer (same signature as an
# nn.scan cell with no per-step inputs)
BlockFn = Callable[[Any, jnp.ndarray], jnp.ndarray]


def _apply_local_layers(block_fn: BlockFn, local_params: Any,
                        x: jnp.ndarray) -> jnp.ndarray:
    def body(carry, layer_params):
        return block_fn(layer_params, carry), None

    out, _ = jax.lax.scan(body, x, local_params)
    return out


def pipeline_apply_local(block_fn: BlockFn, local_params: Any,
                         microbatches: jnp.ndarray, axis: str
                         ) -> jnp.ndarray:
    """Inside shard_map. local_params: this rank's (L/P, ...) layer stack;
    microbatches: (M, mb, ...) — identical on every rank (rank 0 consumes).
    Returns (M, mb, ...) final outputs (valid on the LAST rank; other ranks
    hold garbage — the wrapper psum-selects)."""
    n = jax.lax.psum(1, axis)
    rank = jax.lax.axis_index(axis)
    m = microbatches.shape[0]
    ticks = m + n - 1
    perm = [(i, (i + 1) % n) for i in range(n)]

    mb_shape = microbatches.shape[1:]
    buf0 = jnp.zeros(mb_shape, microbatches.dtype)
    outputs0 = jnp.zeros_like(microbatches)

    def tick(carry, t):
        incoming, outputs = carry
        # rank 0 injects microbatch t (when in range); others use incoming
        inject = microbatches[jnp.minimum(t, m - 1)]
        x_in = jnp.where(rank == 0, inject, incoming)
        # active window for this rank: t in [rank, rank + m)
        active = jnp.logical_and(t >= rank, t < rank + m)
        y = _apply_local_layers(block_fn, local_params, x_in)
        y = jnp.where(active, y, incoming)
        # last rank stores its finished microbatch (index t − rank)
        out_idx = jnp.clip(t - rank, 0, m - 1)
        store = jnp.logical_and(rank == n - 1, active)
        outputs = jax.lax.cond(
            store,
            lambda o: o.at[out_idx].set(y),
            lambda o: o,
            outputs)
        # forward activations one hop around the ring
        nxt = jax.lax.ppermute(y, axis, perm)
        return (nxt, outputs), None

    (_, outputs), _ = jax.lax.scan(tick, (buf0, outputs0),
                                   jnp.arange(ticks))
    # broadcast the last rank's outputs to every rank so out_specs can be
    # replicated (masked psum)
    outputs = jnp.where(rank == n - 1, outputs, jnp.zeros_like(outputs))
    return jax.lax.psum(outputs, axis)


def pipeline_apply(mesh: Mesh, block_fn: BlockFn, stacked_params: Any,
                   x: jnp.ndarray, microbatches: int = 4,
                   axis: str = "pp") -> jnp.ndarray:
    """Run a (L, ...) scan-stacked layer stack pipelined over ``axis``.

    x: (B, ...) with B divisible by ``microbatches``. Params are passed
    sharded over their leading (layer) dim; activations stay replicated
    across pp (they flow rank-to-rank inside)."""
    b = x.shape[0]
    assert b % microbatches == 0, "batch must divide into microbatches"
    mbs = x.reshape(microbatches, b // microbatches, *x.shape[1:])

    pspec = jax.tree.map(lambda _: P(axis), stacked_params)
    fn = functools.partial(pipeline_apply_local, block_fn, axis=axis)
    mapped = shard_map(
        lambda p, mb: fn(p, mb),
        mesh=mesh,
        in_specs=(pspec, P()),
        out_specs=P(),
        check_vma=False)
    out = mapped(stacked_params, mbs)
    return out.reshape(b, *x.shape[1:])
