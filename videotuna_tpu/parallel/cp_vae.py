"""Context-parallel 3D-causal VAE: temporal sharding with halo exchange.

Capability parity with the reference's CP VAE (SURVEY.md P7):
cogvideo_sat ``cp_enc_dec.py`` distributes temporal chunks of the video
across CP ranks with group collectives passing causal-conv boundary frames
(/root/reference/videotuna/models/cogvideo_sat/vae_modules/
cp_enc_dec.py:12-15,71-234).

TPU-native: the video's time axis is sharded over the mesh ``sp`` axis inside
``shard_map``; every causal temporal conv needs the last (k_t−1) frames of
the PREVIOUS shard, obtained with one ``ppermute`` halo push per conv —
XLA lowers it to ICI collective-permute overlapping the conv compute. Rank 0
front-pads by edge replication exactly like the single-device CausalConv3D,
so the sharded result is bit-identical to the unsharded one.

This module provides the halo-exchange primitive and a sharded-apply wrapper
for encoder/decoder stacks built from CausalConv3D.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def halo_exchange_time(x: jnp.ndarray, halo: int, axis: str) -> jnp.ndarray:
    """Prepend each shard with the previous shard's trailing ``halo`` frames
    (rank 0 gets edge replication). x: (B, T_local, H, W, C) →
    (B, T_local + halo, H, W, C)."""
    n = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    tail = x[:, -halo:]
    # push my tail to my right neighbor
    perm = [(i, (i + 1) % n) for i in range(n)]
    received = jax.lax.ppermute(tail, axis, perm)
    # rank 0's "received" came from the last rank — replace with edge pad
    first_pad = jnp.repeat(x[:, :1], halo, axis=1)
    received = jnp.where(idx == 0, first_pad, received)
    return jnp.concatenate([received, x], axis=1)


def cp_causal_conv(x_local: jnp.ndarray, conv_fn: Callable, kt: int,
                   axis: str) -> jnp.ndarray:
    """Apply a temporally-causal conv over a time-sharded input:
    halo-exchange (kt−1) frames, run the conv with NO internal front pad
    (the halo provides it), return the local shard of the output."""
    halo = kt - 1
    if halo > 0:
        x_local = halo_exchange_time(x_local, halo, axis)
    return conv_fn(x_local)


def sharded_vae_apply(mesh: Mesh, fn: Callable[[jnp.ndarray], jnp.ndarray],
                      video: jnp.ndarray, halo: int,
                      axis: str = "sp") -> jnp.ndarray:
    """Run a frame-local function (e.g. a per-frame decoder stage) over the
    time axis sharded on ``axis`` with causal halo.

    For full encoder/decoder stacks the per-layer variant (cp_causal_conv
    inside the model) is preferred; this whole-stack wrapper suits stages
    whose receptive field is bounded by ``halo`` frames.
    """
    def local(v):
        out = cp_causal_conv(v, fn, halo + 1, axis)
        return out[:, halo:] if halo > 0 else out

    spec = P(None, axis, None, None, None)
    mapped = shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec,
                       check_vma=False)
    return mapped(video)
