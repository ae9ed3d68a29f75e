"""Sequence parallelism: Ulysses all_to_all + ring attention over ICI.

Replaces the reference's two SP mechanisms (SURVEY.md §2.5):
- P4 DeepSpeed-Ulysses style: autograd-aware ``_AllToAll`` scattering heads /
  gathering sequence around full attention
  (/root/reference/videotuna/models/opensora/acceleration/communications.py:
  23-67, SeqParallelAttention models/opensora/models/layers/blocks.py:376-462)
- P5 xfuser hybrid Ulysses×Ring (``xFuserLongContextAttention`` patched into
  Hunyuan/Wan/StepVideo blocks — flow/hunyuanvideo.py:114-179,
  wan/distributed/xdit_context_parallel.py:66-193)

TPU-native design: everything is ``shard_map`` over the global mesh's ``sp``
axis; Ulysses is two ``jax.lax.all_to_all`` calls (head↔sequence reshard),
ring attention rotates KV shards with ``jax.lax.ppermute`` (XLA lowers to ICI
collective-permute, overlapping with the per-step attention compute) and
accumulates with the online-softmax recurrence. Both compose: for
world = ulysses × ring, pass both axis names.

All functions are *local* functions meant to run inside shard_map: inputs are
the per-shard blocks. ``sp_attention`` is the user-facing wrapper that builds
the shard_map for a given mesh.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from videotuna_tpu.kernels.attention import reference_attention


# ---------------------------------------------------------------------------
# Ulysses: sequence-sharded → head-sharded resharding around attention
# ---------------------------------------------------------------------------

def ulysses_attention_local(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                            axis: str,
                            attn_fn=None) -> jnp.ndarray:
    """Inside shard_map: q,k,v are (B, S/n, H, D) shards. All-to-all to
    (B, S, H/n, D), run full attention on the local heads, reshard back."""
    attn_fn = attn_fn or reference_attention
    n = jax.lax.psum(1, axis)

    def a2a_seq_to_heads(x):
        # (B, S/n, H, D) → (B, S, H/n, D)
        b, s_l, h, d = x.shape
        x = x.reshape(b, s_l, n, h // n, d)
        x = jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1,
                               tiled=False)
        # all_to_all with split_axis=2 (the n dim) concatenated on axis 1
        return x.reshape(b, s_l * n, h // n, d)

    def a2a_heads_to_seq(x):
        # (B, S, H/n, D) → (B, S/n, H, D). The received rank dim must land
        # BEFORE the local-head dim (head index = src_rank·h_l + local) to
        # invert a2a_seq_to_heads' split — wrong order permutes heads
        # whenever h_l > 1.
        b, s, h_l, d = x.shape
        x = x.reshape(b, n, s // n, h_l, d)
        x = jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=2,
                               tiled=False)
        return x.reshape(b, s // n, n * h_l, d)

    qg = a2a_seq_to_heads(q)
    kg = a2a_seq_to_heads(k)
    vg = a2a_seq_to_heads(v)
    out = attn_fn(qg, kg, vg)
    return a2a_heads_to_seq(out)


# ---------------------------------------------------------------------------
# Ring attention: KV rotation with online softmax
# ---------------------------------------------------------------------------

def ring_attention_local(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         axis: str,
                         scale: Optional[float] = None) -> jnp.ndarray:
    """Inside shard_map: q,k,v are (B, S/n, H, D) shards of the sequence.
    Each step attends q against the resident KV shard, then rotates KV one
    hop around the ring (ppermute); the online-softmax stats (m, l) merge
    partial results exactly. Equivalent to full attention over S.
    """
    n = jax.lax.psum(1, axis)
    b, s_l, h, d = q.shape
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    qf = q.astype(jnp.float32) * scale

    def partial_attn(k_blk, v_blk):
        s = jnp.einsum("bqhd,bkhd->bhqk", qf, k_blk.astype(jnp.float32))
        m = jnp.max(s, axis=-1, keepdims=True)            # (B,H,Sq,1)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v_blk.astype(jnp.float32))
        return o, m.squeeze(-1), l.squeeze(-1)            # (B,H,Sq)

    perm = [(i, (i + 1) % n) for i in range(n)]

    def body(i, carry):
        acc, m_run, l_run, k_cur, v_cur = carry
        o, m_p, l_p = partial_attn(k_cur, v_cur)
        m_new = jnp.maximum(m_run, m_p)
        alpha = jnp.exp(m_run - m_new)                    # rescale old
        beta = jnp.exp(m_p - m_new)                       # rescale new
        l_new = l_run * alpha + l_p * beta
        acc = (acc * alpha.transpose(0, 2, 1)[..., None]
               + o * beta.transpose(0, 2, 1)[..., None])
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        return acc, m_new, l_new, k_nxt, v_nxt

    acc0 = jnp.zeros((b, s_l, h, d), jnp.float32)
    m0 = jnp.full((b, h, s_l), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, s_l), jnp.float32)
    acc, m_run, l_run, _, _ = jax.lax.fori_loop(
        0, n, body, (acc0, m0, l0, k, v))
    out = acc / l_run.transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


def hybrid_sp_attention_local(q, k, v, ulysses_axis: str, ring_axis: str):
    """Ulysses over heads × ring over sequence (xfuser's hybrid, P5):
    all_to_all over the ulysses axis so each shard owns H/u heads of the
    ring-sharded sequence, ring-attend over the ring axis, reshard back."""
    return ulysses_attention_local(
        q, k, v, ulysses_axis,
        attn_fn=lambda qq, kk, vv: ring_attention_local(qq, kk, vv,
                                                        ring_axis))


# ---------------------------------------------------------------------------
# User-facing wrapper
# ---------------------------------------------------------------------------

def sp_attention(mesh: Mesh, q, k, v,
                 ulysses_axis: Optional[str] = "sp",
                 ring_axis: Optional[str] = None,
                 batch_axes: Tuple[str, ...] = ("dp", "fsdp")):
    """Full-sequence attention with the sequence dimension sharded over the
    mesh's sp axis (and optionally a separate ring axis). Inputs are GLOBAL
    arrays (B, S, H, D); sharding constraints route the shards."""
    from jax import shard_map

    if ring_axis and ulysses_axis:
        spec = P(batch_axes, (ulysses_axis, ring_axis), None, None)
        fn = functools.partial(hybrid_sp_attention_local,
                               ulysses_axis=ulysses_axis,
                               ring_axis=ring_axis)
    elif ring_axis:
        spec = P(batch_axes, ring_axis, None, None)
        fn = functools.partial(ring_attention_local, axis=ring_axis)
    else:
        spec = P(batch_axes, ulysses_axis, None, None)
        fn = functools.partial(ulysses_attention_local, axis=ulysses_axis)

    mapped = shard_map(fn, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec, check_vma=False)
    return mapped(q, k, v)
