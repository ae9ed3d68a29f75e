"""Fused attention for TPU: Pallas flash-attention kernel + jnp fallback.

Replaces the reference's flash-attn 2/3 wrapper
(videotuna/models/wan/wan/modules/attention.py:23-60) and the
``enable_flashattn`` paths in opensora/hunyuan. One entry point,
``dot_product_attention(q, k, v, ...)``, dispatches to:

- a Pallas blockwise online-softmax kernel on TPU (MXU-tiled, fp32
  accumulation, bf16 inputs welcome), or
- ``jnp`` reference attention elsewhere (CPU tests, tiny shapes).

Layout: (batch, seq, heads, head_dim) — the flax convention. Video models call
this for spatial, temporal, and full-3D attention; the sequence axis is
whatever the caller flattened (H·W, T, or T·H·W).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled builds
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

# Block sizes tuned on v5e (16 heads, d=128, bf16): (1024, 2048) reaches
# 120 TF/s at 16k seq (61% MFU) vs 67 TF/s at (512, 512); larger q blocks
# exceed VMEM. Shorter sequences are capped to the padded length.
DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 2048
# packed two-head d=64 kernel blocks (two (bq, bk) score blocks live)
PACKED_BLOCK_Q = 512
PACKED_BLOCK_K = 1024
# (bf16 exp inside the packed kernel was measured SLOWER than f32 —
# Mosaic upcasts for the transcendental; the win is exp2 + no masking)
_NEG_INF = -1e30


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# Reference implementation (CPU fallback + correctness oracle for tests)
# ---------------------------------------------------------------------------

def reference_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        bias: Optional[jnp.ndarray] = None,
                        causal: bool = False,
                        scale: Optional[float] = None) -> jnp.ndarray:
    *_, sq, h, d = q.shape
    sk = k.shape[-3]
    scale = 1.0 / math.sqrt(d) if scale is None else scale
    logits = jnp.einsum("...qhd,...khd->...hqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias
    if causal:
        mask = jnp.tril(jnp.ones((sq, sk), bool))
        logits = jnp.where(mask, logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("...hqk,...khd->...qhd", probs, v)


# ---------------------------------------------------------------------------
# Pallas flash attention
# ---------------------------------------------------------------------------

def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
                  block_k: int, sm_scale: float, causal: bool, kv_len: int,
                  q_block: int, kv_pad: int = 0,
                  static_max: Optional[float] = None):
    """Grid = (batch·head, q_blocks, kv_blocks); kv is the innermost
    (sequential) dim, so the online-softmax stats persist in VMEM scratch
    across kv steps while Pallas double-buffers the (block_k, d) KV tiles
    from HBM. Peak VMEM is O(block_q·d + 2·block_k·d), independent of
    sequence length — the reference keeps full KV per device and relies on
    80 GB HBM.
    Accumulation fp32 (FlashAttention-2 recurrence), stats in the log2
    domain (bare exp2 transcendental — log2e is folded into the Q scale).
    Non-causal kv padding is NOT masked per step: zero-padded keys score
    exactly 0, so each contributes exp2(−m_final) to l (and nothing to
    acc); the finish step removes kv_pad·exp2(−m_final) in closed form.
    The causal mask subsumes kv padding (k_pos ≤ q_pos < kv_len)."""
    j = pl.program_id(2)
    num_kv = pl.num_programs(2)
    q_start = pl.program_id(1) * q_block

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # f32-cast operands: Mosaic fuses the bf16→f32 converts into the MXU
    # feed, so this runs at bf16 rate; explicit bf16 operands measured
    # SLOWER on-chip (packed kernel 130 ms vs 119 ms at 17.8k seq) —
    # the extra astype passes cost more than they save
    q = q_ref[:].astype(jnp.float32) * (sm_scale * _LOG2E)
    k_blk = k_ref[:].astype(jnp.float32)
    v_blk = v_ref[:].astype(jnp.float32)
    s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)

    if causal:
        k_pos = (j * block_k
                 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1))
        q_pos = (q_start
                 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0))
        s = jnp.where(q_pos >= k_pos, s, _NEG_INF)

    if static_max is not None:
        # STATIC-MAX softmax (qk-normed attention; see packed2t kernel):
        # no running max, no rescales — sub+exp2+sum only per step
        p = _exp2_sub(s, static_max)
        l_ref[:] = l_ref[:] + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] + jnp.dot(
            p, v_blk, preferred_element_type=jnp.float32)
    else:
        m_i = m_ref[:]
        l_i = l_ref[:]
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m_i - m_new)
        l_ref[:] = alpha * l_i + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:] = m_new
        acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
            p, v_blk, preferred_element_type=jnp.float32)

    @pl.when(j == num_kv - 1)
    def _finish():
        l_f = l_ref[:]
        if kv_pad and not causal:  # closed-form zero-pad key removal
            if static_max is not None:
                l_f = l_f - kv_pad * (2.0 ** (-static_max))
            else:
                l_f = l_f - kv_pad * jnp.exp2(-m_ref[:])
        o_ref[:] = (acc_ref[:]
                    / jnp.maximum(l_f, 1e-30)).astype(o_ref.dtype)


_LOG2E = 1.4426950408889634


def _exp2_sub(s, static_max):
    """exp2(s − M) with the M=0 subtract elided. Softmax output is
    INVARIANT to the common 2^−M factor (it cancels in acc/l), so M only
    positions the f32 range window (scores must lie in (M−126, M+127));
    qk-normed scores are bounded ≪ 126, making M=0 valid — and one VPU
    pass over the score tile cheaper (measured via attn_d128_staticmax).
    Callers that need headroom for LARGE positive scores keep M>0."""
    return jnp.exp2(s) if static_max == 0.0 else jnp.exp2(s - static_max)


def _flash_kernel_packed2(q_ref, k_ref, v_ref, o_ref, acc_ref,
                          m0_ref, l0_ref, m1_ref, l1_ref, *,
                          block_k: int, sm_scale: float, kv_len: int,
                          kv_pad: int):
    """Two d=64 heads packed into one 128-lane stream (VERDICT r2 next-1b).

    q/k/v refs are (block, 128) with head 2i in lanes 0–63 and head 2i+1
    in lanes 64–127 (a free reshape of the (B,S,H,64) layout — no zero
    padding). Per kv step the K tile is lane-masked into per-head halves
    and each half contracts against the full 128-lane Q at full MXU rate:

        s0 = [q0|q1] @ [k0|0]ᵀ ,   s1 = [q0|q1] @ [0|k1]ᵀ

    MXU cycles equal the zero-padded two-head path (the d=64 data simply
    does not contain 128 lanes of useful contraction), but HBM traffic
    for Q/K/V/O halves (no pad copies, K/V tiles stream once for two
    heads) and the grid has half the programs.

    VPU economies (the measured gap to the MXU floor is all VPU):
    - online-softmax stats run in the log2 domain (log2e folded into the
      Q scaling) so the transcendental is a bare exp2 per score;
    - the kv-pad tail is NOT masked per step: zero-padded keys score
      exactly 0, so after the online rescales each contributes exactly
      exp2(−m_final) to l (and nothing to acc — V pads are zero). The
      finish step subtracts kv_pad·exp2(−m_final) from l in closed form,
      eliminating an iota+compare+select over every score element of
      every kv step;
    - no concatenated (bq, 2·bk) score/prob block: s0/s1 stay separate,
      removing two slice copies and a 1M-element concat per step.
    Not used for causal attention (video DiT attention is non-causal)."""
    j = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m0_ref[:] = jnp.full_like(m0_ref, _NEG_INF)
        l0_ref[:] = jnp.zeros_like(l0_ref)
        m1_ref[:] = jnp.full_like(m1_ref, _NEG_INF)
        l1_ref[:] = jnp.zeros_like(l1_ref)

    q = q_ref[:].astype(jnp.float32) * (sm_scale * _LOG2E)
    k_blk = k_ref[:].astype(jnp.float32)
    v_blk = v_ref[:].astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    mlo = (lane < 64).astype(jnp.float32)
    mhi = 1.0 - mlo
    s0 = jnp.dot(q, (k_blk * mlo).T, preferred_element_type=jnp.float32)
    s1 = jnp.dot(q, (k_blk * mhi).T, preferred_element_type=jnp.float32)

    m0 = m0_ref[:]
    m1 = m1_ref[:]
    m0n = jnp.maximum(m0, jnp.max(s0, axis=-1, keepdims=True))
    m1n = jnp.maximum(m1, jnp.max(s1, axis=-1, keepdims=True))
    p0 = jnp.exp2(s0 - m0n)
    p1 = jnp.exp2(s1 - m1n)
    a0 = jnp.exp2(m0 - m0n)
    a1 = jnp.exp2(m1 - m1n)
    l0_ref[:] = a0 * l0_ref[:] + jnp.sum(p0, axis=-1, keepdims=True)
    l1_ref[:] = a1 * l1_ref[:] + jnp.sum(p1, axis=-1, keepdims=True)
    m0_ref[:] = m0n
    m1_ref[:] = m1n
    alpha_cat = a0 * mlo + a1 * mhi           # (bq, 128) via broadcast
    acc_ref[:] = (acc_ref[:] * alpha_cat
                  + jnp.dot(p0, v_blk * mlo,
                            preferred_element_type=jnp.float32)
                  + jnp.dot(p1, v_blk * mhi,
                            preferred_element_type=jnp.float32))

    @pl.when(j == num_kv - 1)
    def _finish():
        l0 = l0_ref[:]
        l1 = l1_ref[:]
        if kv_pad:  # closed-form removal of the zero-padded keys from l
            l0 = l0 - kv_pad * jnp.exp2(-m0_ref[:])
            l1 = l1 - kv_pad * jnp.exp2(-m1_ref[:])
        l_cat = (jnp.maximum(l0, 1e-30) * mlo
                 + jnp.maximum(l1, 1e-30) * mhi)
        o_ref[:] = (acc_ref[:] / l_cat).astype(o_ref.dtype)


def _finish_packed2t_fused(j, num_kv, o_ref, lse0_ref, lse1_ref,
                           acc0_ref, acc1_ref, *, kv_pad, static_max,
                           emit_lse):
    """Final-step epilogue of the fused static-max branch: l lives in
    acc row 64 (the ones-row PV fusion), rows 0-63 are the PV sums."""
    @pl.when(j == num_kv - 1)
    def _finish():
        l0 = acc0_ref[64:65]
        l1 = acc1_ref[64:65]
        if kv_pad:   # pad keys score exactly −M (indicator lane only)
            pad_p = kv_pad * (2.0 ** (-static_max))
            l0 = l0 - pad_p
            l1 = l1 - pad_p
        l0 = jnp.maximum(l0, 1e-30)
        l1 = jnp.maximum(l1, 1e-30)
        o_ref[:64] = (acc0_ref[:64] / l0).astype(o_ref.dtype)
        o_ref[64:] = (acc1_ref[:64] / l1).astype(o_ref.dtype)
        if emit_lse:
            lse0 = (static_max + jnp.log2(l0)) * (1.0 / _LOG2E)
            lse1 = (static_max + jnp.log2(l1)) * (1.0 / _LOG2E)
            lse0_ref[:] = jnp.broadcast_to(lse0, lse0_ref.shape)
            lse1_ref[:] = jnp.broadcast_to(lse1, lse1_ref.shape)


def _flash_kernel_packed2t(k_ref, qT_ref, vT_ref, *refs,
                           sm_scale: float, kv_pad: int,
                           static_max: Optional[float] = None,
                           fused_sm: bool = True,
                           emit_lse: bool = False):
    """Two d=64 heads, TRANSPOSED score space — the full-rate-PV variant.

    The natural-layout packed kernel above performs 2× MXU work on BOTH
    matmuls (per-head lane masking of the 128-lane stream): ceiling
    197/2 = 98.5 TF/s. Here only the score matmul keeps the inherent 2×
    (d=64 data has no 128 useful contraction lanes); PV runs at exactly
    1× by computing everything transposed:

        s0ᵀ = (k·mlo) @ qᵀ          (bk, bq)   contraction 128: full rate
        acc0ᵀ += v0ᵀ @ p0ᵀ          (64, bq)   N = bq = full lanes: 1× work

    Performed-vs-useful MXU drops from 8/4 to 6/4 → ceiling 131 TF/s.
    Side benefits: the online-softmax stats live as (1, bq) LANE vectors
    (max/sum over the kv axis are sublane reductions; the rescale
    broadcasts along sublanes — no lane-broadcast of a (bq,1) column),
    and the acc rescale touches 2·(64, bq) instead of (bq, 128).
    Same closed-form zero-pad-key correction as the natural kernel
    (pad key rows of s*ᵀ are exactly 0 ⇒ each contributes exp2(−m_final)
    to l). Non-causal only, like every packed path.

    ``emit_lse`` adds per-head LSE outputs (natural log, sublane-
    replicated (8, bq) blocks) for the packed fused backward — the
    training path."""
    j = pl.program_id(2)
    num_kv = pl.num_programs(2)
    if emit_lse:
        (o_ref, lse0_ref, lse1_ref, acc0_ref, acc1_ref,
         m0_ref, l0_ref, m1_ref, l1_ref) = refs
    else:
        (o_ref, acc0_ref, acc1_ref,
         m0_ref, l0_ref, m1_ref, l1_ref) = refs
        lse0_ref = lse1_ref = None

    @pl.when(j == 0)
    def _init():
        acc0_ref[:] = jnp.zeros_like(acc0_ref)
        acc1_ref[:] = jnp.zeros_like(acc1_ref)
        m0_ref[:] = jnp.full_like(m0_ref, _NEG_INF)
        l0_ref[:] = jnp.zeros_like(l0_ref)
        m1_ref[:] = jnp.full_like(m1_ref, _NEG_INF)
        l1_ref[:] = jnp.zeros_like(l1_ref)

    k_blk = k_ref[:].astype(jnp.float32)                      # (bk, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    mlo = (lane < 64).astype(jnp.float32)
    vT = vT_ref[:].astype(jnp.float32)                        # (128, bk)

    if static_max is not None and fused_sm:
        # FUSED STATIC-MAX (the serial-VPU model: per score element the
        # MXU performs ~192 MACs vs ~5-6 VPU ops, and Mosaic does not
        # overlap the units — measured 76.5 TF/s ≈ 197·128/(192+144);
        # every VPU pass over the (bk, bq) score tile costs ~8% e2e).
        # Two VPU passes removed vs the plain static-max branch:
        # 1. the −M subtract folds INTO the QK matmul: head0's k uses
        #    lanes 0-63, so lane 64 becomes an indicator (k0 = k·mlo + 1
        #    at lane 64) and qa0's row 64 carries −M ⇒ s0ᵀ = log2-scores
        #    − M straight off the MXU (head1 symmetric via lane 63);
        # 2. the l row-sum folds INTO the PV matmul: V gets a ones-row
        #    appended (va = [vᵀ; 1; 0⁷], 72 rows) so acc row 64
        #    accumulates Σp — no jnp.sum over the score tile.
        # The q-side masks merge with the sm_scale·log2e multiply into
        # one FMA per head over (128, bq) — cheap, bq ≪ bk.
        # Exactness unchanged: pad-key rows of k are 0, the indicator
        # adds make their scores exactly −M ⇒ same closed-form kv_pad
        # correction on l.
        row = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        qf = qT_ref[:].astype(jnp.float32)                    # (128, bq)
        sc = sm_scale * _LOG2E
        qa0 = (qf * ((row < 64).astype(jnp.float32) * sc)
               + (row == 64).astype(jnp.float32) * (-static_max))
        qa1 = (qf * ((row >= 64).astype(jnp.float32) * sc)
               + (row == 63).astype(jnp.float32) * (-static_max))
        k0 = k_blk * mlo + (lane == 64).astype(jnp.float32)
        k1 = k_blk * (1.0 - mlo) + (lane == 63).astype(jnp.float32)
        s0t = jnp.dot(k0, qa0, preferred_element_type=jnp.float32)
        s1t = jnp.dot(k1, qa1, preferred_element_type=jnp.float32)
        p0t = jnp.exp2(s0t)                                   # (bk, bq)
        p1t = jnp.exp2(s1t)
        rowa = jax.lax.broadcasted_iota(jnp.int32,
                                        (8, k_blk.shape[0]), 0)
        aux = (rowa == 0).astype(jnp.float32)     # [1ᵀ; 0⁷] rows
        va0 = jnp.concatenate([vT[:64], aux], axis=0)         # (72, bk)
        va1 = jnp.concatenate([vT[64:], aux], axis=0)
        acc0_ref[:] = acc0_ref[:] + jnp.dot(
            va0, p0t, preferred_element_type=jnp.float32)     # (72, bq)
        acc1_ref[:] = acc1_ref[:] + jnp.dot(
            va1, p1t, preferred_element_type=jnp.float32)
        return _finish_packed2t_fused(
            j, num_kv, o_ref, lse0_ref, lse1_ref, acc0_ref, acc1_ref,
            kv_pad=kv_pad, static_max=static_max, emit_lse=emit_lse)

    qT = qT_ref[:].astype(jnp.float32) * (sm_scale * _LOG2E)  # (128, bq)
    s0t = jnp.dot(k_blk * mlo, qT,
                  preferred_element_type=jnp.float32)         # (bk, bq)
    s1t = jnp.dot(k_blk * (1.0 - mlo), qT,
                  preferred_element_type=jnp.float32)

    if static_max is not None:
        # STATIC-MAX softmax (opt-in, qk-normed attention only): the
        # caller guarantees |log2-scores| ≤ static_max, so the running
        # max, the alpha rescales, and the acc/l rescale multiplies all
        # drop — per kv step only sub+exp2+sum touch the score block.
        # Mathematically identical to online softmax (the final divide
        # normalizes away the common 2^−M factor); f32 relative
        # precision is scale-free so accuracy matches the online path
        # as long as scores stay within (M−126, M+127) of exp2's range.
        # Kept reachable (fused_sm=False) as the A/B baseline for the
        # fused branch above.
        p0t = _exp2_sub(s0t, static_max)
        p1t = _exp2_sub(s1t, static_max)
        l0_ref[:] = l0_ref[:] + jnp.sum(p0t, axis=0, keepdims=True)
        l1_ref[:] = l1_ref[:] + jnp.sum(p1t, axis=0, keepdims=True)
        acc0_ref[:] = acc0_ref[:] + jnp.dot(
            vT[:64], p0t, preferred_element_type=jnp.float32)
        acc1_ref[:] = acc1_ref[:] + jnp.dot(
            vT[64:], p1t, preferred_element_type=jnp.float32)
    else:
        m0 = m0_ref[:]                                        # (1, bq)
        m1 = m1_ref[:]
        m0n = jnp.maximum(m0, jnp.max(s0t, axis=0, keepdims=True))
        m1n = jnp.maximum(m1, jnp.max(s1t, axis=0, keepdims=True))
        p0t = jnp.exp2(s0t - m0n)
        p1t = jnp.exp2(s1t - m1n)
        a0 = jnp.exp2(m0 - m0n)
        a1 = jnp.exp2(m1 - m1n)
        l0_ref[:] = a0 * l0_ref[:] + jnp.sum(p0t, axis=0, keepdims=True)
        l1_ref[:] = a1 * l1_ref[:] + jnp.sum(p1t, axis=0, keepdims=True)
        m0_ref[:] = m0n
        m1_ref[:] = m1n
        acc0_ref[:] = acc0_ref[:] * a0 + jnp.dot(
            vT[:64], p0t, preferred_element_type=jnp.float32) # (64, bq)
        acc1_ref[:] = acc1_ref[:] * a1 + jnp.dot(
            vT[64:], p1t, preferred_element_type=jnp.float32)

    @pl.when(j == num_kv - 1)
    def _finish():
        l0 = l0_ref[:]
        l1 = l1_ref[:]
        if kv_pad:  # closed-form removal of the zero-padded keys from l
            if static_max is not None:
                pad_p = kv_pad * (2.0 ** (-static_max))
                l0 = l0 - pad_p
                l1 = l1 - pad_p
            else:
                l0 = l0 - kv_pad * jnp.exp2(-m0_ref[:])
                l1 = l1 - kv_pad * jnp.exp2(-m1_ref[:])
        l0 = jnp.maximum(l0, 1e-30)
        l1 = jnp.maximum(l1, 1e-30)
        o_ref[:64] = (acc0_ref[:] / l0).astype(o_ref.dtype)
        o_ref[64:] = (acc1_ref[:] / l1).astype(o_ref.dtype)
        if emit_lse:
            if static_max is not None:
                m0 = m1 = jnp.full_like(l0, static_max)
            else:
                m0, m1 = m0_ref[:], m1_ref[:]
            lse0 = (m0 + jnp.log2(l0)) * (1.0 / _LOG2E)   # (1, bq)
            lse1 = (m1 + jnp.log2(l1)) * (1.0 / _LOG2E)
            lse0_ref[:] = jnp.broadcast_to(lse0, lse0_ref.shape)
            lse1_ref[:] = jnp.broadcast_to(lse1, lse1_ref.shape)


def _squeeze_first_n(fn, n):
    """Squeeze the leading block dim of the first ``n`` refs (tensor I/O);
    the rest (scratch) stay as-is."""
    @functools.wraps(fn)
    def wrapped(*refs, **kw):
        return fn(*[r.at[0] for r in refs[:n]], *refs[n:], **kw)
    return wrapped


def _pack_pairs(x, b, s, h):
    """(B, S, H, 64) → (B·H/2, S, 128): head pair i = heads (2i, 2i+1)."""
    return x.reshape(b, s, h // 2, 128).transpose(0, 2, 1, 3) \
            .reshape(b * h // 2, s, 128)


def _flash_packed2t(q, k, v, *, sm_scale, block_q, block_k, interpret,
                    static_max=None, fused_sm=True, emit_lse=False):
    """Dispatch for the transposed-score packed kernel: (B,S,H,64) →
    packed (B·H/2, S, 128); Q and V are pre-transposed by XLA (one cheap
    relayout each) so every in-kernel dot is in natural [M,K]@[K,N]
    orientation; the (B·H/2, 128, Sq) output is untransposed after.
    With ``emit_lse`` also returns per-head LSE (B·H/2, 2, Sq_pad) f32
    (natural log) for the packed fused backward."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    qp = _pack_pairs(q, b, sq, h)
    kp = _pack_pairs(k, b, sk, h)
    vp = _pack_pairs(v, b, sk, h)
    if block_q is None:
        block_q = PACKED_BLOCK_Q
    if block_k is None:
        block_k = PACKED_BLOCK_K
    block_q = min(block_q, _round_to(sq, 128))
    block_k = min(block_k, _round_to(sk, 128))
    sq_pad = _round_to(sq, block_q)
    sk_pad = _round_to(sk, block_k)
    if sq_pad != sq:
        qp = jnp.pad(qp, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if sk_pad != sk:
        kp = jnp.pad(kp, ((0, 0), (0, sk_pad - sk), (0, 0)))
        vp = jnp.pad(vp, ((0, 0), (0, sk_pad - sk), (0, 0)))
    qT = qp.transpose(0, 2, 1)                 # (BH2, 128, sq_pad)
    vT = vp.transpose(0, 2, 1)                 # (BH2, 128, sk_pad)
    bh2 = b * h // 2
    kernel = functools.partial(_flash_kernel_packed2t, sm_scale=sm_scale,
                               kv_pad=sk_pad - sk, static_max=static_max,
                               fused_sm=fused_sm, emit_lse=emit_lse)
    # fused static-max: l rides in acc row 64 (+7 zero rows to the next
    # sublane multiple); m/l scratch stays allocated but untouched
    acc_rows = 72 if (static_max is not None and fused_sm) else 64
    kernel = _squeeze_first_n(kernel, 6 if emit_lse else 4)
    out_specs = [pl.BlockSpec((1, 128, block_q),
                              lambda i, j, kk: (i, 0, j))]
    out_shape = [jax.ShapeDtypeStruct((bh2, 128, sq_pad), q.dtype)]
    if emit_lse:
        for _ in range(2):
            out_specs.append(pl.BlockSpec((1, 8, block_q),
                                          lambda i, j, kk: (i, 0, j)))
            out_shape.append(jax.ShapeDtypeStruct((bh2, 8, sq_pad),
                                                  jnp.float32))
    res = pl.pallas_call(
        kernel,
        grid=(bh2, sq_pad // block_q, sk_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, block_k, 128), lambda i, j, kk: (i, kk, 0)),
            pl.BlockSpec((1, 128, block_q), lambda i, j, kk: (i, 0, j)),
            pl.BlockSpec((1, 128, block_k), lambda i, j, kk: (i, 0, kk)),
        ],
        out_specs=out_specs if emit_lse else out_specs[0],
        out_shape=out_shape if emit_lse else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((acc_rows, block_q), jnp.float32),   # acc0ᵀ
            pltpu.VMEM((acc_rows, block_q), jnp.float32),   # acc1ᵀ
            pltpu.VMEM((1, block_q), jnp.float32),    # m0
            pltpu.VMEM((1, block_q), jnp.float32),    # l0
            pltpu.VMEM((1, block_q), jnp.float32),    # m1
            pltpu.VMEM((1, block_q), jnp.float32),    # l1
        ] if pltpu is not None else [],
        interpret=interpret,
        compiler_params=_grid_params(interpret),
    )(kp, qT, vT)
    outT = res[0] if emit_lse else res
    out = outT[:, :, :sq].reshape(b, h // 2, 128, sq) \
        .transpose(0, 3, 1, 2)                 # (b, sq, h/2, 128)
    out = out.reshape(b, sq, h, d)
    if emit_lse:
        lse = jnp.stack([res[1][:, 0, :], res[2][:, 0, :]], axis=1)
        return out, lse                        # lse (BH2, 2, Sq_pad)
    return out


def _flash_packed2(q, k, v, *, sm_scale, block_q, block_k, interpret):
    """Dispatch path for d=64, even heads, non-causal: (B,S,H,64) →
    packed (B·H/2, S, 128) without zero padding."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    qt = q.reshape(b, sq, h // 2, 128).transpose(0, 2, 1, 3) \
          .reshape(b * h // 2, sq, 128)
    kt = k.reshape(b, sk, h // 2, 128).transpose(0, 2, 1, 3) \
          .reshape(b * h // 2, sk, 128)
    vt = v.reshape(b, sk, h // 2, 128).transpose(0, 2, 1, 3) \
          .reshape(b * h // 2, sk, 128)
    # the packed score block is (bq, 2·bk): block=None (the generic
    # entry default) resolves to the packed defaults (s_cat/p_cat must
    # stay in the ~16 MB VMEM budget); explicit blocks pass through
    if block_q is None:
        block_q = PACKED_BLOCK_Q
    if block_k is None:
        block_k = PACKED_BLOCK_K
    block_q = min(block_q, _round_to(sq, 128))
    block_k = min(block_k, _round_to(sk, 128))
    sq_pad = _round_to(sq, block_q)
    sk_pad = _round_to(sk, block_k)
    if sq_pad != sq:
        qt = jnp.pad(qt, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if sk_pad != sk:
        kt = jnp.pad(kt, ((0, 0), (0, sk_pad - sk), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, sk_pad - sk), (0, 0)))
    kernel = functools.partial(_flash_kernel_packed2, block_k=block_k,
                               sm_scale=sm_scale, kv_len=sk,
                               kv_pad=sk_pad - sk)
    kernel = _squeeze_kernel(kernel)
    out = pl.pallas_call(
        kernel,
        grid=(b * h // 2, sq_pad // block_q, sk_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, 128), lambda i, j, kk: (i, j, 0)),
            pl.BlockSpec((1, block_k, 128), lambda i, j, kk: (i, kk, 0)),
            pl.BlockSpec((1, block_k, 128), lambda i, j, kk: (i, kk, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, 128),
                               lambda i, j, kk: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h // 2, sq_pad, 128), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # acc (packed)
            pltpu.VMEM((block_q, 1), jnp.float32),    # m0
            pltpu.VMEM((block_q, 1), jnp.float32),    # l0
            pltpu.VMEM((block_q, 1), jnp.float32),    # m1
            pltpu.VMEM((block_q, 1), jnp.float32),    # l1
        ] if pltpu is not None else [],
        interpret=interpret,
        compiler_params=_grid_params(interpret),
    )(qt, kt, vt)
    out = out[:, :sq].reshape(b, h // 2, sq, 128).transpose(0, 2, 1, 3)
    return out.reshape(b, sq, h, d)


def _flash_kernel_t128(k_ref, qT_ref, vT_ref, o_ref, acc_ref, *,
                       sm_scale: float, kv_pad: int, static_max: float):
    """d=128 TRANSPOSED-score forward with the l-sum folded into the PV
    matmul. Static-max (qk-normed/bounded-logit attention) only.

    The natural-layout d=128 static-max branch spends two VPU passes per
    score tile (exp2 + l row-sum) against 256 MACs/elt of MXU work — the
    serial-VPU model (docs/kernels.md) prices each pass at ~8% e2e.
    Computing in score-transpose turns l into a LANE vector that rides
    the PV matmul on 8 aux sublanes:

        sᵀ   = k @ (qᵀ·scale)       (bk, bq)  contraction 128: full rate
        accᵀ += [vᵀ; 1ᵀ; 0⁷] @ pᵀ   (136, bq) — row 128 accumulates Σp

    MXU grows 256→264 MACs/elt, VPU drops 2→1 passes: the model predicts
    ~150 TF/s vs the 126 measured natural (A/B: bench attn_d128t).

    Unlike the packed d=64 fused kernel there is NO free contraction lane
    (k uses all 128), so −M cannot fold into the QK matmul; with the M=0
    elision (_exp2_sub) the subtract disappears anyway for every
    qk-normed family. Zero-padded keys score exactly 0 → each adds 2^−M
    to the folded l row; removed in closed form at finish (same argument
    as the natural kernel's kv_pad correction)."""
    j = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    k_blk = k_ref[:].astype(jnp.float32)                      # (bk, 128)
    qa = qT_ref[:].astype(jnp.float32) * (sm_scale * _LOG2E)  # (128, bq)
    st = jnp.dot(k_blk, qa, preferred_element_type=jnp.float32)
    p = _exp2_sub(st, static_max)                             # (bk, bq)
    # NB: the in-kernel concat (a V-tile copy per grid step) measured
    # FASTER than streaming a pre-augmented (136, sk) V from HBM — the
    # extra 6% HBM traffic outweighs the copy (1.036x vs 0.997x A/B)
    vT = vT_ref[:].astype(jnp.float32)                        # (128, bk)
    rowa = jax.lax.broadcasted_iota(jnp.int32, (8, k_blk.shape[0]), 0)
    aux = (rowa == 0).astype(jnp.float32)                     # [1ᵀ; 0⁷]
    va = jnp.concatenate([vT, aux], axis=0)                   # (136, bk)
    acc_ref[:] = acc_ref[:] + jnp.dot(va, p,
                                      preferred_element_type=jnp.float32)

    @pl.when(j == num_kv - 1)
    def _finish():
        l = acc_ref[128:129]                                  # (1, bq)
        if kv_pad:
            l = l - kv_pad * (2.0 ** (-static_max))
        l = jnp.maximum(l, 1e-30)
        o_ref[:] = (acc_ref[:128] / l).astype(o_ref.dtype)


def _flash_t128(qt, kt, vt, *, sm_scale, sq, sk, block_q, block_k,
                interpret, static_max):
    """Dispatch for the transposed-score d=128 fused-l kernel. Takes the
    head-major padded (B·H, S_pad, 128) tensors the plain path already
    built; Q and V are pre-transposed by XLA (one cheap relayout each);
    the (B·H, 128, Sq_pad) output is untransposed by the caller's
    existing reshape."""
    bh, sq_pad, d = qt.shape
    sk_pad = kt.shape[1]
    qT = qt.transpose(0, 2, 1)                 # (BH, 128, sq_pad)
    vT = vt.transpose(0, 2, 1)                 # (BH, 128, sk_pad)
    kernel = _squeeze_first_n(
        functools.partial(_flash_kernel_t128, sm_scale=sm_scale,
                          kv_pad=sk_pad - sk, static_max=static_max), 4)
    outT = pl.pallas_call(
        kernel,
        grid=(bh, sq_pad // block_q, sk_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, block_k, 128), lambda i, j, kk: (i, kk, 0)),
            pl.BlockSpec((1, 128, block_q), lambda i, j, kk: (i, 0, j)),
            pl.BlockSpec((1, 128, block_k), lambda i, j, kk: (i, 0, kk)),
        ],
        out_specs=pl.BlockSpec((1, 128, block_q),
                               lambda i, j, kk: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((bh, 128, sq_pad), qt.dtype),
        scratch_shapes=[
            pltpu.VMEM((136, block_q), jnp.float32),   # [accᵀ; l; 0⁷]
        ] if pltpu is not None else [],
        interpret=interpret,
        compiler_params=_grid_params(interpret),
    )(kt, qT, vT)
    return outT.transpose(0, 2, 1)             # (BH, sq_pad, 128)


def _round_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _grid_params(interpret: bool):
    """Mosaic pipelining hint shared by every flash kernel here: all five
    grids are (batch·head, output-blocks, reduction-blocks) with VMEM
    carry only along the innermost axis, so axes 0/1 are 'parallel' and
    the reduction axis 'arbitrary'. Without the hint Mosaic must assume
    every axis may carry state, which constrains cross-iteration
    prefetch scheduling."""
    if pltpu is None or interpret:
        return None
    return pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"))


@functools.partial(jax.jit, static_argnames=("causal", "scale", "block_q",
                                             "block_k", "interpret",
                                             "pack2", "static_max",
                                             "static_fused"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    causal: bool = False, scale: Optional[float] = None,
                    block_q: Optional[int] = None,
                    block_k: Optional[int] = None,
                    interpret: bool = False,
                    pack2: Optional[bool] = None,
                    kv_valid: Optional[jnp.ndarray] = None,
                    static_max: Optional[float] = None,
                    static_fused: bool = True) -> jnp.ndarray:
    """Pallas flash attention. q,k,v: (B, S, H, D) → (B, Sq, H, D).

    ``pack2``: for d=64 / even heads / non-causal, pack head pairs into
    one 128-lane stream (no zero-pad copies, half the KV HBM streaming —
    the CogVideoX-class path). ``"t"`` selects the transposed-score
    variant whose PV matmul runs at full MXU rate (131 TF/s ceiling vs
    98.5 for the natural layout). Default: auto (transposed when
    eligible).

    ``kv_valid``: optional (B, Sk) bool key-validity mask (ragged text
    padding). Non-causal only; runs the dynamic-pad kernel — masked rows
    are zeroed and removed from the softmax sum in closed form, no
    per-step masking cost.

    ``static_max``: opt-in fixed softmax max in the LOG2 domain (packed
    "t" path only for now). Valid ONLY when the caller can bound the
    scaled logits (qk-normed DiT attention): drops the running max and
    every online rescale. Exact up to f32 rounding while scores stay in
    (static_max − 126, static_max + 127)."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    kh = k.shape[2]
    if kh != h:  # GQA/MQA: broadcast KV heads
        k = jnp.repeat(k, h // kh, axis=2)
        v = jnp.repeat(v, h // kh, axis=2)
    sm_scale = (1.0 / math.sqrt(d)) if scale is None else scale
    if kv_valid is not None:
        assert not causal, "kv_valid is for non-causal attention"
        pack2 = False  # masked path uses the plain kernel
        vm = kv_valid[:, :, None, None]
        k = k * vm.astype(k.dtype)
        v = v * vm.astype(v.dtype)
    if pack2 is None:
        pack2 = "t" if (d == 64 and h % 2 == 0 and not causal) else False
    if pack2:
        assert d == 64 and h % 2 == 0 and not causal, \
            "pack2 needs d=64, even heads, non-causal"
        if pack2 == "t":
            return _flash_packed2t(q, k, v, sm_scale=sm_scale,
                                   block_q=block_q, block_k=block_k,
                                   interpret=interpret,
                                   static_max=static_max,
                                   fused_sm=static_fused)
        assert static_max is None, "static_max needs the packed-t path"
        return _flash_packed2(q, k, v, sm_scale=sm_scale,
                              block_q=block_q, block_k=block_k,
                              interpret=interpret)
    if static_max is not None:
        assert not causal, "static_max: non-causal only"
    # None = per-path default (the packed paths resolve their own above;
    # explicit caller values are honored verbatim on every path)
    if block_q is None:
        block_q = DEFAULT_BLOCK_Q
    if block_k is None:
        block_k = DEFAULT_BLOCK_K

    # Mosaic requires the lane (last) dim 128-aligned. Zero-pad head_dim:
    # scores are unchanged (zero columns contribute nothing to q·k), padded
    # v columns produce zeros that we slice away.
    d_pad = _round_to(d, 128)
    if d_pad != d:
        pad = ((0, 0), (0, 0), (0, 0), (0, d_pad - d))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    d_orig, d = d, d_pad

    block_q = min(block_q, _round_to(sq, 128))
    block_k = min(block_k, _round_to(sk, 128))
    sq_pad = _round_to(sq, block_q)
    sk_pad = _round_to(sk, block_k)

    # (B, S, H, D) → (B·H, S, D) with head-major layout for the grid
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    if sq_pad != sq:
        qt = jnp.pad(qt, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if sk_pad != sk:
        # padded keys get -inf logits via explicit masking-free trick: pad K
        # with zeros but V too; exp(s−m) for pad rows is then wrong, so mask
        # by padding K with a large negative projection is unreliable —
        # instead we simply require the kernel loop bound to cover only real
        # KV via `kv_len`.
        kt = jnp.pad(kt, ((0, 0), (0, sk_pad - sk), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, sk_pad - sk), (0, 0)))

    if kv_valid is not None:
        # zero-key count per batch = masked rows + alignment padding
        counts = (sk_pad
                  - jnp.sum(kv_valid.astype(jnp.float32), axis=1))
        cnt = jnp.broadcast_to(jnp.repeat(counts, h)[:, None, None],
                               (b * h, 8, 128)).astype(jnp.float32)
        out = _flash_dynpad(qt, kt, vt, cnt, sm_scale=sm_scale,
                            block_q=block_q, block_k=block_k,
                            emit_lse=False, interpret=interpret,
                            static_max=static_max)
        out = out[:, :sq].reshape(b, h, sq, d).transpose(0, 2, 1, 3)
        return out[..., :d_orig]

    if (static_max is not None and static_fused and not causal
            and d == 128 and sq >= 128 and sk >= 128):
        # transposed-score fused-l variant: one VPU pass per score tile
        # instead of two (see _flash_kernel_t128)
        out = _flash_t128(qt, kt, vt, sm_scale=sm_scale, sq=sq, sk=sk,
                          block_q=block_q, block_k=block_k,
                          interpret=interpret, static_max=static_max)
        out = out[:, :sq].reshape(b, h, sq, d).transpose(0, 2, 1, 3)
        return out[..., :d_orig]

    kernel = functools.partial(_flash_kernel, block_k=block_k,
                               sm_scale=sm_scale, causal=causal,
                               kv_len=sk, q_block=block_q,
                               kv_pad=sk_pad - sk, static_max=static_max)
    out = pl.pallas_call(
        kernel,
        grid=(b * h, sq_pad // block_q, sk_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),   # acc
            pltpu.VMEM((block_q, 1), jnp.float32),   # m
            pltpu.VMEM((block_q, 1), jnp.float32),   # l
        ] if pltpu is not None else [],
        interpret=interpret,
        compiler_params=_grid_params(interpret),
    )(qt, kt, vt)
    out = out[:, :sq].reshape(b, h, sq, d).transpose(0, 2, 1, 3)
    return out[..., :d_orig]


# The tensor refs are (1, S, D) blocks; squeeze the leading dim inside
# (scratch refs are already 2D).
def _squeeze_kernel(fn):
    @functools.wraps(fn)
    def wrapped(q_ref, k_ref, v_ref, o_ref, *scratch, **kw):
        return fn(q_ref.at[0], k_ref.at[0], v_ref.at[0], o_ref.at[0],
                  *scratch, **kw)
    return wrapped


_flash_kernel_blocked = _flash_kernel
_flash_kernel = _squeeze_kernel(_flash_kernel)


# ---------------------------------------------------------------------------
# Fused Pallas backward (FlashAttention-2): the forward streams KV and saves
# the per-row logsumexp; the backward recomputes P blockwise from (q, k,
# lse) and accumulates dq / dk / dv without ever materializing the (Sq, Sk)
# matrix. This is what lets 16k+ sequence TRAINING fit on-chip — the
# previous XLA-einsum VJP allocated O(S²) fp32 logits and OOMed exactly
# where the forward kernel was built to go (VERDICT.md weak-2).
#
# Layout trick: both backward kernels compute the score block TRANSPOSED
# (sT = k·qᵀ, shape (block_k, block_q)) so the per-q-row stats (lse, delta)
# stay in the lane dimension as (1, block_q) tiles — no sublane↔lane
# relayout inside the hot loop. dq uses dot_general to contract ds_T over
# its sublane (kv) dim directly.
# ---------------------------------------------------------------------------

DEFAULT_BWD_BLOCK_Q = 512
DEFAULT_BWD_BLOCK_K = 512


def _flash_fwd_lse_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                          acc_ref, m_ref, l_ref, *,
                          block_k: int, sm_scale: float, causal: bool,
                          kv_len: int, q_block: int, kv_pad: int = 0,
                          static_max: Optional[float] = None):
    """Forward kernel variant that also emits LSE = m + log(l) per q row
    (needed by the fused backward). Same recurrence as _flash_kernel:
    log2-domain stats, closed-form zero-pad key removal from l (the
    emitted LSE is the TRUE natural-log-sum-exp, so the backward's
    recomputed probabilities are exact without per-step pad masks)."""
    j = pl.program_id(2)
    num_kv = pl.num_programs(2)
    q_start = pl.program_id(1) * q_block

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32) * (sm_scale * _LOG2E)
    k_blk = k_ref[0].astype(jnp.float32)
    v_blk = v_ref[0].astype(jnp.float32)
    s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)

    if causal:
        k_pos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        q_pos = q_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        s = jnp.where(q_pos >= k_pos, s, _NEG_INF)

    if static_max is not None:
        # static-max path (qk-normed attention): the emitted LSE is still
        # the TRUE log-sum-exp (M + log2(l) with l accumulated at scale
        # 2^-M), so the backward kernels stay exact and unchanged
        p = _exp2_sub(s, static_max)
        l_ref[:] = l_ref[:] + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] + jnp.dot(
            p, v_blk, preferred_element_type=jnp.float32)
    else:
        m_i = m_ref[:]
        l_i = l_ref[:]
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m_i - m_new)
        l_ref[:] = alpha * l_i + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:] = m_new
        acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
            p, v_blk, preferred_element_type=jnp.float32)

    @pl.when(j == num_kv - 1)
    def _finish():
        l_f = l_ref[:]
        m_f = (jnp.full_like(m_ref[:], static_max)
               if static_max is not None else m_ref[:])
        if kv_pad and not causal:  # closed-form zero-pad key removal
            l_f = l_f - kv_pad * jnp.exp2(-m_f)
        l_fin = jnp.maximum(l_f, 1e-30)
        o_ref[0] = (acc_ref[:] / l_fin).astype(o_ref.dtype)
        # natural-log LSE (public across the ring/SP combine API):
        # stats are log2-domain, so scale by ln 2
        lse = (m_f + jnp.log2(l_fin)) * (1.0 / _LOG2E)
        # lane-replicated write: Mosaic needs the last two block dims
        # (8, 128)-aligned, so the lse output is (…, block_q, 128)
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _flash_forward_lse(qt, kt, vt, *, sm_scale, causal, sq, sk,
                       block_q, block_k, interpret, static_max=None):
    """qt/kt/vt: (BH, S_pad, D) padded. Returns (out, lse) with
    out (BH, Sq_pad, D), lse (BH, Sq_pad) fp32."""
    bh, sq_pad, d = qt.shape
    sk_pad = kt.shape[1]
    kernel = functools.partial(_flash_fwd_lse_kernel, block_k=block_k,
                               sm_scale=sm_scale, causal=causal,
                               kv_len=sk, q_block=block_q,
                               kv_pad=sk_pad - sk, static_max=static_max)
    out, lse = pl.pallas_call(
        kernel,
        grid=(bh, sq_pad // block_q, sk_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0)),
            pl.BlockSpec((1, block_q, 128), lambda i, j, kk: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq_pad, d), qt.dtype),
            jax.ShapeDtypeStruct((bh, sq_pad, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ] if pltpu is not None else [],
        interpret=interpret,
        compiler_params=_grid_params(interpret),
    )(qt, kt, vt)
    return out, lse[:, :, 0]


def _flash_kernel_dynpad(q_ref, k_ref, v_ref, cnt_ref, *refs,
                         sm_scale: float, emit_lse: bool,
                         static_max: Optional[float] = None):
    """Non-causal flash forward with a PER-(batch·head) DYNAMIC zero-key
    count — the masked-attention (ragged caption / kv_valid) kernel.

    Masked K/V rows are zeroed OUTSIDE the kernel (a traced elementwise
    multiply, so autodiff also zeroes their dk/dv); inside, every all-zero
    key scores exactly 0 and therefore contributes exactly exp2(−m_final)
    to l after the online rescales (and nothing to acc — its V row is
    zero). The finish step removes cnt·exp2(−m) in closed form, where cnt
    counts BOTH masked rows and block-alignment padding. This keeps the
    steady-state loop identical to _flash_kernel — no per-step iota /
    compare / select over the score block, which at video sequence
    lengths is a measurable VPU cost.

    Replaces the reference's additive key-padding bias
    (e.g. mochi joint attention, stepvideo ragged captions) that would
    otherwise force the O(S²) XLA path."""
    j = pl.program_id(2)
    num_kv = pl.num_programs(2)
    if emit_lse:
        o_ref, lse_ref, acc_ref, m_ref, l_ref = refs
    else:
        o_ref, acc_ref, m_ref, l_ref = refs
        lse_ref = None

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32) * (sm_scale * _LOG2E)
    k_blk = k_ref[0].astype(jnp.float32)
    v_blk = v_ref[0].astype(jnp.float32)
    s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)

    if static_max is not None:
        # fixed-max softmax (qk-normed callers, see flash_attention):
        # zeroed keys still score exactly 0 → each contributes exactly
        # 2^−static_max to l, removed in closed form at finish. NOTE an
        # all-masked row then cancels to l=0 and clamps to a zero output
        # (same as the online path below, where l collapses to the
        # 1e-30 clamp) — callers must keep ≥1 valid key per row.
        p = _exp2_sub(s, static_max)
        l_ref[:] = l_ref[:] + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] + jnp.dot(
            p, v_blk, preferred_element_type=jnp.float32)
    else:
        m_i = m_ref[:]
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m_i - m_new)
        l_ref[:] = alpha * l_ref[:] + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:] = m_new
        acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
            p, v_blk, preferred_element_type=jnp.float32)

    @pl.when(j == num_kv - 1)
    def _finish():
        cnt = cnt_ref[0, 0, 0]
        m_f = (jnp.full_like(m_ref[:], static_max)
               if static_max is not None else m_ref[:])
        l_f = l_ref[:] - cnt * jnp.exp2(-m_f)
        l_fin = jnp.maximum(l_f, 1e-30)
        o_ref[0] = (acc_ref[:] / l_fin).astype(o_ref.dtype)
        if emit_lse:
            lse = (m_f + jnp.log2(l_fin)) * (1.0 / _LOG2E)
            lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _flash_dynpad(qt, kt, vt, cnt, *, sm_scale, block_q, block_k,
                  emit_lse, interpret, static_max=None):
    """qt/kt/vt: (BH, S_pad, D) padded+packed; cnt: (BH, 8, 128) f32
    sublane/lane-replicated zero-key counts (masked + alignment pad —
    same Mosaic (8, 128) stat-feeding rule as the backward's lse8).
    Returns out (BH, Sq_pad, D) and, when emit_lse, lse (BH, Sq_pad)."""
    bh, sq_pad, d = qt.shape
    sk_pad = kt.shape[1]
    kernel = functools.partial(_flash_kernel_dynpad, sm_scale=sm_scale,
                               emit_lse=emit_lse, static_max=static_max)
    out_specs = [pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0))]
    out_shape = [jax.ShapeDtypeStruct((bh, sq_pad, d), qt.dtype)]
    if emit_lse:
        out_specs.append(pl.BlockSpec((1, block_q, 128),
                                      lambda i, j, kk: (i, j, 0)))
        out_shape.append(jax.ShapeDtypeStruct((bh, sq_pad, 128),
                                              jnp.float32))
    res = pl.pallas_call(
        kernel,
        grid=(bh, sq_pad // block_q, sk_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0)),
            pl.BlockSpec((1, 8, 128), lambda i, j, kk: (i, 0, 0)),
        ],
        out_specs=out_specs if emit_lse else out_specs[0],
        out_shape=out_shape if emit_lse else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),   # acc
            pltpu.VMEM((block_q, 1), jnp.float32),   # m
            pltpu.VMEM((block_q, 1), jnp.float32),   # l
        ] if pltpu is not None else [],
        interpret=interpret,
        compiler_params=_grid_params(interpret),
    )(qt, kt, vt, cnt)
    if emit_lse:
        out, lse = res
        return out, lse[:, :, 0]
    return res


def _bwd_masked_sT(q, k_blk, j, qq, *, sm_scale, causal, q_len, kv_len,
                   block_q, block_k):
    """Transposed score block sT (block_k, block_q) in the LOG2 domain
    (log2e folded into the scale), causal-masked to -inf.

    Out-of-range (zero-padded) rows/columns are NOT masked: every pad
    contribution to dq/dk/dv vanishes structurally — pad K rows are zero
    (dq contracts ds against K), pad Q columns carry zero dO and zero
    delta (dv/dk contract against dO and Q), and the garbage pad rows of
    the outputs are sliced away by the dispatch. Skipping the two iotas
    + compare + select per step is a measurable VPU win at video
    sequence lengths."""
    sT = jnp.dot(k_blk, q.T,
                 preferred_element_type=jnp.float32) * (sm_scale * _LOG2E)
    if causal:
        k_pos = (j * block_k
                 + jax.lax.broadcasted_iota(jnp.int32, sT.shape, 0))
        q_pos = (qq * block_q
                 + jax.lax.broadcasted_iota(jnp.int32, sT.shape, 1))
        sT = jnp.where(q_pos >= k_pos, sT, _NEG_INF)
    return sT


def _flash_bwd_dkv_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                          dk_ref, dv_ref, dk_acc, dv_acc, *,
                          block_q: int, block_k: int, sm_scale: float,
                          causal: bool, q_len: int, kv_len: int):
    """Grid (BH, kv_blocks, q_blocks): q innermost/sequential; dk/dv
    accumulate in VMEM scratch across q blocks."""
    qq = pl.program_id(2)
    nq = pl.num_programs(2)
    j = pl.program_id(1)

    @pl.when(qq == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0].astype(jnp.float32)          # (bq, d)
    do = do_ref[0].astype(jnp.float32)        # (bq, d)
    # stats arrive sublane-replicated (1, 8, bq); row 0 is the data
    lse = jnp.maximum(lse_ref[0, 0:1, :], -1e5)   # (1, bq)
    delta = delta_ref[0, 0:1, :]                  # (1, bq)
    k_blk = k_ref[0].astype(jnp.float32)      # (bk, d)
    v_blk = v_ref[0].astype(jnp.float32)

    sT = _bwd_masked_sT(q, k_blk, j, qq, sm_scale=sm_scale, causal=causal,
                        q_len=q_len, kv_len=kv_len, block_q=block_q,
                        block_k=block_k)
    # lse clamp makes exp(-inf - lse) a true 0 even for all-masked rows;
    # sT is log2-domain so the natural-log lse scales by log2e
    pT = jnp.exp2(sT - lse * _LOG2E)          # (bk, bq)
    dv_acc[:] += jnp.dot(pT, do, preferred_element_type=jnp.float32)
    dpT = jnp.dot(v_blk, do.T, preferred_element_type=jnp.float32)
    dsT = pT * (dpT - delta)
    dk_acc[:] += jnp.dot(dsT, q,
                         preferred_element_type=jnp.float32) * sm_scale

    @pl.when(qq == nq - 1)
    def _finish():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd_fused_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref,
                            v_ref, dk_ref, dv_ref, dqp_ref,
                            dk_acc, dv_acc, *,
                            block_q: int, block_k: int, sm_scale: float,
                            causal: bool, q_len: int, kv_len: int):
    """SINGLE-PASS generic (d≤128, causal-capable) backward: the dkv
    kernel body that also emits per-k-tile dq PARTIALS — dsT is already
    in VMEM, so dq costs one extra dot_general (contract the sublane kv
    dims) and an HBM write, while the whole dq kernel (score+dp
    recompute + second exp2 pass) disappears. Masked entries (causal /
    q_len / kv_len pads) have pT=0 ⇒ dsT=0 ⇒ contribute nothing to the
    partial. The dispatch sums partials over the k-tile axis (f32) and
    chunks the batch·head axis to bound the partial buffer."""
    qq = pl.program_id(2)
    nq = pl.num_programs(2)
    j = pl.program_id(1)

    @pl.when(qq == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0].astype(jnp.float32)          # (bq, d)
    do = do_ref[0].astype(jnp.float32)        # (bq, d)
    lse = jnp.maximum(lse_ref[0, 0:1, :], -1e5)   # (1, bq)
    delta = delta_ref[0, 0:1, :]                  # (1, bq)
    k_blk = k_ref[0].astype(jnp.float32)      # (bk, d)
    v_blk = v_ref[0].astype(jnp.float32)

    sT = _bwd_masked_sT(q, k_blk, j, qq, sm_scale=sm_scale, causal=causal,
                        q_len=q_len, kv_len=kv_len, block_q=block_q,
                        block_k=block_k)
    pT = jnp.exp2(sT - lse * _LOG2E)          # (bk, bq)
    dv_acc[:] += jnp.dot(pT, do, preferred_element_type=jnp.float32)
    dpT = jnp.dot(v_blk, do.T, preferred_element_type=jnp.float32)
    dsT = pT * (dpT - delta)
    dk_acc[:] += jnp.dot(dsT, q,
                         preferred_element_type=jnp.float32) * sm_scale
    # dq partial: dq[bq, d] = Σ_bk dsT[bk, bq] · k[bk, d] for THIS k-tile
    dqp_ref[0, 0] = jax.lax.dot_general(
        dsT, k_blk, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale

    @pl.when(qq == nq - 1)
    def _finish():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, dq_acc, *,
                         block_q: int, block_k: int, sm_scale: float,
                         causal: bool, q_len: int, kv_len: int):
    """Grid (BH, q_blocks, kv_blocks): kv innermost/sequential; dq
    accumulates in VMEM scratch across kv blocks."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)
    qq = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = jnp.maximum(lse_ref[0, 0:1, :], -1e5)
    delta = delta_ref[0, 0:1, :]
    k_blk = k_ref[0].astype(jnp.float32)
    v_blk = v_ref[0].astype(jnp.float32)

    sT = _bwd_masked_sT(q, k_blk, j, qq, sm_scale=sm_scale, causal=causal,
                        q_len=q_len, kv_len=kv_len, block_q=block_q,
                        block_k=block_k)
    pT = jnp.exp2(sT - lse * _LOG2E)
    dpT = jnp.dot(v_blk, do.T, preferred_element_type=jnp.float32)
    dsT = pT * (dpT - delta)                  # (bk, bq)
    # dq[bq, d] = Σ_bk dsT[bk, bq] · k[bk, d]  (contract sublane dims)
    dq_acc[:] += jax.lax.dot_general(
        dsT, k_blk, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale

    @pl.when(j == nk - 1)
    def _finish():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# Packed d=64 backward (two heads per 128-lane stream) — the CogVideoX-class
# TRAINING path. The generic backward above zero-pads d 64→128, running every
# matmul at half MXU utilization (8 performed / 4 useful units per head pair
# per tile, ceiling 98.5 TF/s). Here only the score/dp matmuls keep the
# inherent 2× of 64-deep contractions; the three gradient contractions run
# at full rate by putting the 64-sized dim on the SUBLANE (M) axis:
#
#   dkv kernel (natural scores, q innermost):
#     s_h   = (q·mask_h · scale) @ kᵀ      (bq, bk)   2 units (2 heads)
#     dp_h  = (do·mask_h) @ vᵀ             (bq, bk)   2 units
#     dv_hᵀ += do_hᵀ @ p_h                 (64, bk)   1 unit for the pair
#     dk_hᵀ += q_hᵀ @ ds_h                 (64, bk)   1 unit
#   dq kernel (transposed scores, kv innermost):
#     s_hᵀ  = (k·mask_h · scale) @ qᵀ      (bk, bq)   2 units
#     dp_hᵀ = (v·mask_h) @ doᵀ             (bk, bq)   2 units
#     dq_hᵀ += k_hᵀ @ ds_hᵀ                (64, bq)   1 unit
#
# 11 performed / 8 useful-at-128 units per pair vs 14 for the padded path
# (1.27× fewer MXU ops) and half the HBM streaming. Per-q-row stats arrive
# in BOTH orientations, built by XLA: lanes 0..3 of a (Sq, 128) column
# array for the natural kernel, sublanes 0..3 of an (8, Sq) row array for
# the transposed kernel — no in-kernel relayouts. Non-causal only (the
# video-DiT regime; causal d=64 stays on the padded path).
# ---------------------------------------------------------------------------

def _flash_bwd_packed2_dkv_kernel(q_ref, do_ref, qT_ref, doT_ref,
                                  kT_ref, vT_ref, stats_ref,
                                  dkT_ref, dvT_ref,
                                  dk0_acc, dk1_acc, dv0_acc, dv1_acc, *,
                                  sm_scale: float, fold_stats: bool = True):
    """Grid (BH2, kv_blocks, q_blocks): q innermost/sequential; dkᵀ/dvᵀ
    accumulate as (64, block_k) scratch per head.

    ``fold_stats`` (the fwd fused-static-max trick applied to the
    backward): the per-row −lse and −delta subtracts fold INTO the s and
    dp matmuls — head h's q/do carry the stat on its free indicator lane
    (64 for head0, 63 for head1) and the matching kᵀ/vᵀ row is forced to
    1 — removing four VPU passes over the (bq, bk) score tile per pair
    at the cost of four (128, bk) row-selects + two (bq, 128) outer
    products. Pad rows/columns produce exactly the same values as the
    unfolded path (pad q rows: finite lse ⇒ finite p, zero dp−delta;
    pad kv columns: s = −lse, dp = −delta — identical by construction)."""
    qq = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qq == 0)
    def _init():
        dk0_acc[:] = jnp.zeros_like(dk0_acc)
        dk1_acc[:] = jnp.zeros_like(dk1_acc)
        dv0_acc[:] = jnp.zeros_like(dv0_acc)
        dv1_acc[:] = jnp.zeros_like(dv1_acc)

    q = q_ref[:].astype(jnp.float32)           # (bq, 128)
    do = do_ref[:].astype(jnp.float32)         # (bq, 128)
    qT = qT_ref[:].astype(jnp.float32)         # (128, bq)
    doT = doT_ref[:].astype(jnp.float32)       # (128, bq)
    kT = kT_ref[:].astype(jnp.float32)         # (128, bk)
    vT = vT_ref[:].astype(jnp.float32)         # (128, bk)
    stats = stats_ref[:]                       # (bq, 128) f32 lanes 0..3

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    mlo = (lane < 64).astype(jnp.float32)
    qs = q * (sm_scale * _LOG2E)
    # stats lanes: 0/1 = lse per head (natural log), 2/3 = delta per head
    lse0 = stats[:, 0:1] * _LOG2E              # (bq, 1) log2 domain
    lse1 = stats[:, 1:2] * _LOG2E
    if fold_stats:
        ind64 = (lane == 64).astype(jnp.float32)
        ind63 = (lane == 63).astype(jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        kT0 = jnp.where(row == 64, 1.0, kT)
        kT1 = jnp.where(row == 63, 1.0, kT)
        s0 = jnp.dot(qs * mlo + (-lse0) * ind64, kT0,
                     preferred_element_type=jnp.float32)   # = s − lse0
        s1 = jnp.dot(qs * (1.0 - mlo) + (-lse1) * ind63, kT1,
                     preferred_element_type=jnp.float32)
        p0 = jnp.exp2(s0)                      # (bq, bk)
        p1 = jnp.exp2(s1)
        vT0 = jnp.where(row == 64, 1.0, vT)
        vT1 = jnp.where(row == 63, 1.0, vT)
        ds0 = p0 * jnp.dot(do * mlo + (-stats[:, 2:3]) * ind64, vT0,
                           preferred_element_type=jnp.float32)
        ds1 = p1 * jnp.dot(do * (1.0 - mlo) + (-stats[:, 3:4]) * ind63,
                           vT1, preferred_element_type=jnp.float32)
    else:
        s0 = jnp.dot(qs * mlo, kT, preferred_element_type=jnp.float32)
        s1 = jnp.dot(qs * (1.0 - mlo), kT,
                     preferred_element_type=jnp.float32)
        p0 = jnp.exp2(s0 - lse0)               # (bq, bk)
        p1 = jnp.exp2(s1 - lse1)
        dp0 = jnp.dot(do * mlo, vT, preferred_element_type=jnp.float32)
        dp1 = jnp.dot(do * (1.0 - mlo), vT,
                      preferred_element_type=jnp.float32)
        ds0 = p0 * (dp0 - stats[:, 2:3])
        ds1 = p1 * (dp1 - stats[:, 3:4])
    dv0_acc[:] += jnp.dot(doT[:64], p0, preferred_element_type=jnp.float32)
    dv1_acc[:] += jnp.dot(doT[64:], p1, preferred_element_type=jnp.float32)
    dk0_acc[:] += jnp.dot(qT[:64], ds0, preferred_element_type=jnp.float32)
    dk1_acc[:] += jnp.dot(qT[64:], ds1, preferred_element_type=jnp.float32)

    @pl.when(qq == nq - 1)
    def _finish():
        dkT_ref[:64] = (dk0_acc[:] * sm_scale).astype(dkT_ref.dtype)
        dkT_ref[64:] = (dk1_acc[:] * sm_scale).astype(dkT_ref.dtype)
        dvT_ref[:64] = dv0_acc[:].astype(dvT_ref.dtype)
        dvT_ref[64:] = dv1_acc[:].astype(dvT_ref.dtype)


def _flash_bwd_packed2_dq_kernel(k_ref, kT_ref, v_ref, qT_ref, doT_ref,
                                 stats_ref, dqT_ref,
                                 dq0_acc, dq1_acc, *, sm_scale: float,
                                 fold_stats: bool = True):
    """Grid (BH2, q_blocks, kv_blocks): kv innermost/sequential; dqᵀ
    accumulates as (64, block_q) scratch per head. Transposed scores so
    the per-q stats ride as (1, bq) lane vectors (sublanes 0..3 of the
    row-stats input).

    ``fold_stats``: transposed analogue of the dkv fold — −lse/−delta
    ride the free qᵀ/doᵀ ROWS (64 for head0, 63 for head1) against
    indicator lanes on the k/v side (which fuse into the existing mask
    FMAs for free), so the four stat subtracts over (bk, bq) become
    four (128, bq) row-selects. The best-case fold: bq ≪ bk·4."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        dq0_acc[:] = jnp.zeros_like(dq0_acc)
        dq1_acc[:] = jnp.zeros_like(dq1_acc)

    k_blk = k_ref[:].astype(jnp.float32)       # (bk, 128)
    kT = kT_ref[:].astype(jnp.float32)         # (128, bk)
    v_blk = v_ref[:].astype(jnp.float32)       # (bk, 128)
    qT = qT_ref[:].astype(jnp.float32)         # (128, bq)
    doT = doT_ref[:].astype(jnp.float32)       # (128, bq)
    stats = stats_ref[:]                       # (8, bq) sublanes 0..3

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    mlo = (lane < 64).astype(jnp.float32)
    ks = k_blk * (sm_scale * _LOG2E)
    lse0 = stats[0:1, :] * _LOG2E              # (1, bq) log2 domain
    lse1 = stats[1:2, :] * _LOG2E
    if fold_stats:
        ind64 = (lane == 64).astype(jnp.float32)
        ind63 = (lane == 63).astype(jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        qT0 = jnp.where(row == 64, -lse0, qT)
        qT1 = jnp.where(row == 63, -lse1, qT)
        s0T = jnp.dot(ks * mlo + ind64, qT0,
                      preferred_element_type=jnp.float32)  # = sᵀ − lse0
        s1T = jnp.dot(ks * (1.0 - mlo) + ind63, qT1,
                      preferred_element_type=jnp.float32)
        p0T = jnp.exp2(s0T)                    # (bk, bq)
        p1T = jnp.exp2(s1T)
        doT0 = jnp.where(row == 64, -stats[2:3, :], doT)
        doT1 = jnp.where(row == 63, -stats[3:4, :], doT)
        ds0T = p0T * jnp.dot(v_blk * mlo + ind64, doT0,
                             preferred_element_type=jnp.float32)
        ds1T = p1T * jnp.dot(v_blk * (1.0 - mlo) + ind63, doT1,
                             preferred_element_type=jnp.float32)
    else:
        s0T = jnp.dot(ks * mlo, qT, preferred_element_type=jnp.float32)
        s1T = jnp.dot(ks * (1.0 - mlo), qT,
                      preferred_element_type=jnp.float32)
        p0T = jnp.exp2(s0T - lse0)             # (bk, bq)
        p1T = jnp.exp2(s1T - lse1)
        dp0T = jnp.dot(v_blk * mlo, doT, preferred_element_type=jnp.float32)
        dp1T = jnp.dot(v_blk * (1.0 - mlo), doT,
                       preferred_element_type=jnp.float32)
        ds0T = p0T * (dp0T - stats[2:3, :])
        ds1T = p1T * (dp1T - stats[3:4, :])
    dq0_acc[:] += jnp.dot(kT[:64], ds0T, preferred_element_type=jnp.float32)
    dq1_acc[:] += jnp.dot(kT[64:], ds1T, preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _finish():
        dqT_ref[:64] = (dq0_acc[:] * sm_scale).astype(dqT_ref.dtype)
        dqT_ref[64:] = (dq1_acc[:] * sm_scale).astype(dqT_ref.dtype)


# Single-pass fused backward: block sizes and the f32 dq-partial HBM cap.
# Fewer, larger k-tiles cut the partial buffer (and its write+read-back
# traffic) linearly in nk; block_q shrinks to keep the four (bq, bk) f32
# score-tile temporaries inside VMEM.
FUSED_BWD_BLOCK_Q = 512
FUSED_BWD_BLOCK_K = 1024
_FUSED_BWD_PARTIAL_CAP = 384_000_000  # bytes; chunks the pair axis


def _flash_bwd_packed2_fused_kernel(q_ref, do_ref, qT_ref, doT_ref,
                                    kT_ref, vT_ref, k_ref, stats_ref,
                                    dkT_ref, dvT_ref, dqp_ref,
                                    dk0_acc, dk1_acc, dv0_acc, dv1_acc, *,
                                    sm_scale: float,
                                    fold_stats: bool = True):
    """SINGLE-PASS packed backward: the dkv kernel body (grid (BH2,
    kv_blocks, q_blocks), q innermost) that ALSO emits per-k-tile dq
    PARTIALS, so the score block (s, p, ds) is computed — and exp2'd —
    exactly once for all three gradients. The separate dq kernel's
    s/dp recomputation (4 MXU units per pair) and its second exp2+mul
    pass over the score tile disappear; the cost is writing the (bq,
    128) dq partial per (j, qq) step to HBM and one XLA sum over the
    k-tile axis outside (f32, ~nk·Sq·128·4 B per pair — the dispatch
    bounds it via _FUSED_BWD_PARTIAL_CAP and larger k-tiles).

    dq-partial exactness at pads: zero-padded kv COLUMNS of ds carry
    garbage (p·(−delta)) but multiply zero k pad ROWS in ds@k → 0; pad
    q rows have zero dO and zero delta → ds rows vanish. Head packing:
    lanes 0-63 of ds0@k are head0's dq (k lanes 64-127 belong to head1
    and land in lanes 64-127, discarded by the lane select); symmetric
    for ds1@k — one select instead of masking k twice."""
    qq = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qq == 0)
    def _init():
        dk0_acc[:] = jnp.zeros_like(dk0_acc)
        dk1_acc[:] = jnp.zeros_like(dk1_acc)
        dv0_acc[:] = jnp.zeros_like(dv0_acc)
        dv1_acc[:] = jnp.zeros_like(dv1_acc)

    q = q_ref[:].astype(jnp.float32)           # (bq, 128)
    do = do_ref[:].astype(jnp.float32)         # (bq, 128)
    qT = qT_ref[:].astype(jnp.float32)         # (128, bq)
    doT = doT_ref[:].astype(jnp.float32)       # (128, bq)
    kT = kT_ref[:].astype(jnp.float32)         # (128, bk)
    vT = vT_ref[:].astype(jnp.float32)         # (128, bk)
    stats = stats_ref[:]                       # (bq, 128) f32 lanes 0..3

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    mlo = (lane < 64).astype(jnp.float32)
    qs = q * (sm_scale * _LOG2E)
    lse0 = stats[:, 0:1] * _LOG2E              # (bq, 1) log2 domain
    lse1 = stats[:, 1:2] * _LOG2E
    if fold_stats:
        ind64 = (lane == 64).astype(jnp.float32)
        ind63 = (lane == 63).astype(jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        kT0 = jnp.where(row == 64, 1.0, kT)
        kT1 = jnp.where(row == 63, 1.0, kT)
        s0 = jnp.dot(qs * mlo + (-lse0) * ind64, kT0,
                     preferred_element_type=jnp.float32)   # = s − lse0
        s1 = jnp.dot(qs * (1.0 - mlo) + (-lse1) * ind63, kT1,
                     preferred_element_type=jnp.float32)
        p0 = jnp.exp2(s0)                      # (bq, bk)
        p1 = jnp.exp2(s1)
        vT0 = jnp.where(row == 64, 1.0, vT)
        vT1 = jnp.where(row == 63, 1.0, vT)
        ds0 = p0 * jnp.dot(do * mlo + (-stats[:, 2:3]) * ind64, vT0,
                           preferred_element_type=jnp.float32)
        ds1 = p1 * jnp.dot(do * (1.0 - mlo) + (-stats[:, 3:4]) * ind63,
                           vT1, preferred_element_type=jnp.float32)
    else:
        s0 = jnp.dot(qs * mlo, kT, preferred_element_type=jnp.float32)
        s1 = jnp.dot(qs * (1.0 - mlo), kT,
                     preferred_element_type=jnp.float32)
        p0 = jnp.exp2(s0 - lse0)               # (bq, bk)
        p1 = jnp.exp2(s1 - lse1)
        dp0 = jnp.dot(do * mlo, vT, preferred_element_type=jnp.float32)
        dp1 = jnp.dot(do * (1.0 - mlo), vT,
                      preferred_element_type=jnp.float32)
        ds0 = p0 * (dp0 - stats[:, 2:3])
        ds1 = p1 * (dp1 - stats[:, 3:4])
    dv0_acc[:] += jnp.dot(doT[:64], p0, preferred_element_type=jnp.float32)
    dv1_acc[:] += jnp.dot(doT[64:], p1, preferred_element_type=jnp.float32)
    dk0_acc[:] += jnp.dot(qT[:64], ds0, preferred_element_type=jnp.float32)
    dk1_acc[:] += jnp.dot(qT[64:], ds1, preferred_element_type=jnp.float32)

    # dq partials (the single-pass addition): ds @ k over THIS k-tile
    k_nat = k_ref[:].astype(jnp.float32)       # (bk, 128)
    g0 = jnp.dot(ds0, k_nat, preferred_element_type=jnp.float32)
    g1 = jnp.dot(ds1, k_nat, preferred_element_type=jnp.float32)
    dqp_ref[0] = jnp.where(lane < 64, g0, g1)  # (bq, 128)

    @pl.when(qq == nq - 1)
    def _finish():
        dkT_ref[:64] = (dk0_acc[:] * sm_scale).astype(dkT_ref.dtype)
        dkT_ref[64:] = (dk1_acc[:] * sm_scale).astype(dkT_ref.dtype)
        dvT_ref[:64] = dv0_acc[:].astype(dvT_ref.dtype)
        dvT_ref[64:] = dv1_acc[:].astype(dvT_ref.dtype)


def _flash_bwd_packed2(q, k, v, out, lse_pairs, g, *, sm_scale,
                       block_q, block_k, interpret, fold_stats=True,
                       single_pass=True):
    """Packed d=64 fused backward dispatch. q/k/v/out/g: (B, S, H, 64)
    with H even; ``lse_pairs``: (B·H/2, 2, Sq_pad) natural-log LSE from
    the packed forward. Returns (dq, dk, dv) in input layout/dtype.

    Pad-row exactness (no in-kernel masks, like the padded backward):
    pad q rows carry zero dO and zero delta → ds rows vanish; pad kv rows
    of ds meet zero k/v columns in the 64-row contractions; garbage pad
    rows of the outputs are sliced away here."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    bh2 = b * h // 2
    if block_q is None:
        # larger k-tiles → fewer dq partials; smaller q-tiles keep the
        # four (bq, bk) f32 score temporaries in VMEM; explicit caller
        # blocks are honored verbatim (sweep benches)
        block_q = FUSED_BWD_BLOCK_Q if single_pass else DEFAULT_BWD_BLOCK_Q
    if block_k is None:
        block_k = FUSED_BWD_BLOCK_K if single_pass else DEFAULT_BWD_BLOCK_K
    block_q = min(block_q, _round_to(sq, 128))
    block_k = min(block_k, _round_to(sk, 128))
    sq_pad = _round_to(sq, block_q)
    sk_pad = _round_to(sk, block_k)

    qp = _pack_pairs(q, b, sq, h)
    dop = _pack_pairs(g, b, sq, h)
    outp = _pack_pairs(out, b, sq, h)
    kp = _pack_pairs(k, b, sk, h)
    vp = _pack_pairs(v, b, sk, h)
    if sq_pad != sq:
        zq = ((0, 0), (0, sq_pad - sq), (0, 0))
        qp, dop, outp = jnp.pad(qp, zq), jnp.pad(dop, zq), jnp.pad(outp, zq)
    if sk_pad != sk:
        zk = ((0, 0), (0, sk_pad - sk), (0, 0))
        kp, vp = jnp.pad(kp, zk), jnp.pad(vp, zk)
    qT = qp.transpose(0, 2, 1)                 # (BH2, 128, sq_pad)
    doT = dop.transpose(0, 2, 1)
    kT = kp.transpose(0, 2, 1)                 # (BH2, 128, sk_pad)
    vT = vp.transpose(0, 2, 1)

    # per-head delta = Σ_d dO·O (pad rows are exactly 0 — zero dO)
    dof = dop.astype(jnp.float32)
    outf = outp.astype(jnp.float32)
    delta0 = jnp.sum(dof[..., :64] * outf[..., :64], axis=-1)
    delta1 = jnp.sum(dof[..., 64:] * outf[..., 64:], axis=-1)
    if lse_pairs.shape[-1] != sq_pad:
        lse_pairs = (lse_pairs[:, :, :sq_pad]
                     if lse_pairs.shape[-1] > sq_pad
                     else jnp.pad(lse_pairs,
                                  ((0, 0), (0, 0),
                                   (0, sq_pad - lse_pairs.shape[-1]))))
    lse0, lse1 = lse_pairs[:, 0, :], lse_pairs[:, 1, :]
    # both stat orientations, built by XLA once per step:
    stats4 = jnp.stack([lse0, lse1, delta0, delta1], axis=1)  # (BH2,4,Sq)
    stats_rows = jnp.concatenate([stats4, stats4], axis=1)    # (BH2,8,Sq)
    stats_cols = jnp.pad(stats4.transpose(0, 2, 1),
                         ((0, 0), (0, 0), (0, 124)))          # (BH2,Sq,128)

    def _unpack_T(xT, s, s_real):
        # (BH2, 128, S_pad) → (B, S_real, H, 64)
        y = xT[:, :, :s_real].reshape(b, h // 2, 128, s_real)
        return y.transpose(0, 3, 1, 2).reshape(b, s_real, h, 64)

    if single_pass:
        nk = sk_pad // block_k
        fused_kernel = _squeeze_first_n(
            functools.partial(_flash_bwd_packed2_fused_kernel,
                              sm_scale=sm_scale, fold_stats=fold_stats),
            11)
        per_pair = nk * sq_pad * 128 * 4
        chunk = max(1, min(bh2, _FUSED_BWD_PARTIAL_CAP // max(per_pair, 1)))
        dqs, dks, dvs = [], [], []
        for c0 in range(0, bh2, chunk):
            c1 = min(bh2, c0 + chunk)
            n = c1 - c0
            dkT_c, dvT_c, dqp = pl.pallas_call(
                fused_kernel,
                grid=(n, nk, sq_pad // block_q),
                in_specs=[
                    pl.BlockSpec((1, block_q, 128),
                                 lambda i, j, qq: (i, qq, 0)),
                    pl.BlockSpec((1, block_q, 128),
                                 lambda i, j, qq: (i, qq, 0)),
                    pl.BlockSpec((1, 128, block_q),
                                 lambda i, j, qq: (i, 0, qq)),
                    pl.BlockSpec((1, 128, block_q),
                                 lambda i, j, qq: (i, 0, qq)),
                    pl.BlockSpec((1, 128, block_k),
                                 lambda i, j, qq: (i, 0, j)),
                    pl.BlockSpec((1, 128, block_k),
                                 lambda i, j, qq: (i, 0, j)),
                    pl.BlockSpec((1, block_k, 128),
                                 lambda i, j, qq: (i, j, 0)),
                    pl.BlockSpec((1, block_q, 128),
                                 lambda i, j, qq: (i, qq, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((1, 128, block_k),
                                 lambda i, j, qq: (i, 0, j)),
                    pl.BlockSpec((1, 128, block_k),
                                 lambda i, j, qq: (i, 0, j)),
                    pl.BlockSpec((1, 1, block_q, 128),
                                 lambda i, j, qq: (i, j, qq, 0)),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((n, 128, sk_pad), jnp.float32),
                    jax.ShapeDtypeStruct((n, 128, sk_pad), jnp.float32),
                    jax.ShapeDtypeStruct((n, nk, sq_pad, 128),
                                         jnp.float32),
                ],
                scratch_shapes=[
                    pltpu.VMEM((64, block_k), jnp.float32),
                    pltpu.VMEM((64, block_k), jnp.float32),
                    pltpu.VMEM((64, block_k), jnp.float32),
                    pltpu.VMEM((64, block_k), jnp.float32),
                ] if pltpu is not None else [],
                interpret=interpret,
                compiler_params=_grid_params(interpret),
            )(qp[c0:c1], dop[c0:c1], qT[c0:c1], doT[c0:c1],
              kT[c0:c1], vT[c0:c1], kp[c0:c1], stats_cols[c0:c1])
            dqs.append(jnp.sum(dqp, axis=1) * sm_scale)  # (n, Sq_pad, 128)
            dks.append(dkT_c)
            dvs.append(dvT_c)
        dq_nat = jnp.concatenate(dqs, 0) if len(dqs) > 1 else dqs[0]
        dkT = jnp.concatenate(dks, 0) if len(dks) > 1 else dks[0]
        dvT = jnp.concatenate(dvs, 0) if len(dvs) > 1 else dvs[0]
        dq = dq_nat[:, :sq].reshape(b, h // 2, sq, 128) \
            .transpose(0, 2, 1, 3).reshape(b, sq, h, 64)
        dk = _unpack_T(dkT, sk_pad, sk)
        dv = _unpack_T(dvT, sk_pad, sk)
        return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype))

    dkv_kernel = _squeeze_first_n(
        functools.partial(_flash_bwd_packed2_dkv_kernel, sm_scale=sm_scale,
                          fold_stats=fold_stats),
        9)
    dkT, dvT = pl.pallas_call(
        dkv_kernel,
        grid=(bh2, sk_pad // block_k, sq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, 128), lambda i, j, qq: (i, qq, 0)),
            pl.BlockSpec((1, block_q, 128), lambda i, j, qq: (i, qq, 0)),
            pl.BlockSpec((1, 128, block_q), lambda i, j, qq: (i, 0, qq)),
            pl.BlockSpec((1, 128, block_q), lambda i, j, qq: (i, 0, qq)),
            pl.BlockSpec((1, 128, block_k), lambda i, j, qq: (i, 0, j)),
            pl.BlockSpec((1, 128, block_k), lambda i, j, qq: (i, 0, j)),
            pl.BlockSpec((1, block_q, 128), lambda i, j, qq: (i, qq, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 128, block_k), lambda i, j, qq: (i, 0, j)),
            pl.BlockSpec((1, 128, block_k), lambda i, j, qq: (i, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh2, 128, sk_pad), jnp.float32),
            jax.ShapeDtypeStruct((bh2, 128, sk_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((64, block_k), jnp.float32),
            pltpu.VMEM((64, block_k), jnp.float32),
            pltpu.VMEM((64, block_k), jnp.float32),
            pltpu.VMEM((64, block_k), jnp.float32),
        ] if pltpu is not None else [],
        interpret=interpret,
        compiler_params=_grid_params(interpret),
    )(qp, dop, qT, doT, kT, vT, stats_cols)

    dq_kernel = _squeeze_first_n(
        functools.partial(_flash_bwd_packed2_dq_kernel, sm_scale=sm_scale,
                          fold_stats=fold_stats),
        7)
    dqT = pl.pallas_call(
        dq_kernel,
        grid=(bh2, sq_pad // block_q, sk_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, block_k, 128), lambda i, qq, j: (i, j, 0)),
            pl.BlockSpec((1, 128, block_k), lambda i, qq, j: (i, 0, j)),
            pl.BlockSpec((1, block_k, 128), lambda i, qq, j: (i, j, 0)),
            pl.BlockSpec((1, 128, block_q), lambda i, qq, j: (i, 0, qq)),
            pl.BlockSpec((1, 128, block_q), lambda i, qq, j: (i, 0, qq)),
            pl.BlockSpec((1, 8, block_q), lambda i, qq, j: (i, 0, qq)),
        ],
        out_specs=pl.BlockSpec((1, 128, block_q),
                               lambda i, qq, j: (i, 0, qq)),
        out_shape=jax.ShapeDtypeStruct((bh2, 128, sq_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((64, block_q), jnp.float32),
            pltpu.VMEM((64, block_q), jnp.float32),
        ] if pltpu is not None else [],
        interpret=interpret,
        compiler_params=_grid_params(interpret),
    )(kp, kT, vp, qT, doT, stats_rows)

    dq = _unpack_T(dqT, sq_pad, sq)
    dk = _unpack_T(dkT, sk_pad, sk)
    dv = _unpack_T(dvT, sk_pad, sk)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype))


def _pack_heads(x, b, s, h, d):
    return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)


def _unpack_heads(x, b, s, h, d):
    return x.reshape(b, h, s, d).transpose(0, 2, 1, 3)


def flash_attention_bwd(q, k, v, out, lse, g, *, causal=False, scale=None,
                        block_q: Optional[int] = None,
                        block_k: Optional[int] = None,
                        interpret: bool = False, fold_stats: bool = True,
                        single_pass: bool = True):
    """Fused FlashAttention-2 backward. All of q/k/v/out/g are
    (B, S, H, D); lse is (B·H, Sq_pad) from _flash_forward_lse (or the
    packed forward, reflattened head-major)."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    sm_scale = (1.0 / math.sqrt(d)) if scale is None else scale

    if d == 64 and h % 2 == 0 and not causal:
        # packed two-head backward: full-rate gradient contractions, no
        # 64→128 zero-pad copies (1.27× fewer MXU ops, half the HBM)
        lse_pairs = lse.reshape(b, h // 2, 2, lse.shape[-1]) \
                       .reshape(b * h // 2, 2, lse.shape[-1])
        return _flash_bwd_packed2(q, k, v, out, lse_pairs, g,
                                  sm_scale=sm_scale, block_q=block_q,
                                  block_k=block_k, interpret=interpret,
                                  fold_stats=fold_stats,
                                  single_pass=single_pass)

    if block_q is None:
        block_q = DEFAULT_BWD_BLOCK_Q
    if block_k is None:
        block_k = DEFAULT_BWD_BLOCK_K
    d_pad = _round_to(d, 128)
    if d_pad != d:
        pad = ((0, 0), (0, 0), (0, 0), (0, d_pad - d))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        out, g = jnp.pad(out, pad), jnp.pad(g, pad)
    d_orig, d = d, d_pad

    block_q = min(block_q, _round_to(sq, 128))
    block_k = min(block_k, _round_to(sk, 128))
    sq_pad = _round_to(sq, block_q)
    sk_pad = _round_to(sk, block_k)

    qt = _pack_heads(q, b, sq, h, d)
    kt = _pack_heads(k, b, sk, h, d)
    vt = _pack_heads(v, b, sk, h, d)
    ot = _pack_heads(out, b, sq, h, d)
    gt = _pack_heads(g, b, sq, h, d)
    if sq_pad != sq:
        zq = ((0, 0), (0, sq_pad - sq), (0, 0))
        qt, ot, gt = jnp.pad(qt, zq), jnp.pad(ot, zq), jnp.pad(gt, zq)
    if sk_pad != sk:
        zk = ((0, 0), (0, sk_pad - sk), (0, 0))
        kt, vt = jnp.pad(kt, zk), jnp.pad(vt, zk)
    if lse.shape[1] > sq_pad:
        # fwd padded to a larger block_q multiple than bwd uses; rows
        # >= sq are masked by q_len in the kernels, so slicing is exact
        lse = lse[:, :sq_pad]
    elif lse.shape[1] < sq_pad:
        lse = jnp.pad(lse, ((0, 0), (0, sq_pad - lse.shape[1])))

    # delta_i = Σ_d dO·O per q row — O(S·d), computed by XLA
    delta = jnp.sum(gt.astype(jnp.float32) * ot.astype(jnp.float32),
                    axis=-1)                       # (BH, Sq_pad)
    # Mosaic block rule: feed stats as (BH, 8, Sq_pad) sublane-replicated
    lse8 = jnp.broadcast_to(lse[:, None, :], (lse.shape[0], 8,
                                              lse.shape[1]))
    delta8 = jnp.broadcast_to(delta[:, None, :], (delta.shape[0], 8,
                                                  delta.shape[1]))

    bh = b * h
    common = dict(block_q=block_q, block_k=block_k, sm_scale=sm_scale,
                  causal=causal, q_len=sq, kv_len=sk)

    if single_pass:
        nk = sk_pad // block_k
        fused_kernel = functools.partial(_flash_bwd_fused_kernel, **common)
        per_head = nk * sq_pad * d * 4
        chunk = max(1, min(bh, _FUSED_BWD_PARTIAL_CAP // max(per_head, 1)))
        dqs, dks, dvs = [], [], []
        for c0 in range(0, bh, chunk):
            c1 = min(bh, c0 + chunk)
            n = c1 - c0
            dk_c, dv_c, dqp = pl.pallas_call(
                fused_kernel,
                grid=(n, nk, sq_pad // block_q),
                in_specs=[
                    pl.BlockSpec((1, block_q, d),
                                 lambda i, j, qq: (i, qq, 0)),
                    pl.BlockSpec((1, block_q, d),
                                 lambda i, j, qq: (i, qq, 0)),
                    pl.BlockSpec((1, 8, block_q),
                                 lambda i, j, qq: (i, 0, qq)),
                    pl.BlockSpec((1, 8, block_q),
                                 lambda i, j, qq: (i, 0, qq)),
                    pl.BlockSpec((1, block_k, d),
                                 lambda i, j, qq: (i, j, 0)),
                    pl.BlockSpec((1, block_k, d),
                                 lambda i, j, qq: (i, j, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((1, block_k, d),
                                 lambda i, j, qq: (i, j, 0)),
                    pl.BlockSpec((1, block_k, d),
                                 lambda i, j, qq: (i, j, 0)),
                    pl.BlockSpec((1, 1, block_q, d),
                                 lambda i, j, qq: (i, j, qq, 0)),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((n, sk_pad, d), jnp.float32),
                    jax.ShapeDtypeStruct((n, sk_pad, d), jnp.float32),
                    jax.ShapeDtypeStruct((n, nk, sq_pad, d), jnp.float32),
                ],
                scratch_shapes=[
                    pltpu.VMEM((block_k, d), jnp.float32),
                    pltpu.VMEM((block_k, d), jnp.float32),
                ] if pltpu is not None else [],
                interpret=interpret,
                compiler_params=_grid_params(interpret),
            )(qt[c0:c1], gt[c0:c1], lse8[c0:c1], delta8[c0:c1],
              kt[c0:c1], vt[c0:c1])
            dqs.append(jnp.sum(dqp, axis=1))       # (n, Sq_pad, d)
            dks.append(dk_c)
            dvs.append(dv_c)
        dq_t = jnp.concatenate(dqs, 0) if len(dqs) > 1 else dqs[0]
        dk_t = jnp.concatenate(dks, 0) if len(dks) > 1 else dks[0]
        dv_t = jnp.concatenate(dvs, 0) if len(dvs) > 1 else dvs[0]
        dq = _unpack_heads(dq_t[:, :sq], b, sq, h, d)[..., :d_orig]
        dk = _unpack_heads(dk_t[:, :sk], b, sk, h, d)[..., :d_orig]
        dv = _unpack_heads(dv_t[:, :sk], b, sk, h, d)[..., :d_orig]
        return (dq.astype(q.dtype), dk.astype(k.dtype),
                dv.astype(v.dtype))

    dkv_kernel = functools.partial(_flash_bwd_dkv_kernel, **common)
    dk_t, dv_t = pl.pallas_call(
        dkv_kernel,
        grid=(bh, sk_pad // block_k, sq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, qq: (i, qq, 0)),
            pl.BlockSpec((1, block_q, d), lambda i, j, qq: (i, qq, 0)),
            pl.BlockSpec((1, 8, block_q), lambda i, j, qq: (i, 0, qq)),
            pl.BlockSpec((1, 8, block_q), lambda i, j, qq: (i, 0, qq)),
            pl.BlockSpec((1, block_k, d), lambda i, j, qq: (i, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j, qq: (i, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda i, j, qq: (i, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, j, qq: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sk_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, sk_pad, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ] if pltpu is not None else [],
        interpret=interpret,
        compiler_params=_grid_params(interpret),
    )(qt, gt, lse8, delta8, kt, vt)

    dq_kernel = functools.partial(_flash_bwd_dq_kernel, **common)
    dq_t = pl.pallas_call(
        dq_kernel,
        grid=(bh, sq_pad // block_q, sk_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, block_k, d), lambda i, qq, j: (i, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda i, qq, j: (i, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda i, qq, j: (i, qq, 0)),
            pl.BlockSpec((1, block_q, d), lambda i, qq, j: (i, qq, 0)),
            pl.BlockSpec((1, 8, block_q), lambda i, qq, j: (i, 0, qq)),
            pl.BlockSpec((1, 8, block_q), lambda i, qq, j: (i, 0, qq)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d),
                               lambda i, qq, j: (i, qq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq_pad, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
        ] if pltpu is not None else [],
        interpret=interpret,
        compiler_params=_grid_params(interpret),
    )(kt, vt, qt, gt, lse8, delta8)

    dq = _unpack_heads(dq_t[:, :sq], b, sq, h, d)[..., :d_orig]
    dk = _unpack_heads(dk_t[:, :sk], b, sk, h, d)[..., :d_orig]
    dv = _unpack_heads(dv_t[:, :sk], b, sk, h, d)[..., :d_orig]
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype))


# ---------------------------------------------------------------------------
# Differentiable wrapper: Pallas forward + fused Pallas backward on TPU
# (XLA-einsum VJP retained as the off-TPU / interpret fallback).
# ---------------------------------------------------------------------------

_FA_INTERPRET = False  # flipped by tests to exercise kernels on CPU


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def flash_attention_diff(q, k, v, causal=False, scale=None,
                         static_max=None, fold_stats=True,
                         single_pass=True):
    """``fold_stats`` / ``single_pass`` (static) select the stat-folded
    and single-pass variants of the packed d=64 backward (production
    defaults True); explicit here — NOT module globals — so A/B benches
    and overrides survive jit caching and concurrent callers (ADVICE
    r4)."""
    return flash_attention(q, k, v, causal=causal, scale=scale,
                           static_max=static_max,
                           interpret=_FA_INTERPRET)


def _fa_fwd(q, k, v, causal, scale, static_max=None, fold_stats=True,
            single_pass=True):
    if not (_on_tpu() or _FA_INTERPRET):
        out = flash_attention(q, k, v, causal=causal, scale=scale)
        return out, (q, k, v, None, None)
    b, sq, h, d = q.shape
    sk = k.shape[1]
    sm_scale = (1.0 / math.sqrt(d)) if scale is None else scale
    if d == 64 and h % 2 == 0 and not causal and sq >= 128 and sk >= 128:
        # packed two-head training path: transposed-score forward with
        # per-head LSE + the packed backward (no 64→128 pad anywhere)
        out, lse_pairs = _flash_packed2t(
            q, k, v, sm_scale=sm_scale, block_q=None,
            block_k=None, interpret=_FA_INTERPRET,
            static_max=static_max, emit_lse=True)
        # reflatten pair-major LSE to the (B·H, Sq_pad) convention the
        # backward entry expects
        sq_pad = lse_pairs.shape[-1]
        lse = lse_pairs.reshape(b, h // 2, 2, sq_pad).reshape(b * h,
                                                              sq_pad)
        return out, (q, k, v, out, lse)
    d_pad = _round_to(d, 128)
    qp, kp, vp = q, k, v
    if d_pad != d:
        pad = ((0, 0), (0, 0), (0, 0), (0, d_pad - d))
        qp, kp, vp = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    block_q = min(DEFAULT_BLOCK_Q, _round_to(sq, 128))
    block_k = min(DEFAULT_BLOCK_K, _round_to(sk, 128))
    sq_pad = _round_to(sq, block_q)
    sk_pad = _round_to(sk, block_k)
    qt = _pack_heads(qp, b, sq, h, d_pad)
    kt = _pack_heads(kp, b, sk, h, d_pad)
    vt = _pack_heads(vp, b, sk, h, d_pad)
    if sq_pad != sq:
        qt = jnp.pad(qt, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if sk_pad != sk:
        kt = jnp.pad(kt, ((0, 0), (0, sk_pad - sk), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, sk_pad - sk), (0, 0)))
    out_t, lse = _flash_forward_lse(qt, kt, vt, sm_scale=sm_scale,
                                    causal=causal, sq=sq, sk=sk,
                                    block_q=block_q, block_k=block_k,
                                    interpret=_FA_INTERPRET,
                                    static_max=static_max)
    out = _unpack_heads(out_t[:, :sq], b, sq, h, d_pad)[..., :d]
    return out, (q, k, v, out, lse)


def _fa_bwd(causal, scale, static_max, fold_stats, single_pass, res, g):
    # static_max only changes how the forward accumulated; the saved LSE
    # is the true log-sum-exp, so the backward is identical.
    q, k, v, out, lse = res
    if lse is not None:
        return flash_attention_bwd(q, k, v, out, lse, g, causal=causal,
                                   scale=scale, interpret=_FA_INTERPRET,
                                   fold_stats=fold_stats,
                                   single_pass=single_pass)
    # off-TPU fallback: standard softmax-attention VJP in XLA
    d = q.shape[-1]
    sm = (1.0 / math.sqrt(d)) if scale is None else scale
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    s = jnp.einsum("bqhd,bkhd->bhqk", qf, kf) * sm
    if causal:
        mask = jnp.tril(jnp.ones((q.shape[1], k.shape[1]), bool))
        s = jnp.where(mask, s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, gf)
    dp = jnp.einsum("bqhd,bkhd->bhqk", gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, kf) * sm
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, qf) * sm
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention_diff.defvjp(_fa_fwd, _fa_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_diff_masked(q, k, v, counts, scale=None, static_max=None):
    """Differentiable masked flash: k/v must arrive with masked key rows
    ALREADY zeroed (the caller's mask multiply — its backprop zeroes the
    garbage dk/dv those rows get from the unmasked backward kernels);
    ``counts`` is the f32 (B,) number of zeroed key rows per batch.

    Gradients are exact with the UNCHANGED backward kernels: dq contracts
    ds against the zeroed K rows (structural vanish), and dk/dv garbage
    lands only in rows the outer mask multiply zeroes. The forward's
    closed-form l correction makes the saved LSE the true masked
    log-sum-exp, so the backward's recomputed probabilities are exact for
    every VALID key. Non-causal only.

    ``static_max`` (qk-normed callers only) drops the running max and
    rescale chain exactly as in the unmasked kernel: zeroed keys score
    exactly 0, so each contributes exactly 2^−static_max to l, still
    removable in closed form."""
    out, _ = _fa_masked_fwd(q, k, v, counts, scale, static_max)
    return out


def _fa_masked_fwd(q, k, v, counts, scale, static_max=None):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    sm_scale = (1.0 / math.sqrt(d)) if scale is None else scale
    d_pad = _round_to(d, 128)
    qp, kp, vp = q, k, v
    if d_pad != d:
        pad = ((0, 0), (0, 0), (0, 0), (0, d_pad - d))
        qp, kp, vp = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    block_q = min(DEFAULT_BLOCK_Q, _round_to(sq, 128))
    block_k = min(DEFAULT_BLOCK_K, _round_to(sk, 128))
    sq_pad = _round_to(sq, block_q)
    sk_pad = _round_to(sk, block_k)
    qt = _pack_heads(qp, b, sq, h, d_pad)
    kt = _pack_heads(kp, b, sk, h, d_pad)
    vt = _pack_heads(vp, b, sk, h, d_pad)
    if sq_pad != sq:
        qt = jnp.pad(qt, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if sk_pad != sk:
        kt = jnp.pad(kt, ((0, 0), (0, sk_pad - sk), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, sk_pad - sk), (0, 0)))
    cnt = jnp.broadcast_to(
        jnp.repeat(counts + (sk_pad - sk), h)[:, None, None],
        (b * h, 8, 128)).astype(jnp.float32)
    out_t, lse = _flash_dynpad(qt, kt, vt, cnt, sm_scale=sm_scale,
                               block_q=block_q, block_k=block_k,
                               emit_lse=True, interpret=_FA_INTERPRET,
                               static_max=static_max)
    out = _unpack_heads(out_t[:, :sq], b, sq, h, d_pad)[..., :d]
    return out, (q, k, v, counts, out, lse)


def _fa_masked_bwd(scale, static_max, res, g):
    # static_max only changes forward accumulation; the saved LSE is the
    # true masked log-sum-exp, so the backward is identical.
    q, k, v, counts, out, lse = res
    dq, dk, dv = flash_attention_bwd(q, k, v, out, lse, g, causal=False,
                                     scale=scale, interpret=_FA_INTERPRET)
    return dq, dk, dv, jnp.zeros_like(counts)


_flash_diff_masked.defvjp(_fa_masked_fwd, _fa_masked_bwd)


# ---------------------------------------------------------------------------
# Sequence-parallel routing context
# ---------------------------------------------------------------------------

import contextlib
import threading

_SP_CTX = threading.local()


@contextlib.contextmanager
def sequence_parallel(mesh, ulysses_axis: Optional[str] = "sp",
                      ring_axis: Optional[str] = None,
                      batch_axes=("dp", "fsdp"),
                      min_seq: int = 1024):
    """Route long self-attention calls through ulysses/ring SP.

    Used by flows around the denoiser apply (replacing the reference's
    per-model xfuser monkey-patching, flow/hunyuanvideo.py:114-179): within
    this context every ``dot_product_attention`` whose q==kv sequence length
    is ≥ ``min_seq`` and divisible by the sp extent runs as
    ``parallel.sequence.sp_attention`` over the given mesh axes. Short
    sequences (text cross-attn, per-frame spatial attn) stay local.
    """
    prev = getattr(_SP_CTX, "cfg", None)
    _SP_CTX.cfg = {"mesh": mesh, "ulysses_axis": ulysses_axis,
                   "ring_axis": ring_axis, "batch_axes": tuple(batch_axes),
                   "min_seq": min_seq}
    try:
        yield
    finally:
        _SP_CTX.cfg = prev


_ATTN_OPTS = threading.local()


@contextlib.contextmanager
def attention_options(static_max: Optional[float] = None):
    """Scoped kernel options for every ``dot_product_attention`` inside —
    the zero-model-change opt-in used by flows (like ``sequence_parallel``).

    ``static_max``: fixed softmax max (log2 domain) for qk-normed
    denoisers. Applied ONLY at call sites that declare
    ``bounded_logits=True`` (every DiT family here RMS/LayerNorms q and
    k at those sites) on the non-causal Pallas path — including the
    kv_valid masked kernel. Everything else inside the scope (text
    encoders, the un-normed Hunyuan token refiner, biased or causal
    attention) keeps the online softmax. Safety window: exactness needs
    scaled log2-scores within (static_max − 126, static_max + 127) —
    exp2's subtract shifts into representable range; scores need NOT be
    ≤ static_max (d=128 qk-RMSNormed logits can reach √128·log2e ≈
    16.3 > 16 and remain exact)."""
    prev = getattr(_ATTN_OPTS, "cfg", None)
    _ATTN_OPTS.cfg = {"static_max": static_max}
    try:
        yield
    finally:
        _ATTN_OPTS.cfg = prev


def _maybe_sp(q, k, v, bias, causal):
    cfg = getattr(_SP_CTX, "cfg", None)
    if cfg is None or bias is not None or causal:
        return None
    if q.ndim != 4 or q.shape[1] != k.shape[1] or q.shape[1] < cfg["min_seq"]:
        return None
    mesh = cfg["mesh"]
    extent = 1
    for ax in (cfg["ulysses_axis"], cfg["ring_axis"]):
        if ax:
            extent *= mesh.shape.get(ax, 1)
    if extent <= 1 or q.shape[1] % extent != 0:
        return None
    hx = mesh.shape.get(cfg["ulysses_axis"], 1) if cfg["ulysses_axis"] \
        else 1
    if q.shape[2] % max(hx, 1) != 0:
        return None
    from videotuna_tpu.parallel.sequence import sp_attention
    return sp_attention(mesh, q, k, v,
                        ulysses_axis=cfg["ulysses_axis"],
                        ring_axis=cfg["ring_axis"],
                        batch_axes=cfg["batch_axes"])


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          bias: Optional[jnp.ndarray] = None,
                          causal: bool = False,
                          scale: Optional[float] = None,
                          force_reference: bool = False,
                          kv_valid: Optional[jnp.ndarray] = None,
                          bounded_logits: bool = False
                          ) -> jnp.ndarray:
    """Attention entry point used by every model in the zoo.

    q,k,v: (..., seq, heads, head_dim); leading dims are flattened to batch.
    Uses the Pallas kernel on TPU when there is no additive bias (the common
    case); otherwise falls back to the XLA reference path (which XLA still
    fuses well).

    ``kv_valid``: optional (B, Sk) bool key-validity mask (ragged caption
    padding — mochi joint attention, stepvideo cross-attn). Unlike an
    additive ``bias`` (arbitrary values, e.g. T5 relative positions) a
    pure validity mask stays on the flash path: masked keys are zeroed
    and removed from the softmax in closed form, forward and backward.

    ``bounded_logits``: per-call-site declaration that the scaled logits
    are bounded (q and k are LayerNorm/RMSNormed before this call). The
    scoped ``attention_options(static_max=…)`` fast path applies ONLY at
    sites that set this — inferring validity from bias-absence would let
    an unbounded-logit attention (e.g. the Hunyuan token refiner, which
    has no qk-norm) silently run the fixed-max softmax and overflow
    outside exp2's (M−126, M+127) window.
    """
    orig_shape = q.shape
    if q.ndim > 4:
        lead = math.prod(orig_shape[:-3])
        q = q.reshape(lead, *orig_shape[-3:])
        k = k.reshape(lead, *k.shape[-3:])
        v = v.reshape(lead, *v.shape[-3:])
        assert kv_valid is None, "kv_valid needs 4D (B, S, H, D) inputs"
    elif q.ndim == 3:
        q, k, v = q[None], k[None], v[None]
        if kv_valid is not None:
            kv_valid = kv_valid[None] if kv_valid.ndim == 1 else kv_valid

    # GQA/MQA (e.g. LLaMA text encoder with kv_heads < heads): broadcast KV
    # heads once here so every downstream path — reference einsum, Pallas
    # kernel, custom VJP — sees equal head counts. The repeat sits outside
    # flash_attention_diff's custom_vjp, so autodiff sums dk/dv over the
    # repeated heads correctly.
    h, kh = q.shape[-2], k.shape[-2]
    if kh != h:
        assert h % kh == 0, f"q heads {h} not a multiple of kv heads {kh}"
        k = jnp.repeat(k, h // kh, axis=-2)
        v = jnp.repeat(v, h // kh, axis=-2)

    sp_out = None if kv_valid is not None else _maybe_sp(q, k, v, bias,
                                                         causal)
    if sp_out is not None:
        return sp_out.reshape(orig_shape)

    import os
    if os.environ.get("VIDEOTUNA_FORCE_REF_ATTN"):
        # escape hatch: pure-XLA attention everywhere (e.g. when the remote
        # Mosaic compile service is unavailable; XLA attention is also the
        # better choice for short/medium sequences)
        force_reference = True
    use_pallas = ((_on_tpu() or _FA_INTERPRET) and not force_reference
                  and bias is None and q.shape[-1] <= 256
                  and q.shape[1] >= 128)
    opts = getattr(_ATTN_OPTS, "cfg", None) or {}
    static_max = (opts.get("static_max")
                  if (bounded_logits and not causal) else None)
    if kv_valid is not None:
        kv_valid = kv_valid.astype(bool)
        if use_pallas and not causal:
            vm = kv_valid[:, :, None, None]
            k = k * vm.astype(k.dtype)
            v = v * vm.astype(v.dtype)
            counts = jnp.sum(1.0 - kv_valid.astype(jnp.float32), axis=1)
            out = _flash_diff_masked(q, k, v, counts, scale, static_max)
            return out.reshape(orig_shape)
        kb = jnp.where(kv_valid, 0.0, _NEG_INF)[:, None, None, :]
        bias = kb if bias is None else bias + kb
        out = reference_attention(q, k, v, bias=bias, causal=causal,
                                  scale=scale)
        return out.reshape(orig_shape)
    if use_pallas:
        out = flash_attention_diff(q, k, v, causal, scale, static_max)
    else:
        out = reference_attention(q, k, v, bias=bias, causal=causal,
                                  scale=scale)
    return out.reshape(orig_shape)
