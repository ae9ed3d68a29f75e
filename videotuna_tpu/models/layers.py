"""Shared building blocks for the model zoo (flax.linen).

These are the TPU-native equivalents of blocks the reference re-implements per
family (timestep embedding, patchify, adaLN modulation, RoPE, RMSNorm —
e.g. opensora models/layers/blocks.py, hunyuan modules/posemb_layers.py:310,
wan modules/model.py:70). One implementation serves all families; everything
is static-shaped and fusion-friendly.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from videotuna_tpu.kernels.attention import dot_product_attention

Dtype = Any


def timestep_embedding(t: jnp.ndarray, dim: int,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding (shared by every DiT/UNet family)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimestepEmbedder(nn.Module):
    """MLP over the sinusoidal embedding → conditioning vector."""
    hidden: int
    freq_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        x = timestep_embedding(t, self.freq_dim).astype(self.dtype)
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.silu(x)
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(x)
        return x


class RMSNorm(nn.Module):
    """RMSNorm in fp32 accumulation (reference wan model.py:70)."""
    eps: float = 1e-6
    dtype: Dtype = jnp.float32
    use_scale: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(var + self.eps)
        if self.use_scale:
            scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
            y = y * scale
        return y.astype(x.dtype)


def modulate(x: jnp.ndarray, shift: jnp.ndarray,
             scale: jnp.ndarray) -> jnp.ndarray:
    """adaLN modulation: x·(1+scale)+shift, broadcasting (B,D)→(B,…,D)."""
    while shift.ndim < x.ndim:
        shift = shift[:, None]
        scale = scale[:, None]
    return x * (1.0 + scale) + shift


class Mlp(nn.Module):
    hidden: int
    out: Optional[int] = None
    act: Callable = nn.gelu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = self.out or x.shape[-1]
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        x = nn.Dense(out, dtype=self.dtype, name="fc2")(x)
        return x


# ---------------------------------------------------------------------------
# Rotary position embeddings (1D and factorized 3D for video DiTs)
# ---------------------------------------------------------------------------

def rope_frequencies(dim: int, positions: jnp.ndarray,
                     theta: float = 10000.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables: positions (N,) → (N, dim/2)."""
    inv = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    freqs = positions.astype(jnp.float32)[:, None] * inv[None]
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray,
               sin: jnp.ndarray) -> jnp.ndarray:
    """x: (..., N, H, D); cos/sin: (N, D/2). Interleaved-pair convention
    (pairs are adjacent channels — Wan view_as_complex, Hunyuan/CogVideoX
    repeat_interleave'd cos/sin)."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    c = cos[:, None, :]
    s = sin[:, None, :]
    o1 = x1 * c - x2 * s
    o2 = x1 * s + x2 * c
    return jnp.stack([o1, o2], axis=-1).reshape(x.shape)


def apply_rope_half(x: jnp.ndarray, cos: jnp.ndarray,
                    sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate-half (non-interleaved) convention: pairs are (i, i+D/2).

    StepVideo's RoPE1D (stepvideo/modules/model.py:347-356: cos/sin are
    cat(freqs, freqs); rotate_half negates the second half). x: (..., N, H,
    D); cos/sin: (N, D/2)."""
    d2 = x.shape[-1] // 2
    x1 = x[..., :d2]
    x2 = x[..., d2:]
    c = cos[:, None, :]
    s = sin[:, None, :]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


def apply_rope_3d_grouped(x: jnp.ndarray,
                          tables: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
                          dims: Sequence[int],
                          interleaved: bool = False) -> jnp.ndarray:
    """Apply per-axis RoPE to channel groups of x (StepVideo RoPE3D:
    stepvideo/modules/model.py:410-440 splits channels by rope_ch_split and
    rotates each group with its own axis positions).

    x: (..., N, H, D) with D = sum(dims); tables[i]: (cos, sin) each
    (N, dims[i]/2)."""
    fn = apply_rope if interleaved else apply_rope_half
    parts = []
    off = 0
    for (c, s), d in zip(tables, dims):
        parts.append(fn(x[..., off:off + d], c, s))
        off += d
    return jnp.concatenate(parts, axis=-1)


def split_rope_dims(head_dim: int) -> Tuple[int, int, int]:
    """Split head_dim into (t, h, w) rotary dims — all even, summing to
    head_dim, ~(1/4, 3/8, 3/8). This is the *CogVideoX* convention
    (diffusers `get_3d_rotary_pos_embed`: 64 → 16/24/24). Other families
    use different splits — see the per-family helpers below; using this
    split for them breaks converted-checkpoint fidelity."""
    assert head_dim % 2 == 0, "head_dim must be even for RoPE"
    dh = (head_dim * 3 // 8) // 2 * 2
    dt = head_dim - 2 * dh
    return dt, dh, dh


def wan_rope_dims(head_dim: int) -> Tuple[int, int, int]:
    """Wan 2.1 split: (d − 4·⌊d/6⌋, 2·⌊d/6⌋, 2·⌊d/6⌋) — 128 → 44/42/42
    (reference wan/modules/model.py:468-473), interleaved-pair convention
    (torch.view_as_complex on consecutive pairs)."""
    g = head_dim // 6
    return head_dim - 4 * g, 2 * g, 2 * g


HUNYUAN_ROPE_DIMS: Tuple[int, int, int] = (16, 56, 56)
"""HunyuanVideo rope_dim_list default (hyvideo_t2v/modules/models.py:461),
interleaved-pair convention (posemb_layers.rotate_half on (…,-1,2) pairs)."""

STEPVIDEO_ROPE_DIMS: Tuple[int, int, int] = (64, 32, 32)
"""StepVideo rope_ch_split (stepvideo/modules/blocks.py:39), rotate-HALF
(non-interleaved) convention applied per channel group."""


def rope_3d(dim_t: int, dim_h: int, dim_w: int,
            t: int, h: int, w: int,
            theta: float = 10000.0,
            temporal_scale: Optional[jnp.ndarray] = None
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Factorized 3D RoPE tables for a (t,h,w) token grid flattened in
    t-major order → (t·h·w, (dim_t+dim_h+dim_w)/2) cos/sin.

    ``temporal_scale`` implements RIFLEx-style frequency adjustment for long
    videos (reference flow/hunyuanvideo.py:55-109): per-frequency multipliers
    on the temporal inverse frequencies.
    """
    def axis_tables(dim, n, scale=None):
        inv = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
        if scale is not None:
            inv = inv * scale
        freqs = jnp.arange(n, dtype=jnp.float32)[:, None] * inv[None]
        return jnp.cos(freqs), jnp.sin(freqs)

    ct, st = axis_tables(dim_t, t, temporal_scale)
    ch, sh = axis_tables(dim_h, h)
    cw, sw = axis_tables(dim_w, w)

    # broadcast to the full grid, then concat along the freq dim
    ct = jnp.broadcast_to(ct[:, None, None, :], (t, h, w, dim_t // 2))
    st = jnp.broadcast_to(st[:, None, None, :], (t, h, w, dim_t // 2))
    ch = jnp.broadcast_to(ch[None, :, None, :], (t, h, w, dim_h // 2))
    sh = jnp.broadcast_to(sh[None, :, None, :], (t, h, w, dim_h // 2))
    cw = jnp.broadcast_to(cw[None, None, :, :], (t, h, w, dim_w // 2))
    sw = jnp.broadcast_to(sw[None, None, :, :], (t, h, w, dim_w // 2))
    cos = jnp.concatenate([ct, ch, cw], axis=-1).reshape(t * h * w, -1)
    sin = jnp.concatenate([st, sh, sw], axis=-1).reshape(t * h * w, -1)
    return cos, sin


def rope_3d_axis_tables(dims: Sequence[int], grid: Tuple[int, int, int],
                        theta: float = 10000.0,
                        temporal_scale: Optional[jnp.ndarray] = None
                        ) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]:
    """Per-axis cos/sin tables broadcast to the flattened (t·h·w) grid,
    for grouped-RoPE families (StepVideo): returns ((cos_t, sin_t), (cos_h,
    sin_h), (cos_w, sin_w)), each table (t·h·w, dims[i]/2)."""
    t, h, w = grid
    out = []
    for axis, (dim, n) in enumerate(zip(dims, grid)):
        inv = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
        if axis == 0 and temporal_scale is not None:
            inv = inv * temporal_scale
        freqs = jnp.arange(n, dtype=jnp.float32)[:, None] * inv[None]
        c, s = jnp.cos(freqs), jnp.sin(freqs)
        shape = [1, 1, 1, dim // 2]
        shape[axis] = n
        c = jnp.broadcast_to(c.reshape(shape), (t, h, w, dim // 2))
        s = jnp.broadcast_to(s.reshape(shape), (t, h, w, dim // 2))
        out.append((c.reshape(t * h * w, -1), s.reshape(t * h * w, -1)))
    return tuple(out)


# ---------------------------------------------------------------------------
# Attention modules
# ---------------------------------------------------------------------------

class Attention(nn.Module):
    """Multi-head self-attention over the second-to-last axis.

    qk_norm enables per-head RMS query/key normalization (Hunyuan/Wan/SD3
    style). rope tables, if given, are applied to q and k.
    """
    heads: int
    head_dim: Optional[int] = None
    qkv_bias: bool = True
    qk_norm: bool = False
    dtype: Dtype = jnp.float32
    out_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 context: Optional[jnp.ndarray] = None,
                 rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        dim = x.shape[-1]
        head_dim = self.head_dim or dim // self.heads
        inner = self.heads * head_dim
        ctx = x if context is None else context

        q = nn.DenseGeneral((self.heads, head_dim), use_bias=self.qkv_bias,
                            dtype=self.dtype, name="q")(x)
        k = nn.DenseGeneral((self.heads, head_dim), use_bias=self.qkv_bias,
                            dtype=self.dtype, name="k")(ctx)
        v = nn.DenseGeneral((self.heads, head_dim), use_bias=self.qkv_bias,
                            dtype=self.dtype, name="v")(ctx)
        if self.qk_norm:
            q = RMSNorm(dtype=self.dtype, name="q_norm")(q)
            k = RMSNorm(dtype=self.dtype, name="k_norm")(k)
        if rope is not None:
            cos, sin = rope
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
        # mask: (B, Sk) bool key-validity — flash-path masked softmax
        # (falls back to an additive bias off-TPU / short sequences).
        # NOTE the masked flash path outputs zeros for an all-False mask
        # row (l cancels to the clamp); callers must keep ≥1 valid key
        # per row (hunyuan forces column 0; mochi/stepvideo concatenate
        # always-valid tokens). bounded_logits rides the qk_norm flag:
        # only normed q/k make the scoped static-max softmax safe.
        out = dot_product_attention(q, k, v, kv_valid=mask,
                                    bounded_logits=self.qk_norm)
        out = out.reshape(*out.shape[:-2], inner)
        return nn.Dense(dim, use_bias=self.out_bias, dtype=self.dtype,
                        name="out")(out)


class PatchEmbed3D(nn.Module):
    """(B, T, H, W, C) video latents → (B, T', H'·W' or merged tokens, D).

    Conv with stride = patch size over (t, h, w); the reference families use
    (1,2,2) (opensora/hunyuan/wan) or (2,2) image patches (flux).
    """
    dim: int
    patch: Tuple[int, int, int] = (1, 2, 2)
    dtype: Dtype = jnp.float32
    flatten: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pt, ph, pw = self.patch
        x = nn.Conv(self.dim, kernel_size=(pt, ph, pw),
                    strides=(pt, ph, pw), padding="VALID",
                    dtype=self.dtype, name="proj")(x)
        if self.flatten:
            b, t, h, w, d = x.shape
            x = x.reshape(b, t * h * w, d)
        return x


def unpatchify_3d(x: jnp.ndarray, grid: Tuple[int, int, int],
                  patch: Tuple[int, int, int], out_ch: int) -> jnp.ndarray:
    """(B, T'·H'·W', pt·ph·pw·C) → (B, T, H, W, C)."""
    t, h, w = grid
    pt, ph, pw = patch
    b = x.shape[0]
    x = x.reshape(b, t, h, w, pt, ph, pw, out_ch)
    x = jnp.einsum("bthwpqrc->btphqwrc", x)
    return x.reshape(b, t * pt, h * ph, w * pw, out_ch)


class CaptionEmbedder(nn.Module):
    """Project text-encoder states into model dim (+ learned null token for
    CFG dropout, as in opensora blocks.py CaptionEmbedder)."""
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jnp.ndarray) -> jnp.ndarray:
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        return y
