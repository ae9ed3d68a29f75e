"""Mochi-1 AsymmDiT — asymmetric dual-stream joint-attention DiT, TPU-native.

The reference runs Mochi-1 entirely through the diffusers ``MochiPipeline``
(/root/reference/scripts/inference_mochi.py:1-30); the backbone is genmo's
AsymmDiT (published as ``MochiTransformer3DModel`` in diffusers, weights
``genmo/mochi-1-preview``). Faithful architecture, distinct from
Hunyuan/Flux MMDiT in five ways:

- **asymmetric streams**: visual stream ``dim_x`` (10B: 3072) and text
  stream ``dim_y`` (1536); text q/k/v are projected 1536→3072 so the joint
  attention runs in visual width;
- **tanh-gated RMS residuals**: each residual branch is RMS-normalized and
  scaled by ``tanh(gate)`` (no adaLN shift anywhere — modulation is
  scale-only on RMSNorm);
- **learned mixed-rotation RoPE**: a (3, heads, head_dim/2) frequency
  parameter contracted with centered (t, h, w) token coordinates — per-head
  rotations, applied to visual tokens only;
- **SwiGLU MLPs** (value · silu(gate), diffusers half order) without bias;
- **attention-pooled T5 conditioning**: timestep embedding + an 8-head
  attention pool of the T5 states forms the (B, dim_x) conditioning vector;
  the text stream starts from a 4096→1536 projection of the T5 states.

The last block does not update the text stream (``update_y=False``), so its
modulation emits only the text attention scale.

Parameter names mirror the diffusers checkpoint structure so
``tools/convert_weights.mochi_map`` is a rename + qkv-head reshape.

TPU-first: one joint attention per block over [visual; text] (flash/SP
eligible), blocks scanned, fp32 RMS statistics, bf16 matmuls.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from videotuna_tpu.core.registry import register
from videotuna_tpu.kernels.attention import dot_product_attention
from videotuna_tpu.models.layers import (RMSNorm, TimestepEmbedder,
                                         unpatchify_3d)

Dtype = Any


def _rms(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Parameter-free RMSNorm in fp32 (genmo modulated_rmsnorm base)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def modulated_rmsnorm(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """RMSNorm(x) · (1 + scale) — scale (B, D) broadcast over sequence."""
    return _rms(x) * (1.0 + scale[:, None, :])


def residual_tanh_gated_rmsnorm(x: jnp.ndarray, x_res: jnp.ndarray,
                                gate: jnp.ndarray) -> jnp.ndarray:
    """x + tanh(gate) · RMSNorm(x_res) — Mochi's residual connection."""
    return x + jnp.tanh(gate)[:, None, :] * _rms(x_res)


def mochi_positions(t: int, h: int, w: int,
                    target_area: float = 36864.0) -> jnp.ndarray:
    """Centered (t, h, w) token coordinates, spatial axes rescaled so the
    frame area matches the 192×192-token training area (genmo
    create_position_matrix / diffusers MochiRoPE)."""
    scale = math.sqrt(target_area / (h * w))
    tt = jnp.arange(t, dtype=jnp.float32)
    hh = (jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2.0) * scale
    ww = (jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2.0) * scale
    grid = jnp.stack(jnp.meshgrid(tt, hh, ww, indexing="ij"), axis=-1)
    return grid.reshape(-1, 3)                      # (S, 3) t-major


def mochi_rope(pos_frequencies: jnp.ndarray,
               pos: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mixed learned rotation: freqs (3, H, D/2) ⊗ pos (S, 3) → per-head
    angles (S, H, D/2) → (cos, sin)."""
    angles = jnp.einsum("sd,dhf->shf", pos,
                        pos_frequencies.astype(jnp.float32))
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope_perhead(x: jnp.ndarray, cos: jnp.ndarray,
                       sin: jnp.ndarray) -> jnp.ndarray:
    """Interleaved-pair rotation with PER-HEAD tables.
    x: (B, S, H, D); cos/sin: (S, H, D/2)."""
    x1 = x[..., 0::2].astype(jnp.float32)
    x2 = x[..., 1::2].astype(jnp.float32)
    o1 = x1 * cos - x2 * sin
    o2 = x1 * sin + x2 * cos
    return jnp.stack([o1, o2], axis=-1).reshape(x.shape).astype(x.dtype)


class MochiAttentionPool(nn.Module):
    """8-head attention pool of T5 states → (B, out_dim) conditioning
    (genmo AttentionPool: masked-mean token as the sole query over
    [pool; tokens])."""
    heads: int = 8
    out_dim: int = 3072
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b, l, d = x.shape
        hd = d // self.heads
        if mask is None:
            mask = jnp.ones((b, l), bool)
        mf = mask.astype(jnp.float32)[..., None]
        pool = jnp.sum(x * mf, axis=1, keepdims=True) \
            / jnp.maximum(jnp.sum(mf, axis=1, keepdims=True), 1.0)
        xs = jnp.concatenate([pool, x], axis=1)       # (B, L+1, D)
        kv = nn.Dense(2 * d, dtype=self.dtype, name="to_kv")(xs)
        k, v = jnp.split(kv, 2, axis=-1)
        q = nn.Dense(d, dtype=self.dtype, name="to_q")(xs[:, :1])
        q = q.reshape(b, 1, self.heads, hd)
        k = k.reshape(b, l + 1, self.heads, hd)
        v = v.reshape(b, l + 1, self.heads, hd)
        full = jnp.concatenate([jnp.ones((b, 1), bool), mask], axis=1)
        bias = jnp.where(full, 0.0, -jnp.inf)[:, None, None, :]
        o = dot_product_attention(q, k, v, bias=bias)
        o = o.reshape(b, d)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="to_out")(o)


class MochiBlock(nn.Module):
    """AsymmetricJointBlock: joint attention over [visual; text] with
    asymmetric widths, scale-only RMS modulation, tanh-gated residuals."""
    dim_x: int
    dim_y: int
    heads: int
    mlp_ratio_x: float = 4.0
    mlp_ratio_y: float = 4.0
    update_y: bool = True
    dtype: Dtype = jnp.float32
    as_cell: bool = False

    @nn.compact
    def __call__(self, carry, c, cos, sin, txt_mask=None):
        x, y = carry                              # (B,Sx,Dx), (B,Sy,Dy)
        hd = self.dim_x // self.heads

        mod_x = nn.Dense(4 * self.dim_x, dtype=self.dtype,
                         name="mod_x")(nn.silu(c))
        sc_msa_x, g_msa_x, sc_mlp_x, g_mlp_x = jnp.split(mod_x, 4, axis=-1)
        if self.update_y:
            mod_y = nn.Dense(4 * self.dim_y, dtype=self.dtype,
                             name="mod_y")(nn.silu(c))
            sc_msa_y, g_msa_y, sc_mlp_y, g_mlp_y = jnp.split(
                mod_y, 4, axis=-1)
        else:
            sc_msa_y = nn.Dense(self.dim_y, dtype=self.dtype,
                                name="mod_y")(nn.silu(c))

        xm = modulated_rmsnorm(x, sc_msa_x)
        ym = modulated_rmsnorm(y, sc_msa_y)

        def heads_proj(z, name):
            return nn.DenseGeneral((self.heads, hd), use_bias=False,
                                   dtype=self.dtype, name=name)(z)

        qx = RMSNorm(dtype=self.dtype, name="norm_q_x")(heads_proj(xm, "q_x"))
        kx = RMSNorm(dtype=self.dtype, name="norm_k_x")(heads_proj(xm, "k_x"))
        vx = heads_proj(xm, "v_x")
        qy = RMSNorm(dtype=self.dtype, name="norm_q_y")(heads_proj(ym, "q_y"))
        ky = RMSNorm(dtype=self.dtype, name="norm_k_y")(heads_proj(ym, "k_y"))
        vy = heads_proj(ym, "v_y")

        qx = apply_rope_perhead(qx, cos, sin)
        kx = apply_rope_perhead(kx, cos, sin)

        q = jnp.concatenate([qx, qy], axis=1)
        k = jnp.concatenate([kx, ky], axis=1)
        v = jnp.concatenate([vx, vy], axis=1)
        kv_valid = None
        if txt_mask is not None:
            sx = x.shape[1]
            # key-validity mask (ragged captions) — stays on the flash
            # path (closed-form masked softmax) instead of an additive
            # bias that would force the O(S²) reference attention
            kv_valid = jnp.concatenate(
                [jnp.ones((x.shape[0], sx), bool), txt_mask], axis=1)
        att = dot_product_attention(q, k, v, kv_valid=kv_valid,
                                    bounded_logits=True)
        att = att.reshape(att.shape[0], -1, self.dim_x)
        ax, ay = att[:, :x.shape[1]], att[:, x.shape[1]:]

        ax = nn.Dense(self.dim_x, dtype=self.dtype, name="proj_x")(ax)
        x = residual_tanh_gated_rmsnorm(x, ax, g_msa_x)
        if self.update_y:
            ay = nn.Dense(self.dim_y, dtype=self.dtype, name="proj_y")(ay)
            y = residual_tanh_gated_rmsnorm(y, ay, g_msa_y)

        def swiglu(z, dim, hidden, prefix):
            hg = nn.Dense(2 * hidden, use_bias=False, dtype=self.dtype,
                          name=f"{prefix}_in")(z)
            val, gate = jnp.split(hg, 2, axis=-1)
            return nn.Dense(dim, use_bias=False, dtype=self.dtype,
                            name=f"{prefix}_out")(val * nn.silu(gate))

        fx = swiglu(modulated_rmsnorm(x, sc_mlp_x), self.dim_x,
                    int(self.dim_x * self.mlp_ratio_x), "ff_x")
        x = residual_tanh_gated_rmsnorm(x, fx, g_mlp_x)
        if self.update_y:
            fy = swiglu(modulated_rmsnorm(y, sc_mlp_y), self.dim_y,
                        int(self.dim_y * self.mlp_ratio_y), "ff_y")
            y = residual_tanh_gated_rmsnorm(y, fy, g_mlp_y)

        if self.as_cell:
            return (x, y), None
        return x, y


@register("videotuna_tpu.models.MochiDiT",
          aliases=["diffusers.MochiTransformer3DModel"])
class MochiDiT(nn.Module):
    """AsymmDiT. Input latents channel-last (B, T, H, W, C)."""
    in_channels: int = 12
    out_channels: Optional[int] = None
    dim: int = 3072                    # visual stream (dim_x)
    dim_y: int = 1536                  # text stream
    depth: int = 48
    heads: int = 24
    patch_size: int = 2
    caption_channels: int = 4096       # T5-XXL
    mlp_ratio_x: float = 4.0
    mlp_ratio_y: float = 4.0
    rope_target_area: float = 36864.0
    dtype: Dtype = jnp.float32
    scan_blocks: bool = True
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray,
                 text_states: jnp.ndarray,
                 text_mask: Optional[jnp.ndarray] = None,
                 *unused) -> jnp.ndarray:
        b, tt, hh, ww, cin = x.shape
        p = self.patch_size
        gt, gh, gw = tt, hh // p, ww // p
        out_ch = self.out_channels or self.in_channels
        hd = self.dim // self.heads

        # patchify: per-frame p×p patches → tokens (t-major)
        xt = x.astype(self.dtype).reshape(b, gt, gh, p, gw, p, cin)
        xt = xt.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
            b, gt * gh * gw, p * p * cin)
        xt = nn.Dense(self.dim, dtype=self.dtype, name="patch_embed")(xt)

        temb = TimestepEmbedder(self.dim, freq_dim=256, dtype=self.dtype,
                                name="t_embedder")(t)
        pooled = MochiAttentionPool(out_dim=self.dim, dtype=self.dtype,
                                    name="t5_pool")(
            text_states.astype(self.dtype), text_mask)
        c = temb + pooled                                 # (B, dim_x)
        y = nn.Dense(self.dim_y, dtype=self.dtype, name="caption_proj")(
            text_states.astype(self.dtype))

        pos_freq = self.param(
            "pos_frequencies",
            nn.initializers.normal(0.02),
            (3, self.heads, hd // 2))
        pos = mochi_positions(gt, gh, gw, self.rope_target_area)
        cos, sin = mochi_rope(pos_freq, pos)

        blk_kw = dict(dim_x=self.dim, dim_y=self.dim_y, heads=self.heads,
                      mlp_ratio_x=self.mlp_ratio_x,
                      mlp_ratio_y=self.mlp_ratio_y, dtype=self.dtype)
        n_scan = self.depth - 1
        if self.scan_blocks and n_scan > 1:
            cell = MochiBlock(**blk_kw, update_y=True, as_cell=True)
            cell_t = nn.remat(type(cell)) if self.remat else type(cell)
            (xt, y), _ = nn.scan(
                cell_t, variable_axes={"params": 0},
                split_rngs={"params": True}, length=n_scan,
                in_axes=(nn.broadcast,) * 4,
                metadata_params={nn.PARTITION_NAME: "layers"},
            )(**blk_kw, update_y=True, as_cell=True,
              name="blocks")((xt, y), c, cos, sin, text_mask)
        else:
            for i in range(n_scan):
                xt, y = MochiBlock(**blk_kw, update_y=True,
                                   name=f"block_{i}")(
                    (xt, y), c, cos, sin, text_mask)
        # final block: text stream not updated
        xt, y = MochiBlock(**blk_kw, update_y=False,
                           name=f"block_{self.depth - 1}")(
            (xt, y), c, cos, sin, text_mask)

        # final layer: scale/shift LayerNorm modulation (diffusers
        # AdaLayerNormContinuous order: scale first)
        fin = nn.Dense(2 * self.dim, dtype=self.dtype,
                       name="final_mod")(nn.silu(c))
        scale, shift = jnp.split(fin[:, None, :], 2, axis=-1)
        xn = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                          dtype=self.dtype, name="final_norm")(xt)
        xn = xn * (1.0 + scale) + shift
        out = nn.Dense(p * p * out_ch, dtype=self.dtype,
                       name="final_proj")(xn)
        return unpatchify_3d(out, (gt, gh, gw), (1, p, p),
                             out_ch).astype(jnp.float32)
