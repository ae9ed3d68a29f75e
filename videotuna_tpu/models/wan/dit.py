"""Wan 2.1 DiT — flow-matching video transformer (T2V 1.3B/14B + I2V).

Capability parity with the reference ``WanModel``
(/root/reference/videotuna/models/wan/wan/modules/model.py:361, forward :482;
``WanSelfAttention`` / cross-attn variants :102-232; RMSNorm :70; flash-attn
wrapper modules/attention.py:23; USP patching
wan/distributed/xdit_context_parallel.py:66-193):

- patchify (1,2,2) → blocks of [self-attn (3D RoPE, qk RMSNorm) →
  cross-attn to umT5 text (+ CLIP image tokens for I2V) → FFN], each
  modulated by a per-block learned 6-way table added to the shared
  time-projection (the reference's ``modulation`` parameter + ``e``);
- time embedding: sinusoidal → MLP → (dim,) plus a 6·dim projection;
- final head: 2-way modulated norm + linear → unpatchify.

TPU-first: sequence parallelism comes from parallel/sequence.py (the
reference monkey-patches xfuser into blocks); blocks scanned for compile
time; attention through the shared Pallas entry.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from videotuna_tpu.core.registry import register
from videotuna_tpu.kernels.attention import dot_product_attention
from videotuna_tpu.models.layers import (RMSNorm, apply_rope, rope_3d,
                                         wan_rope_dims,
                                         timestep_embedding, unpatchify_3d)

Dtype = Any


class WanBlock(nn.Module):
    dim: int
    heads: int
    ffn_dim: int
    dtype: Dtype = jnp.float32
    as_cell: bool = False

    @nn.compact
    def __call__(self, x, e6, ctx, ctx_img, cos, sin):
        """x: (B, L, D); e6: (B, 6, D) shared time projection; ctx: text
        states (B, Lt, D_model-projected); ctx_img: optional image tokens."""
        d = self.dim
        hd = d // self.heads
        table = self.param("modulation", nn.initializers.normal(d ** -0.5),
                           (6, d))
        mods = table[None] + e6.astype(jnp.float32)
        (s1, sc1, g1, s2, sc2, g2) = [
            m.astype(self.dtype) for m in jnp.split(mods, 6, axis=1)]

        ln = lambda nm: nn.LayerNorm(epsilon=1e-6, use_bias=False,
                                     use_scale=False, dtype=self.dtype,
                                     name=nm)

        def heads_of(z):
            return z.reshape(*z.shape[:-1], self.heads, hd)

        # self attention with rope; q/k RMSNorm is over the FULL dim before
        # the head split (reference WanRMSNorm(dim) at model.py:120-125)
        h = ln("norm1")(x) * (1 + sc1) + s1
        q = nn.Dense(d, dtype=self.dtype, name="self_q")(h)
        k = nn.Dense(d, dtype=self.dtype, name="self_k")(h)
        v = nn.Dense(d, dtype=self.dtype, name="self_v")(h)
        q = heads_of(RMSNorm(dtype=self.dtype, name="self_q_norm")(q))
        k = heads_of(RMSNorm(dtype=self.dtype, name="self_k_norm")(k))
        v = heads_of(v)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        att = dot_product_attention(
            q, k, v, bounded_logits=True).reshape(x.shape[0], -1, d)
        x = x + g1 * nn.Dense(d, dtype=self.dtype, name="self_out")(att)

        # cross attention to text (norm3 has learned scale in the reference)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm3")(x)
        q = nn.Dense(d, dtype=self.dtype, name="cross_q")(h)
        q = heads_of(RMSNorm(dtype=self.dtype, name="cross_q_norm")(q))
        k = nn.Dense(d, dtype=self.dtype, name="cross_k")(ctx)
        v = nn.Dense(d, dtype=self.dtype, name="cross_v")(ctx)
        k = heads_of(RMSNorm(dtype=self.dtype, name="cross_k_norm")(k))
        v = heads_of(v)
        out = dot_product_attention(q, k, v, bounded_logits=True)
        if ctx_img is not None:
            k_i = nn.Dense(d, dtype=self.dtype, name="cross_k_img")(ctx_img)
            v_i = heads_of(nn.Dense(d, dtype=self.dtype,
                                    name="cross_v_img")(ctx_img))
            k_i = heads_of(RMSNorm(dtype=self.dtype,
                                   name="cross_k_img_norm")(k_i))
            out = out + dot_product_attention(q, k_i, v_i,
                                              bounded_logits=True)
        out = out.reshape(x.shape[0], -1, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="cross_out")(out)

        # FFN
        h = ln("norm2")(x) * (1 + sc2) + s2
        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="ffn1")(h)
        h = nn.gelu(h, approximate=True)
        x = x + g2 * nn.Dense(d, dtype=self.dtype, name="ffn2")(h)
        if self.as_cell:
            return x, None
        return x


@register("videotuna_tpu.models.wan.WanModel",
          aliases=["videotuna.models.wan.wan.modules.model.WanModel"])
class WanModel(nn.Module):
    """Defaults ≈ 1.3B (dim 1536, 30 layers, 12 heads); 14B: dim 5120,
    40 layers, 40 heads."""
    in_channels: int = 16
    out_channels: int = 16
    dim: int = 1536
    ffn_dim: int = 8960
    num_layers: int = 30
    heads: int = 12
    text_dim: int = 4096
    img_dim: Optional[int] = None       # CLIP feature dim for I2V
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    freq_dim: int = 256
    rope_theta: float = 10000.0
    dtype: Dtype = jnp.float32
    scan_blocks: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x: Optional[jnp.ndarray] = None,
                 timestep: Optional[jnp.ndarray] = None,
                 context: Optional[jnp.ndarray] = None,
                 context_img: Optional[jnp.ndarray] = None,
                 stage: str = "all",
                 tok: Optional[jnp.ndarray] = None,
                 e: Optional[jnp.ndarray] = None,
                 e6: Optional[jnp.ndarray] = None,
                 ctx: Optional[jnp.ndarray] = None,
                 ctx_img: Optional[jnp.ndarray] = None,
                 grid: Optional[Tuple[int, int, int]] = None) -> Any:
        """``stage`` partitions the forward (the STDiT/HYVideoDiT
        pattern) for host-streamed params > HBM and partitioned benches:
        "embed" → (tok, e, e6, ctx, ctx_img); "blocks" applies this
        instance's num_layers stack; "head" finishes. Staged ==
        monolithic is pinned by tests/test_wan_staging.py."""
        if stage in ("all", "embed"):
            b, t_in, h_in, w_in, _ = x.shape
            pt, ph, pw = self.patch_size
            tt, hh, ww = t_in // pt, h_in // ph, w_in // pw
        else:
            pt, ph, pw = self.patch_size
            tt, hh, ww = grid
        d = self.dim
        if stage == "head":
            return self._head(tok, e, tt, hh, ww)
        if stage == "blocks":
            hd = d // self.heads
            dt_r, dh_r, dw_r = wan_rope_dims(hd)
            cos, sin = rope_3d(dt_r, dh_r, dw_r, tt, hh, ww,
                               theta=self.rope_theta)
            return self._blocks(tok, e6, ctx, ctx_img,
                                cos.astype(self.dtype),
                                sin.astype(self.dtype))

        # time embedding: sinusoidal → MLP → e (B, D); e6 = proj → (B, 6, D)
        te = timestep_embedding(timestep, self.freq_dim).astype(self.dtype)
        e = nn.Dense(d, dtype=self.dtype, name="time_fc1")(te)
        e = nn.Dense(d, dtype=self.dtype, name="time_fc2")(nn.silu(e))
        e6 = nn.Dense(6 * d, dtype=self.dtype,
                      name="time_projection")(nn.silu(e))
        e6 = e6.reshape(b, 6, d)

        tok = nn.Conv(d, kernel_size=self.patch_size,
                      strides=self.patch_size, padding="VALID",
                      dtype=self.dtype,
                      name="patch_embedding")(x.astype(self.dtype))
        tok = tok.reshape(b, tt * hh * ww, d)

        # text projection (umT5 states → model dim, gelu MLP)
        ctx = nn.Dense(d, dtype=self.dtype, name="text_fc1")(
            context.astype(self.dtype))
        ctx = nn.gelu(ctx, approximate=True)
        ctx = nn.Dense(d, dtype=self.dtype, name="text_fc2")(ctx)
        ctx_img = None
        if context_img is not None and self.img_dim is not None:
            ci = nn.Dense(d, dtype=self.dtype, name="img_fc1")(
                context_img.astype(self.dtype))
            ci = nn.gelu(ci, approximate=True)
            ctx_img = nn.Dense(d, dtype=self.dtype, name="img_fc2")(ci)
        if stage == "embed":
            return tok, e, e6, ctx, ctx_img

        hd = d // self.heads
        dt_r, dh_r, dw_r = wan_rope_dims(hd)
        cos, sin = rope_3d(dt_r, dh_r, dw_r, tt, hh, ww,
                           theta=self.rope_theta)
        cos = cos.astype(self.dtype)
        sin = sin.astype(self.dtype)

        tok = self._blocks(tok, e6, ctx, ctx_img, cos, sin)
        return self._head(tok, e, tt, hh, ww)

    def _blocks(self, tok, e6, ctx, ctx_img, cos, sin):
        d = self.dim
        if self.scan_blocks:
            cell = nn.remat(WanBlock, prevent_cse=False) if self.remat \
                else WanBlock
            scan_cls = nn.scan(cell,
                               variable_axes={"params": 0},
                               split_rngs={"params": True},
                               in_axes=(nn.broadcast,) * 5,
                               length=self.num_layers)
            tok, _ = scan_cls(d, self.heads, self.ffn_dim, dtype=self.dtype,
                              as_cell=True, name="blocks")(
                tok, e6, ctx, ctx_img, cos, sin)
        else:
            for i in range(self.num_layers):
                tok = WanBlock(d, self.heads, self.ffn_dim,
                               dtype=self.dtype, name=f"block_{i}")(
                    tok, e6, ctx, ctx_img, cos, sin)
        return tok

    def _head(self, tok, e, tt, hh, ww):
        # head: 2-way modulated norm + linear. As in the reference (WanModel
        # Head :320-331), the time embedding e is ADDED to both modulation
        # rows directly — no extra projection.
        d = self.dim
        pt, ph, pw = self.patch_size
        head_table = self.param("head_modulation",
                                nn.initializers.normal(d ** -0.5), (2, d))
        hm = head_table[None] + e.astype(jnp.float32)[:, None]
        shift, scale = [m.astype(self.dtype)
                        for m in jnp.split(hm, 2, axis=1)]
        tok = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                           dtype=self.dtype, name="head_norm")(tok)
        tok = tok * (1 + scale) + shift
        out_dim = pt * ph * pw * self.out_channels
        tok = nn.Dense(out_dim, dtype=self.dtype, name="head_out")(tok)
        out = unpatchify_3d(tok, (tt, hh, ww), self.patch_size,
                            self.out_channels)
        return out.astype(jnp.float32)
