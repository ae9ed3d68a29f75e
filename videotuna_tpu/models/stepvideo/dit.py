"""StepVideo DiT — 30B T2V flow-matching transformer with TP, TPU-native.

Weight-faithful to the reference ``StepVideoModel``
(/root/reference/videotuna/models/stepvideo/stepvideo/modules/model.py:738-920
— the module the released pipeline instantiates via
stepvideo/__init__.py:7). Structure per block (model.py:696-736):
affine LayerNorm(eps 1e-5) → adaLN modulate → self-attn (fused wqkv,
per-head q/k RMSNorm, grouped RoPE3D ch_split [64,32,32]) → gated
residual; cross-attn applied to the residual stream DIRECTLY (no
pre-norm) with its own q/k RMSNorms → ungated residual; affine
LayerNorm(eps 1e-5) → modulate → GELU(tanh) MLP (bias-free) → gated
residual. Model-level: PixArt adaLN-single (256-dim sinusoid →
2-layer MLP; the ``time_step_rescale=1000`` multiply lives in the
caller — pass timesteps already in [0, 1000]), caption path
LayerNorm(eps 1e-6, no affine) → 2-layer GELU(tanh) projection, optional
CLIP branch concatenated BEFORE the caption tokens (model.py:879-881),
final scale/shift table over norm_out(eps 1e-6, no affine).

The reference requires a prebuilt ``liboptimus`` torch-ops .so for fused ops
(flow/stepvideo.py:93-111); here XLA fusion + the Pallas attention kernel
replace it, and TP is parameter placement (parallel/tensor_parallel.py)
instead of xfuser's TensorParallelApplicator module rewriting.

30B config: dim 6144, heads 48, 48 layers, ffn 24576.
Conversion: tools/convert_weights.stepvideo_map (+
preprocess_split_headwise for the per-head-interleaved wqkv/wkv);
whole-model parity vs the imported reference in
tests/test_stepvideo_parity.py.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from videotuna_tpu.core.registry import register
from videotuna_tpu.kernels.attention import dot_product_attention
from videotuna_tpu.models.layers import (STEPVIDEO_ROPE_DIMS, RMSNorm,
                                         TimestepEmbedder,
                                         apply_rope_3d_grouped,
                                         rope_3d_axis_tables,
                                         split_rope_dims, unpatchify_3d)

Dtype = Any


class StepVideoBlock(nn.Module):
    dim: int
    heads: int
    ffn_dim: int
    rope_dims: Tuple[int, int, int] = STEPVIDEO_ROPE_DIMS
    dtype: Dtype = jnp.float32
    as_cell: bool = False

    @nn.compact
    def __call__(self, x, t6, ctx, rope_tables, ctx_valid=None):
        d = self.dim
        hd = d // self.heads
        table = self.param("scale_shift_table",
                           nn.initializers.normal(d ** -0.5), (6, d))
        mods = table[None] + t6.astype(jnp.float32)
        s1, sc1, g1, s2, sc2, g2 = [m.astype(self.dtype)
                                    for m in jnp.split(mods, 6, axis=1)]

        def dg(nm):
            return nn.DenseGeneral((self.heads, hd), use_bias=False,
                                   dtype=self.dtype, name=nm)

        # norm1: AFFINE LayerNorm eps 1e-5 (model.py:700 default norm_eps),
        # then modulate = x·(1+scale)+shift (model.py:646)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        h = h * (1 + sc1) + s1
        q, k, v = dg("self_q")(h), dg("self_k")(h), dg("self_v")(h)
        q = RMSNorm(dtype=self.dtype, name="q_norm")(q)
        k = RMSNorm(dtype=self.dtype, name="k_norm")(k)
        # StepVideo RoPE3D: per-channel-group rotate-half (model.py:409-447)
        # — NOT the interleaved convention of Wan/Hunyuan.
        q = apply_rope_3d_grouped(q, rope_tables, self.rope_dims)
        k = apply_rope_3d_grouped(k, rope_tables, self.rope_dims)
        att = dot_product_attention(
            q, k, v, bounded_logits=True).reshape(x.shape[0], -1, d)
        x = x + g1 * nn.Dense(d, use_bias=False, dtype=self.dtype,
                              name="self_out")(att)

        # cross-attn reads the residual stream directly — NO pre-norm
        # (model.py:722-727) — with per-head q/k RMSNorms; UNGATED residual
        q = dg("cross_q")(x)
        k, v = dg("cross_k")(ctx), dg("cross_v")(ctx)
        q = RMSNorm(dtype=self.dtype, name="cross_q_norm")(q)
        k = RMSNorm(dtype=self.dtype, name="cross_k_norm")(k)
        out = dot_product_attention(q, k, v, kv_valid=ctx_valid,
                                    bounded_logits=True)
        x = x + nn.Dense(d, use_bias=False, dtype=self.dtype,
                         name="cross_out")(out.reshape(x.shape[0], -1, d))

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        h = h * (1 + sc2) + s2
        h = nn.Dense(self.ffn_dim, use_bias=False, dtype=self.dtype,
                     name="ffn1")(h)
        h = nn.gelu(h, approximate=True)
        x = x + g2 * nn.Dense(d, use_bias=False, dtype=self.dtype,
                              name="ffn2")(h)
        if self.as_cell:
            return x, None
        return x


@register("videotuna_tpu.models.stepvideo.StepVideoModel",
          aliases=["videotuna.models.stepvideo.stepvideo.modules.model."
                   "StepVideoModel"])
class StepVideoModel(nn.Module):
    in_channels: int = 64
    out_channels: int = 64
    dim: int = 6144
    ffn_dim: int = 24576
    num_layers: int = 48
    heads: int = 48
    text_dim: int = 6144
    clip_dim: Optional[int] = 1024
    patch_size: Tuple[int, int, int] = (1, 1, 1)
    rope_theta: float = 10000.0
    dtype: Dtype = jnp.float32
    scan_blocks: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, timestep: jnp.ndarray,
                 context: jnp.ndarray,
                 context_2: Optional[jnp.ndarray] = None,
                 context_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """x: (b, t, h, w, c) latents; timestep already ×1000 (the
        reference's AdaLayerNormSingle.time_step_rescale, model.py:287 —
        our flows pass sigma·1000); context: StepLLM states (b, L, 6144);
        context_2: CLIP states (b, L2, 1024), projected and concatenated
        BEFORE the caption tokens (model.py:879-881); context_mask: bool
        (b, L) over the caption tokens (CLIP tokens always attended —
        prepare_attn_mask model.py:836-842 masking, trim-free)."""
        b, t_in, h_in, w_in, _ = x.shape
        pt, ph, pw = self.patch_size
        tt, hh, ww = t_in // pt, h_in // ph, w_in // pw
        d = self.dim

        # adaLN-single (model.py:270-295): 256-dim sinusoid → 2-layer MLP
        # = embedded_timestep; the 6·dim modulation = linear(silu(·))
        temb = TimestepEmbedder(d, dtype=self.dtype,
                                name="t_embedder")(timestep)
        t6 = nn.Dense(6 * d, dtype=self.dtype,
                      name="t_block")(nn.silu(temb)).reshape(b, 6, d)

        tok = nn.Conv(d, kernel_size=self.patch_size,
                      strides=self.patch_size, padding="VALID",
                      dtype=self.dtype,
                      name="patch_embed")(x.astype(self.dtype))
        tok = tok.reshape(b, tt * hh * ww, d)

        # caption path (model.py:875-881): no-affine LN(eps 1e-6) → PixArt
        # 2-layer GELU(tanh) projection
        cap = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                           dtype=self.dtype,
                           name="caption_norm")(context.astype(self.dtype))
        cap = nn.Dense(d, dtype=self.dtype, name="caption_fc1")(cap)
        cap = nn.gelu(cap, approximate=True)
        ctx = nn.Dense(d, dtype=self.dtype, name="caption_fc2")(cap)
        if context_2 is not None:
            clip = nn.Dense(d, dtype=self.dtype,
                            name="clip_proj")(context_2.astype(self.dtype))
            ctx = jnp.concatenate([clip, ctx], axis=1)
        ctx_valid = None
        if context_mask is not None:
            # raw key-validity mask (ragged captions): flash-path masked
            # softmax instead of an additive bias → reference fallback
            ctx_valid = context_mask.astype(bool)
            if context_2 is not None:
                ctx_valid = jnp.concatenate(
                    [jnp.ones((b, context_2.shape[1]), bool), ctx_valid],
                    axis=1)

        hd = d // self.heads
        rope_dims = (STEPVIDEO_ROPE_DIMS if hd == sum(STEPVIDEO_ROPE_DIMS)
                     else split_rope_dims(hd))
        tables = rope_3d_axis_tables(rope_dims, (tt, hh, ww),
                                     theta=self.rope_theta)
        tables = tuple((c.astype(self.dtype), s.astype(self.dtype))
                       for c, s in tables)

        if self.scan_blocks:
            cell = nn.remat(StepVideoBlock, prevent_cse=False) \
                if self.remat else StepVideoBlock
            scan_cls = nn.scan(cell,
                               variable_axes={"params": 0},
                               split_rngs={"params": True},
                               in_axes=(nn.broadcast,) * 4,
                               length=self.num_layers)
            tok, _ = scan_cls(d, self.heads, self.ffn_dim, rope_dims,
                              dtype=self.dtype, as_cell=True, name="blocks")(
                tok, t6, ctx, tables, ctx_valid)
        else:
            for i in range(self.num_layers):
                tok = StepVideoBlock(d, self.heads, self.ffn_dim, rope_dims,
                                     dtype=self.dtype, name=f"block_{i}")(
                    tok, t6, ctx, tables, ctx_valid)

        # final modulation from embedded_timestep (NOT t6) + (2, d) table;
        # chunk order shift-then-scale (model.py:898-901)
        fin = self.param("final_scale_shift_table",
                         nn.initializers.normal(d ** -0.5), (2, d))
        fm = fin[None] + temb.astype(jnp.float32)[:, None]
        shift, scale = [m.astype(self.dtype)
                        for m in jnp.split(fm, 2, axis=1)]
        tok = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                           dtype=self.dtype, name="final_norm")(tok)
        tok = tok * (1 + scale) + shift
        out_dim = pt * ph * pw * self.out_channels
        tok = nn.Dense(out_dim, dtype=self.dtype, name="final_proj",
                       kernel_init=nn.initializers.zeros)(tok)
        out = unpatchify_3d(tok, (tt, hh, ww), self.patch_size,
                            self.out_channels)
        return out.astype(jnp.float32)
