"""StepVideo DiT — 30B T2V flow-matching transformer with TP, TPU-native.

Capability parity with the reference ``StepVideoModel``
(/root/reference/videotuna/models/stepvideo/stepvideo/modules/model.py:920,
blocks.py:313; bf16 RMSNorm normalization.py:317; parallel init
stepvideo/parallel.py:1-47 — xfuser TP + SP with a ``parallel_forward``
sequence-chunk decorator): patchified video tokens, blocks of
[self-attn (RoPE) → cross-attn to StepLLM text states → gated MLP] with
adaLN modulation, flow-matching prediction.

The reference requires a prebuilt ``liboptimus`` torch-ops .so for fused ops
(flow/stepvideo.py:93-111); here XLA fusion + the Pallas attention kernel
replace it, and TP is parameter placement (parallel/tensor_parallel.py)
instead of xfuser's TensorParallelApplicator module rewriting.

30B config: dim 6144, heads 48, 48 layers, ffn 24576.
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
    def __call__(self, x, t6, ctx, rope_tables):
        d = self.dim
        hd = d // self.heads
        table = self.param("scale_shift_table",
                           nn.initializers.normal(d ** -0.5), (6, d))
        mods = table[None] + t6.astype(jnp.float32)
        s1, sc1, g1, s2, sc2, g2 = [m.astype(self.dtype)
                                    for m in jnp.split(mods, 6, axis=1)]
        ln = lambda nm: nn.LayerNorm(epsilon=1e-6, use_bias=False,
                                     use_scale=False, dtype=self.dtype,
                                     name=nm)

        h = ln("norm1")(x) * (1 + sc1) + s1
        q = nn.DenseGeneral((self.heads, hd), dtype=self.dtype,
                            name="self_q")(h)
        k = nn.DenseGeneral((self.heads, hd), dtype=self.dtype,
                            name="self_k")(h)
        v = nn.DenseGeneral((self.heads, hd), dtype=self.dtype,
                            name="self_v")(h)
        q = RMSNorm(dtype=self.dtype, name="q_norm")(q)
        k = RMSNorm(dtype=self.dtype, name="k_norm")(k)
        # StepVideo RoPE3D: per-channel-group rotate-half (blocks.py:39,
        # model.py:410) — NOT the interleaved convention of Wan/Hunyuan.
        q = apply_rope_3d_grouped(q, rope_tables, self.rope_dims)
        k = apply_rope_3d_grouped(k, rope_tables, self.rope_dims)
        att = dot_product_attention(q, k, v).reshape(x.shape[0], -1, d)
        x = x + g1 * nn.Dense(d, dtype=self.dtype, name="self_out")(att)

        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_cross")(x)
        q = nn.DenseGeneral((self.heads, hd), dtype=self.dtype,
                            name="cross_q")(h)
        k = nn.DenseGeneral((self.heads, hd), dtype=self.dtype,
                            name="cross_k")(ctx)
        v = nn.DenseGeneral((self.heads, hd), dtype=self.dtype,
                            name="cross_v")(ctx)
        out = dot_product_attention(q, k, v).reshape(x.shape[0], -1, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="cross_out")(out)

        h = ln("norm2")(x) * (1 + sc2) + s2
        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="ffn1")(h)
        h = nn.gelu(h, approximate=True)
        x = x + g2 * nn.Dense(d, dtype=self.dtype, name="ffn2")(h)
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
    patch_size: Tuple[int, int, int] = (1, 1, 1)
    rope_theta: float = 10000.0
    dtype: Dtype = jnp.float32
    scan_blocks: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, timestep: jnp.ndarray,
                 context: jnp.ndarray) -> jnp.ndarray:
        b, t_in, h_in, w_in, _ = x.shape
        pt, ph, pw = self.patch_size
        tt, hh, ww = t_in // pt, h_in // ph, w_in // pw
        d = self.dim

        temb = TimestepEmbedder(d, dtype=self.dtype,
                                name="t_embedder")(timestep)
        t6 = nn.Dense(6 * d, dtype=self.dtype,
                      name="t_block")(nn.silu(temb)).reshape(b, 6, d)

        tok = nn.Conv(d, kernel_size=self.patch_size,
                      strides=self.patch_size, padding="VALID",
                      dtype=self.dtype,
                      name="patch_embed")(x.astype(self.dtype))
        tok = tok.reshape(b, tt * hh * ww, d)
        ctx = nn.Dense(d, dtype=self.dtype,
                       name="caption_proj")(context.astype(self.dtype))

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
                               in_axes=(nn.broadcast,) * 3,
                               length=self.num_layers)
            tok, _ = scan_cls(d, self.heads, self.ffn_dim, rope_dims,
                              dtype=self.dtype, as_cell=True, name="blocks")(
                tok, t6, ctx, tables)
        else:
            for i in range(self.num_layers):
                tok = StepVideoBlock(d, self.heads, self.ffn_dim, rope_dims,
                                     dtype=self.dtype, name=f"block_{i}")(
                    tok, t6, ctx, tables)

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
