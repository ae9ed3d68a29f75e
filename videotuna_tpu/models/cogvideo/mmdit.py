"""CogVideoX MMDiT — joint text+video transformer, TPU-native.

Capability parity with the reference's diffusers-backed
``CogVideoXTransformer3DModel`` (instantiated from YAML at
/root/reference/configs/004_cogvideox/cogvideo2b.yaml, trained via
``CogVideoXWorkFlow`` videotuna/models/cogvideo_hf/cogvideo_pl.py:90):

- 2D patchify per frame (v1.0; p=2) or 3D patchify (v1.5; p_t=2);
- text tokens projected and *concatenated* with video tokens; every block
  runs joint full self-attention over [text; video] with per-modality adaLN
  (separate scale/shift/gate for the two segments) and qk-layernorm;
- 3D RoPE on the video segment (v1.5) or learned/sincos pos-embed (v1.0);
- adaLN final norm → unpatchify; v-prediction (cogvideo_pl.py:815-887).

TPU-first: channel-last, one fused attention over the concatenated sequence
(maps to a single Pallas flash call), blocks optionally scanned.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from videotuna_tpu.core.registry import register
from videotuna_tpu.kernels.attention import dot_product_attention
from videotuna_tpu.models.layers import (RMSNorm, TimestepEmbedder,
                                         apply_rope, rope_3d, unpatchify_3d)

Dtype = Any


class CogVideoXBlock(nn.Module):
    dim: int
    heads: int
    text_len: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    as_cell: bool = False

    @nn.compact
    def __call__(self, x, temb, rope_cos, rope_sin):
        """x: (B, L_text + L_vid, D); temb: (B, D); rope tables cover the
        video segment only."""
        b = x.shape[0]
        d = self.dim
        head_dim = d // self.heads
        lt = self.text_len

        # per-modality adaLN: two CogVideoXLayerNormZero linears (one before
        # attention, one before FF), each emitting 6 chunks in the diffusers
        # order (video shift/scale/gate, then text shift/scale/gate)
        mods1 = nn.Dense(6 * d, dtype=self.dtype, name="norm1_mod")(
            nn.silu(temb))
        mods2 = nn.Dense(6 * d, dtype=self.dtype, name="norm2_mod")(
            nn.silu(temb))
        (vs1, vsc1, vg1, ts1, tsc1, tg1) = jnp.split(mods1, 6, axis=-1)
        (vs2, vsc2, vg2, ts2, tsc2, tg2) = jnp.split(mods2, 6, axis=-1)

        # per-segment modulation via a (1, L, 1) select instead of
        # slice+concat: concatenates materialize two full (B, L, D) HBM
        # copies per call (×6 calls/block at 17.7k tokens ≈ 1.3 GB of
        # pure copy traffic per CogVideoX-5B layer); the where-select is
        # elementwise and fuses into the surrounding multiply
        is_text = (jnp.arange(x.shape[1]) < lt)[None, :, None]

        def seg_mod(h, tshift, tscale, vshift, vscale):
            scale = jnp.where(is_text, tscale[:, None], vscale[:, None])
            shift = jnp.where(is_text, tshift[:, None], vshift[:, None])
            return h * (1 + scale) + shift

        def seg_gate(h, tgate, vgate):
            gate = jnp.where(is_text, tgate[:, None], vgate[:, None])
            return h * gate

        norm1 = nn.LayerNorm(epsilon=1e-5, use_bias=False, use_scale=False,
                             dtype=self.dtype, name="norm1")
        h = seg_mod(norm1(x), ts1, tsc1, vs1, vsc1)

        q = nn.DenseGeneral((self.heads, head_dim), dtype=self.dtype,
                            name="q")(h)
        k = nn.DenseGeneral((self.heads, head_dim), dtype=self.dtype,
                            name="k")(h)
        v = nn.DenseGeneral((self.heads, head_dim), dtype=self.dtype,
                            name="v")(h)
        # diffusers CogVideoX uses qk_norm="layer_norm" over head_dim
        q = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="q_norm")(q)
        k = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="k_norm")(k)
        if rope_cos is not None:
            # identity rotation (cos=1, sin=0) on the text prefix — equal
            # to rotating only the video segment but without the
            # slice+concat HBM round-trips on q and k
            pad_c = jnp.ones((lt, rope_cos.shape[1]), rope_cos.dtype)
            pad_s = jnp.zeros((lt, rope_sin.shape[1]), rope_sin.dtype)
            full_cos = jnp.concatenate([pad_c, rope_cos], axis=0)
            full_sin = jnp.concatenate([pad_s, rope_sin], axis=0)
            q = apply_rope(q, full_cos, full_sin)
            k = apply_rope(k, full_cos, full_sin)
        att = dot_product_attention(q, k, v, bounded_logits=True)
        att = att.reshape(b, -1, d)
        att = nn.Dense(d, dtype=self.dtype, name="attn_out")(att)
        x = x + seg_gate(att, tg1, vg1)

        norm2 = nn.LayerNorm(epsilon=1e-5, use_bias=False, use_scale=False,
                             dtype=self.dtype, name="norm2")
        h = seg_mod(norm2(x), ts2, tsc2, vs2, vsc2)
        h = nn.Dense(int(d * self.mlp_ratio), dtype=self.dtype,
                     name="ff1")(h)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(d, dtype=self.dtype, name="ff2")(h)
        x = x + seg_gate(h, tg2, vg2)
        if self.as_cell:
            return x, None
        return x


@register("videotuna_tpu.models.cogvideo.CogVideoXTransformer",
          aliases=[
              "diffusers.CogVideoXTransformer3DModel",
              "videotuna.models.cogvideo_hf.CogVideoXTransformer3DModel",
          ])
class CogVideoXTransformer(nn.Module):
    """Defaults ≈ CogVideoX-2b; 5b uses dim 3072 / 42 layers / 48 heads."""
    in_channels: int = 16
    out_channels: int = 16
    dim: int = 1920
    num_layers: int = 30
    heads: int = 30
    text_dim: int = 4096
    max_text_len: int = 226
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    mlp_ratio: float = 4.0
    time_embed_dim: int = 512       # reference configs/005 time_embed_dim
    use_rope: bool = True           # v1.5; v1.0 uses learned pos embeds
    dtype: Dtype = jnp.float32
    scan_blocks: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, timestep: jnp.ndarray,
                 text_states: jnp.ndarray) -> jnp.ndarray:
        """x: (B, T, H, W, C) latents; text_states: (B, L, text_dim)."""
        b, t_in, h_in, w_in, _ = x.shape
        pt, ph, pw = self.patch_size
        tt, hh, ww = t_in // pt, h_in // ph, w_in // pw
        lt = text_states.shape[1]

        temb = TimestepEmbedder(self.time_embed_dim, dtype=self.dtype,
                                name="t_embedder")(timestep)

        # patchify video; project text
        xv = nn.Conv(self.dim, kernel_size=self.patch_size,
                     strides=self.patch_size, padding="VALID",
                     dtype=self.dtype,
                     name="patch_embed")(x.astype(self.dtype))
        xv = xv.reshape(b, tt * hh * ww, self.dim)
        xt = nn.Dense(self.dim, dtype=self.dtype, name="text_proj")(
            text_states.astype(self.dtype))
        tok = jnp.concatenate([xt, xv], axis=1)

        rope_cos = rope_sin = None
        if self.use_rope:
            head_dim = self.dim // self.heads
            from videotuna_tpu.models.layers import split_rope_dims
            dt, dh, dw = split_rope_dims(head_dim)
            rope_cos, rope_sin = rope_3d(dt, dh, dw, tt, hh, ww)
            rope_cos = rope_cos.astype(self.dtype)
            rope_sin = rope_sin.astype(self.dtype)
        else:
            pos = self.param("pos_embed",
                             nn.initializers.normal(0.02),
                             (tt * hh * ww, self.dim))
            tok = tok.at[:, lt:].add(pos[None].astype(self.dtype))

        if self.scan_blocks:
            cell_cls = CogVideoXBlock
            if self.remat:
                cell_cls = nn.remat(CogVideoXBlock, prevent_cse=False)
            scan_cls = nn.scan(cell_cls,
                               variable_axes={"params": 0},
                               split_rngs={"params": True},
                               in_axes=(nn.broadcast, nn.broadcast,
                                        nn.broadcast),
                               length=self.num_layers)
            tok, _ = scan_cls(self.dim, self.heads, lt, self.mlp_ratio,
                              dtype=self.dtype, as_cell=True,
                              name="blocks")(tok, temb, rope_cos, rope_sin)
        else:
            for i in range(self.num_layers):
                tok = CogVideoXBlock(self.dim, self.heads, lt,
                                     self.mlp_ratio, dtype=self.dtype,
                                     name=f"block_{i}")(
                    tok, temb, rope_cos, rope_sin)

        tok = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                           name="norm_final")(tok)
        # adaLN out on the video segment
        mods = nn.Dense(2 * self.dim, dtype=self.dtype, name="adaln_out")(
            nn.silu(temb))
        shift, scale = jnp.split(mods, 2, axis=-1)
        xv = tok[:, lt:] * (1 + scale[:, None]) + shift[:, None]
        out_dim = pt * ph * pw * self.out_channels
        xv = nn.Dense(out_dim, dtype=self.dtype, name="proj_out")(xv)
        out = unpatchify_3d(xv, (tt, hh, ww), self.patch_size,
                            self.out_channels)
        return out.astype(jnp.float32)
