"""UNet3D — VideoCrafter 1/2 + DynamiCrafter latent video UNet, TPU-native.

Capability parity with the reference ``UNetModel``
(/root/reference/videotuna/models/lvdm/modules/networks/openaimodel3d.py:313,
forward :650; DynamiCrafter variant openaimodel3d_dc.py) and its blocks
(modules/attention.py: SpatialTransformer :313, TemporalTransformer :395,
RelativePosition :19; ResBlock/TemporalConvBlock openaimodel3d.py:123,258):

- FiLM time conditioning (scale-shift norm), optional fps conditioning
  (openaimodel3d.py:400-406);
- per-level: ResBlock (+optional temporal conv) → SpatialTransformer
  (self-attn + cross-attn to text[, + image tokens for DynamiCrafter i2v])
  → TemporalTransformer (per-location attention over frames with learned
  relative position bias);
- down/up levels with skip connections, middle block, zero-init output conv.

TPU-first: channel-last (B, T, H, W, C); spatial ops fold T into batch and
temporal ops fold H·W into batch (pure reshapes); attention through the
Pallas flash kernel; all shapes static.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from videotuna_tpu.core.registry import register
from videotuna_tpu.kernels.attention import dot_product_attention
from videotuna_tpu.models.layers import timestep_embedding

Dtype = Any


def _groups(c: int) -> int:
    for g in (32, 16, 8, 4, 2):
        if c % g == 0:
            return g
    return 1


def zero_init_conv(ch, kernel, dtype, name):
    return nn.Conv(ch, kernel, dtype=dtype, name=name,
                   kernel_init=nn.initializers.zeros,
                   bias_init=nn.initializers.zeros)



class FrameGN(nn.Module):
    """GroupNorm with per-frame statistics: the reference applies its 2D
    GroupNorms on (B·T, C, H, W) (ResBlock in/out_layers, the
    SpatialTransformer norm), so stats must NOT pool over time — flax
    GroupNorm on the 5D video would. Temporal modules (TemporalConvBlock,
    TemporalTransformer) keep clip-wide stats like the reference's 3D
    views."""
    groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t = x.shape[:2]
        y = x.reshape(b * t, *x.shape[2:])
        y = nn.GroupNorm(self.groups, epsilon=self.epsilon,
                         dtype=jnp.float32, name="gn")(y)
        return y.reshape(x.shape)


class TemporalConvBlock(nn.Module):
    """Reference TemporalConvBlock (openaimodel3d.py:258): four
    GN→SiLU→Conv3d stacks with (3,1,1) temporal kernels (conv1 maps
    out_ch→out_ch at in==out in our use), conv4 zero-init, residual."""
    ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = x
        for i in range(1, 5):
            h = nn.GroupNorm(_groups(self.ch), epsilon=1e-5,
                             dtype=jnp.float32, name=f"norm{i}")(h)
            h = nn.silu(h).astype(self.dtype)
            conv = zero_init_conv(self.ch, (3, 1, 1), self.dtype,
                                  f"conv{i}") if i == 4 else \
                nn.Conv(self.ch, (3, 1, 1), dtype=self.dtype,
                        name=f"conv{i}")
            h = conv(h)
        return x + h


class ResBlock3D(nn.Module):
    """Residual block with additive time-embedding (reference default,
    use_scale_shift_norm=False — openaimodel3d.py:145,241) or FiLM
    scale-shift, plus the faithful 4-conv temporal block."""
    out_ch: int
    use_temporal_conv: bool = False
    use_scale_shift_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        # x: (B, T, H, W, C); emb: (B, E)
        b, t, hh, ww, c = x.shape
        h = FrameGN(_groups(c), name="norm1")(x)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_ch, (1, 3, 3), dtype=self.dtype,
                    name="conv1")(h)
        n_emb = 2 * self.out_ch if self.use_scale_shift_norm \
            else self.out_ch
        es = nn.Dense(n_emb, dtype=self.dtype,
                      name="emb_proj")(nn.silu(emb))[:, None, None, None]
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(es, 2, axis=-1)
            h = FrameGN(_groups(self.out_ch), name="norm2")(h)
            h = h.astype(self.dtype) * (1.0 + scale) + shift
        else:
            h = h + es
            h = FrameGN(_groups(self.out_ch),
                        name="norm2")(h).astype(self.dtype)
        h = nn.silu(h)
        h = zero_init_conv(self.out_ch, (1, 3, 3), self.dtype, "conv2")(h)
        if c != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1, 1), dtype=self.dtype,
                        name="skip")(x)
        h = x + h
        if self.use_temporal_conv:
            h = TemporalConvBlock(self.out_ch, dtype=self.dtype,
                                  name="tconv")(h)
        return h


class SpatialTransformer(nn.Module):
    """Per-frame transformer: self-attn over H·W, cross-attn to text context
    (+ optional image tokens — DynamiCrafter's img_cross_attention), GEGLU
    MLP. (reference modules/attention.py:313)."""
    heads: int
    head_dim: int
    context_dim: Optional[int] = None
    image_cross: bool = False
    img_cross_scale: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray],
                 context_img: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b, t, hh, ww, c = x.shape
        inner = self.heads * self.head_dim
        h = FrameGN(_groups(c), epsilon=1e-6, name="norm")(x)
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(
            h.astype(self.dtype))
        tok = h.reshape(b * t, hh * ww, inner)

        def mha(q_in, kv_in, name):
            q = nn.DenseGeneral((self.heads, self.head_dim), use_bias=False,
                                dtype=self.dtype, name=f"{name}_q")(q_in)
            k = nn.DenseGeneral((self.heads, self.head_dim), use_bias=False,
                                dtype=self.dtype, name=f"{name}_k")(kv_in)
            v = nn.DenseGeneral((self.heads, self.head_dim), use_bias=False,
                                dtype=self.dtype, name=f"{name}_v")(kv_in)
            o = dot_product_attention(q, k, v)
            o = o.reshape(*o.shape[:-2], inner)
            return nn.Dense(inner, dtype=self.dtype, name=f"{name}_out")(o)

        # self attention
        normed = nn.LayerNorm(dtype=self.dtype, name="ln1")(tok)
        tok = tok + mha(normed, normed, "attn1")
        # cross attention (text [+ image]): the reference's
        # img_cross_attention SHARES the query and adds extra to_k_ip /
        # to_v_ip projections; the two attention outputs sum BEFORE the
        # single output projection (attention.py:81-170)
        if context is not None:
            ctx = jnp.repeat(context, t, axis=0).astype(self.dtype)
            q_in = nn.LayerNorm(dtype=self.dtype, name="ln2")(tok)
            q = nn.DenseGeneral((self.heads, self.head_dim),
                                use_bias=False, dtype=self.dtype,
                                name="attn2_q")(q_in)
            k = nn.DenseGeneral((self.heads, self.head_dim),
                                use_bias=False, dtype=self.dtype,
                                name="attn2_k")(ctx)
            v = nn.DenseGeneral((self.heads, self.head_dim),
                                use_bias=False, dtype=self.dtype,
                                name="attn2_v")(ctx)
            out = dot_product_attention(q, k, v)
            if self.image_cross and context_img is not None:
                ctx_i = jnp.repeat(context_img, t,
                                   axis=0).astype(self.dtype)
                k_ip = nn.DenseGeneral((self.heads, self.head_dim),
                                       use_bias=False, dtype=self.dtype,
                                       name="attn2_k_ip")(ctx_i)
                v_ip = nn.DenseGeneral((self.heads, self.head_dim),
                                       use_bias=False, dtype=self.dtype,
                                       name="attn2_v_ip")(ctx_i)
                out = out + self.img_cross_scale * dot_product_attention(
                    q, k_ip, v_ip)
            out = out.reshape(*out.shape[:-2], inner)
            tok = tok + nn.Dense(inner, dtype=self.dtype,
                                 name="attn2_out")(out)
        # GEGLU MLP
        m = nn.LayerNorm(dtype=self.dtype, name="ln3")(tok)
        gate = nn.Dense(inner * 8, dtype=self.dtype, name="geglu")(m)
        a, g = jnp.split(gate, 2, axis=-1)
        tok = tok + nn.Dense(inner, dtype=self.dtype, name="mlp_out")(
            a * nn.gelu(g))

        h = tok.reshape(b, t, hh, ww, inner)
        h = nn.Dense(c, dtype=self.dtype, name="proj_out",
                     kernel_init=nn.initializers.zeros)(h)
        return x + h


class TemporalTransformer(nn.Module):
    """Per-location transformer over frames with the reference's
    RelativePosition key/value embeddings (modules/attention.py:19-44 +
    :128-148): sim += q·K2ᵀ over clipped frame offsets, out += P·V2 —
    per-head-dim tables shared across heads, exactly the reference layout
    so VC1/VC2 checkpoints convert weight-faithfully.
    ``use_relative_position=False`` matches DynamiCrafter's i2v UNet."""
    heads: int
    head_dim: int
    max_len: int = 64       # reference max_relative_position=temporal_length
    use_relative_position: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, hh, ww, c = x.shape
        inner = self.heads * self.head_dim
        h = nn.GroupNorm(_groups(c), epsilon=1e-6, dtype=jnp.float32,
                         name="norm")(x)
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(
            h.astype(self.dtype))
        tok = h.transpose(0, 2, 3, 1, 4).reshape(b * hh * ww, t, inner)

        def temporal_attn(tok, prefix):
            """One self-attention over frames; with relative-position k/v
            embeddings when enabled (attention.py:31-43,128-148)."""
            m = nn.LayerNorm(dtype=self.dtype,
                             name=f"ln_{prefix}")(tok)
            q = nn.DenseGeneral((self.heads, self.head_dim),
                                use_bias=False, dtype=self.dtype,
                                name=f"{prefix}_q")(m)
            k = nn.DenseGeneral((self.heads, self.head_dim),
                                use_bias=False, dtype=self.dtype,
                                name=f"{prefix}_k")(m)
            v = nn.DenseGeneral((self.heads, self.head_dim),
                                use_bias=False, dtype=self.dtype,
                                name=f"{prefix}_v")(m)
            if self.use_relative_position:
                idx = jnp.clip(
                    jnp.arange(t)[None, :] - jnp.arange(t)[:, None],
                    -self.max_len, self.max_len) + self.max_len
                k2 = self.param(f"{prefix}_rel_k",
                                nn.initializers.xavier_uniform(),
                                (2 * self.max_len + 1, self.head_dim))[idx]
                v2 = self.param(f"{prefix}_rel_v",
                                nn.initializers.xavier_uniform(),
                                (2 * self.max_len + 1, self.head_dim))[idx]
                scale = self.head_dim ** -0.5
                sim = (jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                  preferred_element_type=jnp.float32)
                       + jnp.einsum("bqhd,qkd->bhqk", q,
                                    k2.astype(q.dtype),
                                    preferred_element_type=jnp.float32)) \
                    * scale
                p = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
                o = (jnp.einsum("bhqk,bkhd->bqhd", p, v)
                     + jnp.einsum("bhqk,qkd->bqhd", p, v2.astype(v.dtype)))
            else:
                o = dot_product_attention(q, k, v)
            o = o.reshape(*o.shape[:-2], inner)
            return tok + nn.Dense(inner, dtype=self.dtype,
                                  name=f"{prefix}_out")(o)

        # reference BasicTransformerBlock runs TWO self-attentions in
        # only_self_att mode (attn2's context defaults to x) then the ff
        tok = temporal_attn(tok, "attn1")
        tok = temporal_attn(tok, "attn2")

        m = nn.LayerNorm(dtype=self.dtype, name="ln3")(tok)
        gate = nn.Dense(inner * 8, dtype=self.dtype, name="geglu")(m)
        a, g = jnp.split(gate, 2, axis=-1)
        tok = tok + nn.Dense(inner, dtype=self.dtype, name="mlp_out")(
            a * nn.gelu(g))

        h = tok.reshape(b, hh, ww, t, inner).transpose(0, 3, 1, 2, 4)
        h = nn.Dense(c, dtype=self.dtype, name="proj_out",
                     kernel_init=nn.initializers.zeros)(h)
        return x + h


@register("videotuna_tpu.models.lvdm.UNet3D",
          aliases=[
              "videotuna.models.lvdm.modules.networks.openaimodel3d.UNetModel",
              "videotuna.models.lvdm.modules.networks.openaimodel3d_dc."
              "UNetModel",
          ])
class UNet3D(nn.Module):
    """Constructor args mirror the reference YAML surface
    (configs/001_videocrafter2/vc2_t2v_320x512.yaml unet_config)."""
    in_channels: int = 4
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_head_channels: int = 64
    context_dim: Optional[int] = 1024
    temporal_conv: bool = True
    temporal_attention: bool = True
    temporal_length: int = 16
    use_relative_position: bool = True      # False for VC2/DynamiCrafter
    use_image_attention: bool = False       # DynamiCrafter i2v
    fps_cond: bool = False
    addition_attention: bool = False        # VC2: init temporal attn
    use_scale_shift_norm: bool = False      # reference default (additive)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, timesteps: jnp.ndarray,
                 context: Optional[jnp.ndarray] = None,
                 context_img: Optional[jnp.ndarray] = None,
                 fps: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """x: (B, T, H, W, C); timesteps: (B,); context: (B, L, D_ctx);
        context_img: (B, L_img, D_ctx) image tokens (DynamiCrafter);
        fps: (B,) optional. Returns (B, T, H, W, out_channels)."""
        mc = self.model_channels
        ted = mc * 4
        emb = timestep_embedding(timesteps, mc).astype(self.dtype)
        emb = nn.Dense(ted, dtype=self.dtype, name="time_fc1")(emb)
        emb = nn.Dense(ted, dtype=self.dtype,
                       name="time_fc2")(nn.silu(emb))
        if self.fps_cond and fps is not None:
            fe = timestep_embedding(fps, mc).astype(self.dtype)
            fe = nn.Dense(ted, dtype=self.dtype, name="fps_fc1")(fe)
            fe = nn.Dense(ted, dtype=self.dtype,
                          name="fps_fc2")(nn.silu(fe))
            emb = emb + fe

        x = x.astype(self.dtype)
        h = nn.Conv(mc, (1, 3, 3), dtype=self.dtype, name="conv_in")(x)
        if self.addition_attention:
            # reference init_attn (openaimodel3d.py:418-432): an extra
            # temporal transformer right after conv_in, 8 heads fixed
            h = TemporalTransformer(
                8, self.num_head_channels,
                max_len=self.temporal_length,
                use_relative_position=self.use_relative_position,
                dtype=self.dtype, name="init_attn")(h)

        def attn_pair(h, ch, ds, idx, force=False):
            if force or ds in self.attention_resolutions:
                heads = ch // self.num_head_channels
                h = SpatialTransformer(
                    heads, self.num_head_channels, self.context_dim,
                    image_cross=self.use_image_attention, dtype=self.dtype,
                    name=f"spatial_{idx}")(h, context, context_img)
                if self.temporal_attention:
                    h = TemporalTransformer(
                        heads, self.num_head_channels,
                        max_len=self.temporal_length,
                        use_relative_position=self.use_relative_position,
                        dtype=self.dtype, name=f"temporal_{idx}")(h)
            return h

        # down path
        skips = [h]
        ch = mc
        ds = 1
        idx = 0
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                ch = mult * mc
                h = ResBlock3D(
                    ch, self.temporal_conv,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    dtype=self.dtype, name=f"down_res_{idx}")(h, emb)
                h = attn_pair(h, ch, ds, f"down_{idx}")
                skips.append(h)
                idx += 1
            if level != len(self.channel_mult) - 1:
                # torch Downsample pads (1,1) symmetric; flax SAME on a
                # stride-2 k=3 conv pads (0,1) — one-pixel shift
                h = nn.Conv(ch, (1, 3, 3), strides=(1, 2, 2),
                            padding=((0, 0), (1, 1), (1, 1)),
                            dtype=self.dtype,
                            name=f"downsample_{level}")(h)
                skips.append(h)
                ds *= 2

        # middle
        h = ResBlock3D(ch, self.temporal_conv,
                       use_scale_shift_norm=self.use_scale_shift_norm,
                       dtype=self.dtype, name="mid_res_1")(h, emb)
        # the reference middle block ALWAYS carries spatial+temporal
        # attention (openaimodel3d.py:519-545), independent of ds
        h = attn_pair(h, ch, ds, "mid", force=True)
        h = ResBlock3D(ch, self.temporal_conv,
                       use_scale_shift_norm=self.use_scale_shift_norm,
                       dtype=self.dtype, name="mid_res_2")(h, emb)

        # up path
        idx = 0
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                ch = mult * mc
                h = ResBlock3D(
                    ch, self.temporal_conv,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    dtype=self.dtype, name=f"up_res_{idx}")(h, emb)
                h = attn_pair(h, ch, ds, f"up_{idx}")
                if level != 0 and i == self.num_res_blocks:
                    b2, t2, h2, w2, c2 = h.shape
                    h = jax.image.resize(
                        h, (b2, t2, h2 * 2, w2 * 2, c2), "nearest")
                    h = nn.Conv(ch, (1, 3, 3), dtype=self.dtype,
                                name=f"upsample_{level}")(h)
                    ds //= 2
                idx += 1

        h = FrameGN(_groups(h.shape[-1]), name="norm_out")(h)
        h = nn.silu(h).astype(self.dtype)
        h = zero_init_conv(self.out_channels, (1, 3, 3), self.dtype,
                           "conv_out")(h)
        return h.astype(jnp.float32)
