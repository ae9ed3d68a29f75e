"""HunyuanVideo 3D causal VAE ("884") — weight-faithful TPU-native.

Reference: /root/reference/videotuna/models/hunyuan/hyvideo_i2v/vae/
  autoencoder_kl_causal_3d.py:55 (AutoencoderKLCausal3D),
  vae.py:32/136 (EncoderCausal3D/DecoderCausal3D),
  unet_causal_3d_blocks.py:48 (CausalConv3d — REPLICATE padding),
  :249 (ResnetBlockCausal3D), :526 (UNetMidBlockCausal3D with diffusers
  Attention + frame-causal mask, :30 prepare_causal_attention_mask),
  :77/:185 (Upsample/DownsampleCausal3D).

Semantics preserved exactly:
- CausalConv3d pads (k−1) frames front and k//2 spatially, ALL in
  **replicate** (edge) mode — unlike Wan's zero padding.
- GroupNorm statistics span the whole clip (C/G, T, H, W) — flax
  nn.GroupNorm on (B,T,H,W,C) already pools over every non-batch axis.
- Mid-block attention: 1 head (head_dim = channels), group-norm → q/k/v →
  softmax upcast to fp32 with an additive frame-causal mask (token in
  frame f sees frames ≤ f) → out proj → residual.
- Down block i: stride (2,2) spatial for i < log2(8); stride 2 temporal
  for i ≥ len−1−log2(4) and not final (vae.py:67-77).
- Up block: nearest ×2, EXCEPT the first frame which only upsamples
  spatially (unet_causal_3d_blocks.py:155-170), then causal conv.

Layout: channel-last (B, T, H, W, C).  Conversion:
tools/convert_weights.hunyuan_vae_map (torch checkpoint names like
``encoder.down_blocks.0.resnets.0.conv1.conv.weight``).  Parity gate:
tests/test_vae_parity.py::test_hunyuan_vae_torch_parity.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from videotuna_tpu.core.registry import register

Dtype = Any


class HYCausalConv3d(nn.Module):
    """CausalConv3d (unet_causal_3d_blocks.py:48-75): replicate-pad
    (k−1, 0) in time and (k//2, k//2) spatially, then VALID conv."""
    features: int
    kernel: int = 3
    stride: Sequence[int] = (1, 1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel
        sp = k // 2
        x = jnp.pad(x, ((0, 0), (k - 1, 0), (sp, sp), (sp, sp), (0, 0)),
                    mode="edge")
        return nn.Conv(self.features, (k, k, k), strides=tuple(self.stride),
                       padding="VALID", dtype=self.dtype, name="conv")(x)


class HYResnetBlock(nn.Module):
    """ResnetBlockCausal3D (:249): GN→SiLU→conv1→GN→SiLU→conv2 (+1×1
    causal shortcut). temb is always None in the VAE."""
    out_ch: int
    groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        h = nn.GroupNorm(self.groups, epsilon=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = HYCausalConv3d(self.out_ch, dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(self.groups, epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = HYCausalConv3d(self.out_ch, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_ch:
            x = HYCausalConv3d(self.out_ch, kernel=1, dtype=self.dtype,
                               name="conv_shortcut")(x)
        return x + h


class HYMidAttention(nn.Module):
    """diffusers Attention as configured by UNetMidBlockCausal3D (:578-593):
    heads = C/head_dim = 1, group-norm, frame-causal additive mask,
    upcast softmax, residual connection."""
    channels: int
    groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, hh, ww, c = x.shape
        y = nn.GroupNorm(self.groups, epsilon=1e-6, name="group_norm")(x)
        y = y.reshape(b, t * hh * ww, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        # frame-causal mask (prepare_causal_attention_mask :30-46)
        frame = jnp.arange(t * hh * ww) // (hh * ww)
        bias = jnp.where(frame[None, :] <= frame[:, None], 0.0, -jnp.inf)
        logits = (jnp.einsum("bic,bjc->bij", q, k).astype(jnp.float32)
                  / jnp.sqrt(float(c)) + bias)
        attn = jnp.einsum("bij,bjc->bic",
                          nn.softmax(logits, axis=-1).astype(v.dtype), v)
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(attn)
        return x + out.reshape(b, t, hh, ww, c)


class HYMidBlock(nn.Module):
    """UNetMidBlockCausal3D (:526): resnet, then (attn, resnet)."""
    channels: int
    groups: int = 32
    add_attention: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = HYResnetBlock(self.channels, self.groups, dtype=self.dtype,
                          name="resnet_0")(x)
        if self.add_attention:
            x = HYMidAttention(self.channels, self.groups, dtype=self.dtype,
                               name="attention_0")(x)
        return HYResnetBlock(self.channels, self.groups, dtype=self.dtype,
                             name="resnet_1")(x)


def _hy_updown_flags(n_blocks: int, spatial_ratio: int = 8,
                     time_ratio: int = 4):
    """(add_spatial, add_time) per block (vae.py:64-77 / :186-199)."""
    import math
    ns = int(math.log2(spatial_ratio))
    nt = int(math.log2(time_ratio))
    flags = []
    for i in range(n_blocks):
        final = i == n_blocks - 1
        flags.append((i < ns, i >= n_blocks - 1 - nt and not final))
    return flags


class HYUpsample(nn.Module):
    """UpsampleCausal3D (:77-182): nearest ×factor with the first frame
    spatial-only, then causal conv."""
    channels: int
    temporal: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, h, w, c = x.shape
        first, rest = x[:, :1], x[:, 1:]
        first = jnp.repeat(jnp.repeat(first, 2, axis=2), 2, axis=3)
        if t > 1:
            rest = jnp.repeat(jnp.repeat(rest, 2, axis=2), 2, axis=3)
            if self.temporal:
                rest = jnp.repeat(rest, 2, axis=1)
            x = jnp.concatenate([first, rest], axis=1)
        else:
            x = first
        return HYCausalConv3d(self.channels, dtype=self.dtype,
                              name="conv")(x)


class HYEncoder(nn.Module):
    """EncoderCausal3D (vae.py:32-133)."""
    block_out_channels: Sequence[int]
    layers_per_block: int
    latent_channels: int
    groups: int
    add_attention: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jnp.ndarray) -> jnp.ndarray:
        ch = self.block_out_channels
        h = HYCausalConv3d(ch[0], dtype=self.dtype, name="conv_in")(video)
        for i, (sp, tm) in enumerate(_hy_updown_flags(len(ch))):
            for j in range(self.layers_per_block):
                h = HYResnetBlock(ch[i], self.groups, dtype=self.dtype,
                                  name=f"down_{i}_res_{j}")(h)
            if sp or tm:
                st = (2 if tm else 1, 2 if sp else 1, 2 if sp else 1)
                h = HYCausalConv3d(ch[i], stride=st, dtype=self.dtype,
                                   name=f"down_{i}_downsampler")(h)
        h = HYMidBlock(ch[-1], self.groups, self.add_attention,
                       dtype=self.dtype, name="mid")(h)
        h = nn.GroupNorm(self.groups, epsilon=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        return HYCausalConv3d(2 * self.latent_channels, dtype=self.dtype,
                              name="conv_out")(h)


class HYDecoder(nn.Module):
    """DecoderCausal3D (vae.py:136-283)."""
    block_out_channels: Sequence[int]
    layers_per_block: int
    groups: int
    add_attention: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        ch = self.block_out_channels
        h = HYCausalConv3d(ch[-1], dtype=self.dtype, name="conv_in")(z)
        h = HYMidBlock(ch[-1], self.groups, self.add_attention,
                       dtype=self.dtype, name="mid")(h)
        rev = list(reversed(ch))
        flags = _hy_updown_flags(len(ch))
        for i in range(len(ch)):
            out_c = rev[i]
            for j in range(self.layers_per_block + 1):
                h = HYResnetBlock(out_c, self.groups, dtype=self.dtype,
                                  name=f"up_{i}_res_{j}")(h)
            sp, tm = flags[i]
            if sp or tm:
                h = HYUpsample(out_c, temporal=tm, dtype=self.dtype,
                               name=f"up_{i}_upsampler")(h)
        h = nn.GroupNorm(self.groups, epsilon=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        return HYCausalConv3d(3, dtype=self.dtype, name="conv_out")(h)


@register("videotuna_tpu.models.HunyuanVAE",
          aliases=["videotuna.models.hunyuan.hyvideo_i2v.vae."
                   "autoencoder_kl_causal_3d.AutoencoderKLCausal3D"])
class HunyuanVAE(nn.Module):
    """AutoencoderKLCausal3D with the HunyuanVideo production config
    (block_out_channels 128/256/512/512, 2 layers, z=16, 884
    compression). scaling_factor 0.476986 per the released config."""
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 16
    norm_num_groups: int = 32
    scaling_factor: float = 0.476986
    mid_block_add_attention: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = HYEncoder(self.block_out_channels,
                                 self.layers_per_block,
                                 self.latent_channels,
                                 self.norm_num_groups,
                                 self.mid_block_add_attention,
                                 dtype=self.dtype, name="encoder")
        self.decoder = HYDecoder(self.block_out_channels,
                                 self.layers_per_block,
                                 self.norm_num_groups,
                                 self.mid_block_add_attention,
                                 dtype=self.dtype, name="decoder")
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1, 1),
                                  dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1, 1),
                                       dtype=self.dtype,
                                       name="post_quant_conv")

    @property
    def spatial_ratio(self) -> int:
        return 8

    @property
    def temporal_ratio(self) -> int:
        return 4

    def encode(self, video: jnp.ndarray) -> jnp.ndarray:
        """(B, 1+4k, H, W, 3) → moments (B, 1+k, H/8, W/8, 2z)."""
        return self.quant_conv(self.encoder(video))

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """(B, 1+k, h, w, z) → (B, 1+4k, H, W, 3)."""
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, video: jnp.ndarray) -> jnp.ndarray:
        moments = self.encode(video)
        return self.decode(moments[..., :self.latent_channels])
