"""2D KL autoencoder (Stable-Diffusion layout) applied frame-wise to video.

Capability parity with the reference ``AutoencoderKL``
(/root/reference/videotuna/models/lvdm/modules/vae/autoencoder.py +
ae_modules.py): conv-in → resnet down blocks → mid (resnet, attn, resnet) →
2·z_ch conv-out; symmetric decoder. The video path encodes/decodes frame-wise
with a micro-batch (reference encode_first_stage_2DAE,
flow/videocrafter.py:269-279, opensora VideoAutoencoderKL micro_batch_size)
— here expressed as a ``lax.map`` over frame chunks so it stays inside jit.

TPU-first: channel-last NHWC convs (XLA's native layout), GroupNorm in fp32,
attention via the shared kernel entry.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from videotuna_tpu.core.registry import register
from videotuna_tpu.kernels.attention import dot_product_attention

Dtype = Any



def _groups(c: int) -> int:
    """Largest group count ≤32 dividing c (tiny test configs use c<32)."""
    for g in (32, 16, 8, 4, 2):
        if c % g == 0:
            return g
    return 1


class ResnetBlock(nn.Module):
    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.GroupNorm(_groups(x.shape[-1]), epsilon=1e-6,
                         dtype=jnp.float32, name="norm1")(x)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(_groups(h.shape[-1]), epsilon=1e-6,
                         dtype=jnp.float32, name="norm2")(h)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        name="nin_shortcut")(x)
        return x + h


class AttnBlock2D(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        y = nn.GroupNorm(_groups(c), epsilon=1e-6, dtype=jnp.float32,
                         name="norm")(x)
        y = y.astype(self.dtype)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(y)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(y)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(y)
        # single-head attention over spatial tokens
        q = q.reshape(b, h * w, 1, c)
        k = k.reshape(b, h * w, 1, c)
        v = v.reshape(b, h * w, 1, c)
        out = dot_product_attention(q, k, v).reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class Encoder2D(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(self.ch, (3, 3), dtype=self.dtype, name="conv_in")(x)
        for i, mult in enumerate(self.ch_mult):
            for j in range(self.num_res_blocks):
                h = ResnetBlock(self.ch * mult, dtype=self.dtype,
                                name=f"down_{i}_block_{j}")(h)
            if i != len(self.ch_mult) - 1:
                h = nn.Conv(h.shape[-1], (3, 3), strides=(2, 2),
                            dtype=self.dtype, name=f"down_{i}_downsample")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock2D(dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)
        h = nn.GroupNorm(_groups(h.shape[-1]), epsilon=1e-6,
                         dtype=jnp.float32, name="norm_out")(h)
        h = nn.silu(h).astype(self.dtype)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_ch, (3, 3), dtype=self.dtype, name="conv_out")(h)


class Decoder2D(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    out_ch: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(self.ch * self.ch_mult[-1], (3, 3), dtype=self.dtype,
                    name="conv_in")(z)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock2D(dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)
        for i, mult in reversed(list(enumerate(self.ch_mult))):
            for j in range(self.num_res_blocks + 1):
                h = ResnetBlock(self.ch * mult, dtype=self.dtype,
                                name=f"up_{i}_block_{j}")(h)
            if i != 0:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
                h = nn.Conv(c, (3, 3), dtype=self.dtype,
                            name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(_groups(h.shape[-1]), epsilon=1e-6,
                         dtype=jnp.float32, name="norm_out")(h)
        h = nn.silu(h).astype(self.dtype)
        return nn.Conv(self.out_ch, (3, 3), dtype=self.dtype,
                       name="conv_out")(h)


class DiagonalGaussian:
    """VAE posterior (reference utils/distributions.py:5-83)."""

    def __init__(self, parameters: jnp.ndarray):
        mean, logvar = jnp.split(parameters, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        return self.mean + self.std * jax.random.normal(
            key, self.mean.shape, self.mean.dtype)

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self) -> jnp.ndarray:
        axes = tuple(range(1, self.mean.ndim))
        return 0.5 * jnp.sum(self.mean ** 2 + jnp.exp(self.logvar)
                             - 1.0 - self.logvar, axis=axes)


@register("videotuna_tpu.models.AutoencoderKL2D",
          aliases=[
              "videotuna.models.lvdm.modules.vae.autoencoder.AutoencoderKL",
              "videotuna.models.opensora.models.vae.vae.VideoAutoencoderKL",
          ])
class AutoencoderKL2D(nn.Module):
    """2D KL VAE with frame-wise video application.

    Video tensors are (B, T, H, W, 3); images fold into T=1.
    ``micro_frame_batch`` chunks frames through the encoder to bound peak
    memory, mirroring the reference's micro_batch_size.
    """
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    embed_dim: int = 4
    scale_factor: float = 0.18215
    micro_frame_batch: Optional[int] = None
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder2D(self.ch, self.ch_mult, self.num_res_blocks,
                                 self.z_channels, dtype=self.dtype)
        self.decoder = Decoder2D(self.ch, self.ch_mult, self.num_res_blocks,
                                 dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.embed_dim, (1, 1),
                                  dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.z_channels, (1, 1),
                                       dtype=self.dtype,
                                       name="post_quant_conv")

    def encode_frames(self, frames: jnp.ndarray) -> jnp.ndarray:
        """(N, H, W, 3) → posterior moments (N, h, w, 2·z)."""
        return self.quant_conv(self.encoder(frames))

    def decode_frames(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, video: jnp.ndarray, key: Optional[jax.Array] = None,
                 sample: bool = False) -> jnp.ndarray:
        """Encode→(sample|mode)→decode roundtrip; used for init/tests."""
        moments = self.encode(video)
        post = DiagonalGaussian(moments)
        z = post.sample(key) if sample and key is not None else post.mode()
        return self.decode(z / self.scale_factor)

    def encode(self, video: jnp.ndarray) -> jnp.ndarray:
        """(B, T, H, W, 3) → scaled latent moments (B, T, h, w, 2·z).
        Applies the 2D encoder frame-wise; scaling by scale_factor is applied
        to the mean only at sampling time by the flow."""
        b, t, h, w, c = video.shape
        frames = video.reshape(b * t, h, w, c)
        mfb = self.micro_frame_batch
        if mfb and b * t > mfb and (b * t) % mfb == 0:
            chunks = frames.reshape(-1, mfb, h, w, c)
            moments = jax.lax.map(self.encode_frames, chunks)
            moments = moments.reshape(b * t, *moments.shape[2:])
        else:
            moments = self.encode_frames(frames)
        return moments.reshape(b, t, *moments.shape[1:])

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """(B, T, h, w, z) → (B, T, H, W, 3)."""
        b, t = z.shape[:2]
        zf = z.reshape(b * t, *z.shape[2:])
        mfb = self.micro_frame_batch
        if mfb and b * t > mfb and (b * t) % mfb == 0:
            chunks = zf.reshape(-1, mfb, *zf.shape[1:])
            out = jax.lax.map(self.decode_frames, chunks)
            out = out.reshape(b * t, *out.shape[2:])
        else:
            out = self.decode_frames(zf)
        return out.reshape(b, t, *out.shape[1:])
