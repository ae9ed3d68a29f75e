"""CogVideoX 3D causal VAE — weight-faithful TPU-native.

Reference: /root/reference/videotuna/models/cogvideo_sat/vae_modules/
cp_enc_dec.py (the in-tree source of the CogVideoX VAE architecture; the
HF path instantiates the same topology via diffusers AutoencoderKLCogVideoX):
  ContextParallelCausalConv3d :356 — time pad = (k−1)× FIRST FRAME
    replication, spatial pad = zeros (:215-217, :429-430),
  ContextParallelResnetBlock3D :681 — GroupNorm(32) / SpatialNorm3D,
  SpatialNorm3D :462 — GroupNorm(f)·conv_y(zq↑) + conv_b(zq↑), zq
    nearest-upsampled with the first frame resized separately (:506-533),
  DownSample3D :625 — time: [x₀, avg_pool₂(x₁…)], space: zero-pad
    (0,1,0,1) + stride-2 conv,
  Upsample3D :560 — time: first frame ×2 spatial only, rest ×2 in t/h/w;
    then 3×3 conv2d,
  ContextParallelEncoder3D :779 / ContextParallelDecoder3D :908 — the
    decoder conditions every norm on zq = the raw latent.

No attention blocks anywhere (attn_resolutions=[] in every CogVideoX
config). No quant_conv (the diagonal-Gaussian regularizer consumes the
2z encoder output directly, vae_modules/autoencoder.py:209).

Layout: channel-last (B, T, H, W, C).  Conversion map:
tools/convert_weights.cogvideox_vae_map (SAT state_dict names).  Parity:
tests/test_vae_parity.py::test_cogvideox_vae_torch_parity runs the actual
reference cp_enc_dec.py (with sgm/beartype shims) against this module.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from videotuna_tpu.core.registry import register

Dtype = Any


class CogCausalConv3d(nn.Module):
    """ContextParallelCausalConv3d (:356-435): (k−1) first-frame replicas
    front in time; zero spatial pad; VALID conv."""
    features: int
    kernel: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel
        if k > 1:
            front = jnp.repeat(x[:, :1], k - 1, axis=1)
            x = jnp.concatenate([front, x], axis=1)
            sp = k // 2
            x = jnp.pad(x, ((0, 0), (0, 0), (sp, sp), (sp, sp), (0, 0)))
        return nn.Conv(self.features, (k, k, k), padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class CogSpatialNorm(nn.Module):
    """SpatialNorm3D (:462-533): GroupNorm(f) · conv_y(zq↑) + conv_b(zq↑);
    zq is nearest-resized to f's grid with the first frame separate."""
    groups: int = 32

    @nn.compact
    def __call__(self, f: jnp.ndarray, zq: jnp.ndarray) -> jnp.ndarray:
        b, t, h, w, _ = f.shape
        zc = zq.shape[-1]
        if t > 1 and zq.shape[1] > 1:
            zq_first = jax.image.resize(
                zq[:, :1], (b, 1, h, w, zc), "nearest")
            zq_rest = jax.image.resize(
                zq[:, 1:], (b, t - 1, h, w, zc), "nearest")
            zq = jnp.concatenate([zq_first, zq_rest], axis=1)
        else:
            zq = jax.image.resize(zq, (b, t, h, w, zc), "nearest")
        norm_f = nn.GroupNorm(self.groups, epsilon=1e-6,
                              name="norm_layer")(f)
        y = CogCausalConv3d(f.shape[-1], kernel=1, name="conv_y")(zq)
        bias = CogCausalConv3d(f.shape[-1], kernel=1, name="conv_b")(zq)
        return norm_f * y + bias


class CogResnetBlock(nn.Module):
    """ContextParallelResnetBlock3D (:681-777). zq=None → GroupNorm."""
    out_ch: int
    groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 zq: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        in_ch = x.shape[-1]

        def norm(h, name):
            if zq is not None:
                return CogSpatialNorm(self.groups, name=name)(h, zq)
            return nn.GroupNorm(self.groups, epsilon=1e-6, name=name)(h)

        h = norm(x, "norm1")
        h = nn.silu(h)
        h = CogCausalConv3d(self.out_ch, dtype=self.dtype, name="conv1")(h)
        h = norm(h, "norm2")
        h = nn.silu(h)
        h = CogCausalConv3d(self.out_ch, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1, 1), dtype=self.dtype,
                        name="nin_shortcut")(x)
        return x + h


class CogDownsample(nn.Module):
    """DownSample3D (:625-679) with with_conv=True."""
    channels: int
    compress_time: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.compress_time and x.shape[1] > 1:
            first, rest = x[:, :1], x[:, 1:]
            # avg_pool1d(k=2, s=2) over time (drops a trailing odd frame)
            tr = rest.shape[1] // 2
            rest = rest[:, :2 * tr].reshape(
                rest.shape[0], tr, 2, *rest.shape[2:]).mean(axis=2)
            x = jnp.concatenate([first, rest], axis=1)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        b, t = x.shape[:2]
        y = x.reshape((b * t,) + x.shape[2:])
        y = nn.Conv(self.channels, (3, 3), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, name="conv")(y)
        return y.reshape((b, t) + y.shape[1:])


class CogUpsample(nn.Module):
    """Upsample3D (:560-623) with with_conv=True."""
    channels: int
    compress_time: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.compress_time and x.shape[1] > 1:
            first, rest = x[:, :1], x[:, 1:]
            first = jnp.repeat(jnp.repeat(first, 2, axis=2), 2, axis=3)
            rest = jnp.repeat(jnp.repeat(jnp.repeat(rest, 2, axis=1),
                                         2, axis=2), 2, axis=3)
            x = jnp.concatenate([first, rest], axis=1)
        else:
            x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        b, t = x.shape[:2]
        y = x.reshape((b * t,) + x.shape[2:])
        y = nn.Conv(self.channels, (3, 3), padding="SAME",
                    dtype=self.dtype, name="conv")(y)
        return y.reshape((b, t) + y.shape[1:])


class CogEncoder(nn.Module):
    """ContextParallelEncoder3D (:779-905)."""
    ch: int
    ch_mult: Sequence[int]
    num_res_blocks: int
    z_channels: int
    temporal_compress_level: int
    groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = len(self.ch_mult)
        h = CogCausalConv3d(self.ch, dtype=self.dtype, name="conv_in")(x)
        for i in range(n):
            for j in range(self.num_res_blocks):
                h = CogResnetBlock(self.ch * self.ch_mult[i], self.groups,
                                   dtype=self.dtype,
                                   name=f"down_{i}_block_{j}")(h)
            if i != n - 1:
                h = CogDownsample(h.shape[-1],
                                  i < self.temporal_compress_level,
                                  dtype=self.dtype,
                                  name=f"down_{i}_downsample")(h)
        c = self.ch * self.ch_mult[-1]
        h = CogResnetBlock(c, self.groups, dtype=self.dtype,
                           name="mid_block_1")(h)
        h = CogResnetBlock(c, self.groups, dtype=self.dtype,
                           name="mid_block_2")(h)
        h = nn.GroupNorm(self.groups, epsilon=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        return CogCausalConv3d(2 * self.z_channels, dtype=self.dtype,
                               name="conv_out")(h)


class CogDecoder(nn.Module):
    """ContextParallelDecoder3D (:908-1070): every norm is zq-conditioned."""
    ch: int
    ch_mult: Sequence[int]
    num_res_blocks: int
    out_ch: int = 3
    temporal_compress_level: int = 2
    groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        n = len(self.ch_mult)
        zq = z
        h = CogCausalConv3d(self.ch * self.ch_mult[-1], dtype=self.dtype,
                            name="conv_in")(z)
        h = CogResnetBlock(h.shape[-1], self.groups, dtype=self.dtype,
                           name="mid_block_1")(h, zq)
        h = CogResnetBlock(h.shape[-1], self.groups, dtype=self.dtype,
                           name="mid_block_2")(h, zq)
        for i in reversed(range(n)):
            for j in range(self.num_res_blocks + 1):
                h = CogResnetBlock(self.ch * self.ch_mult[i], self.groups,
                                   dtype=self.dtype,
                                   name=f"up_{i}_block_{j}")(h, zq)
            if i != 0:
                h = CogUpsample(h.shape[-1],
                                i >= n - self.temporal_compress_level,
                                dtype=self.dtype,
                                name=f"up_{i}_upsample")(h)
        h = CogSpatialNorm(self.groups, name="norm_out")(h, zq)
        h = nn.silu(h)
        return CogCausalConv3d(self.out_ch, dtype=self.dtype,
                               name="conv_out")(h)


@register("videotuna_tpu.models.CogVideoXVAE",
          aliases=["diffusers.AutoencoderKLCogVideoX"])
class CogVideoXVAE(nn.Module):
    """CogVideoX production config: ch=128, ch_mult (1,2,2,4), 3 res
    blocks, z=16, 4× temporal / 8× spatial; scaling_factor 1.15258426
    (divide latents; configs/004_cogvideox)."""
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 2, 4)
    num_res_blocks: int = 3
    z_channels: int = 16
    temporal_compress_times: int = 4
    norm_num_groups: int = 32
    scaling_factor: float = 1.15258426
    dtype: Dtype = jnp.float32

    def setup(self):
        import math
        lvl = int(math.log2(self.temporal_compress_times))
        self.encoder = CogEncoder(self.ch, self.ch_mult,
                                  self.num_res_blocks, self.z_channels,
                                  lvl, self.norm_num_groups,
                                  dtype=self.dtype, name="encoder")
        self.decoder = CogDecoder(self.ch, self.ch_mult,
                                  self.num_res_blocks, 3, lvl,
                                  self.norm_num_groups,
                                  dtype=self.dtype, name="decoder")

    @property
    def spatial_ratio(self) -> int:
        return 2 ** (len(self.ch_mult) - 1)

    @property
    def temporal_ratio(self) -> int:
        return self.temporal_compress_times

    def encode(self, video: jnp.ndarray) -> jnp.ndarray:
        """(B, 1+4k, H, W, 3) → moments (B, 1+k, H/8, W/8, 2z)."""
        return self.encoder(video)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """(B, 1+k, h, w, z) → (B, 1+4k, H, W, 3)."""
        return self.decoder(z)

    def __call__(self, video: jnp.ndarray) -> jnp.ndarray:
        moments = self.encode(video)
        return self.decode(moments[..., :self.z_channels])
