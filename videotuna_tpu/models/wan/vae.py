"""Wan 2.1 3D causal VAE — weight-faithful TPU-native implementation.

Reference architecture: /root/reference/videotuna/models/wan/wan/modules/
vae.py (CausalConv3d :17, RMS_norm :38, Resample :65, ResidualBlock :188,
AttentionBlock :228, Encoder3d :268, Decoder3d :365, WanVAE_ :483).

The reference runs encode/decode in *streamed* chunks (1, 4, 4, … frames)
with per-conv feature caches.  This module implements the exact
full-sequence equivalent, derived from the cache semantics:

- ``CausalConv3d``: front zero-pad of 2·pad_t frames, then VALID conv —
  streaming with a 2-frame cache equals one full-sequence causal conv.
- ``downsample3d`` time conv (kernel 3, stride 2, no padding, 1-frame
  cache): frame 0 passes through *unconvolved* (the first chunk skips the
  conv and only seeds the cache, vae.py:146-158); frames ≥1 come from
  stride-2 windows (x₀,x₁,x₂), (x₂,x₃,x₄), … → full-sequence form
  ``concat([x[:1], conv_stride2(x)])`` mapping 1+2k → 1+k frames.
- ``upsample3d`` time conv (kernel 3, CausalConv3d pad 1 → 2-frame front
  pad): frame 0 again passes unconvolved ('Rep' sentinel, vae.py:104-130);
  every later frame i yields two output frames from the causal window
  (x_{i−2}, x_{i−1}, x_i) with zero padding, channel-split C|C and
  interleaved → ``concat([x[:1], interleave(causal_conv(x)[1:])])``
  mapping 1+k → 1+2k frames.

Layout is channel-last (B, T, H, W, C); module names mirror the torch
``state_dict`` flat Sequential indices so the conversion map
(tools/convert_weights.wan_vae_map) is mechanical.  Parity vs the actual
reference torch module is gated in tests/test_vae_parity.py.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from videotuna_tpu.core.registry import register

Dtype = Any

# Latent normalization constants (vae.py:600-610).
WAN_LATENT_MEAN = np.array([
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
], np.float32)
WAN_LATENT_STD = np.array([
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
], np.float32)


class WanRMSNorm(nn.Module):
    """F.normalize over channels · √C · gamma (vae.py:38-54). gamma is
    stored flat (C,); the converter squeezes torch's (C,1,1[,1])."""
    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        n = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
        y = x / jnp.maximum(n, 1e-12) * (self.dim ** 0.5)
        return (y * gamma).astype(x.dtype)


class WanCausalConv3d(nn.Module):
    """CausalConv3d (vae.py:17-36): time front-pad 2·pad_t zeros, spatial
    SAME, VALID conv.

    ``streaming=True``: the temporal front context comes from a ``cache``
    variable holding the previous chunk's trailing 2·pad_t frames — the
    reference's ``feat_cache`` streaming (vae.py:146-158) made explicit;
    the first chunk zero-pads and primes the cache."""
    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    pad: Tuple[int, int, int] = (1, 1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, streaming: bool = False,
                 first_chunk: bool = True) -> jnp.ndarray:
        pt, ph, pw = self.pad
        tpad = 2 * pt
        if streaming and tpad > 0:
            cache = self.variable(
                "cache", "front",
                lambda: jnp.zeros((x.shape[0], tpad) + x.shape[2:],
                                  x.dtype))
            front = jnp.zeros((x.shape[0], tpad) + x.shape[2:], x.dtype) \
                if first_chunk else cache.value.astype(x.dtype)
            x = jnp.concatenate([front, x], axis=1)
            cache.value = x[:, -tpad:]
            x = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw), (0, 0)))
        else:
            x = jnp.pad(x, ((0, 0), (2 * pt, 0), (ph, ph), (pw, pw),
                            (0, 0)))
        return nn.Conv(self.features, self.kernel, strides=self.stride,
                       padding="VALID", dtype=self.dtype, name="conv")(x)


def _conv2d(x: jnp.ndarray, features: int, name: str, dtype,
            stride: int = 1, pad="SAME") -> jnp.ndarray:
    """Per-frame 2D conv on (B,T,H,W,C)."""
    b, t = x.shape[:2]
    y = x.reshape((b * t,) + x.shape[2:])
    y = nn.Conv(features, (3, 3), strides=(stride, stride), padding=pad,
                dtype=dtype, name=name)(y)
    return y.reshape((b, t) + y.shape[1:])


class WanResample(nn.Module):
    """Resample (vae.py:65-163) — full-sequence equivalents above."""
    dim: int
    mode: str
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, streaming: bool = False,
                 first_chunk: bool = True) -> jnp.ndarray:
        if self.mode == "upsample3d":
            # time conv BEFORE spatial (vae.py:101-138). The 'Rep' sentinel
            # means the GLOBAL frame 0 never enters the conv: later windows
            # see zeros in its place (vae.py:119-124), so zero it in the
            # conv input (first chunk only under streaming).
            if not streaming or first_chunk:
                xz = jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, 1:]],
                                     axis=1)
            else:
                xz = x
            y = WanCausalConv3d(self.dim * 2, (3, 1, 1), pad=(1, 0, 0),
                                dtype=self.dtype, name="time_conv")(
                xz, streaming=streaming, first_chunk=first_chunk)
            b, t, h, w, c2 = y.shape
            c = c2 // 2
            # (…, 2C) → two frames (first-half channels, second-half);
            # the global first frame's conv output is dropped (it passes
            # through unconvolved)
            y2 = y[:, 1:] if (not streaming or first_chunk) else y
            n2 = y2.shape[1]
            pairs = y2.reshape(b, n2, h, w, 2, c)
            inter = jnp.moveaxis(pairs, 4, 2).reshape(b, 2 * n2, h, w, c)
            if not streaming or first_chunk:
                x = jnp.concatenate([x[:, :1], inter], axis=1)
            else:
                x = inter
        if self.mode in ("upsample2d", "upsample3d"):
            x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
            x = _conv2d(x, self.dim // 2, "resample_conv", self.dtype)
        elif self.mode in ("downsample2d", "downsample3d"):
            # ZeroPad2d (left0,right1,top0,bottom1) + stride-2 conv
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
            x = _conv2d(x, self.dim, "resample_conv", self.dtype,
                        stride=2, pad="VALID")
        if self.mode == "downsample3d":
            y = nn.Conv(self.dim, (3, 1, 1), strides=(2, 1, 1),
                        padding="VALID", dtype=self.dtype,
                        name="time_conv")(x)
            x = jnp.concatenate([x[:, :1], y], axis=1)
        return x


class WanResidualBlock(nn.Module):
    """ResidualBlock (vae.py:188-226). Child names = torch Sequential
    indices: residual.{0,2,3,6} → norm1, conv1, norm2, conv2."""
    in_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, streaming: bool = False,
                 first_chunk: bool = True) -> jnp.ndarray:
        skw = dict(streaming=streaming, first_chunk=first_chunk)
        h = WanRMSNorm(self.in_dim, name="norm1")(x)
        h = nn.silu(h)
        h = WanCausalConv3d(self.out_dim, dtype=self.dtype,
                            name="conv1")(h, **skw)
        h = WanRMSNorm(self.out_dim, name="norm2")(h)
        h = nn.silu(h)
        h = WanCausalConv3d(self.out_dim, dtype=self.dtype,
                            name="conv2")(h, **skw)
        if self.in_dim != self.out_dim:
            x = WanCausalConv3d(self.out_dim, (1, 1, 1), pad=(0, 0, 0),
                                dtype=self.dtype, name="shortcut")(x)
        return x + h


class WanAttentionBlock(nn.Module):
    """Single-head per-frame spatial attention (vae.py:228-266)."""
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, h, w, c = x.shape
        y = WanRMSNorm(c, name="norm")(x)
        y = y.reshape(b * t, h * w, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="to_qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        logits = jnp.einsum("bic,bjc->bij", q, k) / jnp.sqrt(float(c))
        attn = jnp.einsum("bij,bjc->bic",
                          nn.softmax(logits.astype(jnp.float32), axis=-1
                                     ).astype(y.dtype), v)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(attn)
        return x + out.reshape(b, t, h, w, c)


def _encoder_layout(dim_mult: Sequence[int], num_res_blocks: int,
                    attn_scales: Sequence[float],
                    temperal_downsample: Sequence[bool]):
    """Reproduce Encoder3d's flat `downsamples` Sequential (vae.py:294-310)."""
    layers = []
    dims = [1] + list(dim_mult)
    scale = 1.0
    for i in range(len(dim_mult)):
        in_m, out_m = dims[i], dims[i + 1]
        for _ in range(num_res_blocks):
            layers.append(("res", in_m, out_m))
            if scale in attn_scales:
                layers.append(("attn", out_m, out_m))
            in_m = out_m
        if i != len(dim_mult) - 1:
            mode = "downsample3d" if temperal_downsample[i] else "downsample2d"
            layers.append((mode, out_m, out_m))
            scale /= 2.0
    return layers


def _decoder_layout(dim_mult: Sequence[int], num_res_blocks: int,
                    attn_scales: Sequence[float],
                    temperal_upsample: Sequence[bool]):
    """Reproduce Decoder3d's flat `upsamples` Sequential (vae.py:394-413),
    incl. the in_dim//2 adjustment after each channel-halving upsample."""
    layers = []
    dims = [dim_mult[-1]] + list(dim_mult[::-1])
    scale = 1.0 / 2 ** (len(dim_mult) - 2)
    for i in range(len(dim_mult)):
        in_m, out_m = dims[i], dims[i + 1]
        if i in (1, 2, 3):
            in_m = in_m // 2
        for _ in range(num_res_blocks + 1):
            layers.append(("res", in_m, out_m))
            if scale in attn_scales:
                layers.append(("attn", out_m, out_m))
            in_m = out_m
        if i != len(dim_mult) - 1:
            mode = "upsample3d" if temperal_upsample[i] else "upsample2d"
            layers.append((mode, out_m, out_m))
            scale *= 2.0
    return layers


class _WanCoder(nn.Module):
    """Shared encoder/decoder body. Encoder: conv1 → downsamples → middle →
    head (vae.py:317-360); decoder: conv1 → middle → upsamples → head
    (vae.py:423-472) — middle placement differs (``middle_first``)."""
    dim: int
    in_ch: int
    out_ch: int
    layout: Tuple[Tuple[str, int, int], ...]
    mid_dim: int
    stages_name: str
    middle_first: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, streaming: bool = False,
                 first_chunk: bool = True) -> jnp.ndarray:
        skw = dict(streaming=streaming, first_chunk=first_chunk)

        def middle(h):
            md = self.dim * self.mid_dim
            h = WanResidualBlock(md, md, dtype=self.dtype,
                                 name="middle_0")(h, **skw)
            h = WanAttentionBlock(md, dtype=self.dtype, name="middle_1")(h)
            return WanResidualBlock(md, md, dtype=self.dtype,
                                    name="middle_2")(h, **skw)

        h = WanCausalConv3d(self.in_ch, dtype=self.dtype,
                            name="conv1")(x, **skw)
        if self.middle_first:
            h = middle(h)
        for idx, (kind, in_m, out_m) in enumerate(self.layout):
            name = f"{self.stages_name}_{idx}"
            if kind == "res":
                h = WanResidualBlock(self.dim * in_m, self.dim * out_m,
                                     dtype=self.dtype, name=name)(h, **skw)
            elif kind == "attn":
                h = WanAttentionBlock(self.dim * out_m, dtype=self.dtype,
                                      name=name)(h)
            else:
                h = WanResample(self.dim * out_m, kind, dtype=self.dtype,
                                name=name)(h, **skw)
        if not self.middle_first:
            h = middle(h)
        head_dim = (self.dim * self.layout[-1][2] if self.middle_first
                    else self.dim * self.mid_dim)
        h = WanRMSNorm(head_dim, name="head_norm")(h)
        h = nn.silu(h)
        return WanCausalConv3d(self.out_ch, dtype=self.dtype,
                               name="head_conv")(h, **skw)


@register("videotuna_tpu.models.WanVAE",
          aliases=["videotuna.models.wan.wan.modules.vae.WanVAE",
                   "videotuna.models.wan.wan.modules.vae.WanVAE_"])
class WanVAE(nn.Module):
    """WanVAE_ (vae.py:483-596): encoder → conv1 (moments) → conv2 →
    decoder, with latent standardization (mean/std from vae.py:600-610)."""
    dim: int = 96
    z_dim: int = 16
    dim_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: Sequence[float] = ()
    temperal_downsample: Sequence[bool] = (False, True, True)
    dtype: Dtype = jnp.float32

    def setup(self):
        enc_layout = tuple(_encoder_layout(
            self.dim_mult, self.num_res_blocks, self.attn_scales,
            self.temperal_downsample))
        dec_layout = tuple(_decoder_layout(
            self.dim_mult, self.num_res_blocks, self.attn_scales,
            tuple(self.temperal_downsample)[::-1]))
        self.encoder = _WanCoder(
            self.dim, self.dim, self.z_dim * 2, enc_layout,
            self.dim_mult[-1], "downsamples", dtype=self.dtype,
            name="encoder")
        self.decoder = _WanCoder(
            self.dim, self.dim * self.dim_mult[-1], 3, dec_layout,
            self.dim_mult[-1], "upsamples", middle_first=True,
            dtype=self.dtype, name="decoder")
        self.conv1 = WanCausalConv3d(self.z_dim * 2, (1, 1, 1),
                                     pad=(0, 0, 0), dtype=self.dtype,
                                     name="conv1")
        self.conv2 = WanCausalConv3d(self.z_dim, (1, 1, 1), pad=(0, 0, 0),
                                     dtype=self.dtype, name="conv2")

    @property
    def spatial_ratio(self) -> int:
        return 2 ** (len(self.dim_mult) - 1)

    @property
    def temporal_ratio(self) -> int:
        return 2 ** sum(bool(b) for b in self.temperal_downsample)

    def _scale(self):
        if self.z_dim == 16:
            return (jnp.asarray(WAN_LATENT_MEAN), jnp.asarray(WAN_LATENT_STD))
        return (jnp.zeros((self.z_dim,)), jnp.ones((self.z_dim,)))

    def encode(self, video: jnp.ndarray,
               standardize: bool = True) -> jnp.ndarray:
        """(B, 1+4k, H, W, 3) → mu (B, 1+k, H/8, W/8, z). Matches
        WanVAE_.encode (vae.py:518-541): returns the standardized mean."""
        moments = self.conv1(self.encoder(video))
        mu = moments[..., :self.z_dim]
        if standardize:
            mean, std = self._scale()
            mu = (mu - mean) / std
        return mu

    def encode_moments(self, video: jnp.ndarray) -> jnp.ndarray:
        """Raw (mu, log_var) moments, for training the VAE."""
        return self.conv1(self.encoder(video))

    def decode(self, z: jnp.ndarray,
               standardize: bool = True) -> jnp.ndarray:
        """(B, 1+k, h, w, z) → (B, 1+4k, H, W, 3) (vae.py:543-567)."""
        if standardize:
            mean, std = self._scale()
            z = z * std + mean
        return self.decoder(self.conv2(z))

    def decode_chunk(self, z: jnp.ndarray, standardize: bool = True,
                     first_chunk: bool = True) -> jnp.ndarray:
        """One streaming chunk — the reference's feat-cache decode
        (vae.py:543-567 chunks of 1,4,4,… latent frames) with conv
        context carried in the ``cache`` collection. Drive with
        ``wan_streaming_decode``."""
        if standardize:
            mean, std = self._scale()
            z = z * std + mean
        return self.decoder(self.conv2(z), streaming=True,
                            first_chunk=first_chunk)

    def __call__(self, video: jnp.ndarray) -> jnp.ndarray:
        return self.decode(self.encode(video, standardize=False),
                           standardize=False)


def wan_streaming_decode(vae: "WanVAE", params, z, chunk: int = 2,
                         standardize: bool = True):
    """Exact O(T) streaming decode for the faithful WanVAE: latent frame 0
    alone (→ 1 pixel frame via the first-frame bypass), then uniform
    chunks (→ 4·chunk frames each); per-conv temporal context rides the
    ``cache`` collection. Matches ``vae.apply(..., method="decode")``
    output exactly (per-position RMS norms keep chunking exact)."""
    import functools

    import jax

    ratio = vae.temporal_ratio
    first_fn = jax.jit(functools.partial(
        vae.apply, method="decode_chunk", standardize=standardize,
        first_chunk=True, mutable=["cache"]))
    rest_fn = jax.jit(functools.partial(
        vae.apply, method="decode_chunk", standardize=standardize,
        first_chunk=False, mutable=["cache"]))

    out0, state = first_fn({"params": params}, z[:, :1])
    outs = [out0]
    t = z.shape[1]
    i = 1
    while i < t:
        j = min(i + chunk, t)
        zc = z[:, i:j]
        if j - i < chunk:
            zc = jnp.pad(zc, ((0, 0), (0, chunk - (j - i)),
                              (0, 0), (0, 0), (0, 0)))
        out, state = rest_fn({"params": params, **state}, zc)
        outs.append(out[:, : ratio * (j - i)])
        i = j
    return jnp.concatenate(outs, axis=1)
