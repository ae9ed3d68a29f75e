"""Flux — rectified-flow image DiT (dev/schnell), TPU-native.

Capability parity with the reference ``Flux`` model
(/root/reference/videotuna/models/flux/model.py, modules/layers.py,
sampling util sampling.py; inference via diffusers FluxPipeline at
scripts/inference_flux.py:10-33): double-stream (img/txt) + single-stream
blocks with modulation from timestep ⊕ pooled CLIP ⊕ guidance embedding,
2D RoPE over latent patches, T5 text tokens.

HunyuanVideo's architecture descends from Flux, so the blocks are shared:
we reuse MMDoubleStreamBlock / MMSingleStreamBlock from models/hunyuan/dit
with 2D (h, w) rope tables instead of 3D.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from videotuna_tpu.core.registry import register
from videotuna_tpu.models.hunyuan.dit import (MMDoubleStreamBlock,
                                              MMSingleStreamBlock,
                                              _modulation)
from videotuna_tpu.models.layers import TimestepEmbedder, rope_3d

Dtype = Any


class MLPEmbedder(nn.Module):
    """BFL MLPEmbedder (in_layer → silu → out_layer); param names match
    TimestepEmbedder's fc1/fc2 so one conversion rule serves both."""
    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(
            x.astype(self.dtype))
        return nn.Dense(self.hidden, dtype=self.dtype,
                        name="fc2")(nn.silu(x))


@register("videotuna_tpu.models.flux.FluxModel",
          aliases=["videotuna.models.flux.model.Flux",
                   "diffusers.FluxTransformer2DModel"])
class FluxModel(nn.Module):
    """Defaults scaled down; flux-dev: dim 3072, heads 24, 19 double +
    38 single, in_channels 64 (2×2-packed 16ch latents)."""
    in_channels: int = 64
    dim: int = 3072
    heads: int = 24
    double_blocks: int = 19
    single_blocks: int = 38
    mlp_ratio: float = 4.0
    text_dim: int = 4096
    pooled_dim: int = 768
    guidance_embed: bool = True           # dev; schnell sets False
    rope_theta: float = 10000.0
    # BFL axes_dim [16, 56, 56]: the 16-dim axis rotates over the (all-
    # zero) token-index id — identity for image patches, so rope_3d with a
    # length-1 time axis reproduces it exactly while keeping the weight
    # layout of real checkpoints
    rope_dims: Optional[Tuple[int, int, int]] = None   # default by head_dim
    dtype: Dtype = jnp.float32
    scan_blocks: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, timestep: jnp.ndarray,
                 text_states: jnp.ndarray,
                 pooled_text: Optional[jnp.ndarray] = None,
                 guidance: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """x: (B, H', W', C) packed latents (H'=H/2 patches); returns same
        shape. Tokens are the flattened patch grid."""
        b, hh, ww, c = x.shape
        d = self.dim

        vec = TimestepEmbedder(d, dtype=self.dtype,
                               name="time_in")(timestep * 1000.0)
        if pooled_text is not None:
            # BFL vector_in is a two-layer MLPEmbedder (model.py), not a
            # single Linear — weight-faithful to real checkpoints
            vec = vec + MLPEmbedder(d, dtype=self.dtype,
                                    name="vector_in")(pooled_text)
        if self.guidance_embed and guidance is not None:
            vec = vec + TimestepEmbedder(d, dtype=self.dtype,
                                         name="guidance_in")(
                guidance * 1000.0)

        img = nn.Dense(d, dtype=self.dtype, name="img_in")(
            x.astype(self.dtype)).reshape(b, hh * ww, d)
        txt = nn.Dense(d, dtype=self.dtype, name="txt_in")(
            text_states.astype(self.dtype))
        lt = txt.shape[1]

        hd = d // self.heads
        if self.rope_dims is not None:
            dt_r, dh_r, dw_r = self.rope_dims
        elif hd == 128:
            dt_r, dh_r, dw_r = 16, 56, 56      # released flux axes_dim
        else:
            dt_r = hd // 8
            while dt_r > 0 and (dt_r % 2 or (hd - dt_r) % 4):
                dt_r -= 1
            dh_r = dw_r = (hd - dt_r) // 2
        assert dt_r + dh_r + dw_r == hd, ((dt_r, dh_r, dw_r), hd)
        cos, sin = rope_3d(dt_r, dh_r, dw_r, 1, hh, ww,
                           theta=self.rope_theta)
        cos = cos.astype(self.dtype)
        sin = sin.astype(self.dtype)
        cos_full = jnp.concatenate(
            [cos, jnp.ones((lt, cos.shape[1]), self.dtype)], axis=0)
        sin_full = jnp.concatenate(
            [sin, jnp.zeros((lt, sin.shape[1]), self.dtype)], axis=0)

        if self.scan_blocks:
            dscan = nn.scan(MMDoubleStreamBlock,
                            variable_axes={"params": 0},
                            split_rngs={"params": True},
                            in_axes=(nn.broadcast,) * 3,
                            length=self.double_blocks)
            (img, txt), _ = dscan(d, self.heads, self.mlp_ratio,
                                  dtype=self.dtype, as_cell=True,
                                  name="double_blocks")(
                (img, txt), vec, cos, sin)
            xcat = jnp.concatenate([img, txt], axis=1)
            sscan = nn.scan(MMSingleStreamBlock,
                            variable_axes={"params": 0},
                            split_rngs={"params": True},
                            in_axes=(nn.broadcast,) * 4,
                            length=self.single_blocks)
            xcat, _ = sscan(d, self.heads, self.mlp_ratio, dtype=self.dtype,
                            as_cell=True, name="single_blocks")(
                xcat, vec, cos_full, sin_full, img.shape[1])
        else:
            for i in range(self.double_blocks):
                img, txt = MMDoubleStreamBlock(
                    d, self.heads, self.mlp_ratio, dtype=self.dtype,
                    name=f"double_{i}")((img, txt), vec, cos, sin)
            xcat = jnp.concatenate([img, txt], axis=1)
            for i in range(self.single_blocks):
                xcat = MMSingleStreamBlock(
                    d, self.heads, self.mlp_ratio, dtype=self.dtype,
                    name=f"single_{i}")(xcat, vec, cos_full, sin_full,
                                        img.shape[1])
        img = xcat[:, :hh * ww]

        shift, scale = _modulation(vec, 2, d, self.dtype, "final_mod")
        img = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                           dtype=self.dtype, name="final_norm")(img)
        img = img * (1 + scale) + shift
        img = nn.Dense(self.in_channels, dtype=self.dtype,
                       name="final_proj",
                       kernel_init=nn.initializers.zeros)(img)
        return img.reshape(b, hh, ww, c).astype(jnp.float32)
