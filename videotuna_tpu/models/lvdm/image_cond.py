"""DynamiCrafter image conditioning: CLIP image embedder + query resampler.

Capability parity with the reference i2v conditioning stack
(/root/reference/videotuna/models/lvdm/modules/encoders/condition.py CLIP
image embedder; ip_resampler.py:8 ``ImageProjModel``, :106 ``Resampler``;
wired in ``LatentVisualDiffusionFlow`` models/lvdm/models/ddpm3d.py:1311):
the conditioning image is CLIP-encoded to patch tokens, then a
perceiver-style resampler with learned latent queries produces a fixed
number of image context tokens that join text tokens in the UNet's cross
attention (openaimodel3d_dc ``img_cross_attention``).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from videotuna_tpu.core.registry import register
from videotuna_tpu.kernels.attention import dot_product_attention

Dtype = Any


@register("videotuna_tpu.models.lvdm.CLIPImageEmbedder",
          aliases=["videotuna.models.lvdm.modules.encoders.condition."
                   "FrozenOpenCLIPImageEmbedderV2"])
class CLIPImageEmbedder(nn.Module):
    """ViT image encoder returning patch tokens (no CLS pooling — the
    resampler consumes the full token grid, reference condition.py)."""
    image_size: int = 224
    patch: int = 14
    dim: int = 1280
    heads: int = 16
    num_layers: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: (B, H, W, 3) in [-1, 1] → (B, N_patches, dim)."""
        b = images.shape[0]
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), padding="VALID",
                    use_bias=False, dtype=self.dtype,
                    name="patch_embed")(images.astype(self.dtype))
        x = x.reshape(b, -1, self.dim)
        n = x.shape[1]
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (n, self.dim))
        x = x + pos[None].astype(self.dtype)
        x = nn.LayerNorm(dtype=self.dtype, name="ln_pre")(x)
        for i in range(self.num_layers):
            h = nn.LayerNorm(dtype=self.dtype, name=f"ln1_{i}")(x)
            q = nn.DenseGeneral((self.heads, self.dim // self.heads),
                                dtype=self.dtype, name=f"q_{i}")(h)
            k = nn.DenseGeneral((self.heads, self.dim // self.heads),
                                dtype=self.dtype, name=f"k_{i}")(h)
            v = nn.DenseGeneral((self.heads, self.dim // self.heads),
                                dtype=self.dtype, name=f"v_{i}")(h)
            o = dot_product_attention(q, k, v)
            o = o.reshape(b, n, self.dim)
            x = x + nn.Dense(self.dim, dtype=self.dtype,
                             name=f"attn_out_{i}")(o)
            h = nn.LayerNorm(dtype=self.dtype, name=f"ln2_{i}")(x)
            h = nn.Dense(self.dim * 4, dtype=self.dtype, name=f"fc1_{i}")(h)
            h = h * jax.nn.sigmoid(1.702 * h)
            x = x + nn.Dense(self.dim, dtype=self.dtype,
                             name=f"fc2_{i}")(h)
        return nn.LayerNorm(dtype=self.dtype, name="ln_post")(x)


@register("videotuna_tpu.models.lvdm.Resampler",
          aliases=["videotuna.models.lvdm.modules.encoders.ip_resampler."
                   "Resampler"])
class Resampler(nn.Module):
    """Perceiver resampler: learned queries cross-attend to image tokens
    (reference ip_resampler.py:106)."""
    dim: int = 1024
    depth: int = 4
    heads: int = 12
    num_queries: int = 16
    embedding_dim: int = 1280
    output_dim: int = 1024
    ff_mult: int = 4
    video_length: Optional[int] = None   # queries repeated per frame
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, N, embedding_dim) → (B, num_queries[, ·T], output_dim)."""
        b = x.shape[0]
        nq = self.num_queries * (self.video_length or 1)
        latents = self.param("latents", nn.initializers.normal(0.02),
                             (self.num_queries, self.dim))
        lat = jnp.broadcast_to(latents[None], (b, self.num_queries,
                                               self.dim)).astype(self.dtype)
        if self.video_length:
            lat = jnp.tile(lat, (1, self.video_length, 1))
        x = nn.Dense(self.dim, dtype=self.dtype, name="proj_in")(
            x.astype(self.dtype))
        hd = self.dim // self.heads
        for i in range(self.depth):
            kv = jnp.concatenate([x, lat], axis=1)
            hq = nn.LayerNorm(dtype=self.dtype, name=f"lnq_{i}")(lat)
            hk = nn.LayerNorm(dtype=self.dtype, name=f"lnk_{i}")(kv)
            q = nn.DenseGeneral((self.heads, hd), use_bias=False,
                                dtype=self.dtype, name=f"q_{i}")(hq)
            k = nn.DenseGeneral((self.heads, hd), use_bias=False,
                                dtype=self.dtype, name=f"k_{i}")(hk)
            v = nn.DenseGeneral((self.heads, hd), use_bias=False,
                                dtype=self.dtype, name=f"v_{i}")(hk)
            o = dot_product_attention(q, k, v)
            o = o.reshape(b, lat.shape[1], self.dim)
            lat = lat + nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                                 name=f"attn_out_{i}")(o)
            h = nn.LayerNorm(dtype=self.dtype, name=f"lnf_{i}")(lat)
            h = nn.Dense(self.dim * self.ff_mult, use_bias=False,
                         dtype=self.dtype, name=f"ff1_{i}")(h)
            lat = lat + nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                                 name=f"ff2_{i}")(nn.gelu(h))
        out = nn.Dense(self.output_dim, dtype=self.dtype,
                       name="proj_out")(lat)
        return nn.LayerNorm(dtype=self.dtype, name="norm_out")(out)


@register("videotuna_tpu.models.lvdm.ImageProjModel",
          aliases=["videotuna.models.lvdm.modules.encoders.ip_resampler."
                   "ImageProjModel"])
class ImageProjModel(nn.Module):
    """Simple linear image-embedding → N context tokens (reference
    ip_resampler.py:8)."""
    cross_attention_dim: int = 1024
    clip_embeddings_dim: int = 1024
    clip_extra_context_tokens: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeds: jnp.ndarray) -> jnp.ndarray:
        b = image_embeds.shape[0]
        x = nn.Dense(self.clip_extra_context_tokens
                     * self.cross_attention_dim, dtype=self.dtype,
                     name="proj")(image_embeds.astype(self.dtype))
        x = x.reshape(b, self.clip_extra_context_tokens,
                      self.cross_attention_dim)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(x)


@register("videotuna_tpu.models.lvdm.ImageConditioner")
class ImageConditioner(nn.Module):
    """DynamiCrafter image-conditioning tower: OpenCLIP ViT patch tokens →
    Perceiver-resampler queries, composed as ONE module (the reference
    Lightning module wires FrozenOpenCLIPImageEmbedderV2 + the separate
    ``image_proj_model`` Resampler; condition.py + ip_resampler.py:106).
    Making it a single cond_stage_2 lets the flow treat image conditioning
    uniformly (encode → context_img tokens for the UNet's image
    cross-attention)."""
    image_size: int = 224
    clip_dim: int = 1280
    clip_heads: int = 16
    clip_layers: int = 32
    dim: int = 1024
    depth: int = 4
    heads: int = 12
    num_queries: int = 16
    output_dim: int = 1024
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: (B, H, W, 3) in [-1, 1]; resized to the CLIP grid here
        so callers can pass video-resolution frames. → (B, nq, out_dim)."""
        if images.shape[1] != self.image_size or \
                images.shape[2] != self.image_size:
            images = jax.image.resize(
                images, (images.shape[0], self.image_size,
                         self.image_size, images.shape[3]), "bilinear")
        tokens = CLIPImageEmbedder(
            image_size=self.image_size, dim=self.clip_dim,
            heads=self.clip_heads, num_layers=self.clip_layers,
            dtype=self.dtype, name="clip")(images)
        return Resampler(dim=self.dim, depth=self.depth, heads=self.heads,
                         num_queries=self.num_queries,
                         embedding_dim=self.clip_dim,
                         output_dim=self.output_dim, dtype=self.dtype,
                         name="resampler")(tokens)
