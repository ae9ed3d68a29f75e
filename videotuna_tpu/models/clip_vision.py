"""CLIP vision tower (ViT) — the perception backbone for VBench semantic
dimensions, the LAION aesthetic predictor, and RLHF rewards.

The reference consumes CLIP through three paths: VBench's perception models
(/root/reference/eval/vbench/third_party/), the RLHF aesthetic/HPS rewards
(models/lvdm/models/rlhf_utils/reward_fn.py:793), and Wan's i2v CLIP image
conditioning (models/wan/wan/modules/clip.py:487). This module is one
TPU-native ViT matching the HF ``CLIPVisionModelWithProjection`` layout so
public OpenAI/LAION CLIP checkpoints convert directly
(``tools/convert_weights.clip_vision_map``).

Layout (HF transformers): class token + conv patch embed + learned position
embeddings → pre-LayerNorm → pre-norm transformer blocks with quick-GELU →
post-LayerNorm on the class token → linear projection to the shared space.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from videotuna_tpu.core.registry import register
from videotuna_tpu.kernels.attention import dot_product_attention

Dtype = Any


class CLIPVisionBlock(nn.Module):
    dim: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")(x)
        hd = self.dim // self.heads
        q = nn.DenseGeneral((self.heads, hd), dtype=self.dtype, name="q")(h)
        k = nn.DenseGeneral((self.heads, hd), dtype=self.dtype, name="k")(h)
        v = nn.DenseGeneral((self.heads, hd), dtype=self.dtype, name="v")(h)
        att = dot_product_attention(q, k, v)
        att = att.reshape(*x.shape[:-1], self.dim)
        x = x + nn.Dense(self.dim, dtype=self.dtype, name="attn_out")(att)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(self.dim * 4, dtype=self.dtype, name="fc1")(h)
        h = h * jax.nn.sigmoid(1.702 * h)        # quick-GELU
        return x + nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)


@register("videotuna_tpu.models.CLIPVisionEncoder")
class CLIPVisionEncoder(nn.Module):
    """ViT-L/14 defaults (the backbone of the LAION aesthetic predictor and
    VBench's CLIP-based scoring). Input images (B, H, W, 3) in [-1, 1],
    H == W == ``image_size``. Returns the projected class embedding
    (B, proj_dim); ``return_states=True`` additionally returns all token
    states (B, N+1, dim)."""
    dim: int = 1024
    heads: int = 16
    num_layers: int = 24
    patch: int = 14
    image_size: int = 224
    proj_dim: int = 768
    feature_layer: Optional[int] = None   # e.g. -2 for LLaVA patch feats
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, return_states: bool = False):
        b, h, w, c = images.shape
        n = (h // self.patch) * (w // self.patch)
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), use_bias=False,
                    dtype=self.dtype, name="patch_embed")(
            images.astype(self.dtype))
        x = x.reshape(b, n, self.dim)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (self.dim,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, self.dim)), x],
            axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (n + 1, self.dim))
        x = x + pos[None].astype(self.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pre_ln")(x)
        feat = None
        fl = self.feature_layer if self.feature_layer is None \
            else self.feature_layer % self.num_layers
        for i in range(self.num_layers):
            x = CLIPVisionBlock(self.dim, self.heads, dtype=self.dtype,
                                name=f"block_{i}")(x)
            if fl is not None and i == fl:
                feat = x
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                              name="post_ln")(x[:, 0])
        proj = nn.Dense(self.proj_dim, use_bias=False, dtype=self.dtype,
                        name="proj")(pooled)
        if return_states:
            return proj, (feat if feat is not None else x)
        return proj


class AestheticPredictor(nn.Module):
    """LAION ``sac+logos+ava1`` aesthetic MLP over L2-normalized CLIP
    ViT-L/14 image embeddings (768) → scalar score ≈ [1, 10]. The same
    predictor the reference's RLHF aesthetic reward loads
    (reward_fn.py:793) and VBench's aesthetic_quality dimension uses."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, emb: jnp.ndarray) -> jnp.ndarray:
        x = emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)
        x = x.astype(self.dtype)
        for i, d in enumerate((1024, 128, 64, 16)):
            x = nn.Dense(d, dtype=self.dtype, name=f"fc{i}")(x)
        return nn.Dense(1, dtype=self.dtype, name="out")(x)[..., 0]


def preprocess_frames(frames: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """(T, H, W, 3) in [-1, 1] → CLIP-normalized (T, size, size, 3).

    Bilinear resize (short-side crop omitted: generated videos are already
    center-framed) + OpenAI CLIP mean/std."""
    t = frames.shape[0]
    x = (frames + 1.0) / 2.0
    x = jax.image.resize(x, (t, size, size, 3), "bilinear")
    mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
    std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])
    return (x - mean) / std
