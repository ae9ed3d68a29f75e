"""DINO ViT-B/16 in JAX — the VBench perception backbone for
``subject_consistency``.

Weight-faithful reimplementation of the ``facebookresearch/dino``
``dino_vitb16`` torch.hub model the reference loads at
/root/reference/eval/vbench/subject_consistency.py:84, and the dimension
protocol (:27-80):

- frames short-side bilinear-resized to 224 (eval/vbench/utils.py:69-76
  ``dino_transform`` — NO center crop, so inputs are rectangular),
  ImageNet-normalized;
- DINO ViT-B/16 forward: conv patchify, prepend CLS, add positional
  embeddings *bicubic-interpolated with DINO's scale_factor quirk*
  (``(w0 + 0.1) / sqrt(N)`` fed to F.interpolate, so source coordinates
  use the given scale, not the output/input ratio), 12 pre-LN blocks
  (qkv bias, exact GELU), final LN, return the CLS feature;
- per frame i ≥ 1 the score is
  ``(max(0, cos(f_{i-1}, f_i)) + max(0, cos(f_0, f_i))) / 2``, averaged
  over frames (subject_consistency.py:48-73).
"""

from __future__ import annotations

import math
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Params = Any

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _cubic_kernel(t: jnp.ndarray, a: float = -0.75) -> jnp.ndarray:
    at = jnp.abs(t)
    return jnp.where(
        at <= 1.0, (a + 2.0) * at ** 3 - (a + 3.0) * at ** 2 + 1.0,
        jnp.where(at < 2.0,
                  a * at ** 3 - 5.0 * a * at ** 2 + 8.0 * a * at - 4.0 * a,
                  0.0))


def _bicubic_scale_axis(x: jnp.ndarray, scale: float, axis: int
                        ) -> jnp.ndarray:
    """One separable pass of F.interpolate(scale_factor=s, mode='bicubic',
    align_corners=False): out_len = floor(in·s) and source coordinates
    use the GIVEN s (src = (dst + 0.5)/s − 0.5) — torch's
    recompute_scale_factor=False semantics, which is what DINO's
    interpolate_pos_encoding relies on via its +0.1 fudge."""
    in_len = x.shape[axis]
    out_len = int(math.floor(in_len * scale))
    pos = (jnp.arange(out_len, dtype=jnp.float32) + 0.5) / scale - 0.5
    base = jnp.floor(pos)
    frac = pos - base
    out = None
    for tap in range(-1, 3):
        idx = jnp.clip(base + tap, 0, in_len - 1).astype(jnp.int32)
        w = _cubic_kernel(frac - tap)
        piece = jnp.take(x, idx, axis=axis)
        shape = [1] * x.ndim
        shape[axis] = out_len
        piece = piece * w.reshape(shape)
        out = piece if out is None else out + piece
    return out


def interpolate_pos_encoding(pos_embed: jnp.ndarray, h: int, w: int,
                             patch: int = 16) -> jnp.ndarray:
    """DINO vision_transformer.py interpolate_pos_encoding: (1, N+1, C)
    table → (1, h0·w0 + 1, C) for an (h, w) pixel input."""
    n = pos_embed.shape[1] - 1
    h0, w0 = h // patch, w // patch
    if h0 * w0 == n and h == w:
        return pos_embed
    cls_pos = pos_embed[:, :1]
    grid = pos_embed[:, 1:]
    size = int(round(math.sqrt(n)))
    grid = grid.reshape(1, size, size, -1)
    grid = _bicubic_scale_axis(grid, (h0 + 0.1) / size, axis=1)
    grid = _bicubic_scale_axis(grid, (w0 + 0.1) / size, axis=2)
    assert grid.shape[1] == h0 and grid.shape[2] == w0
    grid = grid.reshape(1, h0 * w0, -1)
    return jnp.concatenate([cls_pos, grid], axis=1)


class DINOBlock(nn.Module):
    dim: int = 768
    heads: int = 12

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(self.dim * 3, name="qkv")(h)
        b, t, _ = qkv.shape
        hd = self.dim // self.heads
        q, k, v = [y.reshape(b, t, self.heads, hd)
                   for y in jnp.split(qkv, 3, axis=-1)]
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, t, self.dim)
        x = x + nn.Dense(self.dim, name="proj")(o)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(self.dim * 4, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="fc2")(h)
        return x + h


class DINOViT(nn.Module):
    """dino_vitb16: returns the final-LN CLS feature (B, dim)."""
    dim: int = 768
    depth: int = 12
    heads: int = 12
    patch: int = 16

    @nn.compact
    def __call__(self, x):                      # (B, H, W, 3) normalized
        b, h, w, _ = x.shape
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), padding="VALID",
                    name="patch_embed")(x)
        x = x.reshape(b, -1, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), x],
                            axis=1)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, (224 // self.patch) ** 2 + 1, self.dim))
        x = x + interpolate_pos_encoding(pos, h, w, self.patch)
        for i in range(self.depth):
            x = DINOBlock(self.dim, self.heads, name=f"block{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return x[:, 0]


def convert_dino_state_dict(sd: Dict[str, np.ndarray]) -> Params:
    """torch.hub dino_vitb16 state dict → DINOViT params."""
    def t(x):
        return jnp.asarray(np.asarray(x))

    def lin(prefix):
        return {"kernel": t(sd[prefix + ".weight"]).T,
                "bias": t(sd[prefix + ".bias"])}

    def ln(prefix):
        return {"scale": t(sd[prefix + ".weight"]),
                "bias": t(sd[prefix + ".bias"])}

    p: Dict[str, Any] = {
        "cls_token": t(sd["cls_token"]),
        "pos_embed": t(sd["pos_embed"]),
        # Conv2d OIHW → flax HWIO
        "patch_embed": {
            "kernel": t(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
            "bias": t(sd["patch_embed.proj.bias"])},
        "norm": ln("norm"),
    }
    i = 0
    while f"blocks.{i}.norm1.weight" in sd:
        p[f"block{i}"] = {
            "norm1": ln(f"blocks.{i}.norm1"),
            "qkv": lin(f"blocks.{i}.attn.qkv"),
            "proj": lin(f"blocks.{i}.attn.proj"),
            "norm2": ln(f"blocks.{i}.norm2"),
            "fc1": lin(f"blocks.{i}.mlp.fc1"),
            "fc2": lin(f"blocks.{i}.mlp.fc2"),
        }
        i += 1
    return p


def _short_side_resize(video255: np.ndarray, size: int = 224) -> np.ndarray:
    """torchvision Resize(224) on a uint8-range video: short side → 224,
    bilinear antialiased (matches tensor-mode Resize's default)."""
    import cv2
    t, h, w, _ = video255.shape
    if h <= w:
        nh, nw = size, max(int(round(w * size / h)), 1)
    else:
        nh, nw = max(int(round(h * size / w)), 1), size
    out = np.stack([cv2.resize(f, (nw, nh), interpolation=cv2.INTER_AREA
                               if (nh < h) else cv2.INTER_LINEAR)
                    for f in video255.astype(np.float32)])
    return out


class DINOFeaturizer:
    """Per-frame DINO CLS features with the dino_transform protocol.

    Model geometry is inferred from the params tree (dim from pos_embed,
    depth from block count, patch from the conv kernel, heads = dim//64 —
    exact for dino_vitb16's 768/12) so converted checkpoints of any size
    work, including the tiny parity-test replicas.
    """

    def __init__(self, params: Params):
        self.params = params
        dim = int(params["pos_embed"].shape[-1])
        depth = sum(1 for k in params if str(k).startswith("block"))
        patch = int(params["patch_embed"]["kernel"].shape[0])
        self.model = DINOViT(dim=dim, depth=depth,
                             heads=max(1, dim // 64), patch=patch)
        self._fn = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x))

    def features(self, video: np.ndarray) -> np.ndarray:
        """video (T, H, W, 3) in [-1, 1] or uint8 → (T, 768) L2-normed."""
        v = np.asarray(video)
        if v.dtype != np.uint8:
            v = (v + 1.0) * 127.5
        v = _short_side_resize(v.astype(np.float32), 224) / 255.0
        v = (v - np.asarray(IMAGENET_MEAN, np.float32)) \
            / np.asarray(IMAGENET_STD, np.float32)
        f = np.asarray(self._fn(self.params, jnp.asarray(v)))
        return f / np.maximum(np.linalg.norm(f, axis=-1, keepdims=True),
                              1e-8)


def subject_consistency_score(video: np.ndarray, params: Params) -> float:
    """FAITHFUL VBench subject_consistency over DINO features
    (subject_consistency.py:48-73)."""
    f = DINOFeaturizer(params).features(video)
    if f.shape[0] < 2:
        return 1.0
    sim_pre = np.maximum((f[:-1] * f[1:]).sum(-1), 0.0)
    sim_fir = np.maximum((f[:1] * f[1:]).sum(-1), 0.0)
    return float(np.mean((sim_pre + sim_fir) / 2.0))
