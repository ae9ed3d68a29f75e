"""UMT action-recognition ViT in JAX — the VBench perception backbone
for the ``human_action`` dimension.

Weight-faithful reimplementation of the reference torch model
(/root/reference/eval/vbench/third_party/umt/models/modeling_finetune.py:
296-474 VisionTransformer, :476-492 vit_large_patch16_224) and the
dimension protocol (/root/reference/eval/vbench/human_action.py:43-113):

- VideoMAE-style ViT-L/16: Conv3d tubelet patchify (tubelet 1 for the
  K400-finetuned checkpoint → 16 frames × 14×14 patches = 3136 tokens),
  fused-qkv attention with the q_bias/zero-k/v_bias quirk, pre-LN blocks
  with exact (erf) GELU, mean-pool → fc_norm → 400-way head;
- the checkpoint-shaped sinusoid position table: generated for 8 frames
  at 14×14 (pre_n_position=1568) then *linearly interpolated along time*
  to the eval frame count (modeling_finetune.get_sinusoid_encoding_table)
  — this is not a plain 3136-position sinusoid;
- scoring: middle-sample 16 frames, short-side bilinear resize to 256,
  center-crop 224², ImageNet normalize, sigmoid top-5 with the 0.85
  confidence threshold, exact-match against the action phrase parsed
  from the video filename.

The Kinetics-400 category list is pure data; ``load_kinetics_categories``
reads it from disk when available.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Params = Any

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

_K400_CANDIDATES = (
    os.path.join(os.path.dirname(__file__), "assets",
                 "kinetics_400_categories.txt"),
    "/root/reference/eval/vbench/third_party/umt/"
    "kinetics_400_categories.txt",
)


def load_kinetics_categories(path: Optional[str] = None) -> Dict[int, str]:
    """index → lowercase category name (the reference build_dict)."""
    if path is None:
        for cand in _K400_CANDIDATES:
            if os.path.exists(cand):
                path = cand
                break
    if path is None:
        raise FileNotFoundError("kinetics_400_categories.txt not found; "
                                "pass an explicit path")
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            cat, num = line.split("\t")
            out[int(num)] = cat.lower()
    return out


def sinusoid_pos_embed(num_patches: int, d: int, cur_frame: int,
                       pre_n_position: int = 1568) -> np.ndarray:
    """The reference get_sinusoid_encoding_table: a sinusoid table for
    ``pre_n_position`` checkpoint positions (8 frames × 14×14), with the
    bicubic spatial / linear temporal interpolation paths for other
    geometries. Returns (1, num_patches, d) float32."""
    pos = np.arange(pre_n_position)[:, None]
    div = np.power(10000.0, 2 * (np.arange(d) // 2) / d)[None, :]
    table = pos / div
    table[:, 0::2] = np.sin(table[:, 0::2])
    table[:, 1::2] = np.cos(table[:, 1::2])
    table = table[None].astype(np.float32)  # (1, pre_n, d)
    t0, p0 = 8, 14
    if num_patches // cur_frame * 8 != pre_n_position and cur_frame != -1:
        # spatial bicubic resize of the 14×14 grid (rare; kept for parity
        # with non-224 eval resolutions)
        import torch
        import torch.nn.functional as F
        new_p = int((num_patches // cur_frame) ** 0.5)
        t = torch.from_numpy(table).reshape(-1, t0, p0, p0, d)
        t = t.reshape(-1, p0, p0, d).permute(0, 3, 1, 2)
        t = F.interpolate(t, size=(new_p, new_p), mode="bicubic",
                          align_corners=False)
        t = t.permute(0, 2, 3, 1).reshape(-1, t0, new_p, new_p, d)
        table = t.flatten(1, 3).numpy()
        p0 = new_p
    if cur_frame != -1 and cur_frame != 8:
        # linear temporal interpolation 8 → cur_frame,
        # align_corners=False semantics
        p = int((num_patches // cur_frame) ** 0.5)
        grid = table.reshape(t0, p, p, d).transpose(1, 2, 3, 0)  # P,P,d,T
        src = np.clip((np.arange(cur_frame) + 0.5) * (t0 / cur_frame)
                      - 0.5, 0.0, t0 - 1.0)
        lo = np.floor(src).astype(int)
        hi = np.minimum(lo + 1, t0 - 1)
        w = (src - lo).astype(np.float32)
        interp = grid[..., lo] * (1.0 - w) + grid[..., hi] * w  # P,P,d,T'
        table = interp.transpose(3, 0, 1, 2).reshape(1, -1, d)
    return np.ascontiguousarray(table[:, :num_patches].astype(np.float32))


class UMTAttention(nn.Module):
    """Fused-qkv attention with the reference's bias quirk: q and v have
    biases, k's is structurally zero."""
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        hd = self.dim // self.heads
        q = nn.DenseGeneral((self.heads, hd), name="q")(x)
        k = nn.DenseGeneral((self.heads, hd), use_bias=False, name="k")(x)
        v = nn.DenseGeneral((self.heads, hd), name="v")(x)
        from videotuna_tpu.kernels.attention import dot_product_attention
        o = dot_product_attention(q, k, v)
        o = o.reshape(*x.shape[:-1], self.dim)
        return nn.Dense(self.dim, name="proj")(o)


class UMTBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float = 4.0
    layer_scale: bool = False

    @nn.compact
    def __call__(self, x):
        a = UMTAttention(self.dim, self.heads, name="attn")(
            nn.LayerNorm(epsilon=1e-6, name="norm1")(x))
        if self.layer_scale:
            a = a * self.param("gamma_1", nn.initializers.ones,
                               (self.dim,))
        x = x + a
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="fc2")(h)
        if self.layer_scale:
            h = h * self.param("gamma_2", nn.initializers.ones,
                               (self.dim,))
        return x + h


class UMTViT(nn.Module):
    """vit_large_patch16_224 geometry by default (K400 finetune:
    tubelet 1, 16 frames, mean pooling)."""
    dim: int = 1024
    depth: int = 24
    heads: int = 16
    patch: int = 16
    tubelet: int = 1
    num_classes: int = 400
    num_frames: int = 16
    mlp_ratio: float = 4.0
    layer_scale: bool = False

    @nn.compact
    def __call__(self, video: jnp.ndarray) -> jnp.ndarray:
        """video: (B, T, H, W, 3) normalized; returns (B, num_classes)."""
        b, t, hh, ww, _ = video.shape
        x = nn.Conv(self.dim, (self.tubelet, self.patch, self.patch),
                    strides=(self.tubelet, self.patch, self.patch),
                    padding="VALID", name="patch_embed")(video)
        tt = x.shape[1]
        n = tt * x.shape[2] * x.shape[3]
        x = x.reshape(b, n, self.dim)
        pos = sinusoid_pos_embed(
            n, self.dim, tt,
            pre_n_position=2048 if self.patch == 14 else 1568)
        x = x + jnp.asarray(pos)
        for i in range(self.depth):
            x = UMTBlock(self.dim, self.heads, self.mlp_ratio,
                         self.layer_scale, name=f"block_{i}")(x)
        x = jnp.mean(x, axis=1)
        x = nn.LayerNorm(epsilon=1e-6, name="fc_norm")(x)
        return nn.Dense(self.num_classes, name="head")(x)


# ------------------------------------------------------------- protocol
def preprocess_video_umt(video: np.ndarray,
                         num_frames: int = 16) -> np.ndarray:
    """The human_action transform chain: middle-sample ``num_frames``,
    short-side bilinear resize to 256, center-crop 224², /255, ImageNet
    normalize. video: (T, H, W, 3) uint8 or float [-1, 1] →
    (1, 16, 224, 224, 3) float32."""
    import cv2
    v = np.asarray(video)
    if v.dtype != np.uint8:
        v = ((v + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
    t = v.shape[0]
    acc = min(num_frames, t)
    intervals = np.linspace(0, t, acc + 1).astype(int)
    idx = [(intervals[i] + intervals[i + 1] - 1) // 2 for i in range(acc)]
    if len(idx) < num_frames:
        idx = idx + [idx[-1]] * (num_frames - len(idx))
    frames = v[np.asarray(idx)]
    im_h, im_w = frames.shape[1:3]
    if min(im_h, im_w) != 256:
        if im_w < im_h:
            nw, nh = 256, int(256 * im_h / im_w)
        else:
            nh, nw = 256, int(256 * im_w / im_h)
        frames = np.stack([cv2.resize(f, (nw, nh),
                                      interpolation=cv2.INTER_LINEAR)
                           for f in frames])
    im_h, im_w = frames.shape[1:3]
    y0 = int(round((im_h - 224) / 2.0))
    x0 = int(round((im_w - 224) / 2.0))
    frames = frames[:, y0:y0 + 224, x0:x0 + 224]
    out = frames.astype(np.float32) / 255.0
    out = (out - np.asarray(IMAGENET_MEAN, np.float32)) \
        / np.asarray(IMAGENET_STD, np.float32)
    return out[None]


def parse_action_label(video_name: str) -> str:
    """The reference filename protocol: 'a person is <action>-<idx>.mp4'
    → '<action>' (human_action.py:78-84)."""
    return (video_name.split("/")[-1].lower().split("-")[0]
            .split("person is ")[-1].split("_")[0])


class UMTActionScorer:
    def __init__(self, params: Params, categories: Optional[Dict] = None,
                 model: Optional[UMTViT] = None):
        self.model = model or UMTViT()
        self.params = params
        self.categories = categories or load_kinetics_categories()
        self._fn = jax.jit(lambda p, v: self.model.apply({"params": p}, v))

    def top5(self, video: np.ndarray) -> List[Tuple[str, float]]:
        logits = np.asarray(
            self._fn(self.params,
                     jnp.asarray(preprocess_video_umt(video))))[0]
        probs = 1.0 / (1.0 + np.exp(-logits))
        idx = np.argsort(probs)[::-1][:5]
        return [(self.categories[int(i)], round(float(probs[i]), 4))
                for i in idx]

    def score(self, video: np.ndarray, video_name: str) -> bool:
        """True iff the filename's action is among the confident
        (prob ≥ 0.85) top-5 predictions."""
        label = parse_action_label(video_name)
        return any(cat == label and p >= 0.85
                   for cat, p in self.top5(video))


# ----------------------------------------------------------- conversion
def umt_map(depth: int = 24, heads: int = 16):
    """torch UMT K400 checkpoint names → flax tree (after
    ``preprocess_umt`` splits the fused qkv)."""
    from videotuna_tpu.tools.convert_weights import (ConversionMap,
                                                     t_linear)

    def t_conv3d(w: np.ndarray) -> np.ndarray:
        return np.transpose(w, (2, 3, 4, 1, 0))

    def dg(w: np.ndarray) -> np.ndarray:
        out_d, in_d = w.shape
        return w.T.reshape(in_d, heads, out_d // heads)

    def dgb(b: np.ndarray) -> np.ndarray:
        return b.reshape(heads, -1)

    rules = [
        (r"patch_embed\.proj\.weight", "patch_embed/kernel", t_conv3d),
        (r"patch_embed\.proj\.bias", "patch_embed/bias", None),
        (r"fc_norm\.weight", "fc_norm/scale", None),
        (r"fc_norm\.bias", "fc_norm/bias", None),
        (r"head\.weight", "head/kernel", t_linear),
        (r"head\.bias", "head/bias", None),
    ]
    for i in range(depth):
        p = rf"blocks\.{i}"
        o = f"block_{i}"
        rules += [
            (rf"{p}\.attn\.q_w", f"{o}/attn/q/kernel", dg),
            (rf"{p}\.attn\.q_b", f"{o}/attn/q/bias", dgb),
            (rf"{p}\.attn\.k_w", f"{o}/attn/k/kernel", dg),
            (rf"{p}\.attn\.v_w", f"{o}/attn/v/kernel", dg),
            (rf"{p}\.attn\.v_b", f"{o}/attn/v/bias", dgb),
            (rf"{p}\.attn\.proj\.weight", f"{o}/attn/proj/kernel",
             t_linear),
            (rf"{p}\.attn\.proj\.bias", f"{o}/attn/proj/bias", None),
            (rf"{p}\.norm1\.weight", f"{o}/norm1/scale", None),
            (rf"{p}\.norm1\.bias", f"{o}/norm1/bias", None),
            (rf"{p}\.norm2\.weight", f"{o}/norm2/scale", None),
            (rf"{p}\.norm2\.bias", f"{o}/norm2/bias", None),
            (rf"{p}\.mlp\.fc1\.weight", f"{o}/fc1/kernel", t_linear),
            (rf"{p}\.mlp\.fc1\.bias", f"{o}/fc1/bias", None),
            (rf"{p}\.mlp\.fc2\.weight", f"{o}/fc2/kernel", t_linear),
            (rf"{p}\.mlp\.fc2\.bias", f"{o}/fc2/bias", None),
            (rf"{p}\.gamma_1", f"{o}/gamma_1", None),
            (rf"{p}\.gamma_2", f"{o}/gamma_2", None),
        ]
    return ConversionMap(rules)


def preprocess_umt(sd) -> Dict[str, np.ndarray]:
    """Split fused qkv.weight (3D, D) into q_w/k_w/v_w and pair the
    reference's q_bias/v_bias (k has none); drop buffers."""
    out = {}
    for k, v in sd.items():
        v = np.asarray(v)
        if k.endswith("attn.qkv.weight"):
            q, kk, vv = np.split(v, 3, axis=0)
            base = k[:-len("qkv.weight")]
            out[base + "q_w"] = q
            out[base + "k_w"] = kk
            out[base + "v_w"] = vv
        elif k.endswith("attn.q_bias"):
            out[k[:-len("q_bias")] + "q_b"] = v
        elif k.endswith("attn.v_bias"):
            out[k[:-len("v_bias")] + "v_b"] = v
        elif "pos_embed" in k or k.endswith("num_batches_tracked"):
            continue  # sinusoid table is regenerated, not loaded
        else:
            out[k] = v
    return out


def convert_umt_state_dict(sd, **map_kw) -> Params:
    from videotuna_tpu.tools.convert_weights import strip_prefixes
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if "module" in sd or "model" in sd:
        raise ValueError("pass the inner state dict")
    sd = strip_prefixes(sd, ("module.", "model."))
    return umt_map(**map_kw).convert(preprocess_umt(sd), strict=True)
