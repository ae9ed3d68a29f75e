"""MUSIQ (Multi-Scale Image Quality transformer) in JAX — the learned
scorer behind VBench's ``imaging_quality`` dimension.

The reference scores this dimension with pyiqa's MUSIQ port
(/root/reference/eval/vbench/imaging_quality.py:2 —
``from pyiqa.archs.musiq_arch import MUSIQ``) over the SPAQ checkpoint,
averaging per-frame scores and dividing by 100
(imaging_quality.py:31-49).

HONESTY NOTE: pyiqa is not installed in this environment and its source
is not vendored under /root/reference, so — unlike RAFT/AMT/ViCLIP/UMT/
GRiT/Tag2Text/DINO in this package, which carry whole-model torch parity
tests against the imported reference modules — this implementation is
built from the MUSIQ paper (Ke et al., ICCV 2021, arXiv:2108.05997) and
the published google-research/musiq design, and its parity test gates
only the JAX-vs-torch-twin translation (tests/test_musiq.py). The
conversion map targets this module's own naming; adapting real pyiqa
checkpoints may need key remapping. The evalkit therefore keeps
``imaging_quality_proxy`` as the default and exposes this model behind
``runner --musiq``, mirroring the --raft/--amt opt-ins.

Architecture (paper §3, §4.1):
- multi-scale input: the native-resolution image plus aspect-ratio
  preserving resizes with the LONGER side at 224 and 384;
- each scale cut into non-overlapping 32×32 patches (zero-padded to
  multiples of 32), every patch encoded independently by a small
  weight-standardized conv stem ("5-layer ResNet": root conv + two
  pre-activation basic blocks) and projected to the transformer width;
- hash-based 2D spatial embedding: a learned G×G (G=10) grid table,
  indexed by the patch's normalized grid position at its own scale —
  this is what lets one embedding cover arbitrary resolutions;
- a learned per-scale embedding added to every token of that scale;
- a CLS token + 14-layer pre-LN transformer (D=384, 6 heads, MLP 1152);
- regression head: Linear(D → 1) on the CLS feature; checkpoints are
  trained to emit MOS in [0, 100], which the VBench protocol divides by
  100.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Params = Any

PATCH = 32
HASH_GRID = 10


# ---------------------------------------------------------------------------
# Host-side multi-scale patch construction (numpy, per frame)
# ---------------------------------------------------------------------------

def _arp_resize_longer(img: np.ndarray, longer: int) -> np.ndarray:
    """Aspect-ratio-preserving bilinear resize with the longer side →
    ``longer`` (paper §3.1; never upscales past the native size check the
    caller does)."""
    import cv2
    h, w, _ = img.shape
    scale = longer / max(h, w)
    nh, nw = max(int(round(h * scale)), 1), max(int(round(w * scale)), 1)
    return cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)


def _cut_patches(img: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Zero-pad to multiples of 32 and cut raster-order 32×32 patches.
    Returns (N, 32, 32, 3) patches and (N, 2) hash-grid indices computed
    from the patch's normalized position in its own scale's grid."""
    h, w, c = img.shape
    nr, nc = math.ceil(h / PATCH), math.ceil(w / PATCH)
    pad = np.zeros((nr * PATCH, nc * PATCH, c), img.dtype)
    pad[:h, :w] = img
    pats = pad.reshape(nr, PATCH, nc, PATCH, c).transpose(0, 2, 1, 3, 4)
    pats = pats.reshape(nr * nc, PATCH, PATCH, c)
    ri = np.repeat(np.arange(nr), nc)
    ci = np.tile(np.arange(nc), nr)
    hi = np.floor(ri * HASH_GRID / nr).astype(np.int32)
    wi = np.floor(ci * HASH_GRID / nc).astype(np.int32)
    return pats, np.stack([hi, wi], axis=1)


def build_multiscale_input(frame01: np.ndarray,
                           longer_sides=(224, 384)
                           ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """frame01: (H, W, 3) float in [0, 1] → concatenated
    (patches (N,32,32,3), hash_idx (N,2), scale_idx (N,)) over
    [native, *longer_sides]."""
    frame01 = np.asarray(frame01, np.float32)
    all_p: List[np.ndarray] = []
    all_h: List[np.ndarray] = []
    all_s: List[np.ndarray] = []
    scales = [frame01] + [_arp_resize_longer(frame01, s)
                          for s in longer_sides]
    for idx, img in enumerate(scales):
        p, hidx = _cut_patches(img)
        all_p.append(p)
        all_h.append(hidx)
        all_s.append(np.full((p.shape[0],), idx, np.int32))
    return (np.concatenate(all_p), np.concatenate(all_h),
            np.concatenate(all_s))


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

class WSConv(nn.Module):
    """Weight-standardized conv (BiT/MUSIQ stem convention): kernel is
    standardized over (kh, kw, cin) per output channel before use."""
    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        cin = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (kh, kw, cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = w.mean(axis=(0, 1, 2), keepdims=True)
        var = w.var(axis=(0, 1, 2), keepdims=True)
        w = (w - mean) / jnp.sqrt(var + 1e-10)
        return jax.lax.conv_general_dilated(
            x, w, self.strides, "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b


class StemBlock(nn.Module):
    """Pre-activation basic residual block (2×3×3 WSConv, GN(32))."""
    ch: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                 name="gn1")(x))
        h = WSConv(self.ch, (3, 3), name="conv1")(h)
        h = nn.relu(nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                 name="gn2")(h))
        h = WSConv(self.ch, (3, 3), name="conv2")(h)
        return x + h


class PatchEncoder(nn.Module):
    """32×32×3 patch → D-dim token: WSConv 7×7/2 root + GN/ReLU +
    3×3/2 maxpool + 2 residual blocks + flatten + Dense (the paper's
    '5-conv-layer ResNet' patch encoding module)."""
    dim: int = 384
    stem_ch: int = 64

    @nn.compact
    def __call__(self, p):                       # (N, 32, 32, 3)
        h = WSConv(self.stem_ch, (7, 7), (2, 2), name="conv_root")(p)
        h = nn.relu(nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                 name="gn_root")(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="SAME")
        h = StemBlock(self.stem_ch, name="block1")(h)
        h = StemBlock(self.stem_ch, name="block2")(h)
        h = h.reshape(h.shape[0], -1)            # (N, 8·8·64)
        return nn.Dense(self.dim, name="embed")(h)


class MusiqBlock(nn.Module):
    dim: int = 384
    heads: int = 6
    mlp_dim: int = 1152

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(self.dim * 3, name="qkv")(h)
        t = x.shape[0]
        hd = self.dim // self.heads
        q, k, v = [y.reshape(t, self.heads, hd)
                   for y in jnp.split(qkv, 3, axis=-1)]
        att = jnp.einsum("qhd,khd->hqk", q, k) / math.sqrt(hd)
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", att, v).reshape(t, self.dim)
        x = x + nn.Dense(self.dim, name="proj")(o)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(self.mlp_dim, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="fc2")(h)
        return x + h


class MUSIQ(nn.Module):
    """Single-image forward over pre-cut multi-scale patches.

    Inputs: patches (N, 32, 32, 3) in [0, 1]; hash_idx (N, 2) grid
    coordinates in [0, HASH_GRID); scale_idx (N,) in [0, num_scales).
    Returns a scalar MOS-scale score."""
    dim: int = 384
    depth: int = 14
    heads: int = 6
    mlp_dim: int = 1152
    num_scales: int = 3
    stem_ch: int = 64

    @nn.compact
    def __call__(self, patches, hash_idx, scale_idx):
        tok = PatchEncoder(self.dim, self.stem_ch,
                           name="patch_encoder")(patches)
        spatial = self.param("spatial_embed", nn.initializers.normal(0.02),
                             (HASH_GRID, HASH_GRID, self.dim))
        scale = self.param("scale_embed", nn.initializers.normal(0.02),
                           (self.num_scales, self.dim))
        tok = tok + spatial[hash_idx[:, 0], hash_idx[:, 1]]
        tok = tok + scale[scale_idx]
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, self.dim))
        x = jnp.concatenate([cls, tok], axis=0)
        for i in range(self.depth):
            x = MusiqBlock(self.dim, self.heads, self.mlp_dim,
                           name=f"block{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return nn.Dense(1, name="head")(x[0])[0]


# ---------------------------------------------------------------------------
# Conversion + dimension protocol
# ---------------------------------------------------------------------------

def convert_musiq_state_dict(sd: Dict[str, np.ndarray]) -> Params:
    """torch twin state dict → MUSIQ params (naming per this module's
    torch twin in tests/test_musiq.py; see HONESTY NOTE above for real
    pyiqa checkpoints)."""
    def t(x):
        return jnp.asarray(np.asarray(x))

    def lin(prefix):
        return {"kernel": t(sd[prefix + ".weight"]).T,
                "bias": t(sd[prefix + ".bias"])}

    def ln(prefix):
        return {"scale": t(sd[prefix + ".weight"]),
                "bias": t(sd[prefix + ".bias"])}

    def gn(prefix):
        return {"scale": t(sd[prefix + ".weight"]),
                "bias": t(sd[prefix + ".bias"])}

    def conv(prefix):
        return {"kernel": t(sd[prefix + ".weight"]).transpose(2, 3, 1, 0),
                "bias": t(sd[prefix + ".bias"])}

    def block(prefix):
        return {"gn1": gn(prefix + ".gn1"), "conv1": conv(prefix + ".conv1"),
                "gn2": gn(prefix + ".gn2"), "conv2": conv(prefix + ".conv2")}

    p: Dict[str, Any] = {
        "patch_encoder": {
            "conv_root": conv("patch_encoder.conv_root"),
            "gn_root": gn("patch_encoder.gn_root"),
            "block1": block("patch_encoder.block1"),
            "block2": block("patch_encoder.block2"),
            "embed": lin("patch_encoder.embed"),
        },
        "spatial_embed": t(sd["spatial_embed"]),
        "scale_embed": t(sd["scale_embed"]),
        "cls_token": t(sd["cls_token"]),
        "norm": ln("norm"),
        "head": lin("head"),
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


class MusiqScorer:
    """Per-video imaging_quality with the VBench protocol
    (imaging_quality.py:8-49): 'longer' preprocessing (longer side → 512
    if larger), per-frame MUSIQ score, frame mean, /100.

    Geometry is inferred from the params tree so tiny parity-test
    replicas work."""

    def __init__(self, params: Params):
        self.params = params
        dim = int(params["cls_token"].shape[-1])
        depth = sum(1 for k in params if str(k).startswith("block"))
        self.model = MUSIQ(
            dim=dim, depth=depth, heads=max(1, dim // 64),
            mlp_dim=int(params["block0"]["fc1"]["kernel"].shape[1]),
            num_scales=int(params["scale_embed"].shape[0]),
            stem_ch=int(
                params["patch_encoder"]["conv_root"]["kernel"].shape[-1]))
        self._fn = jax.jit(
            lambda p, pa, hi, si: self.model.apply({"params": p}, pa, hi,
                                                   si))

    def frame_score(self, frame01: np.ndarray) -> float:
        pa, hi, si = build_multiscale_input(frame01)
        return float(self._fn(self.params, jnp.asarray(pa),
                              jnp.asarray(hi), jnp.asarray(si)))

    def video_score(self, video: np.ndarray,
                    preprocess: str = "longer") -> float:
        """video (T, H, W, 3) in [-1, 1] or uint8 → mean MUSIQ / 100."""
        import cv2
        v = np.asarray(video)
        if v.dtype != np.uint8:
            v = np.clip((v + 1.0) * 127.5, 0, 255).astype(np.uint8)
        t, h, w, _ = v.shape
        frames = v.astype(np.float32)
        if preprocess == "longer" and max(h, w) > 512:
            s = 512.0 / max(h, w)
            frames = np.stack([cv2.resize(f, (int(s * w), int(s * h)),
                                          interpolation=cv2.INTER_AREA)
                               for f in frames])
        elif preprocess.startswith("shorter") and min(h, w) > 512:
            s = 512.0 / min(h, w)
            frames = np.stack([cv2.resize(f, (int(s * w), int(s * h)),
                                          interpolation=cv2.INTER_AREA)
                               for f in frames])
        frames = frames / 255.0
        scores = [self.frame_score(f) for f in frames]
        return float(np.mean(scores)) / 100.0
