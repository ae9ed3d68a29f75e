"""DINO ViT parity: JAX DINOViT + convert_dino_state_dict vs a torch
replica of the torch.hub facebookresearch/dino dino_vitb16 forward
(reference loads it at eval/vbench/subject_consistency.py:84; the hub
module itself is not vendored in /root/reference, so the oracle is a
from-scratch torch module following the published DINO forward: qkv-fused
pre-LN ViT + interpolate_pos_encoding with the (w0+0.1)/sqrt(N)
scale_factor quirk)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from videotuna_tpu.evalkit.dino import (DINOViT, _bicubic_scale_axis,
                                        convert_dino_state_dict,
                                        interpolate_pos_encoding)

DIM, DEPTH, HEADS, PATCH = 96, 2, 4, 16


class TorchBlock(tnn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = tnn.LayerNorm(DIM, eps=1e-6)
        self.attn_qkv = tnn.Linear(DIM, DIM * 3)
        self.attn_proj = tnn.Linear(DIM, DIM)
        self.norm2 = tnn.LayerNorm(DIM, eps=1e-6)
        self.fc1 = tnn.Linear(DIM, DIM * 4)
        self.fc2 = tnn.Linear(DIM * 4, DIM)

    def forward(self, x):
        b, n, c = x.shape
        h = self.norm1(x)
        qkv = self.attn_qkv(h).reshape(b, n, 3, HEADS, c // HEADS) \
            .permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = (q @ k.transpose(-2, -1)) * (1.0 / math.sqrt(c // HEADS))
        att = att.softmax(dim=-1)
        o = (att @ v).transpose(1, 2).reshape(b, n, c)
        x = x + self.attn_proj(o)
        h = self.norm2(x)
        return x + self.fc2(F.gelu(self.fc1(h)))


class TorchDINO(tnn.Module):
    """Mirrors hub vision_transformer.VisionTransformer.forward for
    feature extraction (returns CLS after final norm)."""

    def __init__(self):
        super().__init__()
        self.patch_embed = tnn.Conv2d(3, DIM, PATCH, PATCH)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, DIM) * 0.02)
        self.pos_embed = tnn.Parameter(
            torch.randn(1, (224 // PATCH) ** 2 + 1, DIM) * 0.02)
        self.blocks = tnn.ModuleList([TorchBlock() for _ in range(DEPTH)])
        self.norm = tnn.LayerNorm(DIM, eps=1e-6)

    def interpolate_pos_encoding(self, x, w, h):
        npatch = x.shape[1] - 1
        n = self.pos_embed.shape[1] - 1
        if npatch == n and w == h:
            return self.pos_embed
        class_pos = self.pos_embed[:, 0]
        patch_pos = self.pos_embed[:, 1:]
        dim = x.shape[-1]
        w0, h0 = w // PATCH, h // PATCH
        w0f, h0f = w0 + 0.1, h0 + 0.1
        size = int(math.sqrt(n))
        patch_pos = F.interpolate(
            patch_pos.reshape(1, size, size, dim).permute(0, 3, 1, 2),
            scale_factor=(h0f / size, w0f / size), mode="bicubic")
        patch_pos = patch_pos.permute(0, 2, 3, 1).view(1, -1, dim)
        return torch.cat((class_pos.unsqueeze(0), patch_pos), dim=1)

    def forward(self, x):
        b, c, h, w = x.shape
        x = self.patch_embed(x).flatten(2).transpose(1, 2)
        cls = self.cls_token.expand(b, -1, -1)
        x = torch.cat((cls, x), dim=1)
        x = x + self.interpolate_pos_encoding(x, w, h)
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)[:, 0]


def _state_dict(m):
    sd = {}
    ren = {"attn_qkv": "attn.qkv", "attn_proj": "attn.proj",
           "fc1": "mlp.fc1", "fc2": "mlp.fc2",
           "patch_embed": "patch_embed.proj"}
    for k, v in m.state_dict().items():
        for old, new in ren.items():
            if old in k:
                k = k.replace(old, new)
        sd[k] = v.numpy()
    return sd


def test_bicubic_scale_semantics():
    """_bicubic_scale_axis matches F.interpolate(scale_factor=…) —
    including the non-identity resample at scale (14+0.1)/14."""
    x = np.random.RandomState(0).randn(1, 14, 14, 8).astype(np.float32)
    for scale in ((14 + 0.1) / 14, (17 + 0.1) / 14, (9 + 0.1) / 14):
        ref = F.interpolate(torch.tensor(x).permute(0, 3, 1, 2),
                            scale_factor=(scale, 1.0), mode="bicubic")
        ref = ref.permute(0, 2, 3, 1).numpy()
        got = np.asarray(_bicubic_scale_axis(jnp.asarray(x), scale, 1))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("hw", [(224, 224), (224, 272)])
def test_dino_whole_model_parity(hw):
    torch.manual_seed(0)
    ref = TorchDINO().eval()
    params = convert_dino_state_dict(_state_dict(ref))
    model = DINOViT(dim=DIM, depth=DEPTH, heads=HEADS, patch=PATCH)
    h, w = hw
    x = np.random.RandomState(1).randn(2, h, w, 3).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-3)


def test_subject_consistency_score_protocol():
    """Identical frames → 1.0; the formula clamps negatives at 0."""
    from videotuna_tpu.evalkit.dino import subject_consistency_score
    torch.manual_seed(0)
    ref = TorchDINO()
    params = convert_dino_state_dict(_state_dict(ref))
    vid = np.broadcast_to(
        np.random.RandomState(2).rand(1, 64, 64, 3).astype(np.float32)
        * 2 - 1, (3, 64, 64, 3))
    # tiny model params but full-size protocol: must run and be ~1.0
    model_params = params
    score = subject_consistency_score(vid, model_params)
    assert 0.99 <= score <= 1.0 + 1e-6
