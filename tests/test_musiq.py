"""MUSIQ parity: JAX MUSIQ + convert_musiq_state_dict vs a torch twin.

pyiqa (the reference's MUSIQ provider, eval/vbench/imaging_quality.py:2)
is not installed and not vendored in /root/reference, so — unlike the
RAFT/AMT/ViCLIP/UMT/GRiT parity suites — the oracle here is a torch twin
of this repo's paper-derived architecture (see the HONESTY NOTE in
videotuna_tpu/evalkit/musiq.py). The test gates the JAX translation:
weight-standardized convs, TF-SAME padding, GN, hash/scale embeddings,
pre-LN transformer, CLS regression head."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from videotuna_tpu.evalkit.musiq import (HASH_GRID, MUSIQ, MusiqScorer,
                                         build_multiscale_input,
                                         convert_musiq_state_dict)

DIM, DEPTH, HEADS, MLP, CH, SCALES = 64, 2, 2, 128, 32, 3


class TorchWSConv(tnn.Conv2d):
    """Weight-standardized conv with explicit TF-SAME padding."""

    def __init__(self, cin, cout, k, stride=1):
        super().__init__(cin, cout, k, stride, padding=0)
        self.k, self.s = k, stride

    def forward(self, x):
        w = self.weight
        v, m = torch.var_mean(w, dim=[1, 2, 3], keepdim=True,
                              unbiased=False)
        w = (w - m) / torch.sqrt(v + 1e-10)
        # TF-SAME: total pad = (ceil(in/s)-1)*s + k - in, extra on right
        h, wd = x.shape[-2:]
        for dim_len, idx in ((wd, 0), (h, 2)):
            out = math.ceil(dim_len / self.s)
            tot = max((out - 1) * self.s + self.k - dim_len, 0)
            pads = [0, 0, 0, 0]
            pads[idx], pads[idx + 1] = tot // 2, tot - tot // 2
            x = F.pad(x, pads)
        return F.conv2d(x, w, self.bias, self.s)


class TorchStemBlock(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.gn1 = tnn.GroupNorm(32, ch, eps=1e-5)
        self.conv1 = TorchWSConv(ch, ch, 3)
        self.gn2 = tnn.GroupNorm(32, ch, eps=1e-5)
        self.conv2 = TorchWSConv(ch, ch, 3)

    def forward(self, x):
        h = self.conv1(F.relu(self.gn1(x)))
        h = self.conv2(F.relu(self.gn2(h)))
        return x + h


class TorchBlock(tnn.Module):
    class A(tnn.Module):
        def __init__(self):
            super().__init__()
            self.qkv = tnn.Linear(DIM, DIM * 3)
            self.proj = tnn.Linear(DIM, DIM)

    class M(tnn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = tnn.Linear(DIM, MLP)
            self.fc2 = tnn.Linear(MLP, DIM)

    def __init__(self):
        super().__init__()
        self.norm1 = tnn.LayerNorm(DIM, eps=1e-6)
        self.attn = self.A()
        self.norm2 = tnn.LayerNorm(DIM, eps=1e-6)
        self.mlp = self.M()

    def forward(self, x):
        n, c = x.shape
        hd = c // HEADS
        qkv = self.attn.qkv(self.norm1(x)).reshape(n, 3, HEADS, hd) \
            .permute(1, 2, 0, 3)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = (q @ k.transpose(-2, -1)) / math.sqrt(hd)
        o = (att.softmax(-1) @ v).transpose(0, 1).reshape(n, c)
        x = x + self.attn.proj(o)
        h = self.norm2(x)
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(h)))


class TorchMUSIQ(tnn.Module):
    class PE(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv_root = TorchWSConv(3, CH, 7, 2)
            self.gn_root = tnn.GroupNorm(32, CH, eps=1e-5)
            self.block1 = TorchStemBlock(CH)
            self.block2 = TorchStemBlock(CH)
            self.embed = tnn.Linear(8 * 8 * CH, DIM)

        def forward(self, p):                    # (N, 3, 32, 32)
            h = F.relu(self.gn_root(self.conv_root(p)))
            h = F.max_pool2d(F.pad(h, (0, 1, 0, 1), value=-torch.inf),
                             3, 2)               # TF-SAME 16→8
            h = self.block2(self.block1(h))
            # match flax NHWC flatten order: (N, H, W, C) raster
            h = h.permute(0, 2, 3, 1).reshape(h.shape[0], -1)
            return self.embed(h)

    def __init__(self):
        super().__init__()
        self.patch_encoder = self.PE()
        self.spatial_embed = tnn.Parameter(
            torch.randn(HASH_GRID, HASH_GRID, DIM) * 0.02)
        self.scale_embed = tnn.Parameter(torch.randn(SCALES, DIM) * 0.02)
        self.cls_token = tnn.Parameter(torch.zeros(1, DIM))
        self.blocks = tnn.ModuleList([TorchBlock() for _ in range(DEPTH)])
        self.norm = tnn.LayerNorm(DIM, eps=1e-6)
        self.head = tnn.Linear(DIM, 1)

    def forward(self, patches, hash_idx, scale_idx):
        tok = self.patch_encoder(patches)
        tok = tok + self.spatial_embed[hash_idx[:, 0], hash_idx[:, 1]]
        tok = tok + self.scale_embed[scale_idx]
        x = torch.cat([self.cls_token, tok], dim=0)
        for b in self.blocks:
            x = b(x)
        return self.head(self.norm(x))[0, 0]


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    tm = TorchMUSIQ().eval()
    # perturb every parameter so zero-init heads can't mask bugs
    with torch.no_grad():
        for p in tm.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    params = convert_musiq_state_dict(
        {k: v.numpy() for k, v in tm.state_dict().items()})
    jm = MUSIQ(dim=DIM, depth=DEPTH, heads=HEADS, mlp_dim=MLP,
               num_scales=SCALES, stem_ch=CH)
    return tm, jm, params


def test_musiq_whole_model_parity(pair):
    tm, jm, params = pair
    rng = np.random.default_rng(1)
    pats = rng.uniform(0, 1, (12, 32, 32, 3)).astype(np.float32)
    hidx = rng.integers(0, HASH_GRID, (12, 2)).astype(np.int32)
    sidx = rng.integers(0, SCALES, (12,)).astype(np.int32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(pats).permute(0, 3, 1, 2),
                 torch.from_numpy(hidx).long(),
                 torch.from_numpy(sidx).long()).item()
    out = jm.apply({"params": params}, jnp.asarray(pats),
                   jnp.asarray(hidx), jnp.asarray(sidx))
    np.testing.assert_allclose(float(out), ref, atol=5e-4, rtol=5e-4)


def test_build_multiscale_input_geometry():
    pats, hidx, sidx = build_multiscale_input(
        np.zeros((100, 160, 3), np.float32), longer_sides=(64,))
    # native: ceil(100/32)*ceil(160/32)=4*5=20; 64-longer: 40x64 → 2*2=4
    assert pats.shape == (24, 32, 32, 3)
    assert sidx.tolist() == [0] * 20 + [1] * 4
    assert hidx.min() >= 0 and hidx.max() < HASH_GRID


def test_musiq_scorer_protocol(pair):
    _, _, params = pair
    scorer = MusiqScorer(params)
    video = np.random.default_rng(2).integers(
        0, 255, (2, 64, 96, 3)).astype(np.uint8)
    s = scorer.video_score(video)
    assert np.isfinite(s)
    assert s == scorer.video_score(video)  # deterministic
