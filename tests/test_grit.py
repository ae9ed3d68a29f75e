"""GRiT perception stack: geometric-op oracles + whole-trunk torch parity.

detectron2 is not installed in this environment, so the reference GRiT
modules (eval/vbench/third_party/grit_src/) cannot be imported directly.
Parity strategy (the stepvideo/mochi pattern from PARITY.md): a verbatim
torch replica of the reference forward semantics is built HERE as a test
fixture — patch embed, bicubic abs-pos interpolation, windowed/global
rel-pos attention, ViT FPN (transposed conv), CenterNet tower, cascade
box heads and the BERT text decoder — its state dict uses the exact
reference key layout, goes through ``convert_grit_state_dict``, and the
JAX forward must match the torch forward. RoIAlignV2 and NMS are checked
against independent brute-force oracles.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from videotuna_tpu.evalkit.grit import (GRiTDetector, GRiTTextDecoder,
                                        _GRiTDense, apply_deltas,
                                        assign_fpn_levels,
                                        convert_grit_state_dict,
                                        init_grit_params, nms, roi_align_np)

torch.manual_seed(0)


# --------------------------------------------------------------- op oracles
def _roi_align_scalar(feat, box, out_size, scale):
    """Literal per-sample RoIAlignV2 (aligned=True, sampling_ratio=0)."""
    h, w, c = feat.shape
    x0, y0, x1, y1 = box * scale - 0.5
    roi_w, roi_h = x1 - x0, y1 - y0
    bw, bh = roi_w / out_size, roi_h / out_size
    nh = max(int(math.ceil(roi_h / out_size)), 1)
    nw = max(int(math.ceil(roi_w / out_size)), 1)
    out = np.zeros((out_size, out_size, c), np.float64)
    for py in range(out_size):
        for px in range(out_size):
            acc = np.zeros(c)
            for sy in range(nh):
                for sx in range(nw):
                    y = y0 + (py + (sy + 0.5) / nh) * bh
                    x = x0 + (px + (sx + 0.5) / nw) * bw
                    if y < -1.0 or y > h or x < -1.0 or x > w:
                        continue
                    y_, x_ = min(max(y, 0.0), h - 1), min(max(x, 0.0), w - 1)
                    yl, xl = int(y_), int(x_)
                    yh_, xh_ = min(yl + 1, h - 1), min(xl + 1, w - 1)
                    wy, wx = y_ - yl, x_ - xl
                    acc += (feat[yl, xl] * (1 - wy) * (1 - wx)
                            + feat[yl, xh_] * (1 - wy) * wx
                            + feat[yh_, xl] * wy * (1 - wx)
                            + feat[yh_, xh_] * wy * wx)
            out[py, px] = acc / (nh * nw)
    return out


def test_roi_align_matches_scalar_oracle():
    rng = np.random.RandomState(1)
    feat = rng.randn(9, 11, 3).astype(np.float32)
    boxes = np.array([[4.0, 2.0, 60.0, 50.0],     # grid 1x1
                      [1.0, 1.0, 170.0, 150.0],   # grid >= 3
                      [-8.0, -4.0, 30.0, 28.0],   # partially outside
                      [10.0, 12.0, 100.0, 90.0]], np.float64)
    got = roi_align_np(feat, boxes, 7, 1.0 / 8.0)
    for i, b in enumerate(boxes):
        exp = _roi_align_scalar(feat, b, 7, 1.0 / 8.0)
        np.testing.assert_allclose(got[i], exp, atol=1e-4, rtol=1e-4)


def test_nms_matches_bruteforce():
    rng = np.random.RandomState(2)
    n = 60
    xy = rng.rand(n, 2) * 40
    wh = rng.rand(n, 2) * 30 + 2
    boxes = np.concatenate([xy, xy + wh], axis=1)
    scores = rng.rand(n)

    def brute(boxes, scores, th):
        idx = np.argsort(-scores, kind="stable").tolist()
        keep = []
        while idx:
            i = idx.pop(0)
            keep.append(i)
            rem = []
            for j in idx:
                xx0 = max(boxes[i, 0], boxes[j, 0])
                yy0 = max(boxes[i, 1], boxes[j, 1])
                xx1 = min(boxes[i, 2], boxes[j, 2])
                yy1 = min(boxes[i, 3], boxes[j, 3])
                inter = max(xx1 - xx0, 0) * max(yy1 - yy0, 0)
                a = ((boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
                     + (boxes[j, 2] - boxes[j, 0])
                     * (boxes[j, 3] - boxes[j, 1]) - inter)
                if inter / max(a, 1e-12) <= th:
                    rem.append(j)
            idx = rem
        return np.array(keep)

    np.testing.assert_array_equal(nms(boxes, scores, 0.5),
                                  brute(boxes, scores, 0.5))


def test_apply_deltas_and_levels():
    boxes = np.array([[10.0, 10.0, 50.0, 30.0]])
    out = apply_deltas(np.zeros((1, 4)), boxes, (10.0, 10.0, 5.0, 5.0))
    np.testing.assert_allclose(out, boxes, atol=1e-6)
    # dw = 5*log(2) doubles the width around the center
    out = apply_deltas(np.array([[0.0, 0.0, 5.0 * math.log(2.0), 0.0]]),
                       boxes, (10.0, 10.0, 5.0, 5.0))
    np.testing.assert_allclose(out[0], [-10.0, 10.0, 70.0, 30.0], atol=1e-4)
    # level assignment: a 224x224 box goes to the canonical level (p4)
    lv = assign_fpn_levels(np.array([[0.0, 0.0, 224.0, 224.0],
                                     [0.0, 0.0, 40.0, 40.0],
                                     [0.0, 0.0, 2000.0, 2000.0]]))
    assert lv.tolist() == [1, 0, 2]


# --------------------------------------------------- torch replica fixtures
class TorchViTAttention(nn.Module):
    """vit.py:35-101 verbatim semantics."""

    def __init__(self, dim, heads, input_size):
        super().__init__()
        self.num_heads = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.rel_pos_h = nn.Parameter(
            torch.randn(2 * input_size - 1, dim // heads) * 0.1)
        self.rel_pos_w = nn.Parameter(
            torch.randn(2 * input_size - 1, dim // heads) * 0.1)

    @staticmethod
    def _get_rel_pos(q_size, k_size, rel_pos):
        max_rel = 2 * max(q_size, k_size) - 1
        if rel_pos.shape[0] != max_rel:
            rel_pos = F.interpolate(
                rel_pos.reshape(1, rel_pos.shape[0], -1).permute(0, 2, 1),
                size=max_rel, mode="linear",
            ).reshape(-1, max_rel).permute(1, 0)
        q = torch.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
        k = torch.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
        rel = (q - k) + (k_size - 1) * max(q_size / k_size, 1.0)
        return rel_pos[rel.long()]

    def forward(self, x):
        b, h, w, _ = x.shape
        qkv = self.qkv(x).reshape(b, h * w, 3, self.num_heads, -1) \
            .permute(2, 0, 3, 1, 4)
        q, k, v = qkv.reshape(3, b * self.num_heads, h * w, -1).unbind(0)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        rh = self._get_rel_pos(h, h, self.rel_pos_h)
        rw = self._get_rel_pos(w, w, self.rel_pos_w)
        rq = q.reshape(-1, h, w, q.shape[-1])
        rel_h = torch.einsum("bhwc,hkc->bhwk", rq, rh)
        rel_w = torch.einsum("bhwc,wkc->bhwk", rq, rw)
        attn = (attn.view(-1, h, w, h, w) + rel_h[:, :, :, :, None]
                + rel_w[:, :, :, None, :]).view(-1, h * w, h * w)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).view(b, self.num_heads, h, w, -1) \
            .permute(0, 2, 3, 1, 4).reshape(b, h, w, -1)
        return self.proj(x)


class TorchMlp(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.fc1 = nn.Linear(dim, dim * 4)
        self.fc2 = nn.Linear(dim * 4, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


def _win_part(x, ws):
    b, h, w, c = x.shape
    ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
    if ph or pw:
        x = F.pad(x, (0, 0, 0, pw, 0, ph))
    hp, wp = h + ph, w + pw
    x = x.view(b, hp // ws, ws, wp // ws, ws, c)
    return (x.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, ws, ws, c),
            (hp, wp))


def _win_unpart(win, ws, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = win.shape[0] // (hp * wp // ws // ws)
    x = win.view(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.permute(0, 1, 3, 2, 4, 5).contiguous().view(b, hp, wp, -1)
    return x[:, :h, :w]


class TorchViTBlock(nn.Module):
    def __init__(self, dim, heads, window, img_tokens):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TorchViTAttention(
            dim, heads, window if window else img_tokens)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = TorchMlp(dim)
        self.window_size = window

    def forward(self, x):
        shortcut = x
        x = self.norm1(x)
        if self.window_size > 0:
            h, w = x.shape[1], x.shape[2]
            x, pad_hw = _win_part(x, self.window_size)
        x = self.attn(x)
        if self.window_size > 0:
            x = _win_unpart(x, self.window_size, pad_hw, (h, w))
        x = shortcut + x
        return x + self.mlp(self.norm2(x))


class TorchViT(nn.Module):
    """vit.py ViT-B/16 + ViT_FPN + LastLevelP6P7_P5 + CenterNetHead,
    packaged under the reference's GeneralizedRCNN key prefixes."""

    def __init__(self, dim=768, depth=12, heads=12):
        super().__init__()

        class BottomUp(nn.Module):
            def __init__(self):
                super().__init__()
                self.patch_embed = nn.ModuleDict(
                    {"proj": nn.Conv2d(3, dim, 16, 16)})
                self.pos_embed = nn.Parameter(
                    torch.randn(1, 14 * 14 + 1, dim) * 0.02)
                self.blocks = nn.ModuleList([
                    TorchViTBlock(dim, heads,
                                  0 if i in (2, 5, 8, 11) else 14, 64)
                    for i in range(depth)])

            def forward(self, x):
                x = self.patch_embed["proj"](x).permute(0, 2, 3, 1)
                pos = self.pos_embed[:, 1:]
                size = 14
                if (size, size) != (x.shape[1], x.shape[2]):
                    pos = F.interpolate(
                        pos.reshape(1, size, size, -1).permute(0, 3, 1, 2),
                        size=(x.shape[1], x.shape[2]), mode="bicubic",
                        align_corners=False).permute(0, 2, 3, 1)
                else:
                    pos = pos.reshape(1, size, size, -1)
                x = x + pos
                for blk in self.blocks:
                    x = blk(x)
                return x.permute(0, 3, 1, 2)

        self.bottom_up = BottomUp()
        oc = 256
        self.fpn_stride_16_8 = nn.ConvTranspose2d(dim, dim, 2, 2,
                                                  bias=False)
        for s in (8, 16, 32):
            setattr(self, f"fpn_stride{s}_conv1",
                    nn.Conv2d(dim, oc, 1, bias=False))
            setattr(self, f"fpn_stride{s}_norm1", nn.LayerNorm(oc))
            setattr(self, f"fpn_stride{s}_conv2",
                    nn.Conv2d(oc, oc, 3, padding=1, bias=False))
            setattr(self, f"fpn_stride{s}_norm2", nn.LayerNorm(oc))
        self.top_block = nn.ModuleDict({
            "p6": nn.Conv2d(oc, oc, 3, 2, 1),
            "p7": nn.Conv2d(oc, oc, 3, 2, 1)})
        self.maxpool = nn.MaxPool2d(2, stride=2)

    def forward(self, x):
        feat = self.bottom_up(x)

        def lateral(y, s):
            y = getattr(self, f"fpn_stride{s}_conv1")(y)
            y = getattr(self, f"fpn_stride{s}_norm1")(
                y.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
            y = getattr(self, f"fpn_stride{s}_conv2")(y)
            return getattr(self, f"fpn_stride{s}_norm2")(
                y.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)

        p3 = lateral(self.fpn_stride_16_8(feat), 8)
        p4 = lateral(feat, 16)
        p5 = lateral(self.maxpool(feat), 32)
        p6 = self.top_block["p6"](p5)
        p7 = self.top_block["p7"](F.relu(p6))
        return [p3, p4, p5, p6, p7]


class TorchCenterNetHead(nn.Module):
    def __init__(self, c=256, levels=5):
        super().__init__()
        tower = []
        for _ in range(4):
            tower += [nn.Conv2d(c, c, 3, padding=1),
                      nn.GroupNorm(32, c), nn.ReLU()]
        self.bbox_tower = nn.Sequential(*tower)
        self.bbox_pred = nn.Conv2d(c, 4, 3, padding=1)
        self.agn_hm = nn.Conv2d(c, 1, 3, padding=1)
        self.scales = nn.ModuleList()
        for _ in range(levels):
            m = nn.Module()
            m.scale = nn.Parameter(torch.tensor([1.0 + 0.1 * len(
                self.scales)]))
            self.scales.append(m)

    def forward(self, feats):
        regs, hms = [], []
        for lvl, f in enumerate(feats):
            y = self.bbox_tower(f)
            hms.append(self.agn_hm(y))
            regs.append(F.relu(self.bbox_pred(y) * self.scales[lvl].scale))
        return regs, hms


@pytest.fixture(scope="module")
def dense_pair():
    torch.manual_seed(3)
    backbone = TorchViT().eval()
    head = TorchCenterNetHead().eval()
    sd = {}
    for k, v in backbone.state_dict().items():
        sd[f"backbone.{k}"] = v.numpy()
    for k, v in head.state_dict().items():
        sd[f"proposal_generator.centernet_head.{k}"] = v.numpy()
    return backbone, head, sd


def test_dense_trunk_torch_parity(dense_pair):
    """Whole dense trunk (ViT-B + FPN + CenterNet head) vs the torch
    replica, including bicubic abs-pos and linear rel-pos interpolation
    (image 96x64 -> 6x4 tokens != 14x14 pretrain grid)."""
    backbone, head, sd = dense_pair
    # text/cascade params unused here — only dense keys needed
    params = convert_grit_state_dict(_with_aux_keys(sd))["dense"]
    img = np.random.RandomState(4).rand(1, 96, 64, 3).astype(np.float32)

    with torch.no_grad():
        fpn_t = backbone(torch.from_numpy(img).permute(0, 3, 1, 2))
        regs_t, hms_t = head(fpn_t)

    fpn_j, regs_j, hms_j = _GRiTDense().apply({"params": params},
                                              jnp.asarray(img))
    for a, b in zip(fpn_j, fpn_t):
        np.testing.assert_allclose(
            np.asarray(a), b.permute(0, 2, 3, 1).numpy(),
            atol=2e-4, rtol=2e-4)
    for a, b in zip(regs_j, regs_t):
        np.testing.assert_allclose(
            np.asarray(a), b.permute(0, 2, 3, 1).numpy(),
            atol=2e-4, rtol=2e-4)
    for a, b in zip(hms_j, hms_t):
        np.testing.assert_allclose(
            np.asarray(a), b.permute(0, 2, 3, 1).numpy(),
            atol=2e-4, rtol=2e-4)


# ----------------------------------------------------- text decoder replica
class TorchBertLayer(nn.Module):
    def __init__(self, dim=768, heads=12, ffn=3072):
        super().__init__()
        self.heads = heads
        att = nn.ModuleDict({
            "self": nn.ModuleDict({"query": nn.Linear(dim, dim),
                                   "key": nn.Linear(dim, dim),
                                   "value": nn.Linear(dim, dim)}),
            "output": nn.ModuleDict({"dense": nn.Linear(dim, dim),
                                     "LayerNorm": nn.LayerNorm(
                                         dim, eps=1e-12)})})
        self.attention = att
        self.intermediate = nn.ModuleDict({"dense": nn.Linear(dim, ffn)})
        self.output = nn.ModuleDict({"dense": nn.Linear(ffn, dim),
                                     "LayerNorm": nn.LayerNorm(
                                         dim, eps=1e-12)})

    def forward(self, x, mask):
        b, s, d = x.shape
        hd = d // self.heads

        def split(t):
            return t.view(b, s, self.heads, hd).permute(0, 2, 1, 3)
        q = split(self.attention["self"]["query"](x))
        k = split(self.attention["self"]["key"](x))
        v = split(self.attention["self"]["value"](x))
        a = q @ k.transpose(-1, -2) / math.sqrt(hd) + mask
        a = a.softmax(dim=-1)
        o = (a @ v).permute(0, 2, 1, 3).reshape(b, s, d)
        x = self.attention["output"]["LayerNorm"](
            self.attention["output"]["dense"](o) + x)
        y = F.gelu(self.intermediate["dense"](x))
        return self.output["LayerNorm"](self.output["dense"](y) + x)


class TorchTextualHead(nn.Module):
    """text_decoder.py TransformerDecoderTextualHead + BertEncoderAsDecoder
    semantics: concat [memory; text], block mask, tied output."""

    def __init__(self, vocab=300, dim=768, layers=2):
        super().__init__()
        self.object_feature_projection = nn.Sequential(
            nn.Linear(256, dim), nn.LayerNorm(dim))
        self.embedding = nn.ModuleDict({
            "words": nn.Embedding(vocab, dim),
            "positions": nn.Embedding(1024, dim),
            "layer_norm": nn.LayerNorm(dim, eps=1e-8)})
        enc = nn.ModuleDict({"layer": nn.ModuleList(
            [TorchBertLayer() for _ in range(layers)])})
        self.transformer = nn.ModuleDict({"encoder": enc})
        self.output = nn.Linear(dim, vocab)
        self.output.weight = self.embedding["words"].weight

    def forward(self, obj_feats, tokens):
        mem = self.object_feature_projection(obj_feats)
        t = tokens.shape[1]
        emb = self.embedding["words"](tokens) + \
            self.embedding["positions"].weight[None, :t]
        emb = self.embedding["layer_norm"](emb)
        m = mem.shape[1]
        s = m + t
        mask = torch.zeros(s, s)
        mask[:m, m:] = float("-inf")
        mask[m:, m:] = torch.triu(torch.full((t, t), float("-inf")), 1)
        x = torch.cat([mem, emb], dim=1)
        for lyr in self.transformer["encoder"]["layer"]:
            x = lyr(x, mask[None, None])
        return self.output(x[:, m:])


def _with_aux_keys(sd, text_sd=None, cascade_sd=None):
    """Pad a partial state dict with zero tensors for the other trees so
    convert_grit_state_dict can run (the map reads fixed keys)."""
    full = dict(sd)

    def zeros(shape):
        return np.zeros(shape, np.float32)

    if cascade_sd is not None:
        full.update(cascade_sd)
    else:
        for k in range(3):
            full[f"roi_heads.box_head.{k}.fc1.weight"] = zeros((1024,
                                                                12544))
            full[f"roi_heads.box_head.{k}.fc1.bias"] = zeros((1024,))
            full[f"roi_heads.box_head.{k}.fc2.weight"] = zeros((1024, 1024))
            full[f"roi_heads.box_head.{k}.fc2.bias"] = zeros((1024,))
            p = f"roi_heads.box_predictor.{k}"
            full[f"{p}.cls_score.weight"] = zeros((2, 1024))
            full[f"{p}.cls_score.bias"] = zeros((2,))
            full[f"{p}.bbox_pred.0.weight"] = zeros((1024, 1024))
            full[f"{p}.bbox_pred.0.bias"] = zeros((1024,))
            full[f"{p}.bbox_pred.2.weight"] = zeros((4, 1024))
            full[f"{p}.bbox_pred.2.bias"] = zeros((4,))
    if text_sd is not None:
        full.update(text_sd)
    else:
        tx = "roi_heads.text_decoder.textual"
        full[f"{tx}.object_feature_projection.0.weight"] = zeros((768, 256))
        full[f"{tx}.object_feature_projection.0.bias"] = zeros((768,))
        full[f"{tx}.object_feature_projection.1.weight"] = zeros((768,))
        full[f"{tx}.object_feature_projection.1.bias"] = zeros((768,))
        full[f"{tx}.embedding.words.weight"] = zeros((30522, 768))
        full[f"{tx}.embedding.positions.weight"] = zeros((1024, 768))
        full[f"{tx}.embedding.layer_norm.weight"] = zeros((768,))
        full[f"{tx}.embedding.layer_norm.bias"] = zeros((768,))
        full[f"{tx}.output.weight"] = zeros((30522, 768))
        full[f"{tx}.output.bias"] = zeros((30522,))
        for i in range(6):
            b = f"{tx}.transformer.encoder.layer.{i}"
            for qkv in ("query", "key", "value"):
                full[f"{b}.attention.self.{qkv}.weight"] = zeros((768, 768))
                full[f"{b}.attention.self.{qkv}.bias"] = zeros((768,))
            full[f"{b}.attention.output.dense.weight"] = zeros((768, 768))
            full[f"{b}.attention.output.dense.bias"] = zeros((768,))
            full[f"{b}.attention.output.LayerNorm.weight"] = zeros((768,))
            full[f"{b}.attention.output.LayerNorm.bias"] = zeros((768,))
            full[f"{b}.intermediate.dense.weight"] = zeros((3072, 768))
            full[f"{b}.intermediate.dense.bias"] = zeros((3072,))
            full[f"{b}.output.dense.weight"] = zeros((768, 3072))
            full[f"{b}.output.dense.bias"] = zeros((768,))
            full[f"{b}.output.LayerNorm.weight"] = zeros((768,))
            full[f"{b}.output.LayerNorm.bias"] = zeros((768,))
    # minimal dense keys if absent (text/cascade-only tests)
    if "backbone.bottom_up.pos_embed" not in full:
        raise AssertionError("dense keys required")
    return full


def test_text_decoder_torch_parity(dense_pair):
    torch.manual_seed(5)
    replica = TorchTextualHead(vocab=300, layers=2).eval()
    text_sd = {f"roi_heads.text_decoder.textual.{k}": v.numpy()
               for k, v in replica.state_dict().items()}
    _, _, dsd = dense_pair
    params = convert_grit_state_dict(_with_aux_keys(dsd,
                                                    text_sd=text_sd))
    feats = np.random.RandomState(6).rand(2, 9, 256).astype(np.float32)
    toks = np.array([[101, 5, 17, 23], [101, 8, 2, 0]], np.int64)

    with torch.no_grad():
        ref = replica(torch.from_numpy(feats), torch.from_numpy(toks))

    dec = GRiTTextDecoder(vocab=300, layers=2)
    got = dec.apply({"params": params["text"]}, jnp.asarray(feats),
                    jnp.asarray(toks.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-4,
                               rtol=2e-4)


class TorchCascadeStage(nn.Module):
    def __init__(self):
        super().__init__()
        self.fc1 = nn.Linear(12544, 1024)
        self.fc2 = nn.Linear(1024, 1024)
        self.cls_score = nn.Linear(1024, 2)
        self.bbox_pred = nn.Sequential(nn.Linear(1024, 1024), nn.ReLU(),
                                       nn.Linear(1024, 4))

    def forward(self, pooled_nchw):
        x = torch.flatten(pooled_nchw, start_dim=1)
        x = F.relu(self.fc1(x))
        x = F.relu(self.fc2(x))
        return self.cls_score(x), self.bbox_pred(x)


def test_cascade_stage_torch_parity(dense_pair):
    torch.manual_seed(7)
    stages = [TorchCascadeStage().eval() for _ in range(3)]
    csd = {}
    for k, st in enumerate(stages):
        sd = st.state_dict()
        csd[f"roi_heads.box_head.{k}.fc1.weight"] = sd["fc1.weight"].numpy()
        csd[f"roi_heads.box_head.{k}.fc1.bias"] = sd["fc1.bias"].numpy()
        csd[f"roi_heads.box_head.{k}.fc2.weight"] = sd["fc2.weight"].numpy()
        csd[f"roi_heads.box_head.{k}.fc2.bias"] = sd["fc2.bias"].numpy()
        p = f"roi_heads.box_predictor.{k}"
        csd[f"{p}.cls_score.weight"] = sd["cls_score.weight"].numpy()
        csd[f"{p}.cls_score.bias"] = sd["cls_score.bias"].numpy()
        csd[f"{p}.bbox_pred.0.weight"] = sd["bbox_pred.0.weight"].numpy()
        csd[f"{p}.bbox_pred.0.bias"] = sd["bbox_pred.0.bias"].numpy()
        csd[f"{p}.bbox_pred.2.weight"] = sd["bbox_pred.2.weight"].numpy()
        csd[f"{p}.bbox_pred.2.bias"] = sd["bbox_pred.2.bias"].numpy()
    _, _, dsd = dense_pair
    params = convert_grit_state_dict(_with_aux_keys(dsd, cascade_sd=csd))

    pooled = np.random.RandomState(8).rand(5, 7, 7, 256).astype(np.float32)
    from videotuna_tpu.evalkit.grit import CascadeBoxStage
    for k in range(3):
        with torch.no_grad():
            s_ref, d_ref = stages[k](
                torch.from_numpy(pooled).permute(0, 3, 1, 2))
        s, d = CascadeBoxStage().apply(
            {"params": params["cascade"][f"stage{k}"]}, jnp.asarray(pooled))
        np.testing.assert_allclose(np.asarray(s), s_ref.numpy(), atol=2e-4,
                                   rtol=2e-4)
        np.testing.assert_allclose(np.asarray(d), d_ref.numpy(), atol=2e-4,
                                   rtol=2e-4)


def test_detector_end_to_end_smoke():
    """Random weights through the whole pipeline: runs, returns a list of
    (desc, box, det_names, score) with in-image boxes."""
    p = init_grit_params(jax.random.key(0))
    det = GRiTDetector(p, max_det=4)
    frame = (np.random.RandomState(9).rand(64, 96, 3) * 255).astype(
        np.uint8)
    out = det.detect(frame)
    assert isinstance(out, list)
    for desc, box, names, score in out:
        assert 0 <= box[0] <= 96 and 0 <= box[3] <= 64
        assert isinstance(desc, str) and isinstance(names, list)
        assert 0.0 <= score <= 1.0
