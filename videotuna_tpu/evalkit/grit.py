"""GRiT dense-captioning / object-detection stack in JAX/flax — the VBench
perception backbone for ``object_class``, ``multiple_objects``,
``spatial_relationship`` and ``color``.

Weight-faithful reimplementation of the reference torch pipeline
(/root/reference/eval/vbench/third_party/grit_src/): a ViTDet ViT-B/16
backbone with windowed attention and decomposed relative positions
(grit/modeling/backbone/vit.py:264-380, utils.py:18-199), a simple FPN
(vit.py:383-490 + centernet2 fpn_p5.py LastLevelP6P7_P5), the CenterNet
proposal head (centernet2 dense_heads/centernet_head.py:24-177) with its
proposal decoding (dense_heads/centernet.py:661-822), a 3-stage cascade
of class-agnostic box heads (grit/modeling/roi_heads/grit_roi_heads.py:
176-300, grit_fast_rcnn.py:18-142) and the autoregressive BERT text
decoder over 14x14 RoI features (grit/modeling/text/text_decoder.py).

TPU-native structure: the dense compute (backbone, FPN, CenterNet head,
cascade stages, text-decoder steps) runs as fixed-shape jitted programs;
the irregular glue (candidate selection, NMS, beam bookkeeping) runs on
host numpy between them — proposals are padded to the reference's
POST_NMS_TOPK_TEST=256 so every jit sees static shapes. The reference's
detectron2 ops are re-derived, not wrapped: RoIAlignV2 as vectorized
bilinear gathers, NMS on host, Box2BoxTransform in numpy.

The reference runs frames at native resolution (predictor.py
SingleDefaultPredictor passes the unresized image) padded to /32 with
ImageNet pixel stats; we replicate that protocol.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Params = Any

PIXEL_MEAN = np.array([123.675, 116.280, 103.530], np.float32)
PIXEL_STD = np.array([58.395, 57.120, 57.375], np.float32)

# Base.yaml MODEL.CENTERNET + demo overrides (image_dense_captions.py:92-111)
CN_INFERENCE_TH = 1e-4
CN_PRE_NMS_TOPK = 1000
CN_POST_NMS_TOPK = 256
CN_NMS_TH = 0.9
FPN_STRIDES = (8, 16, 32, 64, 128)
CASCADE_DELTA_WEIGHTS = ((10.0, 10.0, 5.0, 5.0),
                        (20.0, 20.0, 10.0, 10.0),
                        (30.0, 30.0, 15.0, 15.0))
SCALE_CLAMP = math.log(1000.0 / 16.0)
SCORE_THRESH_TEST = 0.5      # demo confidence_threshold
NMS_THRESH_TEST = 0.5
DETECTIONS_PER_IMAGE = 256
BEGIN_TOKEN = {"ObjectDet": 101, "DenseCap": 104}  # grit_roi_heads.py:64-70
EOS_TOKEN = 102                                     # [SEP]
MAX_TEXT_STEPS = 40


# ------------------------------------------------------------------ interp
def _torch_linear_1d(table: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """F.interpolate(mode='linear', align_corners=False) on a (L, C) table
    (get_rel_pos, utils.py:83-91). Half-pixel sampling, edge clamp."""
    in_len = table.shape[0]
    if in_len == out_len:
        return table
    x = (jnp.arange(out_len, dtype=jnp.float32) + 0.5) * in_len / out_len - 0.5
    x0 = jnp.clip(jnp.floor(x), 0, in_len - 1)
    x1 = jnp.clip(x0 + 1, 0, in_len - 1)
    w = jnp.clip(x - x0, 0.0, 1.0)
    return (table[x0.astype(jnp.int32)] * (1 - w)[:, None]
            + table[x1.astype(jnp.int32)] * w[:, None])


def _cubic_kernel(t: jnp.ndarray, a: float = -0.75) -> jnp.ndarray:
    """Keys cubic convolution kernel with torch's a=-0.75."""
    at = jnp.abs(t)
    return jnp.where(
        at <= 1.0, (a + 2.0) * at ** 3 - (a + 3.0) * at ** 2 + 1.0,
        jnp.where(at < 2.0,
                  a * at ** 3 - 5.0 * a * at ** 2 + 8.0 * a * at - 4.0 * a,
                  0.0))


def _torch_bicubic_axis(x: jnp.ndarray, out_len: int, axis: int
                        ) -> jnp.ndarray:
    """One separable pass of F.interpolate(mode='bicubic',
    align_corners=False) (get_abs_pos, utils.py:155-165): half-pixel
    sampling, 4-tap Keys kernel a=-0.75, edge-clamped taps."""
    in_len = x.shape[axis]
    if in_len == out_len:
        return x
    pos = (jnp.arange(out_len, dtype=jnp.float32) + 0.5) * in_len / out_len \
        - 0.5
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


def interpolate_abs_pos(pos_embed: jnp.ndarray, h: int, w: int,
                        has_cls_token: bool = True) -> jnp.ndarray:
    """(1, N(+1), C) pretrain table -> (1, h, w, C), bicubic
    (utils.py get_abs_pos)."""
    if has_cls_token:
        pos_embed = pos_embed[:, 1:]
    n = pos_embed.shape[1]
    size = int(round(math.sqrt(n)))
    grid = pos_embed.reshape(1, size, size, -1)
    grid = _torch_bicubic_axis(grid, h, axis=1)
    grid = _torch_bicubic_axis(grid, w, axis=2)
    return grid


# ------------------------------------------------------------ ViT backbone
def _get_rel_pos(q_size: int, k_size: int, table: jnp.ndarray) -> jnp.ndarray:
    """utils.py:70-100 — resize table to 2*max-1 then gather by relative
    coordinate (q_size == k_size in this model)."""
    max_rel = 2 * max(q_size, k_size) - 1
    resized = _torch_linear_1d(table, max_rel)
    qc = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    kc = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (qc - kc) + (k_size - 1) * max(q_size / k_size, 1.0)
    return resized[rel.astype(jnp.int32)]


class ViTAttention(nn.Module):
    """vit.py:35-101 — qkv attention with decomposed rel-pos bias.
    ``table_size`` is the trained table length: 2*14-1 for window
    blocks, 2*(1024/16)-1 for global blocks (vit.py:330-345
    input_size)."""
    dim: int
    heads: int
    table_size: int

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        hd = self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.heads, hd)
        qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, b * self.heads,
                                                   h * w, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * (hd ** -0.5)) @ k.transpose(0, 2, 1)

        rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                           (self.table_size, hd))
        rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                           (self.table_size, hd))
        rh = _get_rel_pos(h, h, rel_h)
        rw = _get_rel_pos(w, w, rel_w)
        rq = q.reshape(b * self.heads, h, w, hd)
        bias_h = jnp.einsum("bhwc,hkc->bhwk", rq, rh)
        bias_w = jnp.einsum("bhwc,wkc->bhwk", rq, rw)
        attn = (attn.reshape(b * self.heads, h, w, h, w)
                + bias_h[:, :, :, :, None]
                + bias_w[:, :, :, None, :]).reshape(b * self.heads,
                                                    h * w, h * w)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).reshape(b, self.heads, h, w, hd)
        out = out.transpose(0, 2, 3, 1, 4).reshape(b, h, w, c)
        return nn.Dense(self.dim, name="proj")(out)


def _window_partition(x, ws):
    b, h, w, c = x.shape
    ph, pw = (-h) % ws, (-w) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    return (x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c), (hp, wp))


def _window_unpartition(win, ws, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = win.shape[0] // (hp * wp // ws // ws)
    x = win.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class ViTBlock(nn.Module):
    """vit.py:164-250 (no residual-conv blocks in the B config)."""
    dim: int
    heads: int
    window: int  # 0 = global

    @nn.compact
    def __call__(self, x):
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        table = 2 * (self.window if self.window > 0 else 64) - 1
        if self.window > 0:
            h, w = y.shape[1], y.shape[2]
            y, pad_hw = _window_partition(y, self.window)
        y = ViTAttention(self.dim, self.heads, table, name="attn")(y)
        if self.window > 0:
            y = _window_unpartition(y, self.window, pad_hw, (h, w))
        x = shortcut + y
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(self.dim * 4, name="mlp_fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="mlp_fc2")(y)
        return x + y


class ViTDet(nn.Module):
    """vit.py build_vit_fpn_backbone ViT-B/16: window 14 on blocks
    0,1,3,4,6,7,9,10; global on 2,5,8,11."""
    dim: int = 768
    depth: int = 12
    heads: int = 12
    window: int = 14
    global_blocks: Tuple[int, ...] = (2, 5, 8, 11)

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3) normalized
        x = nn.Conv(self.dim, (16, 16), strides=(16, 16), padding="VALID",
                    name="patch_embed")(x)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, 14 * 14 + 1, self.dim))
        x = x + interpolate_abs_pos(pos, x.shape[1], x.shape[2])
        for i in range(self.depth):
            win = 0 if i in self.global_blocks else self.window
            x = ViTBlock(self.dim, self.heads, win, name=f"block{i}")(x)
        return x  # (B, H/16, W/16, 768)


class ViTFPN(nn.Module):
    """vit.py:383-492 ViT_FPN + fpn_p5.py LastLevelP6P7_P5: single-scale
    ViT feature -> p3 (deconv x2), p4 (identity), p5 (maxpool /2),
    p6/p7 (strided convs from p5), each through 1x1-conv+LN+3x3-conv+LN."""
    out_channels: int = 256

    @nn.compact
    def __call__(self, feat):  # (B, H/16, W/16, 768)
        def lateral(x, name):
            x = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        name=f"{name}_conv1")(x)
            x = nn.LayerNorm(epsilon=1e-5, name=f"{name}_norm1")(x)
            x = nn.Conv(self.out_channels, (3, 3), padding=1,
                        use_bias=False, name=f"{name}_conv2")(x)
            return nn.LayerNorm(epsilon=1e-5, name=f"{name}_norm2")(x)

        up = nn.ConvTranspose(feat.shape[-1], (2, 2), strides=(2, 2),
                              use_bias=False, name="fpn_stride_16_8")(feat)
        p3 = lateral(up, "stride8")
        p4 = lateral(feat, "stride16")
        down = nn.max_pool(feat, (2, 2), strides=(2, 2))
        p5 = lateral(down, "stride32")
        p6 = nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                     name="top_p6")(p5)
        p7 = nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                     name="top_p7")(jax.nn.relu(p6))
        return [p3, p4, p5, p6, p7]


# ----------------------------------------------------------- CenterNet head
class CenterNetHead(nn.Module):
    """centernet_head.py:24-177 with only_proposal=True: a shared
    4x(conv3x3+GN32+relu) bbox tower, 3x3 agn_hm and bbox_pred outputs,
    a learnable per-level scale; reg = relu(scale * pred)."""
    channels: int = 256
    num_levels: int = 5
    num_convs: int = 4

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        regs, hms = [], []
        tower = []
        for i in range(self.num_convs):
            tower.append((
                nn.Conv(self.channels, (3, 3), padding=1,
                        name=f"bbox_tower{i}_conv"),
                nn.GroupNorm(num_groups=32, epsilon=1e-5,
                             name=f"bbox_tower{i}_gn")))
        bbox_pred = nn.Conv(4, (3, 3), padding=1, name="bbox_pred")
        agn_hm = nn.Conv(1, (3, 3), padding=1, name="agn_hm")
        scales = self.param("scales", nn.initializers.ones,
                            (self.num_levels,))
        for lvl, f in enumerate(feats):
            y = f
            for conv, gn in tower:
                y = jax.nn.relu(gn(conv(y)))
            hms.append(agn_hm(y))
            regs.append(jax.nn.relu(bbox_pred(y) * scales[lvl]))
        return regs, hms


# ------------------------------------------------------------------ RoI ops
def roi_align_np(feat: np.ndarray, boxes: np.ndarray, out_size: int,
                 spatial_scale: float, sampling_ratio: int = 0
                 ) -> np.ndarray:
    """RoIAlignV2 (aligned=True, the detectron2 default pooler), exact:
    continuous coordinates with the half-pixel -0.5 shift,
    ``ceil(roi/out)`` sample points per bin per axis when
    sampling_ratio=0, bilinear with edge clamp (samples outside
    [-1, size] contribute zero), bin-averaged. Runs on host — the glue
    between jitted dense programs. feat (H, W, C); boxes (N, 4) xyxy."""
    h, w, c = feat.shape
    n = boxes.shape[0]
    out = np.zeros((n, out_size, out_size, c), np.float32)
    sb = boxes * spatial_scale - 0.5
    roi_w = sb[:, 2] - sb[:, 0]
    roi_h = sb[:, 3] - sb[:, 1]
    if sampling_ratio > 0:
        nh = np.full(n, sampling_ratio, np.int64)
        nw = nh
    else:
        nh = np.maximum(np.ceil(roi_h / out_size), 1).astype(np.int64)
        nw = np.maximum(np.ceil(roi_w / out_size), 1).astype(np.int64)

    def bilinear(yy, xx):
        valid = (yy >= -1.0) & (yy <= h) & (xx >= -1.0) & (xx <= w)
        yy = np.clip(yy, 0.0, h - 1.0)
        xx = np.clip(xx, 0.0, w - 1.0)
        yl = np.floor(yy).astype(np.int64)
        xl = np.floor(xx).astype(np.int64)
        yh = np.minimum(yl + 1, h - 1)
        xh = np.minimum(xl + 1, w - 1)
        wy = (yy - yl)[..., None]
        wx = (xx - xl)[..., None]
        vals = (feat[yl, xl] * (1 - wy) * (1 - wx)
                + feat[yl, xh] * (1 - wy) * wx
                + feat[yh, xl] * wy * (1 - wx)
                + feat[yh, xh] * wy * wx)
        return vals * valid[..., None]

    for (gh, gw) in set(zip(nh.tolist(), nw.tolist())):
        sel = np.nonzero((nh == gh) & (nw == gw))[0]
        iy = (np.arange(out_size)[:, None]
              + (np.arange(gh)[None, :] + 0.5) / gh)  # (out, gh) bin units
        ix = (np.arange(out_size)[:, None]
              + (np.arange(gw)[None, :] + 0.5) / gw)
        bh = (roi_h[sel] / out_size)[:, None, None]
        bw = (roi_w[sel] / out_size)[:, None, None]
        gy = sb[sel, 1][:, None, None] + bh * iy[None]   # (S, out, gh)
        gx = sb[sel, 0][:, None, None] + bw * ix[None]
        yy = np.broadcast_to(gy[:, :, :, None, None],
                             (len(sel), out_size, gh, out_size, gw))
        xx = np.broadcast_to(gx[:, None, None, :, :],
                             (len(sel), out_size, gh, out_size, gw))
        out[sel] = bilinear(yy, xx).mean(axis=(2, 4))
    return out


def assign_fpn_levels(boxes: np.ndarray, min_level: int = 3,
                      max_level: int = 5, canonical: float = 224.0,
                      canonical_level: int = 4) -> np.ndarray:
    """detectron2 assign_boxes_to_levels."""
    area = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * \
        np.maximum(boxes[:, 3] - boxes[:, 1], 0)
    lvl = np.floor(canonical_level + np.log2(np.sqrt(area) / canonical
                                             + 1e-8))
    return np.clip(lvl, min_level, max_level).astype(np.int64) - min_level


def apply_deltas(deltas: np.ndarray, boxes: np.ndarray,
                 weights: Sequence[float]) -> np.ndarray:
    """detectron2 Box2BoxTransform.apply_deltas (class-agnostic)."""
    widths = boxes[:, 2] - boxes[:, 0]
    heights = boxes[:, 3] - boxes[:, 1]
    cx = boxes[:, 0] + 0.5 * widths
    cy = boxes[:, 1] + 0.5 * heights
    wx, wy, ww, wh = weights
    dx, dy, dw, dh = (deltas[:, 0] / wx, deltas[:, 1] / wy,
                      deltas[:, 2] / ww, deltas[:, 3] / wh)
    dw = np.minimum(dw, SCALE_CLAMP)
    dh = np.minimum(dh, SCALE_CLAMP)
    pcx = dx * widths + cx
    pcy = dy * heights + cy
    pw = np.exp(dw) * widths
    ph = np.exp(dh) * heights
    return np.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                     pcx + 0.5 * pw, pcy + 0.5 * ph], axis=1)


def nms(boxes: np.ndarray, scores: np.ndarray, thresh: float) -> np.ndarray:
    """Greedy IoU NMS; returns kept indices in descending-score order
    (torchvision.ops.nms semantics)."""
    order = np.argsort(-scores, kind="stable")
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = np.maximum(x1 - x0, 0) * np.maximum(y1 - y0, 0)
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        rest = order[1:]
        xx0 = np.maximum(x0[i], x0[rest])
        yy0 = np.maximum(y0[i], y0[rest])
        xx1 = np.minimum(x1[i], x1[rest])
        yy1 = np.minimum(y1[i], y1[rest])
        inter = np.maximum(xx1 - xx0, 0) * np.maximum(yy1 - yy0, 0)
        iou = inter / np.maximum(areas[i] + areas[rest] - inter, 1e-12)
        order = rest[iou <= thresh]
    return np.asarray(keep, np.int64)


# ------------------------------------------------------- cascade box heads
class CascadeBoxStage(nn.Module):
    """FastRCNNConvFCHead (2 fc x 1024) + GRiTFastRCNNOutputLayers
    (cls Linear(1024,2); bbox Linear-ReLU-Linear, grit_fast_rcnn.py:34)."""
    fc_dim: int = 1024

    @nn.compact
    def __call__(self, pooled):  # (N, 7, 7, C)
        n = pooled.shape[0]
        # torch flattens (N, C, 7, 7) C-major — transpose to match the
        # pretrained fc layout
        x = pooled.transpose(0, 3, 1, 2).reshape(n, -1)
        x = jax.nn.relu(nn.Dense(self.fc_dim, name="fc1")(x))
        x = jax.nn.relu(nn.Dense(self.fc_dim, name="fc2")(x))
        scores = nn.Dense(2, name="cls_score")(x)
        d = jax.nn.relu(nn.Dense(self.fc_dim, name="bbox_fc")(x))
        deltas = nn.Dense(4, name="bbox_out")(d)
        return scores, deltas


# ------------------------------------------------------------ text decoder
class BertSelfAttn(nn.Module):
    """grit/modeling/text/modeling_bert.py BertAttention (post-norm)."""
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, mask):  # mask additive (S, S)
        hd = self.dim // self.heads
        q = nn.Dense(self.dim, name="query")(x)
        k = nn.Dense(self.dim, name="key")(x)
        v = nn.Dense(self.dim, name="value")(x)

        def split(t):
            return t.reshape(t.shape[0], -1, self.heads, hd) \
                .transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        a = q @ k.transpose(0, 1, 3, 2) / math.sqrt(hd) + mask[None, None]
        a = jax.nn.softmax(a, axis=-1)
        o = (a @ v).transpose(0, 2, 1, 3).reshape(x.shape)
        o = nn.Dense(self.dim, name="out")(o)
        return nn.LayerNorm(epsilon=1e-12, name="out_ln")(o + x)


class BertLayer(nn.Module):
    dim: int
    heads: int
    ffn: int

    @nn.compact
    def __call__(self, x, mask):
        x = BertSelfAttn(self.dim, self.heads, name="attn")(x, mask)
        y = nn.Dense(self.ffn, name="inter")(x)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="output")(y)
        return nn.LayerNorm(epsilon=1e-12, name="output_ln")(y + x)


class GRiTTextDecoder(nn.Module):
    """text_decoder.py TransformerDecoderTextualHead, decoder_type
    'bert_en': project 14x14 object features (256->768), embed tokens
    (word+pos, LN eps 1e-8), run a 6-layer BERT encoder over the
    concatenated [memory; text] sequence with a block mask (memory
    attends only memory; text attends memory + causal text), and score
    with the tied word embedding."""
    vocab: int = 30522
    dim: int = 768
    layers: int = 6
    heads: int = 12
    ffn: int = 3072
    max_len: int = 1024

    @nn.compact
    def __call__(self, obj_feats, tokens):
        # obj_feats (N, M, 256); tokens (N, T) int32
        mem = nn.Dense(self.dim, name="obj_proj")(obj_feats)
        mem = nn.LayerNorm(epsilon=1e-5, name="obj_proj_ln")(mem)

        words = self.param("word_emb", nn.initializers.zeros,
                           (self.vocab, self.dim))
        pos = self.param("pos_emb", nn.initializers.zeros,
                         (self.max_len, self.dim))
        t = tokens.shape[1]
        emb = words[tokens] + pos[None, :t]
        emb = nn.LayerNorm(epsilon=1e-8, name="emb_ln")(emb)

        m = mem.shape[1]
        s = m + t
        neg = jnp.float32(-jnp.inf)
        mask = jnp.zeros((s, s), jnp.float32)
        mask = mask.at[:m, m:].set(neg)                     # mem !-> text
        tri = jnp.triu(jnp.full((t, t), neg), k=1)          # causal text
        mask = mask.at[m:, m:].set(tri)

        x = jnp.concatenate([mem, emb], axis=1)
        for i in range(self.layers):
            x = BertLayer(self.dim, self.heads, self.ffn,
                          name=f"layer{i}")(x, mask)
        logits = x[:, m:] @ words.T + self.param(
            "out_bias", nn.initializers.zeros, (self.vocab,))
        return logits  # (N, T, vocab)


# -------------------------------------------------------------- orchestrator
class _GRiTDense(nn.Module):
    """Jit-friendly dense trunk: image -> FPN feats + CenterNet outputs."""
    @nn.compact
    def __call__(self, img):  # (1, H, W, 3) normalized
        feat = ViTDet(name="backbone")(img)
        fpn = ViTFPN(name="fpn")(feat)
        regs, hms = CenterNetHead(name="centernet")(fpn)
        return fpn, regs, hms


class GRiTDetector:
    """End-to-end GRiT inference orchestrator (grit.py:22-47 +
    grit_roi_heads.py:176-385). Host numpy handles proposal selection,
    NMS and beam bookkeeping; everything dense is jitted per input shape.

    ``detect(frame)`` takes an RGB uint8 (H, W, 3) frame and returns a
    list of (description, [x0, y0, x1, y1], det_names, score) tuples
    mirroring the reference's ``dense_pred_to_caption_tuple`` — where
    ``det_names`` is the full list of ObjectDet-decoded names for the
    frame (the reference attaches it per-instance; VBench reads
    ``[0][2]``)."""

    def __init__(self, params: Params, vocab: Optional[List[str]] = None,
                 test_task: str = "DenseCap", max_det: int = 64):
        self.params = params
        self.vocab = vocab
        self.test_task = test_task
        self.max_det = max_det
        self.dense = _GRiTDense()
        self.stages = [CascadeBoxStage() for _ in range(3)]
        self.text = GRiTTextDecoder()
        self._dense_fn = jax.jit(
            lambda p, img: self.dense.apply({"params": p}, img))
        self._stage_fns = [
            jax.jit(lambda p, pooled, k=k: self.stages[k].apply(
                {"params": p[f"stage{k}"]}, pooled))
            for k in range(3)]
        self._text_fn = jax.jit(
            lambda p, feats, toks: self.text.apply({"params": p}, feats,
                                                   toks))

    # ------------------------------------------------------- host pooling
    @staticmethod
    def _pool(fpn3, boxes, out_size):
        """detectron2 ROIPooler: assign each box to p3/p4/p5 by canonical
        scale, RoIAlignV2 at that level (exact numpy, host-side)."""
        levels = assign_fpn_levels(boxes)
        n = boxes.shape[0]
        c = fpn3[0].shape[-1]
        out = np.zeros((n, out_size, out_size, c), np.float32)
        for i in range(3):
            sel = np.nonzero(levels == i)[0]
            if sel.size:
                out[sel] = roi_align_np(fpn3[i], boxes[sel], out_size,
                                        1.0 / FPN_STRIDES[i])
        return out

    # ------------------------------------------------------ proposal stage
    def _proposals(self, regs, hms):
        """centernet.py:661-822 predict_instances + nms_and_topK for the
        only_proposal/with_agn_hm config: score = sqrt(sigmoid(hm)),
        box = grid -/+ reg*stride, ML-NMS 0.9, top 256."""
        all_boxes, all_scores = [], []
        for lvl, (reg, hm) in enumerate(zip(regs, hms)):
            stride = FPN_STRIDES[lvl]
            hm = np.asarray(jax.nn.sigmoid(hm[0, :, :, 0])).reshape(-1)
            reg = np.asarray(reg[0]).reshape(-1, 4) * stride
            h, w = regs[lvl].shape[1], regs[lvl].shape[2]
            gx, gy = np.meshgrid(np.arange(w) * stride + stride // 2,
                                 np.arange(h) * stride + stride // 2)
            grids = np.stack([gx.reshape(-1), gy.reshape(-1)], axis=1)
            cand = hm > CN_INFERENCE_TH
            scores = hm[cand]
            if scores.size > CN_PRE_NMS_TOPK:
                keep = np.argpartition(-scores, CN_PRE_NMS_TOPK)[
                    :CN_PRE_NMS_TOPK]
                scores = scores[keep]
                boxes_reg = reg[cand][keep]
                g = grids[cand][keep]
            else:
                boxes_reg = reg[cand]
                g = grids[cand]
            boxes = np.stack([g[:, 0] - boxes_reg[:, 0],
                              g[:, 1] - boxes_reg[:, 1],
                              g[:, 0] + boxes_reg[:, 2],
                              g[:, 1] + boxes_reg[:, 3]], axis=1)
            boxes[:, 2] = np.maximum(boxes[:, 2], boxes[:, 0] + 0.01)
            boxes[:, 3] = np.maximum(boxes[:, 3], boxes[:, 1] + 0.01)
            all_boxes.append(boxes)
            all_scores.append(np.sqrt(scores))
        boxes = np.concatenate(all_boxes, 0)
        scores = np.concatenate(all_scores, 0)
        keep = nms(boxes, scores, CN_NMS_TH)
        keep = keep[:CN_POST_NMS_TOPK]
        return boxes[keep], scores[keep]

    # ----------------------------------------------------------- detection
    def detect(self, frame: np.ndarray) -> List[Tuple[str, List[int],
                                                      List[str]]]:
        im_h, im_w = frame.shape[:2]
        x = (frame.astype(np.float32) - PIXEL_MEAN) / PIXEL_STD
        ph, pw = (-im_h) % 32, (-im_w) % 32
        if ph or pw:
            x = np.pad(x, ((0, ph), (0, pw), (0, 0)))
        fpn, regs, hms = self._dense_fn(self.params["dense"], x[None])
        boxes, obj_scores = self._proposals(regs, hms)

        n = boxes.shape[0]
        if n == 0:
            return []
        pad = CN_POST_NMS_TOPK - n
        boxes_p = np.pad(boxes, ((0, pad), (0, 0)))
        fpn3 = [np.asarray(f[0], np.float32) for f in fpn[:3]]

        # 3-stage cascade: refine boxes each stage, average softmax
        # scores. Stage-0 proposals enter UNclipped (the reference clips
        # only in _create_proposals_from_boxes for stages >= 1).
        stage_scores = []
        cur = boxes_p
        for k in range(3):
            if k > 0:
                cur = np.clip(cur, [0, 0, 0, 0], [im_w, im_h, im_w, im_h])
            pooled = self._pool(fpn3, cur, 7)
            scores_k, deltas_k = self._stage_fns[k](
                self.params["cascade"], jnp.asarray(pooled))
            stage_scores.append(_softmax_np(np.asarray(scores_k,
                                                       np.float64)))
            cur = apply_deltas(np.asarray(deltas_k, np.float64), cur,
                               CASCADE_DELTA_WEIGHTS[k])
        scores = sum(stage_scores)[:n] / 3.0
        final_boxes = np.clip(cur[:n], [0, 0, 0, 0],
                              [im_w, im_h, im_w, im_h])
        # MULT_PROPOSAL_SCORE (grit_roi_heads.py:181-185, Base.yaml):
        # sqrt(cls_score * proposal_score), then drop the background col
        fg = np.sqrt(scores[:, 0] * obj_scores)
        keep = fg > SCORE_THRESH_TEST
        if not keep.any():
            return []
        kb, ks = final_boxes[keep], fg[keep]
        order = nms(kb, ks, NMS_THRESH_TEST)[:DETECTIONS_PER_IMAGE]
        kb, ks = kb[order], ks[order]
        kb = kb[:self.max_det]
        ks = ks[:self.max_det]

        # text decoding on 14x14 object features (both task heads share
        # the transformer; only the begin token differs). torch views
        # pooled (N, C, 196) then permutes to (N, 196, C): token
        # m = h*14+w channel-last == the NHWC reshape.
        nb = kb.shape[0]
        pad_n = self.max_det - nb
        pooled = self._pool(fpn3, np.pad(kb, ((0, pad_n), (0, 0))), 14)
        feats = jnp.asarray(pooled.reshape(self.max_det, 14 * 14, -1))
        descs, logp = self._decode(feats, BEGIN_TOKEN[self.test_task], nb)
        det_names, _ = self._decode(feats, BEGIN_TOKEN["ObjectDet"], nb)
        # final score = sqrt(objectness * mean token prob)
        final_scores = np.sqrt(ks * np.exp(logp))
        out = []
        for i in range(nb):
            out.append((descs[i], [int(v) for v in kb[i]], det_names,
                        float(final_scores[i])))
        return out

    def _decode(self, feats, begin_token: int, nb: int
                ) -> Tuple[List[str], np.ndarray]:
        """Greedy beam-1 AutoRegressiveBeamSearch (text_decoder.py:410-587):
        last-token repeat penalty -10000, forced EOS after EOS, returned
        logprob = mean over generated tokens."""
        n = feats.shape[0]
        toks = np.zeros((n, MAX_TEXT_STEPS), np.int32)
        toks[:, 0] = begin_token
        total_logp = np.zeros(n, np.float64)
        finished = np.zeros(n, bool)
        num_gen = np.zeros(n, np.int64)
        for t in range(1, MAX_TEXT_STEPS):
            # fixed-shape call (one compile): the causal mask makes
            # positions >= t irrelevant to the read at t-1
            logits = self._text_fn(self.params["text"], feats,
                                   jnp.asarray(toks))
            last = np.asarray(logits[:, t - 1], np.float64)
            if t > 1:  # repeat penalty on the immediately-previous token
                last[np.arange(n), toks[:, t - 1]] = -10000.0
            logp = last - _logsumexp_np(last)
            nxt = np.argmax(logp, axis=1)
            step_logp = logp[np.arange(n), nxt]
            nxt = np.where(finished, EOS_TOKEN, nxt)
            step_logp = np.where(finished, 0.0, step_logp)
            toks[:, t] = nxt
            total_logp += step_logp
            num_gen += (~finished).astype(np.int64)
            finished |= (nxt == EOS_TOKEN)
            if finished[:nb].all():
                break
        mean_logp = total_logp / np.maximum(num_gen, 1)
        texts = [self._detok(toks[i]) for i in range(nb)]
        return texts, mean_logp[:nb]

    def _detok(self, token_ids: np.ndarray) -> str:
        if self.vocab is None:
            return " ".join(str(t) for t in token_ids[1:]
                            if t not in (0, EOS_TOKEN, 101))
        words = []
        for t in token_ids[1:]:
            if t == EOS_TOKEN:
                break
            if t in (0, 100, 101, 103):  # pad/unk/cls/mask
                continue
            piece = self.vocab[t]
            if piece.startswith("##") and words:
                words[-1] += piece[2:]
            else:
                words.append(piece)
        return " ".join(words)


def init_grit_params(key, img_hw: Tuple[int, int] = (64, 64)) -> Params:
    """Random-init param trees in the detector's layout (tests/smoke —
    real weights come through ``convert_grit_state_dict``)."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    dense = _GRiTDense().init(
        k1, jnp.zeros((1, img_hw[0], img_hw[1], 3)))["params"]
    cascade = {}
    for k in range(3):
        cascade[f"stage{k}"] = CascadeBoxStage().init(
            jax.random.fold_in(k2, k), jnp.zeros((2, 7, 7, 256)))["params"]
    text = GRiTTextDecoder().init(
        k3, jnp.zeros((1, 196, 256)),
        jnp.zeros((1, 4), jnp.int32))["params"]
    return {"dense": dense, "cascade": cascade, "text": text}


# ----------------------------------------------------------- weight import
def convert_grit_state_dict(sd: Dict[str, np.ndarray]) -> Params:
    """Reference GRiT checkpoint (torch ``model`` state dict, key layout
    of grit_src/grit/modeling/* under detectron2's GeneralizedRCNN) ->
    this module's param trees {dense, cascade, text}.

    Torch->flax layout transforms: Conv2d OIHW -> HWIO; ConvTranspose2d
    IOHW -> HWIO; Linear (O, I) -> (I, O). The two GRiTTextDecoder
    wrappers share one ``textual`` transformer in the reference
    (grit_roi_heads.py:79-92); only ``text_decoder.textual`` is read."""
    def t(k):
        return np.asarray(sd[k])

    def conv(k):
        return {"kernel": t(k + ".weight").transpose(2, 3, 1, 0),
                **({"bias": t(k + ".bias")} if k + ".bias" in sd else {})}

    def dense_(k):
        return {"kernel": t(k + ".weight").T, "bias": t(k + ".bias")}

    def ln(k):
        return {"scale": t(k + ".weight"), "bias": t(k + ".bias")}

    vit = {}
    bu = "backbone.bottom_up"
    vit["patch_embed"] = conv(f"{bu}.patch_embed.proj")
    vit["pos_embed"] = t(f"{bu}.pos_embed")
    for i in range(12):
        b = f"{bu}.blocks.{i}"
        vit[f"block{i}"] = {
            "norm1": ln(f"{b}.norm1"),
            "norm2": ln(f"{b}.norm2"),
            "attn": {"qkv": dense_(f"{b}.attn.qkv"),
                     "proj": dense_(f"{b}.attn.proj"),
                     "rel_pos_h": t(f"{b}.attn.rel_pos_h"),
                     "rel_pos_w": t(f"{b}.attn.rel_pos_w")},
            "mlp_fc1": dense_(f"{b}.mlp.fc1"),
            "mlp_fc2": dense_(f"{b}.mlp.fc2"),
        }

    # ConvTranspose2d (in, out, kh, kw) -> flax (kh, kw, in, out) with the
    # spatial taps FLIPPED (flax ConvTranspose is fractionally-strided
    # conv; torch's deconv applies the unflipped kernel)
    fpn = {"fpn_stride_16_8": {
        "kernel": np.ascontiguousarray(
            t("backbone.fpn_stride_16_8.weight")
            .transpose(2, 3, 0, 1)[::-1, ::-1])
    }}
    for s in (8, 16, 32):
        fpn[f"stride{s}_conv1"] = conv(f"backbone.fpn_stride{s}_conv1")
        fpn[f"stride{s}_norm1"] = ln(f"backbone.fpn_stride{s}_norm1")
        fpn[f"stride{s}_conv2"] = conv(f"backbone.fpn_stride{s}_conv2")
        fpn[f"stride{s}_norm2"] = ln(f"backbone.fpn_stride{s}_norm2")
    fpn["top_p6"] = conv("backbone.top_block.p6")
    fpn["top_p7"] = conv("backbone.top_block.p7")

    cn = {}
    ch = "proposal_generator.centernet_head"
    for i in range(4):
        cn[f"bbox_tower{i}_conv"] = conv(f"{ch}.bbox_tower.{3 * i}")
        cn[f"bbox_tower{i}_gn"] = ln(f"{ch}.bbox_tower.{3 * i + 1}")
    cn["bbox_pred"] = conv(f"{ch}.bbox_pred")
    cn["agn_hm"] = conv(f"{ch}.agn_hm")
    cn["scales"] = np.concatenate(
        [t(f"{ch}.scales.{l}.scale") for l in range(5)])

    cascade = {}
    for k in range(3):
        cascade[f"stage{k}"] = {
            "fc1": dense_(f"roi_heads.box_head.{k}.fc1"),
            "fc2": dense_(f"roi_heads.box_head.{k}.fc2"),
            "cls_score": dense_(f"roi_heads.box_predictor.{k}.cls_score"),
            "bbox_fc": dense_(f"roi_heads.box_predictor.{k}.bbox_pred.0"),
            "bbox_out": dense_(f"roi_heads.box_predictor.{k}.bbox_pred.2"),
        }

    tx = "roi_heads.text_decoder.textual"
    text = {
        "obj_proj": dense_(f"{tx}.object_feature_projection.0"),
        "obj_proj_ln": ln(f"{tx}.object_feature_projection.1"),
        "word_emb": t(f"{tx}.embedding.words.weight"),
        "pos_emb": t(f"{tx}.embedding.positions.weight"),
        "emb_ln": ln(f"{tx}.embedding.layer_norm"),
        "out_bias": t(f"{tx}.output.bias"),
    }
    i = 0
    while f"{tx}.transformer.encoder.layer.{i}.attention.self.query" \
            ".weight" in sd:
        b = f"{tx}.transformer.encoder.layer.{i}"
        text[f"layer{i}"] = {
            "attn": {"query": dense_(f"{b}.attention.self.query"),
                     "key": dense_(f"{b}.attention.self.key"),
                     "value": dense_(f"{b}.attention.self.value"),
                     "out": dense_(f"{b}.attention.output.dense"),
                     "out_ln": ln(f"{b}.attention.output.LayerNorm")},
            "inter": dense_(f"{b}.intermediate.dense"),
            "output": dense_(f"{b}.output.dense"),
            "output_ln": ln(f"{b}.output.LayerNorm"),
        }
        i += 1

    return {"dense": {"backbone": vit, "fpn": fpn, "centernet": cn},
            "cascade": cascade, "text": text}


# -------------------------------------------------- VBench dim protocols
def _sample_frames(video: np.ndarray, n: int = 16) -> np.ndarray:
    """VBench load_video(num_frames=16): uniform linspace frame sample."""
    t = video.shape[0]
    idx = np.linspace(0, t - 1, min(n, t)).astype(np.int64)
    v = video[idx]
    if v.dtype != np.uint8:
        v = ((np.clip(v, -1, 1) + 1.0) * 127.5).astype(np.uint8)
    return v


def grit_object_class(det: "GRiTDetector", video: np.ndarray,
                      object_name: str) -> float:
    """eval/vbench/object_class.py:17-55: fraction of 16 sampled frames
    whose ObjectDet name set contains the prompt object."""
    hits = 0
    frames = _sample_frames(video)
    for f in frames:
        names = set()
        out = det.detect(f)
        if out:
            names = set(out[0][2])
        hits += int(object_name in names)
    return hits / len(frames)


def grit_multiple_objects(det: "GRiTDetector", video: np.ndarray,
                          key_info: str) -> float:
    """eval/vbench/multiple_objects.py: both 'a and b' objects in the
    per-frame ObjectDet name set."""
    key_a, key_b = [k.strip() for k in key_info.split(" and ")]
    hits = 0
    frames = _sample_frames(video)
    for f in frames:
        out = det.detect(f)
        names = set(out[0][2]) if out else set()
        hits += int(key_a in names and key_b in names)
    return hits / len(frames)


def grit_spatial_relationship(det: "GRiTDetector", video: np.ndarray,
                              info: Dict[str, str]) -> float:
    """eval/vbench/spatial_relationship.py:17-121: collect boxes whose
    DenseCap description equals object_a/object_b, score each pair by
    the center-offset + IoU rule, take the per-frame max."""
    key_a, key_b = info["object_a"], info["object_b"]
    relation = info["relationship"]
    frame_scores = []
    for f in _sample_frames(video):
        preds = [(d[0], d[1]) for d in det.detect(f)]
        locs: List[List[int]] = []
        cur = [0.0]
        for desc, box in preds:
            if desc == key_a or desc == key_b:
                locs.append(box)
            for i in range(len(locs) - 1):
                for j in range(i + 1, len(locs)):
                    cur.append(_position_score(relation, locs[i], locs[j]))
        frame_scores.append(max(cur))
    return float(np.mean(frame_scores))


def _position_score(locality: str, obj1, obj2,
                    iou_threshold: float = 0.1) -> float:
    """spatial_relationship.py get_position_score (incl. its `in`-based
    locality matching quirk)."""
    b1 = dict(x0=obj1[0], y0=obj1[1], x1=obj1[2], y1=obj1[3])
    b2 = dict(x0=obj2[0], y0=obj2[1], x1=obj2[2], y1=obj2[3])
    c1 = ((b1["x0"] + b1["x1"]) / 2, (b1["y0"] + b1["y1"]) / 2)
    c2 = ((b2["x0"] + b2["x1"]) / 2, (b2["y0"] + b2["y1"]) / 2)
    xd, yd = c2[0] - c1[0], c2[1] - c1[1]
    xo = max(0, min(b1["x1"], b2["x1"]) - max(b1["x0"], b2["x0"]))
    yo = max(0, min(b1["y1"], b2["y1"]) - max(b1["y0"], b2["y0"]))
    inter = xo * yo
    a1 = (b1["x1"] - b1["x0"]) * (b1["y1"] - b1["y0"])
    a2 = (b2["x1"] - b2["x0"]) * (b2["y1"] - b2["y0"])
    iou = inter / max(a1 + a2 - inter, 1e-12)
    if locality in "on the right of" or locality in "on the left of":
        if abs(xd) > abs(yd):
            return 1.0 if iou < iou_threshold else iou_threshold / iou
        return 0.0
    if locality in "on the bottom of" or locality in "on the top of":
        if abs(yd) > abs(xd):
            return 1.0 if iou < iou_threshold else iou_threshold / iou
        return 0.0
    return 0.0


COLOR_QUERIES = ("white", "red", "pink", "blue", "silver", "purple",
                 "orange", "green", "gray", "yellow", "black", "grey")


def grit_color(det: "GRiTDetector", video: np.ndarray, color_key: str,
               object_key: str) -> Optional[float]:
    """eval/vbench/color.py:34-90: over frames where the first ObjectDet
    name equals the object, the fraction whose DenseCap description
    contains the prompt color. None when the object never appears (the
    reference drops such videos from the average)."""
    obj_frames, color_frames = 0, 0
    for f in _sample_frames(video):
        out = det.detect(f)
        preds = [(d[0], d[2][0] if d[2] else "") for d in out] \
            or [("", "")]
        object_flag, color_flag = False, False
        for desc, first_det in preds:
            if object_key == first_det:
                if any(c in desc for c in COLOR_QUERIES):
                    object_flag = True
                if color_key in desc:
                    color_flag = True
        obj_frames += int(object_flag)
        color_frames += int(color_flag)
    if obj_frames == 0:
        return None
    return color_frames / obj_frames


def _softmax_np(x):
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


def _logsumexp_np(x):
    m = x.max(axis=-1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(axis=-1, keepdims=True))

