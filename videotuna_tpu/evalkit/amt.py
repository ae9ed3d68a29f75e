"""AMT-S frame interpolation in JAX — the VBench perception backbone for
``motion_smoothness``.

Weight-faithful reimplementation of the reference torch model
(/root/reference/eval/vbench/third_party/amt/networks/AMT-S.py:21-182 +
blocks/{feat_enc,ifrnet,multi_flow,raft}.py): RAFT-style small feature
encoder (instance-norm bottlenecks), bidirectional all-pairs correlation
pyramid, IFRNet coarse-to-fine decoders with RAFT-style update blocks at
three scales, and a multi-flow (3-field) warping combiner.

Layout NHWC; torch-exact ops:
- ``resize``: bilinear, align_corners=False, no antialiasing on
  downscale (jax.image.resize with antialias=False);
- ``warp``: grid_sample border-padding align_corners=True ≡ bilinear
  gather at clamped pixel coordinates;
- ``TorchConvTranspose``: ConvTranspose2d(k=4, s=2, p=1) via
  lhs-dilated conv with spatially-flipped kernels;
- PReLU with per-channel slopes.

VBench protocol (``motion_smoothness_score``): drop odd frames,
interpolate them back from even neighbours at t=0.5, score
(255 − mean|original − interpolated|)/255
(eval/vbench/motion_smoothness.py:113-178).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from videotuna_tpu.evalkit.raft import bilinear_sampler

Params = Any

CHANNELS = (20, 32, 44, 56)
SKIP_CH = 20
NUM_FLOWS = 3
CORR_RADIUS = 3
CORR_LEVELS = 4


def resize_bilinear(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """F.interpolate(bilinear, align_corners=False) — torch semantics
    (half-pixel centers, NO antialias on downscale)."""
    n, h, w, c = x.shape
    out_h, out_w = int(h * scale), int(w * scale)
    return jax.image.resize(x, (n, out_h, out_w, c), method="bilinear",
                            antialias=False)


def warp(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """flow_utils.warp: grid_sample(border, align_corners=True) at
    base + flow. img (N,H,W,C); flow (N,H,W,2) as (dx, dy)."""
    n, h, w, _ = img.shape
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    x = jnp.clip(gx[None] + flow[..., 0], 0, w - 1)
    y = jnp.clip(gy[None] + flow[..., 1], 0, h - 1)
    return bilinear_sampler(img, jnp.stack([x, y], axis=-1))


class PReLU(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        a = self.param("weight", nn.initializers.constant(0.25),
                       (self.features,))
        return jnp.where(x >= 0, x, a * x)


def _conv(features, kernel=3, stride=1, padding=1, name=None):
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return nn.Conv(features, kernel, strides=(stride, stride),
                   padding=padding, name=name)


class ConvPReLU(nn.Module):
    """ifrnet.convrelu: Conv2d + PReLU (Sequential names 0/1)."""
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1

    @nn.compact
    def __call__(self, x):
        x = _conv(self.features, self.kernel, self.stride, self.padding,
                  name="conv")(x)
        return PReLU(self.features, name="prelu")(x)


class TorchConvTranspose(nn.Module):
    """ConvTranspose2d(kernel=4, stride=2, padding=1) exactly: conv over
    the 2×-dilated input with pad (k−1−p)=2 and spatially-flipped,
    (kh,kw,in,out)-transposed torch kernels (the conversion map performs
    the transpose+flip, so params here are plain conv-layout)."""
    features: int
    kernel: int = 4
    stride: int = 2
    pad: int = 1

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel, self.kernel, in_ch, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        p = self.kernel - 1 - self.pad
        out = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1),
            padding=((p, p), (p, p)),
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + b


class BottleneckBlock(nn.Module):
    """feat_enc.BottleneckBlock with norm_fn='instance' (param-free)."""
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        from videotuna_tpu.evalkit.raft import instance_norm
        y = _conv(self.planes // 4, 1, 1, 0, name="conv1")(x)
        y = nn.relu(instance_norm(y))
        y = _conv(self.planes // 4, 3, self.stride, 1, name="conv2")(y)
        y = nn.relu(instance_norm(y))
        y = _conv(self.planes, 1, 1, 0, name="conv3")(y)
        y = nn.relu(instance_norm(y))
        if self.stride != 1:
            x = _conv(self.planes, 1, self.stride, 0, name="downsample")(x)
            x = instance_norm(x)
        return nn.relu(x + y)


class SmallEncoder(nn.Module):
    """feat_enc.SmallEncoder(output_dim=84, norm='instance')."""
    output_dim: int = 84

    @nn.compact
    def __call__(self, x):
        from videotuna_tpu.evalkit.raft import instance_norm
        x = _conv(32, 7, 2, 3, name="conv1")(x)
        x = nn.relu(instance_norm(x))
        for i, (dim, stride) in enumerate([(32, 1), (64, 2), (96, 2)]):
            x = BottleneckBlock(dim, stride, name=f"layer{i + 1}_0")(x)
            x = BottleneckBlock(dim, 1, name=f"layer{i + 1}_1")(x)
        return _conv(self.output_dim, 1, 1, 0, name="conv2")(x)


class ResBlock(nn.Module):
    """ifrnet.ResBlock: side-channel gated residual."""
    features: int
    side: int = SKIP_CH

    @nn.compact
    def __call__(self, x):
        sc = self.side
        out = ConvPReLU(self.features, name="conv1")(x)
        res, sidef = out[..., :-sc], out[..., -sc:]
        sidef = ConvPReLU(sc, name="conv2")(sidef)
        out = ConvPReLU(self.features, name="conv3")(
            jnp.concatenate([res, sidef], axis=-1))
        res, sidef = out[..., :-sc], out[..., -sc:]
        sidef = ConvPReLU(sc, name="conv4")(sidef)
        out = _conv(self.features, 3, 1, 1, name="conv5")(
            jnp.concatenate([res, sidef], axis=-1))
        return PReLU(self.features, name="prelu")(x + out)


class PyramidEncoder(nn.Module):
    """ifrnet.Encoder: 4-level strided conv pyramid."""
    channels: Sequence[int] = CHANNELS

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        fs = []
        for i, ch in enumerate(self.channels, 1):
            x = ConvPReLU(ch, 3, 2, 1, name=f"pyramid{i}_0")(x)
            x = ConvPReLU(ch, 3, 1, 1, name=f"pyramid{i}_1")(x)
            fs.append(x)
        return fs


class InitDecoder(nn.Module):
    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, f0, f1, embt):
        n, h, w, _ = f0.shape
        e = jnp.broadcast_to(embt.reshape(-1, 1, 1, 1), (n, h, w, 1))
        x = jnp.concatenate([f0, f1, e], axis=-1)
        x = ConvPReLU(self.in_ch * 2, name="cb0")(x)
        x = ResBlock(self.in_ch * 2, name="cb1")(x)
        out = TorchConvTranspose(self.out_ch + 4, name="cb2")(x)
        flow0, flow1 = out[..., :2], out[..., 2:4]
        return flow0, flow1, out[..., 4:]


class IntermediateDecoder(nn.Module):
    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, ft_, f0, f1, flow0_in, flow1_in):
        f0w = warp(f0, flow0_in)
        f1w = warp(f1, flow1_in)
        x = jnp.concatenate([ft_, f0w, f1w, flow0_in, flow1_in], axis=-1)
        x = ConvPReLU(self.in_ch * 3, name="cb0")(x)
        x = ResBlock(self.in_ch * 3, name="cb1")(x)
        out = TorchConvTranspose(self.out_ch + 4, name="cb2")(x)
        flow0 = out[..., :2] + 2.0 * resize_bilinear(flow0_in, 2.0)
        flow1 = out[..., 2:4] + 2.0 * resize_bilinear(flow1_in, 2.0)
        return flow0, flow1, out[..., 4:]


class MultiFlowDecoder(nn.Module):
    in_ch: int
    num_flows: int = NUM_FLOWS

    @nn.compact
    def __call__(self, ft_, f0, f1, flow0, flow1):
        nf = self.num_flows
        f0w = warp(f0, flow0)
        f1w = warp(f1, flow1)
        x = jnp.concatenate([ft_, f0w, f1w, flow0, flow1], axis=-1)
        x = ConvPReLU(self.in_ch * 3, name="cb0")(x)
        x = ResBlock(self.in_ch * 3, name="cb1")(x)
        out = TorchConvTranspose(8 * nf, name="cb2")(x)
        d0 = out[..., :2 * nf]
        d1 = out[..., 2 * nf:4 * nf]
        mask = jax.nn.sigmoid(out[..., 4 * nf:5 * nf])
        img_res = out[..., 5 * nf:]
        up0 = jnp.tile(2.0 * resize_bilinear(flow0, 2.0), (1, 1, 1, nf))
        up1 = jnp.tile(2.0 * resize_bilinear(flow1, 2.0), (1, 1, 1, nf))
        return d0 + up0, d1 + up1, mask, img_res


class SmallUpdateBlock(nn.Module):
    """blocks/raft.SmallUpdateBlock (cdim varies per scale)."""
    cdim: int
    hidden: int = 76
    flow_dim: int = 20
    corr_dim: int = 64
    fc_dim: int = 68
    scale_factor: Optional[int] = None

    @nn.compact
    def __call__(self, net, flow, corr):
        lrelu = lambda x: jnp.where(x >= 0, x, 0.1 * x)
        sf = self.scale_factor
        if sf is not None:
            net = resize_bilinear(net, 1.0 / sf)
        cor = lrelu(_conv(self.corr_dim, 1, 1, 0, name="convc1")(corr))
        flo = lrelu(_conv(self.flow_dim * 2, 7, 1, 3, name="convf1")(flow))
        flo = lrelu(_conv(self.flow_dim, 3, 1, 1, name="convf2")(flo))
        inp = lrelu(_conv(self.fc_dim, 3, 1, 1, name="conv")(
            jnp.concatenate([cor, flo], axis=-1)))
        inp = jnp.concatenate([inp, flow, net], axis=-1)
        out = _conv(self.hidden, 3, 1, 1, name="gru0")(inp)
        out = _conv(self.hidden, 3, 1, 1, name="gru2")(lrelu(out))
        dnet = _conv(self.hidden, 3, 1, 1, name="feat0")(out)
        dnet = _conv(self.cdim, 3, 1, 1, name="feat2")(lrelu(dnet))
        dflow = _conv(self.hidden, 3, 1, 1, name="flow0")(out)
        dflow = _conv(4, 3, 1, 1, name="flow2")(lrelu(dflow))
        if sf is not None:
            dnet = resize_bilinear(dnet, float(sf))
            dflow = float(sf) * resize_bilinear(dflow, float(sf))
        return dnet, dflow


def build_bidir_corr(fmap0: jnp.ndarray, fmap1: jnp.ndarray,
                     num_levels: int = CORR_LEVELS):
    """BidirCorrBlock pyramids: forward (per fmap0 position) and
    transposed (per fmap1 position)."""
    b, h, w, c = fmap0.shape
    corr = jnp.einsum("bijc,bklc->bijkl", fmap0, fmap1) / jnp.sqrt(
        jnp.float32(c))
    corr_T = corr.transpose(0, 3, 4, 1, 2)
    from videotuna_tpu.evalkit.raft import _avg_pool2
    pyr = [corr.reshape(b * h * w, h, w, 1)]
    pyr_T = [corr_T.reshape(b * h * w, h, w, 1)]
    for _ in range(num_levels - 1):
        pyr.append(_avg_pool2(pyr[-1]))
        pyr_T.append(_avg_pool2(pyr_T[-1]))
    return pyr, pyr_T


def bidir_lookup(pyr, pyr_T, coords0, coords1, radius: int = CORR_RADIUS):
    from videotuna_tpu.evalkit.raft import lookup_corr
    c0 = lookup_corr(pyr, coords0, radius)
    c1 = lookup_corr(pyr_T, coords1, radius)
    return c0, c1


class AMT_S(nn.Module):
    """Full AMT-S interpolator: (img0, img1, embt) → interpolated frame.
    imgs (N,H,W,3) in [0,1], H,W divisible by 16; embt (N,) in (0,1)."""
    num_flows: int = NUM_FLOWS
    radius: int = CORR_RADIUS
    corr_levels: int = CORR_LEVELS

    @nn.compact
    def __call__(self, img0, img1, embt):
        ch = CHANNELS
        mean_ = jnp.mean(jnp.concatenate([img0, img1], axis=1),
                         axis=(1, 2, 3), keepdims=True)
        img0 = img0 - mean_
        img1 = img1 - mean_
        n, h, w, _ = img0.shape
        gy, gx = jnp.meshgrid(
            jnp.arange(h // 8, dtype=jnp.float32),
            jnp.arange(w // 8, dtype=jnp.float32), indexing="ij")
        coord = jnp.broadcast_to(jnp.stack([gx, gy], -1),
                                 (n, h // 8, w // 8, 2))

        fenc = SmallEncoder(84, name="feat_encoder")
        fmap0, fmap1 = fenc(img0), fenc(img1)
        pyr, pyr_T = build_bidir_corr(fmap0.astype(jnp.float32),
                                      fmap1.astype(jnp.float32),
                                      self.corr_levels)
        penc = PyramidEncoder(ch, name="encoder")
        f0_1, f0_2, f0_3, f0_4 = penc(img0)
        f1_1, f1_2, f1_3, f1_4 = penc(img1)

        embt = jnp.asarray(embt, jnp.float32).reshape(-1)
        t1_scale = (1.0 / embt).reshape(-1, 1, 1, 1)
        t0_scale = (1.0 / (1.0 - embt)).reshape(-1, 1, 1, 1)

        def corr_scale_lookup(flow0, flow1, downsample):
            if downsample != 1:
                inv = 1.0 / downsample
                flow0 = inv * resize_bilinear(flow0, inv)
                flow1 = inv * resize_bilinear(flow1, inv)
            c0, c1 = bidir_lookup(pyr, pyr_T,
                                  coord + flow1 * t1_scale,
                                  coord + flow0 * t0_scale, self.radius)
            return (jnp.concatenate([c0, c1], axis=-1),
                    jnp.concatenate([flow0, flow1], axis=-1))

        # ---- level 4
        up_f0_4, up_f1_4, ft_3 = InitDecoder(ch[3], ch[2],
                                             name="decoder4")(f0_4, f1_4,
                                                              embt)
        corr4, flow4 = corr_scale_lookup(up_f0_4, up_f1_4, 1)
        dft3, dflow4 = SmallUpdateBlock(ch[2], name="update4")(
            ft_3, flow4, corr4)
        up_f0_4 = up_f0_4 + dflow4[..., :2]
        up_f1_4 = up_f1_4 + dflow4[..., 2:]
        ft_3 = ft_3 + dft3

        # ---- level 3
        up_f0_3, up_f1_3, ft_2 = IntermediateDecoder(
            ch[2], ch[1], name="decoder3")(ft_3, f0_3, f1_3, up_f0_4,
                                           up_f1_4)
        corr3, flow3 = corr_scale_lookup(up_f0_3, up_f1_3, 2)
        dft2, dflow3 = SmallUpdateBlock(ch[1], scale_factor=2,
                                        name="update3")(ft_2, flow3,
                                                        corr3)
        up_f0_3 = up_f0_3 + dflow3[..., :2]
        up_f1_3 = up_f1_3 + dflow3[..., 2:]
        ft_2 = ft_2 + dft2

        # ---- level 2
        up_f0_2, up_f1_2, ft_1 = IntermediateDecoder(
            ch[1], ch[0], name="decoder2")(ft_2, f0_2, f1_2, up_f0_3,
                                           up_f1_3)
        corr2, flow2 = corr_scale_lookup(up_f0_2, up_f1_2, 4)
        dft1, dflow2 = SmallUpdateBlock(ch[0], scale_factor=4,
                                        name="update2")(ft_1, flow2,
                                                        corr2)
        up_f0_2 = up_f0_2 + dflow2[..., :2]
        up_f1_2 = up_f1_2 + dflow2[..., 2:]
        ft_1 = ft_1 + dft1

        # ---- level 1: multi-flow combine
        up_f0_1, up_f1_1, mask, img_res = MultiFlowDecoder(
            ch[0], self.num_flows, name="decoder1")(ft_1, f0_1, f1_1,
                                                    up_f0_2, up_f1_2)
        nf = self.num_flows
        # per-flow warps (multi_flow.multi_flow_combine)
        f0r = up_f0_1.reshape(n, h, w, nf, 2)
        f1r = up_f1_1.reshape(n, h, w, nf, 2)
        warps = []
        for i in range(nf):
            w0 = warp(img0, f0r[..., i, :])
            w1 = warp(img1, f1r[..., i, :])
            m = mask[..., i:i + 1]
            warps.append(m * w0 + (1 - m) * w1 + mean_
                         + img_res[..., 3 * i:3 * i + 3])
        stacked = jnp.stack(warps, axis=-2)          # (N,H,W,nf,3)
        comb_in = stacked.reshape(n, h, w, nf * 3)
        cb = ConvPReLU(6 * nf, name="comb0")(comb_in)
        cb = _conv(3, 3, 1, 1, name="comb2")(cb)
        pred = jnp.mean(stacked, axis=-2) + cb
        return jnp.clip(pred, 0.0, 1.0)


# ----------------------------------------------------------------- protocol
def pad_to_16(img: jnp.ndarray) -> Tuple[jnp.ndarray, Tuple[int, ...]]:
    """amt utils.InputPadder(padding=16): pad H and W up to multiples of
    16, split evenly ('sintel' style), replicate."""
    H, W = img.shape[-3:-1]
    ph = (-H) % 16
    pw = (-W) % 16
    pads = (ph // 2, ph - ph // 2, pw // 2, pw - pw // 2)
    out = jnp.pad(img, ((0, 0), (pads[0], pads[1]), (pads[2], pads[3]),
                        (0, 0)), mode="edge")
    return out, pads


def motion_smoothness_score(video: np.ndarray, amt_params: Params,
                            pair_chunk: int = 4) -> float:
    """FAITHFUL VBench motion_smoothness
    (eval/vbench/motion_smoothness.py:113-178): even frames kept,
    odd frames re-synthesized by AMT-S at t=0.5; score =
    (255 − mean|original_odd − interpolated|)/255.

    ``video``: (T, H, W, 3) float in [-1, 1]."""
    from videotuna_tpu.evalkit.raft import unpad
    v01 = (np.asarray(video, np.float32) + 1.0) / 2.0
    evens = v01[0::2]
    odds = v01[1::2]
    if evens.shape[0] < 2 or odds.shape[0] < 1:
        return 1.0
    padded, pads = pad_to_16(jnp.asarray(evens))
    model = AMT_S()
    apply_fn = jax.jit(lambda p, a, b, e: model.apply({"params": p},
                                                      a, b, e))
    n_pairs = evens.shape[0] - 1
    diffs: List[float] = []
    for s in range(0, n_pairs, pair_chunk):
        a = padded[s:s + pair_chunk]
        b = padded[s + 1:s + 1 + pair_chunk]
        nn_ = min(a.shape[0], b.shape[0])
        embt = jnp.full((nn_,), 0.5, jnp.float32)
        pred = apply_fn(amt_params, a[:nn_], b[:nn_], embt)
        pred = np.asarray(unpad(pred, pads))
        for i in range(nn_):
            if s + i >= odds.shape[0]:
                break
            # uint8-space MAE like the reference (tensor2img rounding)
            pi = np.round(np.clip(pred[i], 0, 1) * 255.0)
            oi = np.round(np.clip(odds[s + i], 0, 1) * 255.0)
            diffs.append(float(np.mean(np.abs(pi - oi))))
    if not diffs:
        return 1.0
    return (255.0 - float(np.mean(diffs))) / 255.0


# --------------------------------------------------------------- conversion
def amt_s_map():
    """torch AMT-S state-dict names → flax tree."""
    from videotuna_tpu.tools.convert_weights import ConversionMap, t_conv

    def t_convT(w: np.ndarray) -> np.ndarray:
        # ConvTranspose2d (in, out, kh, kw) → flipped (kh, kw, in, out)
        return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()

    rules = []

    def conv(src, dst):
        rules.append((rf"{src}\.weight", f"{dst}/kernel", t_conv))
        rules.append((rf"{src}\.bias", f"{dst}/bias", None))

    def prelu(src, dst):
        rules.append((rf"{src}\.weight", f"{dst}/weight", None))

    def convrelu(src, dst):
        conv(f"{src}.0", f"{dst}/conv")
        prelu(f"{src}.1", f"{dst}/prelu")

    def resblock(src, dst):
        for i in (1, 2, 3, 4):
            convrelu(f"{src}.conv{i}", f"{dst}/conv{i}")
        conv(f"{src}.conv5", f"{dst}/conv5")
        prelu(f"{src}.prelu", f"{dst}/prelu")

    def convblock(src, dst):
        convrelu(f"{src}.convblock.0", f"{dst}/cb0")
        resblock(f"{src}.convblock.1", f"{dst}/cb1")
        rules.append((rf"{src}\.convblock\.2\.weight", f"{dst}/cb2/kernel",
                      t_convT))
        rules.append((rf"{src}\.convblock\.2\.bias", f"{dst}/cb2/bias",
                      None))

    # feat_encoder (instance norm: conv params only)
    conv("feat_encoder.conv1", "feat_encoder/conv1")
    conv("feat_encoder.conv2", "feat_encoder/conv2")
    for L in (1, 2, 3):
        for Bl in (0, 1):
            p = rf"feat_encoder\.layer{L}\.{Bl}"
            o = f"feat_encoder/layer{L}_{Bl}"
            for c in ("conv1", "conv2", "conv3"):
                rules.append((rf"{p}\.{c}\.weight", f"{o}/{c}/kernel",
                              t_conv))
                rules.append((rf"{p}\.{c}\.bias", f"{o}/{c}/bias", None))
            rules.append((rf"{p}\.downsample\.0\.weight",
                          f"{o}/downsample/kernel", t_conv))
            rules.append((rf"{p}\.downsample\.0\.bias",
                          f"{o}/downsample/bias", None))
    # pyramid encoder
    for i in (1, 2, 3, 4):
        convrelu(f"encoder.pyramid{i}.0", f"encoder/pyramid{i}_0")
        convrelu(f"encoder.pyramid{i}.1", f"encoder/pyramid{i}_1")
    # decoders
    convblock("decoder4", "decoder4")
    convblock("decoder3", "decoder3")
    convblock("decoder2", "decoder2")
    convblock("decoder1", "decoder1")
    # update blocks
    for u in ("update4", "update3", "update2"):
        for c in ("convc1", "convf1", "convf2", "conv"):
            conv(f"{u}.{c}", f"{u}/{c}")
        conv(f"{u}.gru.0", f"{u}/gru0")
        conv(f"{u}.gru.2", f"{u}/gru2")
        conv(f"{u}.feat_head.0", f"{u}/feat0")
        conv(f"{u}.feat_head.2", f"{u}/feat2")
        conv(f"{u}.flow_head.0", f"{u}/flow0")
        conv(f"{u}.flow_head.2", f"{u}/flow2")
    # comb block
    conv("comb_block.0", "comb0/conv")
    prelu("comb_block.1", "comb0/prelu")
    conv("comb_block.2", "comb2")
    return ConversionMap(rules)


def convert_amt_state_dict(sd) -> Params:
    import numpy as np
    from videotuna_tpu.tools.convert_weights import strip_prefixes
    sd = {k: np.asarray(v) for k, v in sd.items()}
    sd = strip_prefixes(sd, ("module.", "model."))
    return amt_s_map().convert(sd, strict=True)
