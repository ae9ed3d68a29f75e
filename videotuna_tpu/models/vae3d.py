"""3D causal VAE — the CogVideoX / HunyuanVideo-884 / Wan family, TPU-native.

Capability parity targets (SURVEY.md §2.3, hard part #2):
- CogVideoX ``AutoencoderKLCogVideoX`` (config-instantiated in
  /root/reference/configs/004_cogvideox/*; context-parallel variant
  models/cogvideo_sat/vae_modules/cp_enc_dec.py:1070),
- Hunyuan ``AutoencoderKLCausal3D``
  (models/hunyuan/hyvideo_i2v/vae/autoencoder_kl_causal_3d.py:55, tiled
  encode/decode :262-...),
- Wan ``WanVAE_`` (models/wan/wan/modules/vae.py:637).

All three share: causal temporal convs (front-replicate padding so frame i
sees only frames ≤ i), 8× spatial / 4× temporal compression mapping 4k+1
frames → k+1 latent frames, z=16 channels, diagonal-Gaussian posterior.

TPU-first design:
- channel-last (B, T, H, W, C) NDHWC convs;
- causal padding is an explicit pad-then-VALID conv (static shapes, fuses);
- temporal *tiling* for memory is a ``lax.map`` over latent-time chunks with
  causal context carried explicitly (replaces the reference's Python tiling
  loops and rank-0-only decode);
- the context-parallel variant (P7) shards the time axis over the ``sp``
  mesh axis with ``ppermute`` halo exchange — see parallel/cp_vae.py.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from videotuna_tpu.core.registry import register

Dtype = Any


def _groups(c: int) -> int:
    for g in (32, 16, 8, 4, 2):
        if c % g == 0:
            return g
    return 1


class FrameGroupNorm(nn.Module):
    """GroupNorm with per-frame statistics (over H, W, C/G only).

    torch GroupNorm on (B, C, T, H, W) pools statistics over the whole clip,
    which (a) breaks strict temporal causality and (b) makes temporally tiled
    decode inexact (the reference papers that over with overlap blending).
    Per-frame stats keep latent frame i a pure function of input frames ≤ i,
    so temporal tiles concatenate exactly.
    """
    num_groups: int
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t = x.shape[:2]
        y = x.reshape(b * t, *x.shape[2:])
        y = nn.GroupNorm(self.num_groups, epsilon=self.epsilon,
                         dtype=jnp.float32, name="gn")(y)
        return y.reshape(x.shape).astype(x.dtype)


class CausalConv3D(nn.Module):
    """3D conv, causal in time: front-pad (k_t−1) frames by edge replication,
    symmetric spatial SAME padding, then VALID conv.

    ``streaming=True`` enables exact O(T) chunked processing: the front pad
    comes from a ``cache`` variable holding the previous chunk's last
    (k_t−1) input frames (``first_chunk=True`` edge-replicates instead and
    primes the cache) — the state-carry equivalent of the reference Wan
    VAE's ``feat_cache`` streaming decode (wan/modules/vae.py)."""
    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, streaming: bool = False,
                 first_chunk: bool = True) -> jnp.ndarray:
        kt, kh, kw = self.kernel
        st, sh, sw = self.strides
        pt = kt - 1
        ph = ((kh - 1) // 2, kh // 2)
        pw = ((kw - 1) // 2, kw // 2)
        if pt > 0:
            if streaming:
                cache = self.variable(
                    "cache", "front",
                    lambda: jnp.zeros(
                        (x.shape[0], pt) + x.shape[2:], x.dtype))
                front = jnp.repeat(x[:, :1], pt, axis=1) if first_chunk \
                    else cache.value.astype(x.dtype)
                x = jnp.concatenate([front, x], axis=1)
                # next chunk's context = last pt frames of the padded
                # stream (handles chunks shorter than pt, e.g. the 1-frame
                # first chunk)
                cache.value = x[:, -pt:]
            else:
                front = jnp.repeat(x[:, :1], pt, axis=1)
                x = jnp.concatenate([front, x], axis=1)
        x = jnp.pad(x, ((0, 0), (0, 0), ph, pw, (0, 0)))
        return nn.Conv(self.features, self.kernel,
                       strides=(st, sh, sw), padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class ResBlock3D(nn.Module):
    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, streaming: bool = False,
                 first_chunk: bool = True) -> jnp.ndarray:
        c = x.shape[-1]
        skw = dict(streaming=streaming, first_chunk=first_chunk)
        h = FrameGroupNorm(_groups(c), name="norm1")(x)
        h = nn.silu(h).astype(self.dtype)
        h = CausalConv3D(self.out_ch, dtype=self.dtype, name="conv1")(
            h, **skw)
        h = FrameGroupNorm(_groups(self.out_ch), name="norm2")(h)
        h = nn.silu(h).astype(self.dtype)
        h = CausalConv3D(self.out_ch, dtype=self.dtype, name="conv2")(
            h, **skw)
        if c != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1, 1), dtype=self.dtype,
                        name="shortcut")(x)
        return x + h


class Encoder3D(nn.Module):
    """Down path: per level, res blocks then spatial (and on the marked
    levels temporal) downsampling via strided causal conv."""
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 16
    temporal_down_levels: Sequence[int] = (0, 1)   # 2 levels → 4× temporal
    temporal_down_factors: Optional[Sequence[int]] = None  # e.g. (2, 3)=6×
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = CausalConv3D(self.ch, dtype=self.dtype, name="conv_in")(x)
        factors = dict(zip(self.temporal_down_levels,
                           self.temporal_down_factors
                           or (2,) * len(self.temporal_down_levels)))
        for i, mult in enumerate(self.ch_mult):
            for j in range(self.num_res_blocks):
                h = ResBlock3D(self.ch * mult, dtype=self.dtype,
                               name=f"down_{i}_block_{j}")(h)
            if i != len(self.ch_mult) - 1:
                ts = factors.get(i, 1)
                h = CausalConv3D(h.shape[-1], strides=(ts, 2, 2),
                                 dtype=self.dtype,
                                 name=f"down_{i}_downsample")(h)
        h = ResBlock3D(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = ResBlock3D(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)
        h = FrameGroupNorm(_groups(h.shape[-1]), name="norm_out")(h)
        h = nn.silu(h).astype(self.dtype)
        return CausalConv3D(2 * self.z_channels, dtype=self.dtype,
                            name="conv_out")(h)


class Decoder3D(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    out_ch: int = 3
    temporal_up_levels: Optional[Sequence[int]] = None  # default: top 2
    temporal_up_factors: Optional[Sequence[int]] = None  # e.g. (2, 3)=6×
    dtype: Dtype = jnp.float32

    @property
    def _t_up(self) -> Tuple[int, ...]:
        if self.temporal_up_levels is not None:
            return tuple(self.temporal_up_levels)
        n = len(self.ch_mult)
        return (n - 2, n - 1)

    @property
    def _t_up_factors(self) -> dict:
        return dict(zip(self._t_up, self.temporal_up_factors
                        or (2,) * len(self._t_up)))

    @nn.compact
    def __call__(self, z: jnp.ndarray, streaming: bool = False,
                 first_chunk: bool = True) -> jnp.ndarray:
        skw = dict(streaming=streaming, first_chunk=first_chunk)
        h = CausalConv3D(self.ch * self.ch_mult[-1], dtype=self.dtype,
                         name="conv_in")(z, **skw)
        h = ResBlock3D(h.shape[-1], dtype=self.dtype,
                       name="mid_block_1")(h, **skw)
        h = ResBlock3D(h.shape[-1], dtype=self.dtype,
                       name="mid_block_2")(h, **skw)
        for i, mult in reversed(list(enumerate(self.ch_mult))):
            for j in range(self.num_res_blocks + 1):
                h = ResBlock3D(self.ch * mult, dtype=self.dtype,
                               name=f"up_{i}_block_{j}")(h, **skw)
            if i != 0:
                b, t, hh, ww, c = h.shape
                tu = self._t_up_factors.get(i, 1)
                # spatial NN-upsample; temporal causal upsample duplicates
                # each frame ``tu``× except the GLOBAL first frame stays
                # single (tu·k+1 ↔ k+1 map; Mochi's 6× = 2×3 factors) —
                # in streaming mode only the first chunk contains it
                h = jax.image.resize(h, (b, t, hh * 2, ww * 2, c),
                                     "nearest")
                if tu > 1:
                    if not streaming or first_chunk:
                        first = h[:, :1]
                        rest = jnp.repeat(h[:, 1:], tu, axis=1)
                        h = jnp.concatenate([first, rest], axis=1)
                    else:
                        h = jnp.repeat(h, tu, axis=1)
                h = CausalConv3D(c, dtype=self.dtype,
                                 name=f"up_{i}_upsample")(h, **skw)
        h = FrameGroupNorm(_groups(h.shape[-1]), name="norm_out")(h)
        h = nn.silu(h).astype(self.dtype)
        return CausalConv3D(self.out_ch, dtype=self.dtype,
                            name="conv_out")(h, **skw)


@register("videotuna_tpu.models.CausalVAE3D")
class CausalVAE3D(nn.Module):
    """4k+1 frames ↔ k+1 latent frames; 8× spatial; z=16 (defaults match
    CogVideoX/Hunyuan-884/Wan)."""
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 16
    embed_dim: int = 16
    scale_factor: float = 1.0       # Cog 1.15258426/0.7 etc set via config
    temporal_tile_latent: Optional[int] = None  # latent-frame tile size
    temporal_factors: Optional[Sequence[int]] = None  # (2,3) → 6× (Mochi)
    dtype: Dtype = jnp.float32

    def setup(self):
        n = len(self.ch_mult)
        dn_lv = tuple(range(len(self.temporal_factors))) \
            if self.temporal_factors else (0, 1)
        self.encoder = Encoder3D(self.ch, self.ch_mult, self.num_res_blocks,
                                 self.z_channels,
                                 temporal_down_levels=dn_lv,
                                 temporal_down_factors=self.temporal_factors,
                                 dtype=self.dtype)
        up_lv = tuple(range(n - len(dn_lv), n)) \
            if self.temporal_factors else None
        up_f = tuple(reversed(self.temporal_factors)) \
            if self.temporal_factors else None
        self.decoder = Decoder3D(self.ch, self.ch_mult, self.num_res_blocks,
                                 temporal_up_levels=up_lv,
                                 temporal_up_factors=up_f,
                                 dtype=self.dtype)

    @property
    def temporal_ratio(self) -> int:
        if self.temporal_factors:
            r = 1
            for f in self.temporal_factors:
                r *= f
            return r
        # one 2× temporal upsample per default _t_up level that actually
        # upsamples (level 0 never does) — 4× for the standard 4-level
        # config, config-derived otherwise
        n = len(self.ch_mult)
        return 2 ** len([i for i in (n - 2, n - 1) if i != 0])

    @property
    def spatial_ratio(self) -> int:
        return 2 ** (len(self.ch_mult) - 1)

    def encode(self, video: jnp.ndarray) -> jnp.ndarray:
        """(B, 4k+1, H, W, 3) → moments (B, k+1, H/8, W/8, 2·z)."""
        return self.encoder(video)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """(B, k+1, h, w, z) → (B, 4k+1, H, W, 3)."""
        return self.decoder(z)

    def decode_chunk(self, z: jnp.ndarray,
                     first_chunk: bool = True) -> jnp.ndarray:
        """One streaming chunk (run under ``apply(..., mutable=['cache'])``;
        see ``streaming_decode`` for the driver)."""
        return self.decoder(z, streaming=True, first_chunk=first_chunk)

    def decode_tiled(self, z: jnp.ndarray,
                     spatial_tile: int = 32,
                     overlap: int = 8) -> jnp.ndarray:
        """Spatially tiled decode with linear overlap blending — bounds peak
        HBM for 720p+ decodes (parity with the reference's tiled decode,
        hyvideo autoencoder_kl_causal_3d.py:262; Hunyuan decodes rank-0-only
        to dodge this, we just tile).

        Temporal chunking needs no blending at all: the per-frame
        normalization + causal convs make latent-time chunks exact when fed
        with their full causal prefix (see parallel/cp_vae.py for the
        multi-chip version)."""
        b, t, h, w, c = z.shape
        sr = self.spatial_ratio
        if h <= spatial_tile and w <= spatial_tile:
            return self.decode(z)
        step = spatial_tile - overlap
        ys = list(range(0, max(h - overlap, 1), step))
        xs = list(range(0, max(w - overlap, 1), step))
        out = jnp.zeros((b, 4 * (t - 1) + 1 if t > 1 else 1,
                         h * sr, w * sr, 3), jnp.float32)
        weight = jnp.zeros((1, 1, h * sr, w * sr, 1), jnp.float32)

        def ramp(n, lead, trail):
            r = jnp.ones((n,))
            if lead > 0:
                r = r.at[:lead].set(jnp.linspace(0, 1, lead + 1)[1:])
            if trail > 0:
                r = r.at[-trail:].set(jnp.linspace(1, 0, trail + 1)[:-1])
            return r

        for yi in ys:
            for xi in xs:
                y1 = min(yi + spatial_tile, h)
                x1 = min(xi + spatial_tile, w)
                tile = self.decode(z[:, :, yi:y1, xi:x1])
                th, tw = tile.shape[2], tile.shape[3]
                wy = ramp(th, overlap * sr if yi > 0 else 0,
                          overlap * sr if y1 < h else 0)
                wx = ramp(tw, overlap * sr if xi > 0 else 0,
                          overlap * sr if x1 < w else 0)
                wmap = (wy[:, None] * wx[None, :])[None, None, :, :, None]
                out = out.at[:, :, yi * sr:y1 * sr, xi * sr:x1 * sr].add(
                    tile * wmap)
                weight = weight.at[:, :, yi * sr:y1 * sr,
                                   xi * sr:x1 * sr].add(wmap)
        return out / jnp.maximum(weight, 1e-8)

    def decode_temporal_chunked(self, z: jnp.ndarray,
                                chunk: int = 8,
                                context: int = 6) -> jnp.ndarray:
        """Temporally chunked decode: each latent chunk is decoded together
        with its preceding ``context`` latent frames, and the context's
        output region is dropped. Because every temporal op is causal and
        normalization is per-frame, the result converges to the full decode
        as ``context`` covers the decoder's temporal receptive field — no
        overlap blending (the reference's tiled decoders blend because their
        GroupNorm statistics span the clip). Peak memory is
        O((chunk+context)/T) of the full decode."""
        b, t = z.shape[:2]
        if t <= chunk:
            return self.decode(z)
        outs = []
        start = 0
        while start < t:
            end = min(start + chunk, t)
            # ≥1 context frame so the chunk's own latents all sit in the
            # "non-first" (4-pixel) region of the causal 4k+1 mapping
            ctx = max(1, min(context, start)) if start > 0 else 0
            piece = self.decode(z[:, start - ctx:end])
            if start == 0:
                outs.append(piece)          # includes the 4k+1 head frame
            else:
                # piece covers latents (start−ctx … end): pixel length
                # 1+4·(ctx+cl−1); keep the trailing 4·cl for this chunk
                outs.append(piece[:, piece.shape[1] - 4 * (end - start):])
            start = end
        return jnp.concatenate(outs, axis=1)

    def __call__(self, video: jnp.ndarray) -> jnp.ndarray:
        moments = self.encode(video)
        mean = jnp.split(moments, 2, axis=-1)[0]
        return self.decode(mean)


def streaming_decode(vae: CausalVAE3D, params, z: jnp.ndarray,
                     chunk: int = 2) -> jnp.ndarray:
    """Exact O(T) streaming decode: latent frame 0 decodes alone (it maps
    to the single un-duplicated pixel frame), then uniform ``chunk``-sized
    latent chunks, with every causal conv's temporal context carried in the
    ``cache`` collection — identical output to ``vae.decode`` with peak
    activation memory O(chunk) instead of O(T).

    Two compiled programs total (first + steady-state), reused across
    chunks and across calls. Replaces the reference's overlap-blended
    temporal tiling (hyvideo autoencoder_kl_causal_3d.py tiled decode) with
    an exact recurrence (Wan feat_cache semantics, wan/modules/vae.py)."""
    import functools

    first_fn = jax.jit(functools.partial(
        vae.apply, method="decode_chunk", first_chunk=True,
        mutable=["cache"]))
    rest_fn = jax.jit(functools.partial(
        vae.apply, method="decode_chunk", first_chunk=False,
        mutable=["cache"]))

    out0, state = first_fn({"params": params}, z[:, :1])
    outs = [out0]
    t = z.shape[1]
    i = 1
    while i < t:
        j = min(i + chunk, t)
        if j - i < chunk:                  # pad tail chunk for one program
            zc = jnp.pad(z[:, i:j], ((0, 0), (0, chunk - (j - i)),
                                     (0, 0), (0, 0), (0, 0)))
        else:
            zc = z[:, i:j]
        out, state = rest_fn({"params": params, **state}, zc)
        keep = (j - i) * vae.temporal_ratio
        outs.append(out[:, :keep])
        i = j
    return jnp.concatenate(outs, axis=1)
