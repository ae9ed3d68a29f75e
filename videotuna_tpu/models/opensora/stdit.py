"""STDiT — Open-Sora v1.0 spatial-temporal DiT, TPU-native.

Capability parity with the reference ``STDiT``
(/root/reference/videotuna/models/opensora/models/stdit/stdit.py:34-313):
patchify (1,2,2) → [spatial attn → temporal attn → T5 cross-attn → MLP] ×
depth with PixArt-style t2i modulation (shared 6-way scale/shift table +
per-timestep offsets), sincos spatial pos-embed, temporal pos-embed added
before the first temporal attention, T2I final layer, optional sigma
prediction (out_ch = 2·in_ch).

TPU-first design decisions (vs the reference):
- channel-last (B, T, H, W, C) latents; tokens kept as (B, T, S, C) so the
  spatial/temporal attention factorization is a reshape, not a rearrange copy;
- sequence parallelism is *not* baked into the module (reference
  SeqParallelAttention, stdit.py:52-56): the flow applies sharding constraints
  / shard_map outside, so one module serves 1..N chips;
- attention runs through the Pallas flash kernel (kernels/attention.py);
- no variable-length y packing (reference masked_select, stdit.py:272-279):
  we keep static shapes and mask via attention bias — XLA-friendly.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from videotuna_tpu.core.registry import register
from videotuna_tpu.parallel.sharding import constrain_batch
from videotuna_tpu.models.layers import (Attention, Mlp, PatchEmbed3D,
                                         TimestepEmbedder, modulate,
                                         unpatchify_3d)

Dtype = Any


def sincos_pos_embed_2d(dim: int, h: int, w: int,
                        scale: float = 1.0) -> jnp.ndarray:
    """2D sincos position table (h·w, dim), built from traced jnp ops so it
    is computed on device rather than embedded as a multi-MB HLO literal
    (a 32×32 grid at dim 1152 would otherwise ship ~4.7 MB of constants
    with every program)."""
    def one_axis(d, n):
        omega = 1.0 / (10000.0 ** (jnp.arange(d // 2, dtype=jnp.float32)
                                   / (d // 2)))
        pos = jnp.arange(n, dtype=jnp.float32) / scale
        out = pos[:, None] * omega[None]
        return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1)

    emb_h = one_axis(dim // 2, h)            # (h, dim/2)
    emb_w = one_axis(dim // 2, w)            # (w, dim/2)
    # reference get_2d_sincos_pos_embed builds meshgrid(w, h) and embeds
    # grid[0] (the W coordinate) into the FIRST half — checkpoint parity
    # requires the same half order
    grid = jnp.concatenate([
        jnp.tile(emb_w, (h, 1)),
        jnp.repeat(emb_h, w, axis=0),
    ], axis=1)
    return grid


def pos_embed_2d_dynamic(dim: int, h: int, w: int, scale,
                         base_size: int) -> jnp.ndarray:
    """OpenSora-1.2 PositionEmbedding2D (blocks.py:799-838): [sin, cos]
    halves per axis, emb_h/emb_w concatenated, positions divided by the
    dynamic resolution ``scale`` and renormalized by ``base_size`` —
    numerically identical to the reference (verified to 6e-8)."""
    half = dim // 2
    inv = 1.0 / (10000 ** (jnp.arange(0, half, 2, dtype=jnp.float32)
                           / half))
    gh = jnp.arange(h, dtype=jnp.float32) / scale * (base_size / h)
    gw = jnp.arange(w, dtype=jnp.float32) / scale * (base_size / w)
    GH = jnp.tile(gw[:, None], (1, h)).T.reshape(-1)
    GW = jnp.tile(gh[None, :], (w, 1)).T.reshape(-1)

    def emb(t):
        out = t[:, None] * inv[None]
        return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=-1)

    return jnp.concatenate([emb(GH), emb(GW)], axis=-1)


def sincos_pos_embed_1d(dim: int, n: int, scale: float = 1.0) -> jnp.ndarray:
    omega = 1.0 / (10000.0 ** (jnp.arange(dim // 2, dtype=jnp.float32)
                               / (dim // 2)))
    pos = jnp.arange(n, dtype=jnp.float32) / scale
    out = pos[:, None] * omega[None]
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1)


class STDiTBlock(nn.Module):
    """One STDiT layer. ``as_cell=True`` gives the (carry, ys) signature
    required by ``nn.scan`` (used for the deep configs — 28 inlined blocks
    take minutes to XLA-compile; one scanned block compiles once).

    In scan mode ``tpe`` is passed to every layer with a per-layer scalar
    ``tpe_gate`` (1.0 only for layer 0), which reproduces the reference's
    "temporal pos-embed added in the first block only" semantics
    (stdit.py:288-299) under a uniform scan body."""
    hidden: int
    heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    as_cell: bool = False
    qk_norm: bool = False            # STDiT2/3 variant feature
    temporal_rope: bool = False      # STDiT3: RoPE instead of additive tpe
    temporal_mod: bool = False       # STDiT5-7: own 3-way temporal adaLN
    # "both" (STDiT1-7: spatial+temporal in one block) | "spatial" |
    # "temporal" (STDiT8 / upstream OpenSora 1.2: paired single-axis
    # blocks, stdit8.py:104-184 — one attention + cross + MLP each)
    attn_mode: str = "both"

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray, t6: jnp.ndarray,
                 y_mask: Optional[jnp.ndarray] = None,
                 tpe: Optional[jnp.ndarray] = None,
                 tpe_gate: Optional[jnp.ndarray] = None,
                 t3: Optional[jnp.ndarray] = None,
                 t6_zero: Optional[jnp.ndarray] = None,
                 t3_zero: Optional[jnp.ndarray] = None,
                 x_mask: Optional[jnp.ndarray] = None):
        # x: (B, T, S, C); y: (B, L, C); t6: (B, 6, C); t3: (B, 3, C)
        # x_mask: (B, T) bool — True = real frame, False = masked frame
        # conditioned at the zero-timestep modulation (reference
        # stdit5.py:118-209 t_mask_select; OpenSora 1.1/1.2 image-video
        # joint training / v2v frame conditioning)
        b, tt, ss, c = x.shape
        table = self.param("scale_shift_table",
                           nn.initializers.normal(self.hidden ** -0.5),
                           (6, self.hidden))

        def six_mods(tvec):
            mods = table[None] + tvec.astype(jnp.float32)
            return [m.astype(self.dtype).reshape(b, 1, 1, self.hidden)
                    for m in jnp.split(mods, 6, axis=1)]

        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = six_mods(t6)
        if x_mask is not None and t6_zero is not None:
            zmods = six_mods(t6_zero)
            fm = x_mask.astype(self.dtype).reshape(b, tt, 1, 1)

            def fsel(a, z):
                return a * fm + z * (1.0 - fm)
        else:
            def fsel(a, z):
                return a

            zmods = [None] * 6

        norm = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                            dtype=self.dtype, name="norm1")
        x_n = norm(x)
        x_m = fsel(x_n * (1.0 + scale_msa) + shift_msa,
                   None if zmods[0] is None else
                   x_n * (1.0 + zmods[1]) + zmods[0])

        if self.attn_mode == "temporal":
            # STDiT8 temporal block: the single attention runs over
            # frames on the MODULATED input; gate applies after
            x_t = x_m.transpose(0, 2, 1, 3).reshape(b * ss, tt, c)
            rope_t8 = None
            if self.temporal_rope:
                from videotuna_tpu.models.layers import rope_frequencies
                rope_t8 = rope_frequencies(self.hidden // self.heads,
                                           jnp.arange(tt))
            elif tpe is not None:
                x_t = x_t + tpe.astype(self.dtype)
            x_t = Attention(self.heads, qk_norm=self.qk_norm,
                            dtype=self.dtype, name="attn")(x_t,
                                                           rope=rope_t8)
            x_t = x_t.reshape(b, ss, tt, c).transpose(0, 2, 1, 3)
            x = x + fsel(gate_msa * x_t,
                         None if zmods[2] is None else zmods[2] * x_t)
        else:
            # spatial attention: fold T into batch
            x_s = x_m.reshape(b * tt, ss, c)
            x_s = Attention(self.heads, qk_norm=self.qk_norm,
                            dtype=self.dtype, name="attn")(x_s)
            x_s = x_s.reshape(b, tt, ss, c)
            x = x + fsel(gate_msa * x_s,
                         None if zmods[2] is None else zmods[2] * x_s)

        # temporal branch modulation: shared 6-way gate (STDiT1-4) or the
        # separate 3-way temporal table (STDiT5-7 scale_shift_table_temporal)
        if self.temporal_mod and self.attn_mode == "both":
            t_table = self.param("scale_shift_table_temporal",
                                 nn.initializers.normal(
                                     self.hidden ** -0.5),
                                 (3, self.hidden))

            def three_mods(tvec):
                mods = t_table[None] + tvec.astype(jnp.float32)
                return [m.astype(self.dtype).reshape(b, 1, 1, self.hidden)
                        for m in jnp.split(mods, 3, axis=1)]

            shift_tmp, scale_tmp, gate_tmp = three_mods(t3)
            ztmp = three_mods(t3_zero) \
                if (x_mask is not None and t3_zero is not None) \
                else [None] * 3
            norm_t = nn.LayerNorm(use_bias=False, use_scale=False,
                                  epsilon=1e-6, dtype=self.dtype,
                                  name="norm_temp")
            x_n = norm_t(x)
            x_tm = fsel(x_n * (1.0 + scale_tmp) + shift_tmp,
                        None if ztmp[0] is None else
                        x_n * (1.0 + ztmp[1]) + ztmp[0])
            gate_t, zgate_t = gate_tmp, ztmp[2]
        else:
            x_tm = x
            gate_t, zgate_t = gate_msa, zmods[2]

        if self.attn_mode == "both":
            # temporal attention: fold S into batch
            x_t = x_tm.transpose(0, 2, 1, 3).reshape(b * ss, tt, c)
            rope_t = None
            if self.temporal_rope:
                from videotuna_tpu.models.layers import rope_frequencies
                rope_t = rope_frequencies(self.hidden // self.heads,
                                          jnp.arange(tt))
            elif tpe is not None:
                add = tpe.astype(self.dtype)
                if tpe_gate is not None:
                    add = add * tpe_gate.astype(self.dtype)
                x_t = x_t + add
            x_t = Attention(self.heads, qk_norm=self.qk_norm,
                            dtype=self.dtype, name="attn_temp")(
                x_t, rope=rope_t)
            x_t = x_t.reshape(b, ss, tt, c).transpose(0, 2, 1, 3)
            x = x + fsel(gate_t * x_t,
                         None if zgate_t is None else zgate_t * x_t)

        # cross attention to text tokens
        x_flat = x.reshape(b, tt * ss, c)
        x_flat = x_flat + Attention(self.heads, dtype=self.dtype,
                                    name="cross_attn")(
            x_flat, context=y, mask=y_mask)
        x = x_flat.reshape(b, tt, ss, c)

        # MLP
        norm2 = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                             dtype=self.dtype, name="norm2")
        x_n = norm2(x)
        x_m = fsel(x_n * (1.0 + scale_mlp) + shift_mlp,
                   None if zmods[3] is None else
                   x_n * (1.0 + zmods[4]) + zmods[3])
        x_mlp = Mlp(int(self.hidden * self.mlp_ratio),
                    act=lambda v: nn.gelu(v, approximate=True),
                    dtype=self.dtype, name="mlp")(x_m)
        x = x + fsel(gate_mlp * x_mlp,
                     None if zmods[5] is None else zmods[5] * x_mlp)
        if self.as_cell:
            return x, None
        return x


class PairedSTDiTCell(nn.Module):
    """One (spatial-only, temporal-only) block pair — the STDiT8 /
    upstream OpenSora 1.2 layout (stdit8.py:285-318, forward :489)."""
    hidden: int
    heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    qk_norm: bool = False
    temporal_rope: bool = False
    as_cell: bool = False

    @nn.compact
    def __call__(self, x, y, t6, y_mask=None, tpe=None,
                 t6_zero=None, x_mask=None):
        x = STDiTBlock(self.hidden, self.heads, self.mlp_ratio,
                       dtype=self.dtype, qk_norm=self.qk_norm,
                       attn_mode="spatial", name="spatial")(
            x, y, t6, y_mask=y_mask, t6_zero=t6_zero, x_mask=x_mask)
        x = STDiTBlock(self.hidden, self.heads, self.mlp_ratio,
                       dtype=self.dtype, qk_norm=self.qk_norm,
                       temporal_rope=self.temporal_rope,
                       attn_mode="temporal", name="temporal")(
            x, y, t6, y_mask=y_mask, tpe=tpe, t6_zero=t6_zero,
            x_mask=x_mask)
        if self.as_cell:
            return x, None
        return x


@register("videotuna_tpu.models.opensora.STDiT",
          aliases=[
              "videotuna.models.opensora.models.stdit.stdit.STDiT",
              "videotuna.models.opensora.models.stdit.stdit.STDiT_XL_2",
          ])
class STDiT(nn.Module):
    """Args mirror the reference constructor (stdit.py:137-160)."""
    input_size: Tuple[int, int, int] = (16, 32, 32)
    in_channels: int = 4
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    pred_sigma: bool = True
    caption_channels: int = 4096
    model_max_length: int = 120
    space_scale: float = 1.0
    time_scale: float = 1.0
    dtype: Dtype = jnp.float32
    remat: bool = False
    scan_blocks: bool = False
    qk_norm: bool = False            # STDiT2/3: per-head qk RMSNorm
    temporal_rope: bool = False      # STDiT3: rotary temporal positions
    temporal_mod: bool = False       # STDiT5-7: separate temporal adaLN
    paired_blocks: bool = False      # STDiT8/OpenSora-1.2: spatial+temporal
    # single-axis block pairs instead of fused dual-attention blocks
    dynamic_pos_embed: bool = False  # OpenSora-1.2 resolution-scaled pos
    input_sq_size: float = 512.0     # embed + fps SizeEmbedder conditioning

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.pred_sigma else self.in_channels

    @nn.compact
    def __call__(self, x: Optional[jnp.ndarray] = None,
                 timestep: Optional[jnp.ndarray] = None,
                 y: Optional[jnp.ndarray] = None,
                 mask: Optional[jnp.ndarray] = None,
                 stage: str = "all",
                 tok: Optional[jnp.ndarray] = None,
                 t6: Optional[jnp.ndarray] = None,
                 t_emb: Optional[jnp.ndarray] = None,
                 use_tpe: bool = True,
                 x_mask: Optional[jnp.ndarray] = None,
                 fps: Optional[jnp.ndarray] = None,
                 height: Optional[jnp.ndarray] = None,
                 width: Optional[jnp.ndarray] = None) -> Any:
        """x: (B, T, H, W, C) latents; timestep: (B,); y: (B, L, C_cap) text
        states; mask: (B, L) bool. Returns (B, T, H, W, C_out).

        ``stage`` partitions the SAME forward into separately-jittable
        pieces (bench.py's remote-compile workaround runs embed → 7×4-layer
        block chunks → head as chained programs — every stage executes THIS
        class's code, so the bench cannot drift from the model):
        - "all" (default): full forward;
        - "embed": → (tok, t6, y_emb, t_emb);
        - "blocks": runs this instance's ``depth`` blocks on ``tok`` given
          (y_emb, t6); for a sub-stack, instantiate with depth=K and feed a
          K-layer slice of the scanned block params; ``use_tpe`` gates the
          temporal pos-embed (first chunk only);
        - "head": T2I final layer on ``tok`` given ``t_emb``.
        """
        b = x.shape[0] if stage in ("all", "embed") else tok.shape[0]
        pt, ph, pw = self.patch_size
        if stage in ("all", "embed"):
            t_in, h_in, w_in = x.shape[1:4]
        else:
            t_in, h_in, w_in = self.input_size
        tt, hh, ww = t_in // pt, h_in // ph, w_in // pw
        ss = hh * ww

        tpe = sincos_pos_embed_1d(self.hidden_size, tt, self.time_scale)

        if stage in ("all", "embed"):
            x = x.astype(self.dtype)
            x = constrain_batch(x)
            tok = PatchEmbed3D(self.hidden_size, self.patch_size,
                               dtype=self.dtype, flatten=False,
                               name="x_embedder")(x)
            tok = constrain_batch(
                tok.reshape(b, tt, ss, self.hidden_size))
            if self.dynamic_pos_embed:
                res_sq = jnp.sqrt(height[0] * width[0]) \
                    if height is not None else float(h_in * 8)
                pos = pos_embed_2d_dynamic(
                    self.hidden_size, hh, ww,
                    res_sq / self.input_sq_size,
                    int(round(ss ** 0.5))).reshape(hh * ww,
                                                   self.hidden_size)
            else:
                pos = sincos_pos_embed_2d(self.hidden_size, hh, ww,
                                          self.space_scale)
            tok = tok + pos[None, None].astype(self.dtype)

            t_embedder = TimestepEmbedder(self.hidden_size,
                                          dtype=self.dtype,
                                          name="t_embedder")
            t_block = nn.Dense(6 * self.hidden_size, dtype=self.dtype,
                               name="t_block")
            t_emb = t_embedder(timestep)
            fps_embedder = None
            if self.dynamic_pos_embed and fps is not None:
                # OpenSora-1.2: fps SizeEmbedder added to the timestep
                # embedding (stdit8.py:456-464)
                fps_embedder = TimestepEmbedder(
                    self.hidden_size, dtype=self.dtype,
                    name="fps_embedder")
                t_emb = t_emb + fps_embedder(fps)
            t6 = constrain_batch(
                t_block(nn.silu(t_emb)).reshape(b, 6, self.hidden_size))
            t3 = t6_zero = t3_zero = None
            if self.temporal_mod:
                t_block_temp = nn.Dense(3 * self.hidden_size,
                                        dtype=self.dtype,
                                        name="t_block_temp")
                t3 = constrain_batch(t_block_temp(nn.silu(t_emb)).reshape(
                    b, 3, self.hidden_size))
            if x_mask is not None:
                # masked frames are conditioned at timestep 0 (reference
                # stdit5.py:438-445 t0 path)
                t0_emb = t_embedder(jnp.zeros_like(timestep))
                if fps_embedder is not None:
                    t0_emb = t0_emb + fps_embedder(fps)
                t6_zero = constrain_batch(t_block(nn.silu(t0_emb)).reshape(
                    b, 6, self.hidden_size))
                if self.temporal_mod:
                    t3_zero = constrain_batch(
                        t_block_temp(nn.silu(t0_emb)).reshape(
                            b, 3, self.hidden_size))

            y = nn.Dense(self.hidden_size, dtype=self.dtype,
                         name="y_proj1")(y.astype(self.dtype))
            y = nn.gelu(y, approximate=True)
            y = constrain_batch(nn.Dense(self.hidden_size, dtype=self.dtype,
                                         name="y_proj2")(y))
            t_emb_zero = None
            if x_mask is not None:
                t_emb_zero = t0_emb
            if stage == "embed":
                return tok, t6, y, t_emb
        elif stage == "blocks":
            t3 = t6_zero = t3_zero = None    # staged path: base features
            if not use_tpe:
                tpe = None
        elif stage != "head":
            raise ValueError(f"unknown stage {stage}")

        if stage == "head":
            pass
        elif self.paired_blocks:
            if self.scan_blocks:
                cell_cls = PairedSTDiTCell
                if self.remat:
                    cell_cls = nn.remat(PairedSTDiTCell, prevent_cse=False)
                scan_cls = nn.scan(
                    cell_cls, variable_axes={"params": 0},
                    split_rngs={"params": True},
                    in_axes=(nn.broadcast,) * 6, length=self.depth)
                tok, _ = scan_cls(self.hidden_size, self.num_heads,
                                  self.mlp_ratio, dtype=self.dtype,
                                  qk_norm=self.qk_norm,
                                  temporal_rope=self.temporal_rope,
                                  as_cell=True, name="pairs")(
                    tok, y, t6, mask, tpe, t6_zero, x_mask)
            else:
                for i in range(self.depth):
                    tok = PairedSTDiTCell(
                        self.hidden_size, self.num_heads, self.mlp_ratio,
                        dtype=self.dtype, qk_norm=self.qk_norm,
                        temporal_rope=self.temporal_rope,
                        name=f"pair_{i}")(
                        tok, y, t6, y_mask=mask,
                        tpe=tpe if i == 0 else None,
                        t6_zero=t6_zero, x_mask=x_mask)
        elif self.scan_blocks:
            cell_cls = STDiTBlock
            if self.remat:
                cell_cls = nn.remat(STDiTBlock, prevent_cse=False)
            scan_cls = nn.scan(
                cell_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast,
                         nn.broadcast, 0, nn.broadcast, nn.broadcast,
                         nn.broadcast, nn.broadcast),
                length=self.depth)
            gates = jnp.zeros((self.depth, 1, 1),
                              self.dtype).at[0].set(1.0)
            cell = scan_cls(self.hidden_size, self.num_heads, self.mlp_ratio,
                            dtype=self.dtype, as_cell=True,
                            qk_norm=self.qk_norm,
                            temporal_rope=self.temporal_rope,
                            temporal_mod=self.temporal_mod, name="blocks")
            tok, _ = cell(tok, y, t6, mask, tpe, gates, t3, t6_zero,
                          t3_zero, x_mask)
        else:
            block_cls = STDiTBlock
            if self.remat:
                block_cls = nn.remat(STDiTBlock, prevent_cse=False)
            for i in range(self.depth):
                tok = block_cls(self.hidden_size, self.num_heads,
                                self.mlp_ratio, dtype=self.dtype,
                                qk_norm=self.qk_norm,
                                temporal_rope=self.temporal_rope,
                                temporal_mod=self.temporal_mod,
                                name=f"block_{i}")(
                    tok, y, t6, y_mask=mask,
                    tpe=tpe if i == 0 else None, t3=t3,
                    t6_zero=t6_zero, t3_zero=t3_zero, x_mask=x_mask)

        if stage == "blocks":
            return tok

        # T2I final layer (reference T2IFinalLayer; with x_mask the
        # masked frames use the timestep-0 modulation — stdit8.py:508,
        # blocks.py:611-628)
        final_table = self.param(
            "final_scale_shift_table",
            nn.initializers.normal(self.hidden_size ** -0.5),
            (2, self.hidden_size))

        def fin_mods(te):
            fin = final_table[None] + te.astype(jnp.float32)[:, None, :]
            sh, sc = jnp.split(fin, 2, axis=1)
            return (sh.astype(self.dtype).reshape(b, 1, 1, -1),
                    sc.astype(self.dtype).reshape(b, 1, 1, -1))

        shift, scale = fin_mods(t_emb)
        final_norm = nn.LayerNorm(use_bias=False, use_scale=False,
                                  epsilon=1e-6, dtype=self.dtype,
                                  name="final_norm")
        tok = final_norm(tok) * (1.0 + scale) + shift
        if stage == "all" and x_mask is not None \
                and t_emb_zero is not None:
            # replicate the reference exactly (T2IFinalLayer,
            # blocks.py:611-624): the t0 branch re-norms and re-modulates
            # the ALREADY t-modulated tokens — masked frames get the
            # double modulation, as shipped
            sh0, sc0 = fin_mods(t_emb_zero)
            tok0 = final_norm(tok) * (1.0 + sc0) + sh0
            fm = x_mask.astype(self.dtype).reshape(b, tt, 1, 1)
            tok = tok * fm + tok0 * (1.0 - fm)
        out_dim = pt * ph * pw * self.out_channels
        tok = nn.Dense(out_dim, dtype=self.dtype, name="final_linear")(tok)

        tok = constrain_batch(tok.reshape(b, tt * ss, out_dim))
        out = unpatchify_3d(tok, (tt, hh, ww), self.patch_size,
                            self.out_channels)
        return constrain_batch(out.astype(jnp.float32))


def stdit_xl_2(**kwargs) -> STDiT:
    kwargs.setdefault("hidden_size", 1152)
    kwargs.setdefault("depth", 28)
    kwargs.setdefault("num_heads", 16)
    return STDiT(**kwargs)
