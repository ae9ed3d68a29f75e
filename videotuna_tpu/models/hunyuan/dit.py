"""HunyuanVideo DiT — dual/single-stream MMDiT with flow matching, TPU-native.

Capability parity with the reference ``HYVideoDiffusionTransformer``
(/root/reference/videotuna/models/hunyuan/hyvideo_i2v/modules/models.py:464;
``MMDoubleStreamBlock`` :25, ``MMSingleStreamBlock`` :300; RoPE
posemb_layers.py:310; LLaMA-state token refiner text_encoder/__init__.py:610):

- conditioning vector = timestep ⊕ pooled-CLIP ⊕ (optional) guidance embed;
- N double-stream blocks: img and txt streams with separate adaLN
  modulation/QKV/MLP but ONE joint attention over [img; txt];
- M single-stream blocks: concatenated sequence, fused qkv+mlp linear in,
  fused attn+mlp linear out;
- 3D RoPE on image/video tokens only (text tokens un-rotated);
- token refiner: small self-attention stack over LLaMA text states with
  timestep-gated modulation;
- final adaLN + linear → unpatchify.

TPU-first: one attention call per block over the concatenated sequence (maps
onto the Pallas flash kernel / ring attention for SP); blocks scanned for
compile time; RIFLEx temporal-frequency scaling enters via the rope tables
(models/layers.rope_3d temporal_scale).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from videotuna_tpu.core.registry import register
from videotuna_tpu.kernels.attention import dot_product_attention
from videotuna_tpu.models.layers import (RMSNorm, TimestepEmbedder,
                                         HUNYUAN_ROPE_DIMS,
                                         apply_rope, rope_3d,
                                         split_rope_dims, unpatchify_3d)

Dtype = Any


def _modulation(vec: jnp.ndarray, n: int, dim: int, dtype, name: str):
    mods = nn.Dense(n * dim, dtype=dtype, name=name,
                    kernel_init=nn.initializers.zeros)(nn.silu(vec))
    return jnp.split(mods[:, None, :], n, axis=-1)  # each (B, 1, dim)


class MMDoubleStreamBlock(nn.Module):
    """``tr_len > 0`` enables token-replace i2v conditioning (reference
    models.py:150-199): the first ``tr_len`` image tokens (the conditioning
    first frame) are modulated with ``vec_tr`` (the timestep-0 vector)
    instead of ``vec``."""
    dim: int
    heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    as_cell: bool = False
    tr_len: int = 0

    @nn.compact
    def __call__(self, carry, vec, img_cos, img_sin, vec_tr=None):
        img, txt = carry
        d = self.dim
        hd = d // self.heads
        b = img.shape[0]

        img_mod = nn.Dense(6 * d, dtype=self.dtype, name="img_mod",
                           kernel_init=nn.initializers.zeros)
        mods = jnp.split(img_mod(nn.silu(vec))[:, None, :], 6, axis=-1)
        if self.tr_len > 0 and vec_tr is not None:
            mods_tr = jnp.split(img_mod(nn.silu(vec_tr))[:, None, :], 6,
                                axis=-1)
            li = img.shape[1]

            def sel(m, m_tr):
                return jnp.concatenate(
                    [jnp.broadcast_to(m_tr, (b, self.tr_len, d)),
                     jnp.broadcast_to(m, (b, li - self.tr_len, d))], axis=1)

            mods = [sel(m, mt) for m, mt in zip(mods, mods_tr)]
        (i_s1, i_sc1, i_g1, i_s2, i_sc2, i_g2) = mods
        (t_s1, t_sc1, t_g1, t_s2, t_sc2, t_g2) = _modulation(
            vec, 6, d, self.dtype, "txt_mod")

        def qkv(x, prefix):
            q = nn.DenseGeneral((self.heads, hd), dtype=self.dtype,
                                name=f"{prefix}_q")(x)
            k = nn.DenseGeneral((self.heads, hd), dtype=self.dtype,
                                name=f"{prefix}_k")(x)
            v = nn.DenseGeneral((self.heads, hd), dtype=self.dtype,
                                name=f"{prefix}_v")(x)
            q = RMSNorm(dtype=self.dtype, name=f"{prefix}_q_norm")(q)
            k = RMSNorm(dtype=self.dtype, name=f"{prefix}_k_norm")(k)
            return q, k, v

        ln = lambda nm: nn.LayerNorm(epsilon=1e-6, use_bias=False,
                                     use_scale=False, dtype=self.dtype,
                                     name=nm)
        img_m = ln("img_norm1")(img) * (1 + i_sc1) + i_s1
        txt_m = ln("txt_norm1")(txt) * (1 + t_sc1) + t_s1

        iq, ik, iv = qkv(img_m, "img")
        tq, tk, tv = qkv(txt_m, "txt")
        if img_cos is not None:
            iq = apply_rope(iq, img_cos, img_sin)
            ik = apply_rope(ik, img_cos, img_sin)

        q = jnp.concatenate([iq, tq], axis=1)
        k = jnp.concatenate([ik, tk], axis=1)
        v = jnp.concatenate([iv, tv], axis=1)
        att = dot_product_attention(q, k, v, bounded_logits=True)
        att = att.reshape(att.shape[0], -1, d)
        li = img.shape[1]
        img_att, txt_att = att[:, :li], att[:, li:]

        img = img + i_g1 * nn.Dense(d, dtype=self.dtype,
                                    name="img_attn_out")(img_att)
        txt = txt + t_g1 * nn.Dense(d, dtype=self.dtype,
                                    name="txt_attn_out")(txt_att)

        def mlp(x, prefix):
            h = nn.Dense(int(d * self.mlp_ratio), dtype=self.dtype,
                         name=f"{prefix}_mlp1")(x)
            h = nn.gelu(h, approximate=True)
            return nn.Dense(d, dtype=self.dtype, name=f"{prefix}_mlp2")(h)

        img = img + i_g2 * mlp(
            ln("img_norm2")(img) * (1 + i_sc2) + i_s2, "img")
        txt = txt + t_g2 * mlp(
            ln("txt_norm2")(txt) * (1 + t_sc2) + t_s2, "txt")
        if self.as_cell:
            return (img, txt), None
        return img, txt


class MMSingleStreamBlock(nn.Module):
    """``tr_len > 0``: token-replace modulation for the first ``tr_len``
    tokens of the concatenated [img; txt] sequence (the conditioning
    frame — reference models.py:371-460)."""
    dim: int
    heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    as_cell: bool = False
    tr_len: int = 0

    @nn.compact
    def __call__(self, x, vec, cos_full, sin_full, img_len: int,
                 vec_tr=None):
        d = self.dim
        hd = d // self.heads
        mlp_dim = int(d * self.mlp_ratio)
        mod = nn.Dense(3 * d, dtype=self.dtype, name="mod",
                       kernel_init=nn.initializers.zeros)
        mods = jnp.split(mod(nn.silu(vec))[:, None, :], 3, axis=-1)
        if self.tr_len > 0 and vec_tr is not None:
            b, ls = x.shape[0], x.shape[1]
            mods_tr = jnp.split(mod(nn.silu(vec_tr))[:, None, :], 3,
                                axis=-1)
            mods = [jnp.concatenate(
                [jnp.broadcast_to(mt, (b, self.tr_len, d)),
                 jnp.broadcast_to(m, (b, ls - self.tr_len, d))], axis=1)
                for m, mt in zip(mods, mods_tr)]
        s1, sc1, gate = mods
        xm = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                          dtype=self.dtype, name="norm")(x)
        xm = xm * (1 + sc1) + s1
        qkv_mlp = nn.Dense(3 * d + mlp_dim, dtype=self.dtype,
                           name="linear1")(xm)
        qkv, mlp_in = jnp.split(qkv_mlp, [3 * d], axis=-1)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, s = q.shape[:2]
        q = RMSNorm(dtype=self.dtype, name="q_norm")(
            q.reshape(b, s, self.heads, hd))
        k = RMSNorm(dtype=self.dtype, name="k_norm")(
            k.reshape(b, s, self.heads, hd))
        v = v.reshape(b, s, self.heads, hd)
        if cos_full is not None:
            # rotate image positions only; text rows of the table are
            # identity (cos=1, sin=0) — built by the caller
            q = apply_rope(q, cos_full, sin_full)
            k = apply_rope(k, cos_full, sin_full)
        att = dot_product_attention(q, k, v,
                                    bounded_logits=True).reshape(b, s, d)
        fused = jnp.concatenate([att, nn.gelu(mlp_in, approximate=True)],
                                axis=-1)
        out = nn.Dense(d, dtype=self.dtype, name="linear2")(fused)
        x = x + gate * out
        if self.as_cell:
            return x, None
        return x


class TokenRefiner(nn.Module):
    """SingleTokenRefiner (reference hyvideo_t2v/modules/token_refiner.py:164),
    weight-faithful: input_embedder + its OWN TimestepEmbedder over raw t +
    TextProjection c_embedder over the masked mean of the RAW text states,
    then `layers`× IndividualTokenRefinerBlock (:16 — fused qkv in torch,
    split q/k/v here via preprocess_split_fused_qkv; 2-gate adaLN; affine
    LayerNorms; no qk_norm in the released config)."""
    dim: int
    heads: int = 8
    layers: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, txt, t, mask=None):
        # c = t_embedder(t) + c_embedder(masked-mean of raw txt)
        # (token_refiner.py:217-230)
        temb = TimestepEmbedder(self.dim, dtype=self.dtype,
                                name="t_embedder")(t)
        if mask is None:
            ctx = jnp.mean(txt, axis=1)
        else:
            mf = mask.astype(txt.dtype)[..., None]
            ctx = (txt * mf).sum(axis=1) / jnp.maximum(mf.sum(axis=1), 1e-6)
        c1 = nn.Dense(self.dim, dtype=self.dtype, name="c_embedder_1")(ctx)
        c = temb + nn.Dense(self.dim, dtype=self.dtype,
                            name="c_embedder_2")(nn.silu(c1))
        x = nn.Dense(self.dim, dtype=self.dtype, name="input_embedder")(txt)

        bias = None
        if mask is not None:
            # q AND k masked; column 0 forced valid so padded rows don't
            # softmax over an all-masked set (token_refiner.py:142-155)
            valid = jnp.logical_and(mask[:, None, :, None],
                                    mask[:, None, None, :])
            valid = valid.at[:, :, :, 0].set(True)
            bias = jnp.where(valid, 0.0, -1e30)
        for i in range(self.layers):
            g = nn.Dense(2 * self.dim, dtype=self.dtype,
                         kernel_init=nn.initializers.zeros,
                         name=f"mod_{i}")(nn.silu(c))
            g1, g2 = jnp.split(g[:, None, :], 2, axis=-1)
            h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name=f"ln1_{i}")(x)
            q = nn.DenseGeneral((self.heads, self.dim // self.heads),
                                dtype=self.dtype, name=f"q_{i}")(h)
            k = nn.DenseGeneral((self.heads, self.dim // self.heads),
                                dtype=self.dtype, name=f"k_{i}")(h)
            v = nn.DenseGeneral((self.heads, self.dim // self.heads),
                                dtype=self.dtype, name=f"v_{i}")(h)
            o = dot_product_attention(q, k, v, bias=bias)
            o = o.reshape(*o.shape[:-2], self.dim)
            x = x + g1 * nn.Dense(self.dim, dtype=self.dtype,
                                  name=f"attn_out_{i}")(o)
            h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name=f"ln2_{i}")(x)
            h = nn.Dense(self.dim * 4, dtype=self.dtype, name=f"fc1_{i}")(h)
            x = x + g2 * nn.Dense(self.dim, dtype=self.dtype,
                                  name=f"fc2_{i}")(nn.silu(h))
        return x


@register("videotuna_tpu.models.hunyuan.HYVideoDiT",
          aliases=[
              "videotuna.models.hunyuan.hyvideo_i2v.modules.models."
              "HYVideoDiffusionTransformer",
          ])
class HYVideoDiT(nn.Module):
    """Defaults scaled down; 13B config: dim 3072, heads 24, double 20,
    single 40, patch (1,2,2)."""
    in_channels: int = 16
    out_channels: int = 16
    dim: int = 3072
    heads: int = 24
    double_blocks: int = 20
    single_blocks: int = 40
    mlp_ratio: float = 4.0
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    text_dim: int = 4096
    pooled_dim: int = 768
    guidance_embed: bool = False
    rope_theta: float = 256.0
    # rope_dim_list (hyvideo_t2v/modules/models.py:461). None → the released
    # [16,56,56] when head_dim is 128, else an even ~(1/4,3/8,3/8) split.
    rope_dim_list: Optional[Tuple[int, int, int]] = None
    # "token_replace": the i2v conditioning of the released HunyuanVideo
    # I2V model (models.py:538,703-716) — the first latent frame's tokens
    # are modulated at timestep 0
    i2v_condition_type: Optional[str] = None
    dtype: Dtype = jnp.float32
    scan_blocks: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x: Optional[jnp.ndarray] = None,
                 timestep: Optional[jnp.ndarray] = None,
                 text_states: Optional[jnp.ndarray] = None,
                 pooled_text: Optional[jnp.ndarray] = None,
                 text_mask: Optional[jnp.ndarray] = None,
                 guidance: Optional[jnp.ndarray] = None,
                 temporal_rope_scale: Optional[jnp.ndarray] = None,
                 stage: str = "all",
                 img: Optional[jnp.ndarray] = None,
                 txt: Optional[jnp.ndarray] = None,
                 xcat: Optional[jnp.ndarray] = None,
                 vec: Optional[jnp.ndarray] = None,
                 vec_tr: Optional[jnp.ndarray] = None,
                 grid: Optional[Tuple[int, int, int]] = None
                 ) -> Any:
        """``stage`` partitions the forward into separately-jittable
        pieces (the STDiT pattern, stdit.py ``stage=``; used by
        tools/offload host-streaming for params > HBM and by bench.py):

        - "all": full forward (default);
        - "embed": → (img, txt, vec, vec_tr) + host keeps grid=(tt,hh,ww);
        - "double": instance with double_blocks=K applies its K-layer
          stack to (img, txt) given (vec, vec_tr, grid);
        - "single": instance with single_blocks=K applies its stack to
          ``xcat`` given (vec, vec_tr, grid);
        - "head": final modulation + projection + unpatchify on ``img``.
        Staged == monolithic is pinned by tests/test_hunyuan.py's
        stage-parity test."""
        pt, ph, pw = self.patch_size
        if stage in ("all", "embed"):
            b, t_in, h_in, w_in, _ = x.shape
            tt, hh, ww = t_in // pt, h_in // ph, w_in // pw
        else:
            tt, hh, ww = grid
        d = self.dim
        token_replace = self.i2v_condition_type == "token_replace"

        if stage in ("all", "embed"):
            vec, vec_tr, img, txt = self._embed(
                x, timestep, text_states, pooled_text, text_mask,
                guidance, tt, hh, ww)
            if stage == "embed":
                return img, txt, vec, vec_tr
        if stage == "head":
            return self._head(img, vec, tt, hh, ww)

        hd = d // self.heads
        if self.rope_dim_list is not None:
            dt_r, dh_r, dw_r = self.rope_dim_list
        elif hd == 128:
            dt_r, dh_r, dw_r = HUNYUAN_ROPE_DIMS
        else:
            dt_r, dh_r, dw_r = split_rope_dims(hd)
        assert dt_r + dh_r + dw_r == hd, \
            f"rope dims {dt_r}+{dh_r}+{dw_r} != head_dim {hd}"
        cos, sin = rope_3d(dt_r, dh_r, dw_r, tt, hh, ww,
                           theta=self.rope_theta,
                           temporal_scale=temporal_rope_scale)
        cos = cos.astype(self.dtype)
        sin = sin.astype(self.dtype)

        if stage in ("all", "double"):
            img, txt = self._double_stack(img, txt, vec, vec_tr, cos, sin,
                                          hh, ww, token_replace)
            if stage == "double":
                return img, txt

        if stage == "all":
            xcat = jnp.concatenate([img, txt], axis=1)
            img_len = img.shape[1]
        else:
            img_len = tt * hh * ww
        lt = xcat.shape[1] - img_len
        cos_full = jnp.concatenate(
            [cos, jnp.ones((lt, cos.shape[1]), self.dtype)], axis=0)
        sin_full = jnp.concatenate(
            [sin, jnp.zeros((lt, sin.shape[1]), self.dtype)], axis=0)
        xcat = self._single_stack(xcat, vec, vec_tr, cos_full, sin_full,
                                  img_len, hh, ww, token_replace)
        if stage == "single":
            return xcat
        img = xcat[:, :img_len]
        return self._head(img, vec, tt, hh, ww)

    def _embed(self, x, timestep, text_states, pooled_text, text_mask,
               guidance, tt, hh, ww):
        d = self.dim
        b = x.shape[0]
        token_replace = self.i2v_condition_type == "token_replace"
        t_embedder = TimestepEmbedder(d, dtype=self.dtype,
                                      name="t_embedder")
        vec = t_embedder(timestep)
        vec_tr = t_embedder(jnp.zeros_like(timestep)) if token_replace \
            else None
        if pooled_text is not None:
            # MLPEmbedder (reference mlp_layers.py:63): in→d, silu, d→d
            pv = nn.Dense(d, dtype=self.dtype, name="vector_in")(
                pooled_text.astype(self.dtype))
            vec2 = nn.Dense(d, dtype=self.dtype,
                            name="vector_in_out")(nn.silu(pv))
            vec = vec + vec2
            if token_replace:
                vec_tr = vec_tr + vec2
        if self.guidance_embed and guidance is not None:
            # guidance modulates vec only, NOT the token-replace vector
            # (models.py:718-725)
            vec = vec + TimestepEmbedder(d, dtype=self.dtype,
                                         name="guidance_in")(guidance)

        img = nn.Conv(d, kernel_size=self.patch_size,
                      strides=self.patch_size, padding="VALID",
                      dtype=self.dtype, name="img_in")(x.astype(self.dtype))
        img = img.reshape(b, tt * hh * ww, d)
        # reference models.py:638 passes the RAW timestep (not the fused
        # vec): the refiner owns its t_embedder; heads_num matches the DiT
        txt = TokenRefiner(d, heads=self.heads, dtype=self.dtype,
                           name="txt_in")(
            text_states.astype(self.dtype), timestep, text_mask)
        return vec, vec_tr, img, txt

    def _double_stack(self, img, txt, vec, vec_tr, cos, sin, hh, ww,
                      token_replace):
        d = self.dim
        if self.scan_blocks:
            dcell = nn.remat(MMDoubleStreamBlock, prevent_cse=False) \
                if self.remat else MMDoubleStreamBlock
            dscan = nn.scan(dcell,
                            variable_axes={"params": 0},
                            split_rngs={"params": True},
                            in_axes=(nn.broadcast,) * 4,
                            length=self.double_blocks)
            (img, txt), _ = dscan(d, self.heads, self.mlp_ratio,
                                  dtype=self.dtype, as_cell=True,
                                  tr_len=hh * ww if token_replace else 0,
                                  name="double_blocks")(
                (img, txt), vec, cos, sin, vec_tr)
        else:
            for i in range(self.double_blocks):
                img, txt = MMDoubleStreamBlock(
                    d, self.heads, self.mlp_ratio, dtype=self.dtype,
                    tr_len=hh * ww if token_replace else 0,
                    name=f"double_{i}")((img, txt), vec, cos, sin, vec_tr)
        return img, txt

    def _single_stack(self, xcat, vec, vec_tr, cos_full, sin_full,
                      img_len, hh, ww, token_replace):
        d = self.dim
        if self.scan_blocks:
            scell = nn.remat(MMSingleStreamBlock, prevent_cse=False) \
                if self.remat else MMSingleStreamBlock
            sscan = nn.scan(scell,
                            variable_axes={"params": 0},
                            split_rngs={"params": True},
                            in_axes=(nn.broadcast,) * 5,
                            length=self.single_blocks)
            xcat, _ = sscan(d, self.heads, self.mlp_ratio, dtype=self.dtype,
                            as_cell=True,
                            tr_len=hh * ww if token_replace else 0,
                            name="single_blocks")(
                xcat, vec, cos_full, sin_full, img_len, vec_tr)
        else:
            for i in range(self.single_blocks):
                xcat = MMSingleStreamBlock(
                    d, self.heads, self.mlp_ratio, dtype=self.dtype,
                    tr_len=hh * ww if token_replace else 0,
                    name=f"single_{i}")(xcat, vec, cos_full, sin_full,
                                        img_len, vec_tr)
        return xcat

    def _head(self, img, vec, tt, hh, ww):
        d = self.dim
        pt, ph, pw = self.patch_size
        shift, scale = _modulation(vec, 2, d, self.dtype, "final_mod")
        img = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                           dtype=self.dtype, name="final_norm")(img)
        img = img * (1 + scale) + shift
        out_dim = pt * ph * pw * self.out_channels
        img = nn.Dense(out_dim, dtype=self.dtype, name="final_proj",
                       kernel_init=nn.initializers.zeros)(img)
        out = unpatchify_3d(img, (tt, hh, ww), self.patch_size,
                            self.out_channels)
        return out.astype(jnp.float32)
