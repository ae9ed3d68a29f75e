"""BLIP "med" BERT (mixture of encoder-decoder) in JAX — the Tag2Text
text stack used by the VBench ``scene`` dimension.

Weight-faithful reimplementation of the reference torch module
(/root/reference/eval/vbench/third_party/tag2Text/med.py): post-LN BERT
with optional cross-attention whose key/value projections read an
``encoder_width``-dim vision sequence, three layer modes —

- ``text``: self-attention only (plain BERT);
- ``multimodal``: self-attention then cross-attention (tag encoder /
  caption decoder);
- ``mlr``: cross-attention ONLY (the Tag2Text multi-label head, whose
  torch module literally ``del``-etes its self-attention and
  embeddings);

— plus the causal-decoder path and the LM head (transform + decoder).
Eval-only: dropout is identity. All masks follow HF semantics
((1-mask)·-10000 additive bias; causal = lower-triangular ∧ padding).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

Params = Any


@dataclasses.dataclass(frozen=True)
class MedBertConfig:
    vocab_size: int = 30524
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_positions: int = 512
    type_vocab: int = 2
    encoder_width: int = 768
    eps: float = 1e-12


def _ext_mask(mask: Optional[jnp.ndarray], causal: bool,
              seq: int) -> Optional[jnp.ndarray]:
    """(B, S) 1/0 → (B, 1, S_q, S_k) additive; None → None."""
    if mask is None and not causal:
        return None
    if mask is None:
        mask = jnp.ones((1, seq), jnp.float32)
    m = mask[:, None, None, :].astype(jnp.float32)       # B,1,1,Sk
    if causal:
        tri = jnp.tril(jnp.ones((seq, seq), jnp.float32))
        m = m * tri[None, None]
    return (1.0 - m) * -10000.0


class MedSelfAttention(nn.Module):
    cfg: MedBertConfig
    cross: bool = False

    @nn.compact
    def __call__(self, x, kv, mask):
        c = self.cfg
        hd = c.hidden // c.heads
        q = nn.Dense(c.hidden, name="query")(x)
        k = nn.Dense(c.hidden, name="key")(kv)
        v = nn.Dense(c.hidden, name="value")(kv)

        def split(t):
            return t.reshape(*t.shape[:-1], c.heads, hd) \
                .transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        attn = q @ k.transpose(0, 1, 3, 2) / np.sqrt(hd)
        if mask is not None:
            attn = attn + mask
        attn = nn.softmax(attn, axis=-1)
        o = (attn @ v).transpose(0, 2, 1, 3)
        return o.reshape(*x.shape[:-1], c.hidden)


class MedAttention(nn.Module):
    cfg: MedBertConfig
    cross: bool = False

    @nn.compact
    def __call__(self, x, kv, mask):
        h = MedSelfAttention(self.cfg, self.cross, name="self")(x, kv,
                                                                mask)
        h = nn.Dense(self.cfg.hidden, name="out_dense")(h)
        return nn.LayerNorm(epsilon=self.cfg.eps, name="out_norm")(h + x)


class MedLayer(nn.Module):
    cfg: MedBertConfig
    has_cross: bool = True

    @nn.compact
    def __call__(self, x, self_mask=None, enc=None, enc_mask=None,
                 mode="text"):
        c = self.cfg
        if mode == "mlr":
            x = MedAttention(c, cross=True, name="crossattention")(
                x, enc, enc_mask)
        else:
            x = MedAttention(c, name="attention")(x, x, self_mask)
            if mode == "multimodal":
                x = MedAttention(c, cross=True, name="crossattention")(
                    x, enc, enc_mask)
        h = nn.Dense(c.intermediate, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden, name="output")(h)
        return nn.LayerNorm(epsilon=c.eps, name="output_norm")(h + x)


class MedBertEmbeddings(nn.Module):
    cfg: MedBertConfig

    @nn.compact
    def __call__(self, ids):
        c = self.cfg
        # the med BertEmbeddings drops token_type (BLIP modification)
        x = nn.Embed(c.vocab_size, c.hidden, name="word_embeddings")(ids)
        pos = nn.Embed(c.max_positions, c.hidden,
                       name="position_embeddings")(
            jnp.arange(ids.shape[-1]))
        return nn.LayerNorm(epsilon=c.eps, name="norm")(x + pos)


class MedBert(nn.Module):
    """BertModel(med): ``mode`` selects text/multimodal/mlr; ``causal``
    enables the decoder triangle. For ``mlr`` pass ``embeds`` (the torch
    module has no embeddings in that role)."""
    cfg: MedBertConfig = MedBertConfig()
    has_embeddings: bool = True

    @nn.compact
    def __call__(self, ids=None, embeds=None, mask=None, enc=None,
                 enc_mask=None, mode="text", causal=False):
        c = self.cfg
        if embeds is None:
            embeds = MedBertEmbeddings(c, name="embeddings")(ids)
        x = embeds
        self_mask = _ext_mask(mask, causal, x.shape[1])
        if enc is not None:
            e_mask = _ext_mask(
                enc_mask if enc_mask is not None
                else jnp.ones(enc.shape[:2], jnp.float32), False,
                enc.shape[1])
        else:
            e_mask = None
        for i in range(c.layers):
            x = MedLayer(c, name=f"layer_{i}")(
                x, self_mask, enc, e_mask, mode)
        return x


class MedLMHead(nn.Module):
    """cls.predictions: transform (dense+gelu+LN) + decoder to vocab."""
    cfg: MedBertConfig = MedBertConfig()

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = nn.Dense(c.hidden, name="transform_dense")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.LayerNorm(epsilon=c.eps, name="transform_norm")(x)
        return nn.Dense(c.vocab_size, name="decoder")(x)


# ----------------------------------------------------------- conversion
def med_bert_map(layers: int = 12, prefix: str = "", has_cross: bool =
                 True, has_embeddings: bool = True, lm_head: bool = False,
                 out_prefix: str = ""):
    """torch med BertModel/BertLMHeadModel names → flax tree paths.
    ``prefix`` is the torch-side module prefix (e.g. ``bert\\.``)."""
    from videotuna_tpu.tools.convert_weights import (ConversionMap,
                                                     t_linear)
    ident = lambda w: w  # noqa: E731
    rules = []
    if has_embeddings:
        rules += [
            (rf"{prefix}embeddings\.word_embeddings\.weight",
             f"{out_prefix}embeddings/word_embeddings/embedding", ident),
            (rf"{prefix}embeddings\.position_embeddings\.weight",
             f"{out_prefix}embeddings/position_embeddings/embedding",
             ident),
            (rf"{prefix}embeddings\.LayerNorm\.weight",
             f"{out_prefix}embeddings/norm/scale", None),
            (rf"{prefix}embeddings\.LayerNorm\.bias",
             f"{out_prefix}embeddings/norm/bias", None),
        ]
    for i in range(layers):
        p = rf"{prefix}encoder\.layer\.{i}"
        o = f"{out_prefix}layer_{i}"
        blocks = [("attention", "attention")]
        if has_cross:
            blocks.append(("crossattention", "crossattention"))
        for tsrc, tdst in blocks:
            rules += [
                (rf"{p}\.{tsrc}\.self\.query\.weight",
                 f"{o}/{tdst}/self/query/kernel", t_linear),
                (rf"{p}\.{tsrc}\.self\.query\.bias",
                 f"{o}/{tdst}/self/query/bias", None),
                (rf"{p}\.{tsrc}\.self\.key\.weight",
                 f"{o}/{tdst}/self/key/kernel", t_linear),
                (rf"{p}\.{tsrc}\.self\.key\.bias",
                 f"{o}/{tdst}/self/key/bias", None),
                (rf"{p}\.{tsrc}\.self\.value\.weight",
                 f"{o}/{tdst}/self/value/kernel", t_linear),
                (rf"{p}\.{tsrc}\.self\.value\.bias",
                 f"{o}/{tdst}/self/value/bias", None),
                (rf"{p}\.{tsrc}\.output\.dense\.weight",
                 f"{o}/{tdst}/out_dense/kernel", t_linear),
                (rf"{p}\.{tsrc}\.output\.dense\.bias",
                 f"{o}/{tdst}/out_dense/bias", None),
                (rf"{p}\.{tsrc}\.output\.LayerNorm\.weight",
                 f"{o}/{tdst}/out_norm/scale", None),
                (rf"{p}\.{tsrc}\.output\.LayerNorm\.bias",
                 f"{o}/{tdst}/out_norm/bias", None),
            ]
        rules += [
            (rf"{p}\.intermediate\.dense\.weight", f"{o}/intermediate/kernel",
             t_linear),
            (rf"{p}\.intermediate\.dense\.bias", f"{o}/intermediate/bias",
             None),
            (rf"{p}\.output\.dense\.weight", f"{o}/output/kernel",
             t_linear),
            (rf"{p}\.output\.dense\.bias", f"{o}/output/bias", None),
            (rf"{p}\.output\.LayerNorm\.weight", f"{o}/output_norm/scale",
             None),
            (rf"{p}\.output\.LayerNorm\.bias", f"{o}/output_norm/bias",
             None),
        ]
    if lm_head:
        rules += [
            (r"cls\.predictions\.transform\.dense\.weight",
             "lm_head/transform_dense/kernel", t_linear),
            (r"cls\.predictions\.transform\.dense\.bias",
             "lm_head/transform_dense/bias", None),
            (r"cls\.predictions\.transform\.LayerNorm\.weight",
             "lm_head/transform_norm/scale", None),
            (r"cls\.predictions\.transform\.LayerNorm\.bias",
             "lm_head/transform_norm/bias", None),
            (r"cls\.predictions\.decoder\.weight", "lm_head/decoder/kernel",
             t_linear),
            (r"cls\.predictions\.decoder\.bias", "lm_head/decoder/bias",
             None),
        ]
        # note: the tied duplicate ``cls.predictions.bias`` must be
        # filtered by the caller before a strict convert
    return ConversionMap(rules)
