"""Text encoders: T5 (encoder-only) and CLIP-style causal text transformer.

Capability parity targets:
- T5 (reference opensora models/text_encoder/t5.py:503, wan modules/t5.py:456)
  — relative-position-bias attention, RMSNorm, gated-GELU FFN.
- CLIP text encoder (reference FrozenOpenCLIPEmbedder,
  models/lvdm/modules/encoders/condition.py) — causal transformer, learned
  positions, quick-GELU, final LN (penultimate-layer output supported).

Both are flax modules that tokenize on host (HF tokenizers via
``transformers``, loaded lazily) and run the encoder under jit. Weight import
from torch checkpoints lives in tools/convert_weights.py.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from videotuna_tpu.core.registry import register
from videotuna_tpu.kernels.attention import dot_product_attention
from videotuna_tpu.models.layers import RMSNorm

Dtype = Any


# ---------------------------------------------------------------------------
# T5 encoder
# ---------------------------------------------------------------------------

def t5_relative_bucket(relative_position: jnp.ndarray,
                       num_buckets: int = 32,
                       max_distance: int = 128) -> jnp.ndarray:
    """Bidirectional T5 relative-position bucketing."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5SelfAttention(nn.Module):
    dim: int
    heads: int
    head_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias, mask):
        q = nn.DenseGeneral((self.heads, self.head_dim), use_bias=False,
                            dtype=self.dtype, name="q")(x)
        k = nn.DenseGeneral((self.heads, self.head_dim), use_bias=False,
                            dtype=self.dtype, name="k")(x)
        v = nn.DenseGeneral((self.heads, self.head_dim), use_bias=False,
                            dtype=self.dtype, name="v")(x)
        # T5 does not scale by sqrt(d)
        full_bias = bias
        if mask is not None:
            full_bias = bias + jnp.where(mask[:, None, None, :], 0.0, -1e30)
        out = dot_product_attention(q, k, v, bias=full_bias, scale=1.0)
        out = out.reshape(*x.shape[:-1], self.heads * self.head_dim)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                        name="o")(out)


class T5Block(nn.Module):
    dim: int
    heads: int
    head_dim: int
    ff_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias, mask):
        h = RMSNorm(eps=1e-6, dtype=self.dtype, name="norm1")(x)
        x = x + T5SelfAttention(self.dim, self.heads, self.head_dim,
                                dtype=self.dtype, name="attn")(h, bias, mask)
        h = RMSNorm(eps=1e-6, dtype=self.dtype, name="norm2")(x)
        wi0 = nn.Dense(self.ff_dim, use_bias=False, dtype=self.dtype,
                       name="wi_0")(h)
        wi1 = nn.Dense(self.ff_dim, use_bias=False, dtype=self.dtype,
                       name="wi_1")(h)
        ff = nn.gelu(wi0, approximate=True) * wi1
        return x + nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                            name="wo")(ff)


@register("videotuna_tpu.models.T5Encoder",
          aliases=[
              "videotuna.models.opensora.models.text_encoder.t5.T5Encoder",
          ])
class T5Encoder(nn.Module):
    """Encoder-only T5 (T5-v1.1/umT5 layout). Defaults are T5-XXL-ish but
    tests instantiate tiny configs."""
    vocab_size: int = 32128
    dim: int = 4096
    heads: int = 64
    head_dim: int = 64
    ff_dim: int = 10240
    num_layers: int = 24
    rel_buckets: int = 32
    rel_max_distance: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x = nn.Embed(self.vocab_size, self.dim, dtype=self.dtype,
                     name="token_embed")(input_ids)
        n = input_ids.shape[-1]
        pos = jnp.arange(n)
        rel = pos[None, :] - pos[:, None]
        buckets = t5_relative_bucket(rel, self.rel_buckets,
                                     self.rel_max_distance)
        rel_embed = self.param("rel_bias", nn.initializers.normal(0.02),
                               (self.rel_buckets, self.heads))
        bias = rel_embed[buckets].transpose(2, 0, 1)[None]  # (1,H,N,N)
        for i in range(self.num_layers):
            x = T5Block(self.dim, self.heads, self.head_dim, self.ff_dim,
                        dtype=self.dtype, name=f"block_{i}")(x, bias, mask)
        x = RMSNorm(eps=1e-6, dtype=self.dtype, name="final_norm")(x)
        if mask is not None:
            x = x * mask[..., None].astype(x.dtype)
        return x


# ---------------------------------------------------------------------------
# CLIP text encoder
# ---------------------------------------------------------------------------

class CLIPBlock(nn.Module):
    dim: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")(x)
        q = nn.DenseGeneral((self.heads, self.dim // self.heads),
                            dtype=self.dtype, name="q")(h)
        k = nn.DenseGeneral((self.heads, self.dim // self.heads),
                            dtype=self.dtype, name="k")(h)
        v = nn.DenseGeneral((self.heads, self.dim // self.heads),
                            dtype=self.dtype, name="v")(h)
        att = dot_product_attention(q, k, v, causal=True)
        att = att.reshape(*x.shape[:-1], self.dim)
        x = x + nn.Dense(self.dim, dtype=self.dtype, name="attn_out")(att)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(self.dim * 4, dtype=self.dtype, name="fc1")(h)
        h = h * jax.nn.sigmoid(1.702 * h)  # quick-GELU
        return x + nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)


@register("videotuna_tpu.models.CLIPTextEncoder",
          aliases=[
              "videotuna.models.lvdm.modules.encoders.condition."
              "FrozenOpenCLIPEmbedder",
          ])
class CLIPTextEncoder(nn.Module):
    """OpenCLIP-style causal text transformer. ``penultimate=True`` returns
    the second-to-last layer states (the reference's ``layer='penultimate'``
    default for VideoCrafter)."""
    vocab_size: int = 49408
    dim: int = 1024
    heads: int = 16
    num_layers: int = 24
    max_len: int = 77
    penultimate: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        pos_embed = self.param("pos_embed", nn.initializers.normal(0.01),
                               (self.max_len, self.dim))
        x = nn.Embed(self.vocab_size, self.dim, dtype=self.dtype,
                     name="token_embed")(input_ids)
        x = x + pos_embed[None, :x.shape[1]].astype(self.dtype)
        n_run = self.num_layers - 1 if self.penultimate else self.num_layers
        for i in range(n_run):
            x = CLIPBlock(self.dim, self.heads, dtype=self.dtype,
                          name=f"block_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
        return x


# ---------------------------------------------------------------------------
# LLaMA-style decoder used as a text encoder (HunyuanVideo's LLaVA-LLaMA
# path — reference models/hunyuan/hyvideo_i2v/text_encoder/__init__.py:610:
# hidden states of a causal LM feed the DiT's token refiner)
# ---------------------------------------------------------------------------

class LlamaBlock(nn.Module):
    dim: int
    heads: int
    kv_heads: Optional[int] = None
    ff_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cos, sin):
        # rotate-half convention: HF LLaMA pairs channel i with i+D/2
        # (Hunyuan's text encoder is an HF LLaVA-LLaMA — converted
        # checkpoints would be wrong under the interleaved convention)
        from videotuna_tpu.models.layers import apply_rope_half
        hd = self.dim // self.heads
        kvh = self.kv_heads or self.heads
        h = RMSNorm(eps=1e-5, dtype=self.dtype, name="attn_norm")(x)
        q = nn.DenseGeneral((self.heads, hd), use_bias=False,
                            dtype=self.dtype, name="q")(h)
        k = nn.DenseGeneral((kvh, hd), use_bias=False,
                            dtype=self.dtype, name="k")(h)
        v = nn.DenseGeneral((kvh, hd), use_bias=False,
                            dtype=self.dtype, name="v")(h)
        q = apply_rope_half(q, cos, sin)
        k = apply_rope_half(k, cos, sin)
        o = dot_product_attention(q, k, v, causal=True)
        o = o.reshape(*x.shape[:-1], self.dim)
        x = x + nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                         name="o")(o)
        h = RMSNorm(eps=1e-5, dtype=self.dtype, name="mlp_norm")(x)
        ff = self.ff_dim or int(self.dim * 8 / 3)
        gate = nn.Dense(ff, use_bias=False, dtype=self.dtype,
                        name="gate")(h)
        up = nn.Dense(ff, use_bias=False, dtype=self.dtype, name="up")(h)
        return x + nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                            name="down")(nn.silu(gate) * up)


@register("videotuna_tpu.models.LlamaTextEncoder",
          aliases=[
              "videotuna.models.hunyuan.hyvideo_i2v.text_encoder.TextEncoder",
          ])
class LlamaTextEncoder(nn.Module):
    """Causal LLaMA returning final hidden states (+ last-token pooled).

    ``input_embeds`` bypasses the token embedding (multimodal prefixes —
    the LLaVA captioner prepends projected CLIP patch features);
    ``lm_head=True`` adds the vocabulary projection and returns logits
    (HF ``lm_head.weight``)."""
    vocab_size: int = 32000
    dim: int = 4096
    heads: int = 32
    kv_heads: Optional[int] = None
    ff_dim: Optional[int] = None
    num_layers: int = 32
    rope_theta: float = 10000.0
    lm_head: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: Optional[jnp.ndarray] = None,
                 mask: Optional[jnp.ndarray] = None,
                 input_embeds: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from videotuna_tpu.models.layers import rope_frequencies
        if input_embeds is not None:
            x = input_embeds.astype(self.dtype)
        else:
            x = nn.Embed(self.vocab_size, self.dim, dtype=self.dtype,
                         name="token_embed")(input_ids)
        hd = self.dim // self.heads
        cos, sin = rope_frequencies(hd, jnp.arange(x.shape[-2]),
                                    self.rope_theta)
        for i in range(self.num_layers):
            x = LlamaBlock(self.dim, self.heads, self.kv_heads, self.ff_dim,
                           dtype=self.dtype, name=f"block_{i}")(x, cos, sin)
        x = RMSNorm(eps=1e-5, dtype=self.dtype, name="final_norm")(x)
        if self.lm_head:
            x = nn.Dense(self.vocab_size, use_bias=False, dtype=self.dtype,
                         name="lm_head")(x)
        if mask is not None:
            x = x * mask[..., None].astype(x.dtype)
        return x

    def embed_tokens(self, params, input_ids: jnp.ndarray) -> jnp.ndarray:
        """Token embedding lookup outside apply (for prefix assembly)."""
        emb = params["token_embed"]["embedding"]
        return jnp.asarray(emb)[input_ids]


# ---------------------------------------------------------------------------
# StepLLM — StepVideo's 6144-dim multi-query-attention text encoder
# (reference models/stepvideo/stepvideo/text_encoder/stepllm.py:37-276:
# Step1Model = word embeddings (NO positional encoding) + pre-RMSNorm
# blocks of causal MQA (fused wqkv: hidden + 2·groups·head_dim) and
# SwiGLU FFN (fused w1 → silu(first)·second, hidden rounded to 256), no
# final norm)
# ---------------------------------------------------------------------------

class StepLLMBlock(nn.Module):
    dim: int
    heads: int
    groups: int                      # kv groups (MQA/GQA)
    ff_hidden: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hd = self.dim // self.heads
        h = RMSNorm(eps=self.eps, dtype=self.dtype, name="attn_norm")(x)
        qkv = nn.Dense(self.dim + 2 * self.groups * hd, use_bias=False,
                       dtype=self.dtype, name="wqkv")(h)
        q, kv = jnp.split(qkv, [self.dim], axis=-1)
        q = q.reshape(*x.shape[:-1], self.heads, hd)
        kv = kv.reshape(*x.shape[:-1], self.groups, 2 * hd)
        k, v = jnp.split(kv, 2, axis=-1)
        o = dot_product_attention(q, k, v, causal=True)
        o = o.reshape(*x.shape[:-1], self.dim)
        x = x + nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                         name="wo")(o)
        h = RMSNorm(eps=self.eps, dtype=self.dtype, name="ffn_norm")(x)
        w1 = nn.Dense(2 * self.ff_hidden, use_bias=False, dtype=self.dtype,
                      name="w1")(h)
        a, bgate = jnp.split(w1, 2, axis=-1)
        h = nn.silu(a) * bgate
        return x + nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                            name="w2")(h)


@register("videotuna_tpu.models.StepLLMEncoder",
          aliases=["videotuna.models.stepvideo.stepvideo.text_encoder."
                   "stepllm.STEP1TextEncoder"])
class StepLLMEncoder(nn.Module):
    """Step-1 text encoder; 30B config: dim 6144, 48 heads, 48 layers."""
    vocab_size: int = 65536
    dim: int = 6144
    heads: int = 48
    groups: int = 8
    ff_hidden: Optional[int] = None    # rounded to multiple of 256
    num_layers: int = 48
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        ffh = self.ff_hidden
        if ffh is None:
            ffh = 256 * ((int(self.dim * 8 / 3) + 255) // 256)
        x = nn.Embed(self.vocab_size, self.dim, dtype=self.dtype,
                     name="tok_embeddings")(input_ids)
        for i in range(self.num_layers):
            x = StepLLMBlock(self.dim, self.heads, self.groups, ffh,
                             eps=self.eps, dtype=self.dtype,
                             name=f"block_{i}")(x)
        if mask is not None:
            x = x * mask[..., None].astype(x.dtype)
        return x


# ---------------------------------------------------------------------------
# Host-side tokenization helpers (lazy transformers import)
# ---------------------------------------------------------------------------

_TOKENIZERS: dict = {}


def tokenize(texts, tokenizer_name: str = "t5", max_length: int = 120,
             pretrained: Optional[str] = None
             ) -> Tuple[np.ndarray, np.ndarray]:
    """Host tokenization → (ids, mask) int32/bool arrays.

    Falls back to a deterministic hash tokenizer when no pretrained tokenizer
    is available (offline tests)."""
    key = (tokenizer_name, pretrained)
    tok = _TOKENIZERS.get(key)
    if tok is None and pretrained is not None:
        try:
            from transformers import AutoTokenizer
            tok = AutoTokenizer.from_pretrained(pretrained)
            _TOKENIZERS[key] = tok
        except Exception:
            tok = None
    if tok is not None:
        enc = tok(list(texts), padding="max_length", truncation=True,
                  max_length=max_length, return_tensors="np")
        return (enc["input_ids"].astype(np.int32),
                enc["attention_mask"].astype(bool))
    # offline fallback: stable hash of whitespace tokens
    ids = np.zeros((len(texts), max_length), np.int32)
    mask = np.zeros((len(texts), max_length), bool)
    for i, t in enumerate(texts):
        words = str(t).split()[:max_length]
        for j, w in enumerate(words):
            ids[i, j] = (hash(w) % 30000) + 2
            mask[i, j] = True
        if not words:
            ids[i, 0] = 1
            mask[i, 0] = True
    return ids, mask


# ---------------------------------------------------------------------------
# HunyuanVideo I2V LLaVA prompt-encode protocol
# (reference models/hunyuan/hyvideo_i2v/text_encoder/__init__.py:292-517 +
# constants.py:39-100): the user prompt is wrapped in a chat template whose
# system message carries an <image> slot; the LLaVA-LLaMA expands that slot
# to 576 projected CLIP patch states; the output hidden states are then
# crop/spliced into [subsampled image states ; text states] for the DiT.
# ---------------------------------------------------------------------------

HUNYUAN_PROMPT_TEMPLATES = {
    # constants.py:75-100 (crop_start counts the template's own tokens)
    "dit-llm-encode": {
        "template": ("<|start_header_id|>system<|end_header_id|>\n\n"
                     "Describe the image by detailing the color, shape, "
                     "size, texture, quantity, text, spatial relationships "
                     "of the objects and background:<|eot_id|>"
                     "<|start_header_id|>user<|end_header_id|>\n\n{}"
                     "<|eot_id|>"),
        "crop_start": 36,
    },
    "dit-llm-encode-video": {
        "template": ("<|start_header_id|>system<|end_header_id|>\n\n"
                     "Describe the video by detailing the following "
                     "aspects: 1. The main content and theme of the video."
                     "2. The color, shape, size, texture, quantity, text, "
                     "and spatial relationships of the objects."
                     "3. Actions, events, behaviors temporal relationships, "
                     "physical movement changes of the objects."
                     "4. background environment, light, style and "
                     "atmosphere."
                     "5. camera angles, movements, and transitions used in "
                     "the video:<|eot_id|>"
                     "<|start_header_id|>user<|end_header_id|>\n\n{}"
                     "<|eot_id|>"),
        "crop_start": 95,
    },
    "dit-llm-encode-i2v": {
        "template": ("<|start_header_id|>system<|end_header_id|>\n\n"
                     "<image>\nDescribe the image by detailing the color, "
                     "shape, size, texture, quantity, text, spatial "
                     "relationships of the objects and background:"
                     "<|eot_id|><|start_header_id|>user<|end_header_id|>"
                     "\n\n{}<|eot_id|>"
                     "<|start_header_id|>assistant<|end_header_id|>\n\n"),
        "crop_start": 36, "image_emb_start": 5, "image_emb_end": 581,
        "image_emb_len": 576, "double_return_token_id": 271,
    },
    "dit-llm-encode-video-i2v": {
        "template": ("<|start_header_id|>system<|end_header_id|>\n\n"
                     "<image>\nDescribe the video by detailing the "
                     "following aspects according to the reference image: "
                     "1. The main content and theme of the video."
                     "2. The color, shape, size, texture, quantity, text, "
                     "and spatial relationships of the objects."
                     "3. Actions, events, behaviors temporal relationships, "
                     "physical movement changes of the objects."
                     "4. background environment, light, style and "
                     "atmosphere."
                     "5. camera angles, movements, and transitions used in "
                     "the video:<|eot_id|>\n\n"
                     "<|start_header_id|>user<|end_header_id|>\n\n{}"
                     "<|eot_id|>"
                     "<|start_header_id|>assistant<|end_header_id|>\n\n"),
        "crop_start": 103, "image_emb_start": 5, "image_emb_end": 581,
        "image_emb_len": 576, "double_return_token_id": 271,
    },
}

# token_replace i2v subsamples image states ×4, latent_concat ×2
# (reference __init__.py:592-597)
HUNYUAN_I2V_INTERLEAVE = {"token_replace": 4, "latent_concat": 2}


def hunyuan_i2v_crop(hidden: np.ndarray, attn_mask: np.ndarray,
                     input_ids: np.ndarray, template: dict,
                     image_embed_interleave: int
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Exact port of the reference's i2v crop/splice
    (text_encoder/__init__.py:395-510).

    ``hidden``: (B, L+575, D) LLaVA output states (the single <image>
    input token expanded to 576 patch states); ``attn_mask``/``input_ids``:
    (B, L) UN-expanded. Returns (y, mask): subsampled image states
    concatenated before the template-stripped text states.
    """
    crop_start = template["crop_start"]
    emb_len = template["image_emb_len"]
    img_s, img_e = template["image_emb_start"], template["image_emb_end"]
    dr_id = template["double_return_token_id"]
    b, L = input_ids.shape
    text_crop_start = crop_start - 1 + emb_len

    text_states, text_masks, img_states, img_masks = [], [], [], []
    for i in range(b):
        dr = np.where(input_ids[i] == dr_id)[0]
        # reference: the template carries 4 double-return ("\n\n") tokens;
        # when the prompt is too long the last is truncated away and the
        # sequence end acts as the 4th (:412-422)
        if dr.size == 3 or dr.size == 0:
            last_dr = L
        else:
            last_dr = int(dr[-1])
        a_start = last_dr - 1 + emb_len - 4
        a_end = last_dr - 1 + emb_len
        m_start = last_dr - 4
        m_end = last_dr
        text_states.append(np.concatenate(
            [hidden[i, text_crop_start:a_start], hidden[i, a_end:]]))
        text_masks.append(np.concatenate(
            [attn_mask[i, crop_start:m_start], attn_mask[i, m_end:]]))
        img_states.append(hidden[i, img_s:img_e])
        img_masks.append(np.ones(img_e - img_s, attn_mask.dtype))
    y_text = np.stack(text_states)
    m_text = np.stack(text_masks)
    y_img = np.stack(img_states)
    m_img = np.stack(img_masks)
    if 0 < image_embed_interleave < 6:
        y_img = y_img[:, ::image_embed_interleave]
        m_img = m_img[:, ::image_embed_interleave]
    return (np.concatenate([y_img, y_text], axis=1),
            np.concatenate([m_img, m_text], axis=1))


def encode_hunyuan_i2v(llama, llama_params, texts, image_states,
                       tokenizer: Optional[str] = None,
                       template_name: str = "dit-llm-encode-video-i2v",
                       text_len: int = 256,
                       i2v_condition_type: str = "token_replace",
                       image_token: str = "<image>"
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Full i2v prompt-encode: template → tokenize → splice the 576
    projected CLIP patch states at the <image> slot → LLaVA-LLaMA →
    crop/splice (reference TextEncoderWrapper path, __init__.py:539-660).

    ``image_states``: (B, 576, D_lm) projected patch features (e.g. from
    tools.captioner.LlavaCaptioner.image_tokens). Returns (y, mask).
    """
    import jax.numpy as jnp
    template = HUNYUAN_PROMPT_TEMPLATES[template_name]
    crop_start = template["crop_start"]
    max_length = text_len + crop_start
    prompts = [template["template"].format(t) for t in texts]
    # tokenize with the <image> slot held out (one token placeholder)
    marked = [p.replace(image_token, " \x00 ") for p in prompts]
    ids, mask = tokenize(marked, tokenizer_name="llama",
                         max_length=max_length, pretrained=tokenizer)
    emb_len = template["image_emb_len"]
    # the <image> slot sits at the template's image_emb_start with the
    # real llama tokenizer; the crop arithmetic assumes exactly that
    # position, so the splice is pinned there
    img_pos = template["image_emb_start"]
    # build input embeds: tokens up to the slot, 576 image states, rest
    tok_emb = llama.embed_tokens(llama_params, jnp.asarray(ids))
    embeds = jnp.concatenate([
        tok_emb[:, :img_pos],
        jnp.asarray(image_states)[:, :emb_len].astype(tok_emb.dtype),
        tok_emb[:, img_pos + 1:],
    ], axis=1)
    expanded_mask = np.concatenate([
        mask[:, :img_pos],
        np.ones((mask.shape[0], emb_len), mask.dtype),
        mask[:, img_pos + 1:],
    ], axis=1)
    hidden = llama.apply({"params": llama_params}, input_embeds=embeds,
                         mask=jnp.asarray(expanded_mask))
    interleave = HUNYUAN_I2V_INTERLEAVE.get(i2v_condition_type, 1)
    return hunyuan_i2v_crop(np.asarray(hidden), mask, ids, template,
                            interleave)
