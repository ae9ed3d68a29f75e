"""ViCLIP (InternVideo video-CLIP) in JAX — the VBench perception
backbone for ``overall_consistency`` and ``temporal_style``.

Weight-faithful reimplementation of the reference torch model
(/root/reference/eval/vbench/third_party/ViCLIP/viclip.py:16-227,
viclip_vision.py clip_joint_l14, viclip_text.py clip_text_l14):

- vision: ViT-L/14 at 224², joint spatio-temporal attention over
  1 cls + 256 patches × 8 frames (tokens patch-major, frame-minor after
  the reference's rearrange), spatial pos-embed per frame + temporal
  pos-embed per patch, QuickGELU MLPs, cls-token output → 768-d proj;
- text: CLIP text tower (width 768, 12 layers, context 32, vocab 49408),
  causal mask, eot (argmax-id) pooling → 768-d proj;
- score: cosine of the two normalized embeddings (the VBench
  overall_consistency / temporal_style protocol,
  eval/vbench/overall_consistency.py:43-68: 8 frames, CLIP transform,
  plain dot of normalized features).

Tokenization uses OpenAI CLIP BPE via ``evalkit.clip_bpe`` (parity with
the reference SimpleTokenizer is test-gated); when no vocabulary asset
exists on disk the deterministic hash tokenizer keeps the pipeline
runnable (scores then are NOT leaderboard-comparable).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Params = Any

VISION_WIDTH = 1024
VISION_LAYERS = 24
VISION_HEADS = 16
PATCH = 14
RES = 224
NUM_FRAMES = 8
TEXT_WIDTH = 768
TEXT_LAYERS = 12
TEXT_HEADS = 12
CONTEXT_LEN = 32
VOCAB = 49408
EMBED_DIM = 768

# CLIP preprocessing constants (vbench utils.clip_transform)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class MHABlock(nn.Module):
    """ResidualAttentionBlock with torch nn.MultiheadAttention layout
    (fused in_proj split into q/k/v at conversion time)."""
    width: int
    heads: int
    causal: bool = False

    @nn.compact
    def __call__(self, x):
        d = self.width
        hd = d // self.heads
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        q = nn.DenseGeneral((self.heads, hd), name="q")(h)
        k = nn.DenseGeneral((self.heads, hd), name="k")(h)
        v = nn.DenseGeneral((self.heads, hd), name="v")(h)
        from videotuna_tpu.kernels.attention import dot_product_attention
        o = dot_product_attention(q, k, v, causal=self.causal)
        o = o.reshape(*x.shape[:-1], d)
        x = x + nn.Dense(d, name="out")(o)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(d * 4, name="c_fc")(h)
        h = quick_gelu(h)
        return x + nn.Dense(d, name="c_proj")(h)


class ViCLIPVision(nn.Module):
    """clip_joint_l14: joint spatio-temporal ViT over 8 frames."""
    width: int = VISION_WIDTH
    layers: int = VISION_LAYERS
    heads: int = VISION_HEADS
    patch: int = PATCH
    output_dim: int = EMBED_DIM
    num_frames: int = NUM_FRAMES

    @nn.compact
    def __call__(self, video: jnp.ndarray) -> jnp.ndarray:
        """video: (B, T, H, W, 3) CLIP-normalized; returns (B, 768)."""
        b, t, hh, ww, _ = video.shape
        d = self.width
        # conv1: Conv3d kernel (1, p, p) no bias ≡ per-frame 2D patch conv
        x = nn.Conv(d, (1, self.patch, self.patch),
                    strides=(1, self.patch, self.patch), padding="VALID",
                    use_bias=False, name="conv1")(video)
        gh, gw = x.shape[2], x.shape[3]
        n = gh * gw
        x = x.reshape(b, t, n, d)
        cls = self.param("class_embedding",
                         nn.initializers.normal(d ** -0.5), (d,))
        pos = self.param("positional_embedding",
                         nn.initializers.normal(d ** -0.5), (n + 1, d))
        tpe = self.param("temporal_positional_embedding",
                         nn.initializers.zeros, (1, self.num_frames, d))
        # spatial pos: cls row 0, patches rows 1..n (added per frame)
        x = x + pos[None, None, 1:, :]
        if t == 1:
            x = x + jnp.mean(tpe, axis=1)[:, None]
        else:
            x = x + tpe[:, :t, None, :]
        # patch-major, frame-minor ordering (the reference rearrange
        # "(b t) n m -> b (n t) m")
        x = x.transpose(0, 2, 1, 3).reshape(b, n * t, d)
        cls_tok = (cls + pos[0])[None, None, :]
        x = jnp.concatenate([jnp.broadcast_to(cls_tok, (b, 1, d)), x],
                            axis=1)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        for i in range(self.layers):
            x = MHABlock(d, self.heads, name=f"block_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x)
        proj = self.param("proj", nn.initializers.normal(d ** -0.5),
                          (d, self.output_dim))
        return x[:, 0] @ proj


class ViCLIPText(nn.Module):
    """clip_text_l14 at context 32."""
    width: int = TEXT_WIDTH
    layers: int = TEXT_LAYERS
    heads: int = TEXT_HEADS
    context: int = CONTEXT_LEN
    vocab: int = VOCAB
    output_dim: int = EMBED_DIM

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        """ids: (B, context) int tokens; returns (B, 768)."""
        d = self.width
        x = nn.Embed(self.vocab, d, name="token_embedding")(ids)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01), (self.context, d))
        x = x + pos[None]
        for i in range(self.layers):
            x = MHABlock(d, self.heads, causal=True, name=f"block_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        eot = jnp.argmax(ids, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot]
        proj = self.param("text_projection",
                          nn.initializers.normal(d ** -0.5),
                          (d, self.output_dim))
        return pooled @ proj


def preprocess_frames(video: np.ndarray,
                      num_frames: int = NUM_FRAMES) -> np.ndarray:
    """VBench clip_transform protocol: sample ``num_frames`` evenly,
    bilinear-resize to 224², CLIP mean/std normalize.
    video: (T, H, W, 3) float in [-1, 1] → (1, 8, 224, 224, 3)."""
    t = video.shape[0]
    idx = np.linspace(0, t - 1, num_frames).round().astype(int)
    frames = (np.asarray(video)[idx] + 1.0) / 2.0
    frames = jax.image.resize(jnp.asarray(frames),
                              (num_frames, RES, RES, 3), "bilinear",
                              antialias=True)
    frames = (frames - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
    return np.asarray(frames)[None]


class ViCLIPScorer:
    """Video↔text cosine scoring (the overall_consistency /
    temporal_style dimension protocol)."""

    def __init__(self, vision_params: Params, text_params: Params,
                 tokenizer_bpe: Optional[str] = None):
        self.vision = ViCLIPVision()
        self.text = ViCLIPText()
        self.vision_params = vision_params
        self.text_params = text_params
        if tokenizer_bpe is None:
            from videotuna_tpu.evalkit.clip_bpe import find_vocab_asset
            tokenizer_bpe = find_vocab_asset()
        self.tokenizer_bpe = tokenizer_bpe
        self._v_fn = jax.jit(lambda p, v: self.vision.apply({"params": p},
                                                            v))
        self._t_fn = jax.jit(lambda p, i: self.text.apply({"params": p},
                                                          i))

    def tokenize(self, texts) -> np.ndarray:
        if self.tokenizer_bpe is not None:
            ids = clip_bpe_tokenize(texts, self.tokenizer_bpe,
                                    CONTEXT_LEN)
        else:
            from videotuna_tpu.models.text_encoders import tokenize
            raw, mask = tokenize(list(texts), max_length=CONTEXT_LEN - 2)
            ids = np.zeros((len(texts), CONTEXT_LEN), np.int32)
            ids[:, 0] = VOCAB - 2                     # <|startoftext|>
            for i in range(len(texts)):
                nvalid = int(mask[i].sum())
                ids[i, 1:1 + nvalid] = raw[i, :nvalid] % (VOCAB - 2)
                ids[i, 1 + nvalid] = VOCAB - 1        # <|endoftext|>
        return ids

    def score(self, video: np.ndarray, prompt: str) -> float:
        frames = preprocess_frames(video)
        vfeat = np.asarray(self._v_fn(self.vision_params,
                                      jnp.asarray(frames)))
        tfeat = np.asarray(self._t_fn(self.text_params,
                                      jnp.asarray(self.tokenize([prompt]))))
        vfeat = vfeat / np.linalg.norm(vfeat, axis=-1, keepdims=True)
        tfeat = tfeat / np.linalg.norm(tfeat, axis=-1, keepdims=True)
        return float(vfeat[0] @ tfeat[0])


def clip_bpe_tokenize(texts, bpe_path: str, context: int) -> np.ndarray:
    """Exact CLIP BPE tokenization (sot + ids + eot, truncate, zero-pad)
    — the reference ``CLIP_TEXT.tokenize(texts, context_length=32,
    truncate=True)`` protocol."""
    from videotuna_tpu.evalkit.clip_bpe import ClipBPE
    tok = _bpe_cache.get(bpe_path)
    if tok is None:
        tok = _bpe_cache[bpe_path] = ClipBPE(bpe_path)
    return tok(list(texts), context=context, truncate=True).astype(np.int32)


_bpe_cache: dict = {}


# --------------------------------------------------------------- conversion
def viclip_map(vision_layers: int = VISION_LAYERS,
               vision_heads: int = VISION_HEADS,
               text_layers: int = TEXT_LAYERS,
               text_heads: int = TEXT_HEADS):
    """torch ViCLIP checkpoint names → (vision, text) flax trees.
    The fused MultiheadAttention in_proj is split by ``preprocess_viclip``
    before the map runs."""
    from videotuna_tpu.tools.convert_weights import (ConversionMap,
                                                     t_linear)

    def t_conv3d(w: np.ndarray) -> np.ndarray:
        return np.transpose(w, (2, 3, 4, 1, 0))

    def dg(heads):
        def f(w: np.ndarray) -> np.ndarray:
            out_d, in_d = w.shape
            return w.T.reshape(in_d, heads, out_d // heads)
        return f

    def dgb(heads):
        def f(b: np.ndarray) -> np.ndarray:
            return b.reshape(heads, -1)
        return f

    rules = []

    def tower(src, dst, layers, heads):
        for i in range(layers):
            p = rf"{src}\.transformer\.resblocks\.{i}"
            o = f"{dst}/block_{i}"
            for nm in ("q", "k", "v"):
                rules.append((rf"{p}\.attn\.{nm}_w", f"{o}/{nm}/kernel",
                              dg(heads)))
                rules.append((rf"{p}\.attn\.{nm}_b", f"{o}/{nm}/bias",
                              dgb(heads)))
            rules.append((rf"{p}\.attn\.out_proj\.weight",
                          f"{o}/out/kernel", t_linear))
            rules.append((rf"{p}\.attn\.out_proj\.bias", f"{o}/out/bias",
                          None))
            for ln in ("ln_1", "ln_2"):
                rules.append((rf"{p}\.{ln}\.weight", f"{o}/{ln}/scale",
                              None))
                rules.append((rf"{p}\.{ln}\.bias", f"{o}/{ln}/bias", None))
            rules.append((rf"{p}\.mlp\.c_fc\.weight", f"{o}/c_fc/kernel",
                          t_linear))
            rules.append((rf"{p}\.mlp\.c_fc\.bias", f"{o}/c_fc/bias",
                          None))
            rules.append((rf"{p}\.mlp\.c_proj\.weight",
                          f"{o}/c_proj/kernel", t_linear))
            rules.append((rf"{p}\.mlp\.c_proj\.bias", f"{o}/c_proj/bias",
                          None))

    # vision tower
    rules.append((r"vision_encoder\.conv1\.weight", "vision/conv1/kernel",
                  t_conv3d))
    rules.append((r"vision_encoder\.class_embedding",
                  "vision/class_embedding", None))
    rules.append((r"vision_encoder\.positional_embedding",
                  "vision/positional_embedding", None))
    rules.append((r"vision_encoder\.temporal_positional_embedding",
                  "vision/temporal_positional_embedding", None))
    for ln in ("ln_pre", "ln_post"):
        rules.append((rf"vision_encoder\.{ln}\.weight",
                      f"vision/{ln}/scale", None))
        rules.append((rf"vision_encoder\.{ln}\.bias", f"vision/{ln}/bias",
                      None))
    rules.append((r"vision_encoder\.proj", "vision/proj", None))
    tower("vision_encoder", "vision", vision_layers, vision_heads)
    # text tower
    # explicit identity: the map's default transposes 2-D ``.weight``
    rules.append((r"text_encoder\.token_embedding\.weight",
                  "text/token_embedding/embedding", lambda w: w))
    rules.append((r"text_encoder\.positional_embedding",
                  "text/positional_embedding", None))
    rules.append((r"text_encoder\.ln_final\.weight", "text/ln_final/scale",
                  None))
    rules.append((r"text_encoder\.ln_final\.bias", "text/ln_final/bias",
                  None))
    rules.append((r"text_encoder\.text_projection",
                  "text/text_projection", None))
    tower("text_encoder", "text", text_layers, text_heads)
    rules.append((r"temp", "temp", None))
    return ConversionMap(rules)


def preprocess_viclip(sd):
    """Split every fused MultiheadAttention in_proj into q_w/k_w/v_w (+
    biases) so the map stays per-projection."""
    out = {}
    for k, v in sd.items():
        if k.endswith("attn.in_proj_weight"):
            q, kk, vv = np.split(np.asarray(v), 3, axis=0)
            base = k[:-len("in_proj_weight")]
            out[base + "q_w"] = q
            out[base + "k_w"] = kk
            out[base + "v_w"] = vv
        elif k.endswith("attn.in_proj_bias"):
            q, kk, vv = np.split(np.asarray(v), 3, axis=0)
            base = k[:-len("in_proj_bias")]
            out[base + "q_b"] = q
            out[base + "k_b"] = kk
            out[base + "v_b"] = vv
        else:
            out[k] = np.asarray(v)
    return out


def convert_viclip_state_dict(sd, **map_kw) -> Tuple[Params, Params]:
    """torch ViCLIP checkpoint (the 'model' entry of
    ViClip-InternVid-10M-FLT.pth) → (vision_params, text_params)."""
    from videotuna_tpu.tools.convert_weights import strip_prefixes
    sd = {k: np.asarray(v) for k, v in sd.items()}
    sd = strip_prefixes(sd, ("module.",))
    tree = viclip_map(**map_kw).convert(preprocess_viclip(sd),
                                        strict=True)
    return tree["vision"], tree["text"]
