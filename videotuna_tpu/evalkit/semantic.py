"""VBench semantic dimensions, scored with a converted CLIP.

The reference's VBench fork scores the 8 semantic dimensions with a zoo of
perception models (/root/reference/eval/scripts/evaluation.py:14-39;
GRiT detection for object/spatial dims, ViCLIP for style/overall
consistency, CLIP for appearance_style — eval/vbench/third_party/). This
TPU-native evalkit uses ONE backbone — CLIP (vision tower
``models/clip_vision.py`` + text tower ``models/text_encoders.py``,
both weight-convertible from public checkpoints via
``tools/convert_weights.clip_vision_map`` / ``clip_text_map``) — with
zero-shot ranking replacing detection:

- object_class / multiple_objects / scene / color: per-frame zero-shot
  classification against a candidate list; the score is the fraction of
  frames where the target wins (VBench: fraction of frames where GRiT
  detects the object).
- human_action: "a person {action}" vs candidate actions.
- spatial_relationship: CLIP ranking of the prompt against the
  relation-swapped prompt (VBench uses detection-box geometry; this is a
  documented approximation).
- appearance_style: mean frame↔style-text CLIP similarity (VBench itself
  uses CLIP here).
- temporal_style / overall_consistency: mean frame↔prompt similarity
  (VBench uses ViCLIP video embeddings; frame-mean CLIP is the
  approximation).

With random-init CLIP params the wiring runs but the numbers are
meaningless — pass converted weights (``CLIPScorer.from_pretrained``) for
leaderboard-grade scoring.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from videotuna_tpu.models.clip_vision import (CLIPVisionEncoder,
                                              preprocess_frames)

# compact default candidate sets (subset of VBench's class lists; extend
# via the *candidates* arguments for full leaderboard protocol)
OBJECT_CANDIDATES = [
    "person", "dog", "cat", "bird", "horse", "car", "bicycle", "airplane",
    "boat", "train", "chair", "table", "tree", "flower", "mountain",
    "ocean", "building", "bridge", "clock", "book",
]
COLOR_CANDIDATES = ["red", "orange", "yellow", "green", "blue", "purple",
                    "pink", "black", "white", "brown", "gray"]
SCENE_CANDIDATES = ["beach", "forest", "city street", "mountain", "desert",
                    "kitchen", "office", "bedroom", "snowy field",
                    "underwater", "space", "stadium"]
ACTION_CANDIDATES = ["running", "dancing", "eating", "swimming", "jumping",
                     "reading", "cooking", "singing", "riding a bike",
                     "playing guitar"]

SPATIAL_SWAPS = {"left of": "right of", "right of": "left of",
                 "above": "below", "below": "above",
                 "on top of": "under", "under": "on top of",
                 "in front of": "behind", "behind": "in front of"}


class CLIPScorer:
    """Frame/text embedding + zero-shot ranking on a CLIP pair."""

    def __init__(self, vision: Optional[CLIPVisionEncoder] = None,
                 vision_params: Optional[Any] = None,
                 text_encoder: Optional[Any] = None,
                 text_params: Optional[Any] = None,
                 text_projection: Optional[jnp.ndarray] = None,
                 tokenizer: Optional[str] = None,
                 max_len: int = 77):
        if vision is None:
            vision = CLIPVisionEncoder()
        self.vision = vision
        if vision_params is None:
            img = jnp.zeros((1, vision.image_size, vision.image_size, 3))
            vision_params = vision.init(jax.random.key(0), img)["params"]
        self.vision_params = vision_params

        if text_encoder is None:
            from videotuna_tpu.models.text_encoders import CLIPTextEncoder
            text_encoder = CLIPTextEncoder(dim=768, heads=12,
                                           num_layers=12,
                                           penultimate=False)
        self.text = text_encoder
        if text_params is None:
            ids = jnp.zeros((1, 8), jnp.int32)
            text_params = text_encoder.init(jax.random.key(1), ids)["params"]
        self.text_params = text_params
        if text_projection is None:
            text_projection = jnp.eye(
                getattr(text_encoder, "dim", 768), vision.proj_dim)
        self.text_projection = text_projection
        self.tokenizer = tokenizer
        self.max_len = max_len
        self._jit_embed = jax.jit(self._embed_frames_impl)
        self._text_cache: Dict[str, np.ndarray] = {}

    @classmethod
    def from_pretrained(cls, vision_ckpt: str, text_ckpt: str,
                        vision_heads: int = 16, text_heads: int = 12,
                        tokenizer: Optional[str] = None, **kw):
        """Convert HF CLIPVisionModelWithProjection +
        CLIPTextModelWithProjection torch checkpoints."""
        from videotuna_tpu.tools.convert_weights import (
            clip_text_map, clip_vision_map, load_torch_state_dict, t_linear)
        vsd = load_torch_state_dict(vision_ckpt)
        vtree = clip_vision_map(vision_heads).convert(vsd)
        tsd = load_torch_state_dict(text_ckpt)
        ttree = clip_text_map(text_heads).convert(tsd)
        proj = None
        if "text_projection.weight" in tsd:
            proj = jnp.asarray(t_linear(tsd["text_projection.weight"]))
        return cls(vision_params=vtree, text_params=ttree,
                   text_projection=proj, tokenizer=tokenizer, **kw)

    # ------------------------------------------------------------ embedding
    def _embed_frames_impl(self, video):
        frames = preprocess_frames(video, self.vision.image_size)
        emb = self.vision.apply({"params": self.vision_params}, frames)
        return emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)

    def embed_frames(self, video: jnp.ndarray) -> jnp.ndarray:
        """(T, H, W, 3) in [-1, 1] → (T, D) L2-normalized."""
        return self._jit_embed(jnp.asarray(video))

    def embed_texts(self, texts: Sequence[str]) -> jnp.ndarray:
        """(N, D) L2-normalized text embeddings (eot-token pooling)."""
        missing = [t for t in texts if t not in self._text_cache]
        if missing:
            from videotuna_tpu.models.text_encoders import tokenize
            ids, mask = tokenize(missing, pretrained=self.tokenizer,
                                 max_length=self.max_len)
            # hash-fallback tokenizer ids can exceed a small test vocab;
            # out-of-range flax Embed lookups fill with NaN
            vocab = getattr(self.text, "vocab_size", None)
            ids = np.asarray(ids) % vocab if vocab else np.asarray(ids)
            states = self.text.apply({"params": self.text_params},
                                     jnp.asarray(ids))
            last = jnp.sum(jnp.asarray(mask), axis=1) - 1
            pooled = states[jnp.arange(states.shape[0]), last]
            emb = pooled @ self.text_projection
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)
            for t, e in zip(missing, np.asarray(emb)):
                self._text_cache[t] = e
        return jnp.asarray(np.stack([self._text_cache[t] for t in texts]))

    # ------------------------------------------------------- zero-shot core
    def frame_winner_fraction(self, video, target: str,
                              candidates: Sequence[str],
                              template: str = "a photo of a {}"
                              ) -> float:
        """Fraction of frames whose argmax over the candidate set (target
        prepended if absent) is the target."""
        cands = list(candidates)
        if target not in cands:
            cands = [target] + cands
        t_emb = self.embed_texts([template.format(c) for c in cands])
        f_emb = self.embed_frames(video)
        sims = f_emb @ t_emb.T                       # (T, C)
        win = jnp.argmax(sims, axis=-1) == cands.index(target)
        return float(jnp.mean(win.astype(jnp.float32)))

    def mean_similarity(self, video, text: str) -> float:
        """Mean frame↔text cosine similarity mapped to [0, 1]."""
        t_emb = self.embed_texts([text])
        f_emb = self.embed_frames(video)
        return float(jnp.clip((jnp.mean(f_emb @ t_emb.T) + 1.0) / 2.0,
                              0.0, 1.0))


# ---------------------------------------------------------------------------
# The 8 semantic dimensions (VBench names / protocol)
# ---------------------------------------------------------------------------

def object_class(scorer: CLIPScorer, video, object_name: str,
                 candidates: Sequence[str] = OBJECT_CANDIDATES) -> float:
    return scorer.frame_winner_fraction(video, object_name, candidates)


def multiple_objects(scorer: CLIPScorer, video, objects: Sequence[str],
                     candidates: Sequence[str] = OBJECT_CANDIDATES
                     ) -> float:
    """Both objects must win their zero-shot vote per frame (VBench: both
    detected); score = product-min across objects."""
    fracs = [scorer.frame_winner_fraction(video, o, candidates)
             for o in objects]
    return float(min(fracs)) if fracs else 0.0


def human_action(scorer: CLIPScorer, video, action: str,
                 candidates: Sequence[str] = ACTION_CANDIDATES) -> float:
    return scorer.frame_winner_fraction(
        video, action, candidates, template="a person {}")


def color(scorer: CLIPScorer, video, color_name: str, object_name: str,
          candidates: Sequence[str] = COLOR_CANDIDATES) -> float:
    cands = [c for c in candidates if c != color_name]
    t_emb = scorer.embed_texts(
        [f"a {color_name} {object_name}"]
        + [f"a {c} {object_name}" for c in cands])
    f_emb = scorer.embed_frames(video)
    sims = f_emb @ t_emb.T
    win = jnp.argmax(sims, axis=-1) == 0
    return float(jnp.mean(win.astype(jnp.float32)))


def spatial_relationship(scorer: CLIPScorer, video, prompt: str) -> float:
    """CLIP ranking of the prompt vs its relation-swapped counterpart —
    a documented approximation of VBench's detection-box geometry."""
    swapped = prompt
    for rel, opp in SPATIAL_SWAPS.items():
        if rel in prompt:
            swapped = prompt.replace(rel, opp, 1)
            break
    if swapped == prompt:
        return scorer.mean_similarity(video, prompt)
    t_emb = scorer.embed_texts([prompt, swapped])
    f_emb = scorer.embed_frames(video)
    sims = f_emb @ t_emb.T
    win = sims[:, 0] > sims[:, 1]
    return float(jnp.mean(win.astype(jnp.float32)))


def scene(scorer: CLIPScorer, video, scene_name: str,
          candidates: Sequence[str] = SCENE_CANDIDATES) -> float:
    return scorer.frame_winner_fraction(
        video, scene_name, candidates, template="a photo of a {}")


def appearance_style(scorer: CLIPScorer, video, style: str) -> float:
    return scorer.mean_similarity(video, style)


def temporal_style(scorer: CLIPScorer, video, style: str) -> float:
    return scorer.mean_similarity(video, style)


def overall_consistency(scorer: CLIPScorer, video, prompt: str) -> float:
    return scorer.mean_similarity(video, prompt)


SEMANTIC_DIMENSIONS = ("object_class", "multiple_objects", "human_action",
                       "color", "spatial_relationship", "scene",
                       "appearance_style", "temporal_style",
                       "overall_consistency")


def evaluate_semantics(scorer: CLIPScorer, video, prompt: str,
                       aux: Optional[Dict[str, Any]] = None,
                       dimensions: Optional[Sequence[str]] = None
                       ) -> Dict[str, float]:
    """Score the requested semantic dimensions for one video.

    ``aux`` carries VBench-style auxiliary info: ``object`` / ``objects`` /
    ``color`` / ``scene`` / ``action`` / ``style``; dimensions whose aux is
    absent fall back to prompt-level similarity or are skipped."""
    aux = aux or {}
    dims = dimensions or SEMANTIC_DIMENSIONS
    out: Dict[str, float] = {}
    for d in dims:
        if d == "object_class" and aux.get("object"):
            out[d] = object_class(scorer, video, aux["object"])
        elif d == "multiple_objects" and aux.get("objects"):
            out[d] = multiple_objects(scorer, video, aux["objects"])
        elif d == "human_action" and aux.get("action"):
            out[d] = human_action(scorer, video, aux["action"])
        elif d == "color" and aux.get("color") and aux.get("object"):
            out[d] = color(scorer, video, aux["color"], aux["object"])
        elif d == "spatial_relationship":
            out[d] = spatial_relationship(scorer, video, prompt)
        elif d == "scene" and aux.get("scene"):
            out[d] = scene(scorer, video, aux["scene"])
        elif d == "appearance_style" and aux.get("style"):
            out[d] = appearance_style(scorer, video, aux["style"])
        elif d == "temporal_style" and aux.get("style"):
            out[d] = temporal_style(scorer, video, aux["style"])
        elif d == "overall_consistency":
            out[d] = overall_consistency(scorer, video, prompt)
    return out
