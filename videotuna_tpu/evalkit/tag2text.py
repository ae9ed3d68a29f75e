"""Tag2Text captioner in JAX — the VBench ``scene`` perception backbone.

Weight-faithful composition of the reference torch model
(/root/reference/eval/vbench/third_party/tag2Text/tag2text.py:40-259
Tag2Text_Caption) from parity-gated components:

- visual encoder: Swin-B/384 (``evalkit.swin``);
- multi-label tag head: label embedding (3429 classes) → 2-layer
  cross-attention-only q2l BERT (mode ``mlr``) → GroupWiseLinear →
  sigmoid > 0.7, with the reference's 6 deleted tag indices;
- tag encoder: 12-layer med-BERT, tags as text cross-attending to image
  tokens ([ENC] first token);
- caption decoder: 12-layer causal med-BERT + LM head cross-attending to
  the tag-encoder output, beam search (3 beams, max 30, min 10,
  eos=[SEP], length-penalty 1.0) from the prompt "a picture of ";
- scene protocol (/root/reference/eval/vbench/scene.py:16-58): 16
  middle frames at 384², caption each, count captions containing every
  word of the expected scene phrase.

The 3429-entry tag vocabulary is pure data
(third_party/tag2Text/tag_class.py); ``load_tag_array`` literal-parses
it from disk at runtime.
"""

from __future__ import annotations

import ast
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from videotuna_tpu.evalkit.med_bert import (MedBert, MedBertConfig,
                                            MedLMHead)
from videotuna_tpu.evalkit.swin import SwinTransformer

Params = Any

NUM_TAGS = 3429
DELETE_TAG_INDEX = (127, 3351, 3265, 3338, 3355, 3359)
PROMPT = "a picture of "

_TAG_CANDIDATES = (
    os.path.join(os.path.dirname(__file__), "assets", "tag_list.txt"),
    "/root/reference/eval/vbench/third_party/tag2Text/tag_class.py",
)


def load_tag_array(path: Optional[str] = None) -> np.ndarray:
    """3429 tag names. Accepts a plain text file (one per line) or the
    reference tag_class.py (the list literal is ast-parsed, the file is
    never executed)."""
    if path is None:
        for cand in _TAG_CANDIDATES:
            if os.path.exists(cand):
                path = cand
                break
    if path is None:
        raise FileNotFoundError("tag list not found; pass a path")
    if path.endswith(".py"):
        tree = ast.parse(open(path).read())
        for node in tree.body:
            if isinstance(node, ast.Assign) and \
                    isinstance(node.value, ast.List):
                return np.asarray(ast.literal_eval(node.value))
        raise ValueError(f"no list literal in {path}")
    return np.asarray([ln.strip() for ln in open(path) if ln.strip()])


def med_config(encoder_width: int = 1024) -> MedBertConfig:
    return MedBertConfig(vocab_size=30524, encoder_width=encoder_width)


def q2l_config(encoder_width: int = 1024) -> MedBertConfig:
    return MedBertConfig(vocab_size=30522, layers=2, heads=4,
                         encoder_width=encoder_width)


class Tag2TextCaptioner:
    """Inference-time composition; every tower's params come from
    ``convert_tag2text_state_dict``."""

    def __init__(self, params: Dict[str, Params], tokenizer,
                 tag_array: Optional[np.ndarray] = None,
                 threshold: float = 0.7, swin=None, q2l=None,
                 tag_encoder=None, decoder=None, lm_head=None):
        self.p = params
        self.tok = tokenizer
        self.tags = tag_array if tag_array is not None else \
            load_tag_array()
        self.threshold = threshold
        self.swin = swin or SwinTransformer()
        self.q2l = q2l or MedBert(q2l_config(), has_embeddings=False)
        self.tag_encoder = tag_encoder or MedBert(med_config())
        self.decoder = decoder or MedBert(med_config(encoder_width=768))
        self.lm_head = lm_head or MedLMHead(med_config())
        self._vision_fn = jax.jit(
            lambda p, img: self.swin.apply({"params": p}, img))
        self._tag_fn = jax.jit(self._tag_logits)
        self._enc_fn = jax.jit(self._encode_tags)
        self._dec_fn = jax.jit(self._decode_logits)

    # ---------------------------------------------------------- stages
    def _tag_logits(self, p, image_embeds):
        b = image_embeds.shape[0]
        label = jnp.broadcast_to(p["label_embed"][None],
                                 (b,) + p["label_embed"].shape)
        h = self.q2l.apply({"params": p["vision_multi"]}, embeds=label,
                           enc=image_embeds, mode="mlr")
        return (p["fc_w"][None] * h).sum(-1) + p["fc_b"][None]

    def _encode_tags(self, p, ids, mask, image_embeds):
        return self.tag_encoder.apply(
            {"params": p["tag_encoder"]}, ids=ids, mask=mask,
            enc=image_embeds, mode="multimodal")

    def _decode_logits(self, p, ids, mask, tag_embeds):
        h = self.decoder.apply({"params": p["text_decoder"]}, ids=ids,
                               mask=mask, enc=tag_embeds,
                               mode="multimodal", causal=True)
        return self.lm_head.apply({"params": p["lm_head"]}, h)

    # -------------------------------------------------------- protocol
    def predict_tags(self, image_embeds) -> List[str]:
        logits = np.asarray(self._tag_fn(self.p, image_embeds))
        probs = 1.0 / (1.0 + np.exp(-logits))
        hits = probs > self.threshold
        drop = [i for i in DELETE_TAG_INDEX if i < hits.shape[1]]
        hits[:, drop] = False
        return [" | ".join(self.tags[np.where(row)[0]]) for row in hits]

    def generate(self, images: np.ndarray, num_beams: int = 3,
                 max_length: int = 30, min_length: int = 10,
                 return_tags: bool = False):
        """images: (B, 384, 384, 3) ImageNet-normalized. Returns
        captions (list of str), optionally the predicted tag strings."""
        image_embeds = self._vision_fn(self.p["visual_encoder"],
                                       jnp.asarray(images))
        tag_strings = self.predict_tags(image_embeds)
        ids, mask = self.tok(tag_strings, max_length=40, pad_to_max=True)
        ids[:, 0] = self.tok.enc_id
        tag_embeds = self._enc_fn(self.p, jnp.asarray(ids),
                                  jnp.asarray(mask), image_embeds)
        prompt_ids = [self.tok.bos_id] + self.tok.encode(PROMPT)
        captions = []
        for b in range(images.shape[0]):
            out = self._beam_search(tag_embeds[b:b + 1], prompt_ids,
                                    num_beams, max_length, min_length)
            text = self.tok.decode(out)
            prompt_txt = PROMPT.strip()
            captions.append(text[len(prompt_txt):].strip()
                            if text.startswith(prompt_txt) else text)
        if return_tags:
            return captions, tag_strings
        return captions

    def _beam_search(self, tag_embeds, prompt_ids: List[int],
                     num_beams: int, max_length: int,
                     min_length: int) -> List[int]:
        """Standard beam search (length-penalty 1.0); the decoder is
        re-run on the padded full prefix each step so one jit compile
        serves every step."""
        eos = self.tok.sep_id
        beams = [(0.0, list(prompt_ids))]
        done: List[Tuple[float, List[int]]] = []
        enc = jnp.broadcast_to(tag_embeds,
                               (num_beams,) + tag_embeds.shape[1:])
        while beams and len(beams[0][1]) < max_length:
            cur_len = len(beams[0][1])
            ids = np.full((num_beams, max_length), self.tok.pad_id,
                          np.int32)
            mask = np.zeros((num_beams, max_length), np.int32)
            for i, (_, seq) in enumerate(beams):
                ids[i, :len(seq)] = seq
                mask[i, :len(seq)] = 1
            logits = np.asarray(self._dec_fn(
                self.p, jnp.asarray(ids), jnp.asarray(mask),
                enc))[:, cur_len - 1]
            logp = logits - logsumexp(logits)
            if cur_len - len(prompt_ids) < min_length:
                logp[:, eos] = -1e9
            cand = []
            for i, (score, seq) in enumerate(beams):
                top = np.argsort(logp[i])[::-1][:2 * num_beams]
                for t in top:
                    cand.append((score + float(logp[i][t]),
                                 seq + [int(t)]))
            cand.sort(key=lambda x: -x[0])
            beams = []
            for score, seq in cand:
                if seq[-1] == eos:
                    done.append((score / len(seq), seq))
                else:
                    beams.append((score, seq))
                if len(beams) == num_beams:
                    break
        for score, seq in beams:
            done.append((score / len(seq), seq))
        done.sort(key=lambda x: -x[0])
        return done[0][1]


def logsumexp(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=-1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(axis=-1, keepdims=True))


# ------------------------------------------------------------ protocol
def preprocess_frames_tag2text(video: np.ndarray,
                               num_frames: int = 16) -> np.ndarray:
    """scene protocol: middle-sample 16 frames, resize to exactly 384²
    (bilinear), ImageNet normalize. (T,H,W,3) uint8/[-1,1] float →
    (16, 384, 384, 3)."""
    import cv2
    v = np.asarray(video)
    if v.dtype != np.uint8:
        v = ((v + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
    t = v.shape[0]
    acc = min(num_frames, t)
    intervals = np.linspace(0, t, acc + 1).astype(int)
    idx = [(intervals[i] + intervals[i + 1] - 1) // 2 for i in range(acc)]
    if len(idx) < num_frames:
        idx = idx + [idx[-1]] * (num_frames - len(idx))
    frames = v[np.asarray(idx)]
    frames = np.stack([cv2.resize(f, (384, 384),
                                  interpolation=cv2.INTER_LINEAR)
                       for f in frames])
    out = frames.astype(np.float32) / 255.0
    return (out - np.asarray((0.485, 0.456, 0.406), np.float32)) \
        / np.asarray((0.229, 0.224, 0.225), np.float32)


def scene_score(captioner: Tag2TextCaptioner, video: np.ndarray,
                scene_phrase: str, frame_batch: int = 8) -> float:
    """Fraction of frames whose caption contains every word of the
    expected scene phrase (the check_generate protocol)."""
    frames = preprocess_frames_tag2text(video)
    captions: List[str] = []
    for i in range(0, frames.shape[0], frame_batch):
        captions += captioner.generate(frames[i:i + frame_batch])
    words = scene_phrase.split(" ")
    hit = sum(1 for c in captions if all(w in c for w in words))
    return hit / max(1, len(captions))


# ----------------------------------------------------------- conversion
def convert_tag2text_state_dict(sd, tokenizer=None) -> Dict[str, Params]:
    """Full Tag2Text checkpoint → the captioner's params dict
    {visual_encoder, vision_multi, tag_encoder, text_decoder, lm_head,
    label_embed, fc_w, fc_b}."""
    from videotuna_tpu.evalkit.med_bert import med_bert_map
    from videotuna_tpu.evalkit.swin import convert_swin_state_dict
    from videotuna_tpu.tools.convert_weights import strip_prefixes
    sd = {k: np.asarray(v) for k, v in sd.items()}
    sd = strip_prefixes(sd, ("module.", "model."))

    def sub(prefix):
        return {k[len(prefix):]: v for k, v in sd.items()
                if k.startswith(prefix)}

    out: Dict[str, Params] = {}
    out["visual_encoder"] = convert_swin_state_dict(sub("visual_encoder."))
    vm = {k: v for k, v in sub("vision_multi.").items()
          if "embeddings" not in k and "position_ids" not in k}
    out["vision_multi"] = med_bert_map(layers=2).convert(vm, strict=True)
    te = {k: v for k, v in sub("tag_encoder.").items()
          if "position_ids" not in k}
    out["tag_encoder"] = med_bert_map(layers=12).convert(te, strict=True)
    td = {k: v for k, v in sub("text_decoder.").items()
          if "position_ids" not in k and k != "cls.predictions.bias"}
    full = med_bert_map(layers=12, prefix=r"bert\.",
                        lm_head=True).convert(td, strict=True)
    out["lm_head"] = full.pop("lm_head")
    out["text_decoder"] = full
    out["label_embed"] = sd["label_embed.weight"]
    out["fc_w"] = sd["fc.W"][0]
    out["fc_b"] = sd["fc.b"][0]
    return out
