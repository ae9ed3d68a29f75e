"""LLaVA-style video captioner — TPU-native dataset captioning.

The reference vendors ~20k LoC of LLaVA for dataset construction
(/root/reference/tools/data_process/caption/): sample frames → CLIP ViT
patch features (penultimate layer) → MLP projector → LLaMA, autoregressive
caption. This is the same pipeline on the repo's own towers:

- vision: ``models/clip_vision.CLIPVisionEncoder`` (feature_layer=-2,
  patch tokens, HF-convertible via ``clip_vision_map``);
- projector: LLaVA-1.5 mlp2x_gelu (1024 → dim → dim), convertible via
  ``llava_projector_map`` (HF ``multi_modal_projector.linear_1/2``);
- language model: ``models/text_encoders.LlamaTextEncoder`` with
  ``lm_head=True`` (``llama_map`` + lm_head rule).

Decoding is a fixed-shape greedy loop (``lax.fori_loop`` over a padded
token buffer — causal attention makes positions ≥ current step inert), so
one compilation serves every caption. A KV-cache decode is a later
optimization; captioning is offline tooling, not the serving hot path.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Params = Any


class LlavaProjector(nn.Module):
    """LLaVA-1.5 mlp2x_gelu projector: vision dim → LM dim."""
    out_dim: int = 4096
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc1")(
            feats.astype(self.dtype))
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)


class LlavaCaptioner:
    """Greedy captioner over (vision, projector, LM) component triples."""

    def __init__(self, vision, vision_params: Params,
                 projector: LlavaProjector, projector_params: Params,
                 lm, lm_params: Params,
                 eos_token_id: int = 2):
        assert lm.lm_head, "captioner LM needs lm_head=True"
        self.vision = vision
        self.vision_params = vision_params
        self.projector = projector
        self.projector_params = projector_params
        self.lm = lm
        self.lm_params = lm_params
        self.eos_token_id = eos_token_id
        self._decode_jit = jax.jit(self._decode,
                                   static_argnames=("max_new",))

    # ----------------------------------------------------------- pipeline
    def image_tokens(self, frames: jnp.ndarray) -> jnp.ndarray:
        """(T, H, W, 3) in [-1,1] → (T·N_patches, lm_dim) projected patch
        features (class token dropped, frames concatenated in time)."""
        from videotuna_tpu.models.clip_vision import preprocess_frames
        x = preprocess_frames(frames, self.vision.image_size)
        _, states = self.vision.apply({"params": self.vision_params}, x,
                                      return_states=True)
        patches = states[:, 1:]                       # drop cls
        proj = self.projector.apply({"params": self.projector_params},
                                    patches)
        return proj.reshape(-1, proj.shape[-1])

    def _decode(self, prefix_embeds, prompt_ids, max_new: int):
        """Greedy loop over a fixed-size buffer.

        prefix_embeds: (P, D) multimodal prefix; prompt_ids: (L,) prompt
        tokens. Buffer = [prefix; prompt; generated...]."""
        p = prefix_embeds.shape[0]
        l = prompt_ids.shape[0]
        total = p + l + max_new
        tok_emb = self.lm.embed_tokens(self.lm_params, prompt_ids)
        pad_emb = jnp.zeros((max_new, tok_emb.shape[-1]), tok_emb.dtype)
        embeds0 = jnp.concatenate([prefix_embeds, tok_emb, pad_emb],
                                  axis=0)
        ids0 = jnp.zeros((max_new,), jnp.int32)

        def body(i, carry):
            embeds, ids, done = carry
            logits = self.lm.apply({"params": self.lm_params},
                                   input_embeds=embeds[None])[0]
            nxt = jnp.argmax(logits[p + l + i - 1], axis=-1).astype(
                jnp.int32)
            nxt = jnp.where(done, self.eos_token_id, nxt)
            ids = ids.at[i].set(nxt)
            emb = self.lm.embed_tokens(self.lm_params, nxt[None])[0]
            embeds = jax.lax.dynamic_update_slice(
                embeds, emb[None], (p + l + i, 0))
            done = jnp.logical_or(done, nxt == self.eos_token_id)
            return embeds, ids, done

        _, ids, _ = jax.lax.fori_loop(
            0, max_new, body, (embeds0, ids0, jnp.asarray(False)))
        _ = total
        return ids

    def caption(self, frames: jnp.ndarray, prompt_ids: Sequence[int],
                max_new_tokens: int = 32) -> np.ndarray:
        """Generate caption token ids for a clip."""
        prefix = self.image_tokens(jnp.asarray(frames))
        ids = self._decode_jit(prefix,
                               jnp.asarray(prompt_ids, jnp.int32),
                               max_new=max_new_tokens)
        out = np.asarray(ids)
        eos = np.where(out == self.eos_token_id)[0]
        return out[: eos[0]] if eos.size else out

    # -------------------------------------------------------- construction
    @classmethod
    def from_pretrained(cls, vision_ckpt: str, llava_ckpt: str,
                        vision_heads: int = 16, lm_heads: int = 32,
                        **lm_kw) -> "LlavaCaptioner":
        """Convert an HF LLaVA checkpoint (language_model.* +
        multi_modal_projector.*) + CLIP vision tower."""
        from videotuna_tpu.models.clip_vision import CLIPVisionEncoder
        from videotuna_tpu.models.text_encoders import LlamaTextEncoder
        from videotuna_tpu.tools.convert_weights import (
            clip_vision_map, llama_map, llava_projector_map,
            load_torch_state_dict)
        vsd = load_torch_state_dict(vision_ckpt)
        vtree = clip_vision_map(vision_heads).convert(vsd)
        lsd = load_torch_state_dict(llava_ckpt)
        proj_tree = llava_projector_map().convert(
            {k: v for k, v in lsd.items()
             if k.startswith("multi_modal_projector")})
        lm_sd = {k.replace("language_model.model.", "")
                 .replace("language_model.", ""): v
                 for k, v in lsd.items()
                 if k.startswith("language_model")}
        lm_tree = llama_map(lm_heads).convert(lm_sd)
        vision = CLIPVisionEncoder(feature_layer=-2)
        lm = LlamaTextEncoder(lm_head=True, **lm_kw)
        proj = LlavaProjector(out_dim=lm.dim)
        return cls(vision, vtree, proj, proj_tree, lm, lm_tree)


def caption_directory(captioner: LlavaCaptioner, videos_dir: str,
                      output_csv: str, prompt_ids: Sequence[int],
                      num_frames: int = 4,
                      detokenize=None) -> int:
    """Caption every video in a directory → CSV of path,caption (the
    reference's dataset-construction output format, data/datasets.py CSV
    schema). Returns the number captioned."""
    import csv
    import os

    from videotuna_tpu.data.video_io import load_video
    rows = []
    for name in sorted(os.listdir(videos_dir)):
        if not name.endswith((".mp4", ".avi", ".mkv", ".npy")):
            continue
        video = load_video(os.path.join(videos_dir, name),
                           num_frames=num_frames)
        if video.dtype == np.uint8:
            video = video.astype(np.float32) / 127.5 - 1.0
        ids = captioner.caption(video, prompt_ids)
        text = detokenize(ids) if detokenize else " ".join(map(str, ids))
        rows.append((os.path.join(videos_dir, name), text))
    with open(output_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["path", "caption"])
        w.writerows(rows)
    return len(rows)
