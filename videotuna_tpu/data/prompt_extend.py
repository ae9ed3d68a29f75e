"""Prompt extension hooks.

Capability parity with the reference's Wan prompt expander
(/root/reference/videotuna/models/wan/wan/utils/prompt_extend.py:543 —
DashScope API or a local Qwen-VL), used rank-0-then-broadcast at
flow/wanvideo.py:224-243.

TPU-native shape: a hook interface (any callable str→str, e.g. a served LLM
endpoint) plus a deterministic template-based local extender so the pipeline
works offline; with JAX's deterministic PRNG there is no broadcast step —
every host computes the same extension.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Optional, Sequence

PromptExpander = Callable[[str], str]

_STYLE_BANK = [
    "cinematic lighting, shallow depth of field",
    "highly detailed, sharp focus, vivid colors",
    "smooth camera motion, natural movement",
    "35mm film look, rich contrast",
    "soft golden-hour light, gentle shadows",
]

_MOTION_BANK = [
    "the camera slowly pans across the scene",
    "steady tracking shot",
    "gentle handheld motion",
    "static tripod shot with subject motion",
]


def template_expander(prompt: str) -> str:
    """Deterministic local extension: appends style/motion descriptors chosen
    by a stable hash of the prompt (same output on every host/run)."""
    if not prompt.strip():
        return prompt
    h = int(hashlib.sha1(prompt.encode()).hexdigest(), 16)
    style = _STYLE_BANK[h % len(_STYLE_BANK)]
    motion = _MOTION_BANK[(h // 7) % len(_MOTION_BANK)]
    return f"{prompt.strip()}, {style}, {motion}"


def identity_expander(prompt: str) -> str:
    return prompt


_EXPANDERS = {
    "template": template_expander,
    "none": identity_expander,
    "identity": identity_expander,
}


def get_expander(name_or_fn) -> PromptExpander:
    """Resolve an expander: a callable passes through (the LLM-endpoint
    hook), a name looks up the built-ins."""
    if callable(name_or_fn):
        return name_or_fn
    if name_or_fn in _EXPANDERS:
        return _EXPANDERS[name_or_fn]
    raise KeyError(f"Unknown prompt expander {name_or_fn!r}; "
                   f"available: {sorted(_EXPANDERS)} or pass a callable")


def extend_prompts(prompts: Sequence[str],
                   expander="template") -> list[str]:
    fn = get_expander(expander)
    return [fn(p) for p in prompts]


def make_llm_expander(lm, lm_params, prompt_template_ids,
                      max_new_tokens: int = 48,
                      eos_token_id: int = 2,
                      tokenize_fn=None, detokenize_fn=None
                      ) -> PromptExpander:
    """Real LLM-backed extension on the repo's own LLaMA decoder
    (``models/text_encoders.LlamaTextEncoder(lm_head=True)``, convertible
    from a local Qwen/LLaMA checkpoint via ``tools/convert_weights.
    llama_map``) — the TPU-native equivalent of the reference's local
    Qwen-VL expander (wan/utils/prompt_extend.py:543). Greedy fixed-shape
    decode shared with ``tools/captioner``.

    ``prompt_template_ids``: system/instruction prefix token ids;
    ``tokenize_fn``/``detokenize_fn``: str↔ids (defaults to the hash
    tokenizer, which makes the output a deterministic-but-meaningless
    extension — supply real tokenizer fns with real weights)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from videotuna_tpu.tools.captioner import LlavaCaptioner

    cap = LlavaCaptioner.__new__(LlavaCaptioner)
    cap.lm = lm
    cap.lm_params = lm_params
    cap.eos_token_id = eos_token_id
    cap._decode_jit = jax.jit(cap._decode, static_argnames=("max_new",))

    if tokenize_fn is None:
        from videotuna_tpu.models.text_encoders import tokenize

        def tokenize_fn(text):
            ids, mask = tokenize([text], max_length=64)
            n = int(np.sum(mask[0]))
            vocab = getattr(lm, "vocab_size", None)
            out = np.asarray(ids[0][:n])
            return out % vocab if vocab else out

    if detokenize_fn is None:
        def detokenize_fn(ids):
            return " ".join(str(int(i)) for i in ids)

    def expand(prompt: str) -> str:
        ids = np.concatenate([np.asarray(prompt_template_ids, np.int32),
                              np.asarray(tokenize_fn(prompt), np.int32)])
        prefix = jnp.zeros((0, lm.dim), jnp.float32)
        out = cap._decode_jit(prefix, jnp.asarray(ids),
                              max_new=max_new_tokens)
        out = np.asarray(out)
        eos = np.where(out == eos_token_id)[0]
        gen = out[: eos[0]] if eos.size else out
        ext = detokenize_fn(gen)
        return f"{prompt.strip()}, {ext}" if ext else prompt

    return expand


# English VL system prompt (reference wan/utils/prompt_extend.py:79-97,
# abridged task list — the instruction content that conditions the local
# VL rewriter; the full text only matters with real Qwen-VL weights)
VL_EN_SYS_PROMPT = (
    "You are a prompt optimization specialist whose goal is to rewrite "
    "the user's input prompts into high-quality English prompts by "
    "referring to the details of the user's input images, making them "
    "more complete and expressive while maintaining the original "
    "meaning. Emphasize movement information, camera angles, character "
    "actions, clothing and backgrounds from the photo; around 80-100 "
    "words; always output in English. Directly output the rewritten "
    "English text.")


def make_vl_expander(lm, lm_params, vision, vision_params,
                     projector, projector_params,
                     prompt_template_ids,
                     max_new_tokens: int = 96,
                     eos_token_id: int = 2,
                     tokenize_fn=None, detokenize_fn=None):
    """IMAGE-CONDITIONED prompt extension — the local Qwen-VL equivalent
    (reference QwenPromptExpander(is_vl=True),
    wan/utils/prompt_extend.py:543 and extend_run at :500-540): the input
    image's projected CLIP patch states are prepended to the LM prefix
    (the same multimodal splice the LLaVA captioner uses) so the rewrite
    is grounded in the image.

    Returns ``expand(prompt, image=None) -> str``; with image=None it
    degrades to text-only extension. ``image``: (H, W, 3) float [-1, 1]
    or uint8."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from videotuna_tpu.tools.captioner import LlavaCaptioner

    cap = LlavaCaptioner.__new__(LlavaCaptioner)
    cap.lm = lm
    cap.lm_params = lm_params
    cap.vision = vision
    cap.vision_params = vision_params
    cap.projector = projector
    cap.projector_params = projector_params
    cap.eos_token_id = eos_token_id
    cap._decode_jit = jax.jit(cap._decode, static_argnames=("max_new",))

    if tokenize_fn is None:
        from videotuna_tpu.models.text_encoders import tokenize

        def tokenize_fn(text):
            ids, mask = tokenize([text], max_length=96)
            n = int(np.sum(mask[0]))
            vocab = getattr(lm, "vocab_size", None)
            out = np.asarray(ids[0][:n])
            return out % vocab if vocab else out

    if detokenize_fn is None:
        def detokenize_fn(ids):
            return " ".join(str(int(i)) for i in ids)

    def expand(prompt: str, image=None) -> str:
        ids = np.concatenate([np.asarray(prompt_template_ids, np.int32),
                              np.asarray(tokenize_fn(prompt), np.int32)])
        if image is not None:
            img = np.asarray(image)
            if img.dtype == np.uint8:
                img = img.astype(np.float32) / 127.5 - 1.0
            prefix = cap.image_tokens(jnp.asarray(img)[None])
        else:
            prefix = jnp.zeros((0, lm.dim), jnp.float32)
        out = cap._decode_jit(prefix, jnp.asarray(ids),
                              max_new=max_new_tokens)
        out = np.asarray(out)
        eos = np.where(out == eos_token_id)[0]
        gen = out[: eos[0]] if eos.size else out
        ext = detokenize_fn(gen)
        return f"{prompt.strip()}, {ext}" if ext else prompt

    return expand
