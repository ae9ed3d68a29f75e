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
