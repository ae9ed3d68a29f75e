"""Flows — model compositions (VAE + text enc + denoiser + scheduler).

Parity targets (SURVEY.md §1 L3): GenerationBase + concrete flows
(VideocrafterFlow, OpenSora IDDPM, CogVideoXWorkFlow, HunyuanVideoFlow,
WanVideoModelFlow, StepVideoModelFlow).
"""

from videotuna_tpu.flows.generation import GenerationFlow, load_prompts, savename
from videotuna_tpu.flows.opensora import OpenSoraFlow

__all__ = ["GenerationFlow", "OpenSoraFlow", "load_prompts", "savename"]

for _mod in ("videocrafter", "cogvideo", "hunyuan", "wan", "stepvideo",
             "flux", "mochi", "v2v"):
    try:  # registry side effects for families as they land
        __import__(f"videotuna_tpu.flows.{_mod}")
    except ImportError:
        pass
