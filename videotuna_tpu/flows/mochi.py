"""MochiFlow — Mochi-1 T2V: faithful AsymmDiT + flow-matching, true CFG.

Reference path: the diffusers ``MochiPipeline``
(/root/reference/scripts/inference_mochi.py:1-30) — 84f 480×848 T2V,
CFG ≈ 4.5, ~64 flow steps, T5-XXL text (max 256 tokens), 12-channel
latents at 8× spatial / 6× temporal compression.

Unlike HunyuanVideo, Mochi is NOT CFG-distilled: sampling doubles the
batch (true classifier-free guidance) and there is no embedded guidance
input. The single text encoder is T5-XXL; the pooled conditioning is
produced INSIDE the DiT (attention pool), so the flow only supplies
states + mask.

Sign convention: the genmo checkpoint predicts the x0-ward flow
(diffusers' MochiPipeline integrates with inverted sigmas); we negate the
raw model output (``negate_model_output=True``) so the standard
``FlowMatchSchedule`` (v = ε − x₀) applies for both training and sampling.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from videotuna_tpu.core.registry import register
from videotuna_tpu.flows.generation import GenerationFlow, Params
from videotuna_tpu.schedulers import (FlowMatchSchedule, cfg_denoise,
                                      flow_interpolate, flow_target,
                                      sample_sigmas)


@register("videotuna_tpu.flows.MochiFlow",
          aliases=["diffusers.MochiPipeline"])
class MochiFlow(GenerationFlow):
    latent_channels = 12
    vae_spatial_ratio = 8
    vae_temporal_ratio = 6

    def __init__(self, *args,
                 num_inference_steps: int = 64,
                 flow_shift: float = 6.0,
                 negate_model_output: bool = True,
                 **kwargs):
        kwargs.setdefault("model_max_length", 256)
        # qk-RMSNormed DiT attention opts in via bounded_logits=True;
        # exactness comes from exp2's shift window (scaled log2-scores in
        # (M-126, M+127)), NOT from scores staying below M — at d=128
        # the bound is sqrt(128)*log2(e) ~= 16.3, inside M=0's window
        # (-126, 127), and M=0 also elides the -M subtract (one fewer
        # VPU pass over the score tile; kernels/_exp2_sub). Measured
        # 1.08x for static-max on the plain d=128 kernel (126 TF/s).
        kwargs.setdefault("attn_static_max", 0.0)
        super().__init__(*args, **kwargs)
        self.negate_model_output = negate_model_output
        if not isinstance(self.scheduler, FlowMatchSchedule):
            self.scheduler = FlowMatchSchedule.create(
                num_inference_steps, flow_shift)

    def example_inputs(self) -> Dict[str, Any]:
        td = getattr(self.cond_stage, "dim", 4096) \
            if self.cond_stage is not None \
            else getattr(self.denoiser, "caption_channels", 4096)
        return {
            "denoiser": (jnp.zeros((1, 2, 8, 8, self.latent_channels)),
                         jnp.zeros((1,)),
                         jnp.zeros((1, 8, td)),
                         jnp.ones((1, 8), bool)),
            "first_stage": (jnp.zeros((1, 7, 32, 32, 3)),),
            "cond_stage": (jnp.zeros((1, 8), jnp.int32),
                           jnp.ones((1, 8), bool)),
        }

    def latent_shape(self, batch, num_frames, height, width):
        return (batch,
                (num_frames - 1) // self.vae_temporal_ratio + 1,
                height // self.vae_spatial_ratio,
                width // self.vae_spatial_ratio,
                self.latent_channels)

    def encode_text(self, params: Params, texts):
        from videotuna_tpu.models.text_encoders import tokenize
        ids, mask = tokenize(texts, pretrained=self.tokenizer,
                             max_length=self.model_max_length)
        states = self.cond_stage.apply({"params": params["cond_stage"]},
                                       jnp.asarray(ids), jnp.asarray(mask))
        return {"y": states, "mask": jnp.asarray(mask)}

    def denoise_apply(self, params: Params, x, t, cond) -> jnp.ndarray:
        out = self.denoiser.apply(
            {"params": params["denoiser"]}, x, t, cond["y"],
            cond.get("mask"))
        return -out if self.negate_model_output else out

    def training_loss(self, params: Params, batch: Dict[str, Any],
                      key: jax.Array) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        k_enc, k_sig, k_noise = jax.random.split(key, 3)
        z = batch.get("latents")
        if z is None:
            z = self.encode_video(params, batch["video"], k_enc)
        b = z.shape[0]
        sigma = sample_sigmas(k_sig, b, "uniform")
        noise = jax.random.normal(k_noise, z.shape, z.dtype)
        x_t = flow_interpolate(z, noise, sigma)
        v_pred = self.denoise_apply(
            params, x_t, sigma * 1000.0,
            {"y": batch["text_states"], "mask": batch.get("text_mask")})
        per = jnp.mean((v_pred - flow_target(z, noise)) ** 2,
                       axis=tuple(range(1, z.ndim)))
        per = jnp.where(jnp.isnan(per), 0.0, per)
        loss = jnp.mean(per)
        return loss, {"loss": loss, "sigma_mean": jnp.mean(sigma)}

    def sample(self, params: Params, cond, uncond, shape, key,
               cfg_scale: float = 4.5):
        if uncond is not None and cfg_scale != 1.0:
            model_fn = lambda x, t, c: self.denoise_apply(params, x, t, c)
            denoise = cfg_denoise(model_fn, cond, uncond, cfg_scale)
        else:
            denoise = lambda x, t: self.denoise_apply(params, x, t, cond)
        return self.scheduler.sample(denoise, shape, key)
