"""FluxFlow — Flux dev/schnell T2I: rectified-flow sampling + LoRA training.

Capability parity with the reference's Flux paths:
- inference: diffusers FluxPipeline wrapper (/root/reference/scripts/
  inference_flux.py:10-33) — resolution-shifted sigma schedule, embedded
  guidance (dev), 4-step schnell;
- LoRA training: the vendored SimpleTuner trainer (third_party/flux,
  scripts/train_flux_lora.py) — here the standard Trainer + training/lora.py
  on the same rectified-flow loss.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from videotuna_tpu.core.registry import register
from videotuna_tpu.flows.generation import GenerationFlow, Params
from videotuna_tpu.schedulers import (FlowMatchSchedule, flow_interpolate,
                                      flow_target, sample_sigmas)


def flux_shift_for_resolution(tokens: int,
                              base_tokens: int = 256,
                              max_tokens: int = 4096,
                              base_shift: float = 0.5,
                              max_shift: float = 1.15) -> float:
    """Resolution-dependent timestep shift (Flux's mu schedule): larger
    images get more high-noise steps."""
    m = (max_shift - base_shift) / (max_tokens - base_tokens)
    mu = base_shift + m * (tokens - base_tokens)
    return math.exp(mu)


@register("videotuna_tpu.flows.FluxFlow",
          aliases=["videotuna.flow.flux.FluxFlow"])
class FluxFlow(GenerationFlow):
    latent_channels = 16
    vae_spatial_ratio = 8
    vae_temporal_ratio = 1

    def __init__(self, *args,
                 num_inference_steps: int = 28,
                 guidance_scale: float = 3.5,
                 schnell: bool = False,
                 **kwargs):
        kwargs.setdefault("model_max_length", 512)
        kwargs.setdefault("scale_factor", 0.3611)
        super().__init__(*args, **kwargs)
        self.schnell = schnell
        self.guidance_scale = guidance_scale
        self.num_inference_steps = 4 if schnell else num_inference_steps

    def example_inputs(self) -> Dict[str, Any]:
        td = getattr(self.cond_stage, "dim", 4096) \
            if self.cond_stage is not None else 4096
        pd = getattr(self.cond_stage_2, "dim", 768) \
            if self.cond_stage_2 is not None else 768
        cin = self.denoiser.in_channels
        ex = {
            "denoiser": (jnp.zeros((1, 4, 4, cin)),
                         jnp.zeros((1,)),
                         jnp.zeros((1, 8, td)),
                         jnp.zeros((1, pd)),
                         jnp.ones((1,))),
            "first_stage": (jnp.zeros((1, 1, 32, 32, 3)),),
            "cond_stage": (jnp.zeros((1, 8), jnp.int32),
                           jnp.ones((1, 8), bool)),
        }
        if self.cond_stage_2 is not None:
            ex["cond_stage_2"] = (jnp.zeros((1, 8), jnp.int32),)
        return ex

    # packed latents: (H/16, W/16, 64) from (H/8, W/8, 16) via 2×2 packing
    def latent_shape(self, batch, num_frames, height, width):
        return (batch, height // 16, width // 16, 64)

    def encode_text(self, params: Params, texts):
        from videotuna_tpu.models.text_encoders import tokenize
        ids, mask = tokenize(texts, pretrained=self.tokenizer,
                             max_length=self.model_max_length)
        states = self.cond_stage.apply({"params": params["cond_stage"]},
                                       jnp.asarray(ids), jnp.asarray(mask))
        pooled = None
        if self.cond_stage_2 is not None:
            max2 = getattr(self.cond_stage_2, "max_len", 77)
            ids2, mask2 = tokenize(texts, pretrained=self.tokenizer,
                                   max_length=max2)
            seq2 = self.cond_stage_2.apply(
                {"params": params["cond_stage_2"]}, jnp.asarray(ids2))
            last = jnp.sum(jnp.asarray(mask2), axis=1) - 1
            pooled = seq2[jnp.arange(seq2.shape[0]), last]
        return {"y": states, "mask": jnp.asarray(mask), "pooled": pooled}

    def denoise_apply(self, params: Params, x, t, cond):
        guidance = jnp.full((x.shape[0],), self.guidance_scale) \
            if not self.schnell else None
        return self.denoiser.apply({"params": params["denoiser"]},
                                   x, t, cond["y"], cond.get("pooled"),
                                   guidance)

    def training_loss(self, params: Params, batch: Dict[str, Any],
                      key: jax.Array) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        k_sig, k_noise = jax.random.split(key)
        z = batch["latents"]  # packed latents precomputed by the pipeline
        b = z.shape[0]
        sigma = sample_sigmas(k_sig, b, "logit_normal")
        noise = jax.random.normal(k_noise, z.shape, z.dtype)
        x_t = flow_interpolate(z, noise, sigma)
        v = self.denoise_apply(params, x_t, sigma,
                               {"y": batch["text_states"],
                                "pooled": batch.get("pooled_text")})
        per = jnp.mean((v - flow_target(z, noise)) ** 2,
                       axis=tuple(range(1, z.ndim)))
        loss = jnp.mean(jnp.where(jnp.isnan(per), 0.0, per))
        return loss, {"loss": loss}

    def sample(self, params: Params, cond, uncond, shape, key,
               cfg_scale: float = 1.0):
        tokens = shape[1] * shape[2]
        shift = flux_shift_for_resolution(tokens)
        sched = FlowMatchSchedule.create(self.num_inference_steps, shift,
                                         num_train_timesteps=1)
        denoise = lambda x, t, : self.denoise_apply(params, x, t, cond)
        return sched.sample(lambda x, t: denoise(x, t), shape, key)

    def unpack_latents(self, z_packed: jnp.ndarray) -> jnp.ndarray:
        """(B, H', W', 64) → (B, 1, 2H', 2W', 16) for the 2D VAE decode."""
        b, hh, ww, _ = z_packed.shape
        z = z_packed.reshape(b, hh, ww, 2, 2, 16)
        z = jnp.einsum("bhwpqc->bhpwqc", z).reshape(b, hh * 2, ww * 2, 16)
        return z[:, None]

    def decode_latents(self, params: Params, z: jnp.ndarray) -> jnp.ndarray:
        if z.ndim == 4:
            z = self.unpack_latents(z)
        return super().decode_latents(params, z)
