"""OpenSoraFlow — Open-Sora v1.0 STDiT T2V (the PR1 end-to-end slice).

Reference composition: IDDPM LightningModule
(/root/reference/videotuna/models/opensora/models/iddpm3d.py:590) with STDiT
denoiser, frame-wise 2D VAE, T5 text encoder, spaced-diffusion sampling; the
PR1 config is configs/003_opensora/opensorav10_256x256.yaml.

Here: STDiT (flax) + AutoencoderKL2D + T5Encoder + DDPM/DDIM schedules; the
sampling loop is one jit'd scan; the training loss is eps-prediction MSE
(optionally v / x0) over q_sample noise.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from videotuna_tpu.core.registry import register
from videotuna_tpu.flows.generation import GenerationFlow, Params
from videotuna_tpu.schedulers import DDIMSchedule, DDPMSchedule


@register("videotuna_tpu.flows.OpenSoraFlow",
          aliases=["videotuna.models.opensora.models.iddpm3d.IDDPM"])
class OpenSoraFlow(GenerationFlow):
    latent_channels = 4
    vae_spatial_ratio = 8
    vae_temporal_ratio = 1

    def __init__(self, *args,
                 num_frames: int = 16, height: int = 256, width: int = 256,
                 ddim_steps: int = 50, ddim_eta: float = 0.0,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.num_frames = num_frames
        self.height = height
        self.width = width
        # scheduler from config is the DDPM base; derive the DDIM subset once
        from videotuna_tpu.schedulers.flow_match import FlowMatchSchedule
        from videotuna_tpu.schedulers.iddpm import SpacedSchedule
        if isinstance(self.scheduler, DDPMSchedule):
            self.base_schedule = self.scheduler
            self.scheduler = DDIMSchedule.create(
                self.base_schedule, ddim_steps, ddim_eta)
        elif isinstance(self.scheduler, DDIMSchedule):
            self.base_schedule = self.scheduler.base
        elif isinstance(self.scheduler, SpacedSchedule):
            # Open-Sora 1.1 (STDiT2): IDDPM spaced sampling; training uses
            # the underlying FULL chain (reference iddpm3d.py:185,869 —
            # respacing is sampling-only)
            self.base_schedule = self.scheduler.full or self.scheduler.base
        elif isinstance(self.scheduler, FlowMatchSchedule):
            # Open-Sora 1.2 (STDiT3): rectified flow
            self.base_schedule = None
        else:
            raise TypeError(f"Unsupported scheduler {type(self.scheduler)}")

    # ------------------------------------------------------------------ init
    def example_inputs(self) -> Dict[str, Any]:
        t, h, w = 2, 32, 32
        zc = self.latent_channels
        cap_ch = getattr(self.cond_stage, "dim", 4096) \
            if self.cond_stage is not None \
            else getattr(self.denoiser, "caption_channels", 4096)
        return {
            "denoiser": (jnp.zeros((1, t, h, w, zc)),
                         jnp.zeros((1,), jnp.int32),
                         jnp.zeros((1, 8, cap_ch)),
                         jnp.ones((1, 8), bool)),
            "first_stage": (jnp.zeros((1, 1, 32, 32, 3)),),
            "cond_stage": (jnp.zeros((1, 8), jnp.int32),
                           jnp.ones((1, 8), bool)),
        }

    # --------------------------------------------------------------- denoise
    def denoise_apply(self, params: Params, x: jnp.ndarray, t: jnp.ndarray,
                      cond: Dict[str, Any]) -> jnp.ndarray:
        out = self.denoiser.apply({"params": params["denoiser"]},
                                  x, t, cond["y"], cond.get("mask"))
        # pred_sigma models emit 2·C channels. SpacedSchedule (IDDPM
        # learned-variance sampling) consumes both halves; every other
        # schedule consumes eps only.
        from videotuna_tpu.schedulers.iddpm import SpacedSchedule
        c = x.shape[-1]
        if (out.shape[-1] == 2 * c
                and not isinstance(self.scheduler, SpacedSchedule)):
            out = out[..., :c]
        return out

    # --------------------------------------------------------------- training
    def training_loss(self, params: Params, batch: Dict[str, Any],
                      key: jax.Array) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        """eps-MSE diffusion loss over VAE latents.

        batch: {"video": (B,T,H,W,3) in [-1,1], "text_states": (B,L,C),
        "text_mask": (B,L)} — text/VAE encoding may be precomputed by the
        data pipeline (the reference encodes inside training_step; we allow
        both, device-side)."""
        k_enc, k_t, k_noise = jax.random.split(key, 3)
        if "latents" in batch:
            z = batch["latents"]
        else:
            z = self.encode_video(params, batch["video"], k_enc)
        b = z.shape[0]
        sched = self.base_schedule
        if sched is None:
            # Open-Sora 1.2 rectified flow: v-target = noise − x0
            from videotuna_tpu.schedulers.flow_match import (
                flow_interpolate, flow_target, sample_sigmas)
            sigma = sample_sigmas(k_t, b, "uniform")
            noise = jax.random.normal(k_noise, z.shape, z.dtype)
            x_t = flow_interpolate(z, noise, sigma)
            v_pred = self.denoise_apply(
                params, x_t, sigma * 1000.0,
                {"y": batch["text_states"], "mask": batch.get("text_mask")})
            per = jnp.mean((v_pred - flow_target(z, noise)) ** 2,
                           axis=tuple(range(1, z.ndim)))
            per = jnp.where(jnp.isnan(per), 0.0, per)
            loss = jnp.mean(per)
            return loss, {"loss": loss,
                          "t_mean": jnp.mean(sigma) * 1000.0}
        t = jax.random.randint(k_t, (b,), 0, sched.num_timesteps)
        noise = jax.random.normal(k_noise, z.shape, z.dtype)
        x_t = sched.q_sample(z, t, noise)
        model_out = self.denoise_apply(
            params, x_t, t,
            {"y": batch["text_states"], "mask": batch.get("text_mask")})
        target = sched.training_target(z, noise, t)
        c = z.shape[-1]
        aux: Dict[str, Any] = {}
        if model_out.shape[-1] == 2 * c:
            # IDDPM hybrid loss: eps-MSE + vb(learned variance, frozen
            # mean) · T/1000 (reference iddpm3d.py:1366-1379)
            from videotuna_tpu.schedulers.iddpm import vb_loss_term
            eps_pred = model_out[..., :c]
            vb = vb_loss_term(sched, model_out, z, x_t, t) \
                * (sched.num_timesteps / 1000.0)
            per = jnp.mean((eps_pred - target) ** 2,
                           axis=tuple(range(1, z.ndim)))
            aux["loss_vb"] = jnp.mean(vb)
            per = per + vb
        else:
            per = jnp.mean((model_out - target) ** 2,
                           axis=tuple(range(1, z.ndim)))
        # per-sample NaN guard (reference flow/videocrafter.py:447-451)
        per = jnp.where(jnp.isnan(per), 0.0, per)
        loss = jnp.mean(per)
        aux.update({"loss": loss, "t_mean": jnp.mean(t.astype(jnp.float32))})
        return loss, aux
