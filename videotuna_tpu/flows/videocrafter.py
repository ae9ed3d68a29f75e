"""VideocrafterFlow — VideoCrafter 1/2 T2V and DynamiCrafter I2V.

Capability parity with the reference ``VideocrafterFlow``/``LVDMFlow``
(/root/reference/videotuna/flow/videocrafter.py:39, models/lvdm/ddpm3d.py:448,
i2v ``LatentVisualDiffusionFlow`` :1311): 2D-VAE frame-wise encode, CLIP text
conditioning with random unconditional drop, eps/x0/v-parameterized DDPM loss
(q_sample → UNet → weighted MSE, :346-474), DDIM CFG sampling (+ separate
image CFG for i2v), EMA hooks, fps conditioning.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from videotuna_tpu.core.registry import register
from videotuna_tpu.flows.generation import GenerationFlow, Params
from videotuna_tpu.schedulers import (DDIMSchedule, DDPMSchedule,
                                      multicond_cfg_denoise)


@register("videotuna_tpu.flows.VideocrafterFlow",
          aliases=["videotuna.flow.videocrafter.VideocrafterFlow"])
class VideocrafterFlow(GenerationFlow):
    latent_channels = 4
    vae_spatial_ratio = 8
    vae_temporal_ratio = 1

    def __init__(self, *args,
                 ddim_steps: int = 50, ddim_eta: float = 0.0,
                 uncond_prob: float = 0.1,
                 fps_cond: bool = True,
                 i2v_mode: bool = False,
                 **kwargs):
        kwargs.setdefault("model_max_length", 77)
        super().__init__(*args, **kwargs)
        self.uncond_prob = uncond_prob
        self.fps_cond = fps_cond
        self.i2v_mode = i2v_mode
        if isinstance(self.scheduler, DDPMSchedule):
            self.base_schedule = self.scheduler
            self.scheduler = DDIMSchedule.create(self.base_schedule,
                                                 ddim_steps, ddim_eta)
        else:
            self.base_schedule = self.scheduler.base

    def example_inputs(self) -> Dict[str, Any]:
        ctx_dim = getattr(self.cond_stage, "dim", 1024) \
            if self.cond_stage is not None else 1024
        img_tokens = jnp.zeros((1, 4, ctx_dim)) if self.i2v_mode else None
        fps = jnp.ones((1,)) if self.fps_cond else None
        in_ch = getattr(self.denoiser, "in_channels",
                        self.latent_channels)
        ex = {
            "denoiser": (jnp.zeros((1, 2, 16, 16, in_ch)),
                         jnp.zeros((1,), jnp.int32),
                         jnp.zeros((1, 8, ctx_dim)),
                         img_tokens, fps),
            "first_stage": (jnp.zeros((1, 1, 32, 32, 3)),),
            "cond_stage": (jnp.zeros((1, 8), jnp.int32),),
        }
        if self.cond_stage_2 is not None:
            ex["cond_stage_2"] = (jnp.zeros((1, 32, 32, 3)),)
        return ex

    # --------------------------------------------------------------- encoders
    def encode_text(self, params: Params, texts):
        from videotuna_tpu.models.text_encoders import tokenize
        max_len = min(self.model_max_length,
                      getattr(self.cond_stage, "max_len",
                              self.model_max_length))
        ids, mask = tokenize(texts, pretrained=self.tokenizer,
                             max_length=max_len)
        states = self.cond_stage.apply({"params": params["cond_stage"]},
                                       jnp.asarray(ids))
        return {"y": states, "mask": jnp.asarray(mask)}

    def denoise_apply(self, params: Params, x, t, cond):
        kwargs = {}
        if cond.get("fps") is not None and self.fps_cond:
            kwargs["fps"] = cond["fps"]
        if cond.get("context_img") is not None:
            kwargs["context_img"] = cond["context_img"]
        if cond.get("img_latents") is not None:
            # DynamiCrafter concat conditioning: the cond-frame latent is
            # repeated per frame on channels (in_channels 8 = 4 + 4)
            x = jnp.concatenate([x, cond["img_latents"]], axis=-1)
        return self.denoiser.apply({"params": params["denoiser"]},
                                   x, t, cond["y"], **kwargs)

    def prepare_image_cond(self, params, cond, uncond, images, frames,
                           height, width, key):
        """DynamiCrafter / VC1-i2v conditioning: CLIP→resampler context
        tokens for the UNet's image cross-attention, plus (when the UNet
        takes 2× latent channels) the cond-frame latent repeated over
        time. The image-uncond branch is handled separately by
        multicond_cfg_denoise; the TEXT-uncond branch keeps the image."""
        cond = dict(cond)
        if self.cond_stage_2 is not None:
            cond["context_img"] = self.cond_stage_2.apply(
                {"params": params["cond_stage_2"]}, images)
        in_ch = getattr(self.denoiser, "in_channels",
                        self.latent_channels)
        if in_ch > self.latent_channels:
            z0 = self.encode_video(params, images[:, None], key)
            lat = self.latent_shape(images.shape[0], frames, height,
                                    width)[1]
            cond["img_latents"] = jnp.repeat(z0, lat, axis=1)
        if uncond is not None:
            uncond = dict(uncond)
            for k in ("context_img", "img_latents"):
                if k in cond:
                    uncond[k] = cond[k]
        return cond, uncond

    # --------------------------------------------------------------- training
    def training_loss(self, params: Params, batch: Dict[str, Any],
                      key: jax.Array) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        """q_sample → UNet → MSE against the schedule's target, with random
        unconditional drop (reference get_batch_input :323-334) and NaN
        guard (:447-451)."""
        k_enc, k_t, k_noise, k_drop = jax.random.split(key, 4)
        z = batch.get("latents")
        if z is None:
            z = self.encode_video(params, batch["video"], k_enc)
        b = z.shape[0]
        sched = self.base_schedule
        t = jax.random.randint(k_t, (b,), 0, sched.num_timesteps)
        noise = jax.random.normal(k_noise, z.shape, z.dtype)
        x_t = sched.q_sample(z, t, noise)

        y = batch["text_states"]
        if self.uncond_prob > 0:
            drop = jax.random.bernoulli(k_drop, self.uncond_prob, (b,))
            y = jnp.where(drop[:, None, None], jnp.zeros_like(y), y)

        cond = {"y": y, "fps": batch.get("fps")}
        model_out = self.denoise_apply(params, x_t, t, cond)
        target = sched.training_target(z, noise, t)
        per = jnp.mean((model_out - target) ** 2,
                       axis=tuple(range(1, z.ndim)))
        per = jnp.where(jnp.isnan(per), 0.0, per)
        loss = jnp.mean(per)
        return loss, {"loss": loss}

    # -------------------------------------------------------------- sampling
    def sample(self, params: Params, cond, uncond, shape, key,
               cfg_scale: float = 12.0,
               image_cfg_scale: Optional[float] = None):
        if self.i2v_mode and image_cfg_scale is not None:
            model_fn = lambda x, t, c: self.denoise_apply(params, x, t, c)
            img_uncond = dict(cond)
            img_uncond["context_img"] = jnp.zeros_like(
                cond["context_img"]) if cond.get("context_img") is not None \
                else None
            denoise = multicond_cfg_denoise(model_fn, cond, uncond,
                                            img_uncond, cfg_scale,
                                            image_cfg_scale)
            return self.scheduler.sample(denoise, shape, key)
        return super().sample(params, cond, uncond, shape, key, cfg_scale)
