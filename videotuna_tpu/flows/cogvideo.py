"""CogVideoXFlow — CogVideoX 1.0/1.5 T2V + I2V (full-ft + LoRA).

Capability parity with the reference ``CogVideoXWorkFlow``
(/root/reference/videotuna/models/cogvideo_hf/cogvideo_pl.py:90):
- components: CogVideoX MMDiT + 3D-causal VAE + T5 (configs/004, 005);
- training: v-prediction with alpha-weighted MSE over q_sample'd 3D-causal
  latents (training_step :815-887, encode_video :792);
- i2v: first frame VAE-encoded, zero-padded over time, concatenated on
  channels (cogvideo_i2v.py:34);
- sampling: SDE-DPM-Solver++(2M) (the 004/005 configs' default,
  diffusers CogVideoXDPMScheduler recipe — schedulers/cogvideox_dpm.py)
  or trailing-spaced η=0 DDIM; both on the SNR-shifted (s=3.0)
  zero-terminal-SNR v-prediction schedule + CFG;
- LoRA-only checkpoints via training/lora.py (reference :143-149, 781-787).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from videotuna_tpu.core.registry import register
from videotuna_tpu.flows.generation import GenerationFlow, Params
from videotuna_tpu.schedulers import DDIMSchedule, DDPMSchedule
from videotuna_tpu.schedulers.common import extract_into


@register("videotuna_tpu.flows.CogVideoXFlow",
          aliases=["videotuna.models.cogvideo_hf.cogvideo_pl.CogVideoXWorkFlow"])
class CogVideoXFlow(GenerationFlow):
    latent_channels = 16
    vae_spatial_ratio = 8
    vae_temporal_ratio = 4

    def __init__(self, *args,
                 ddim_steps: int = 50,
                 i2v_mode: bool = False,
                 use_dynamic_cfg: bool = False,
                 **kwargs):
        kwargs.setdefault("model_max_length", 226)
        kwargs.setdefault("scale_factor", 1.15258426)  # CogVideoX latent scale
        # CogVideoX LayerNorms q and k per head (d=64): |log2 scores| ≤
        # ~√d/ln2 ≈ 11.5, well inside exp2's M=0 window (−126, 127), so
        # the fixed-max softmax with M=0 is exact AND skips both the
        # online-max rescale chain and the −M subtract; the packed d=64
        # kernel further fuses the l-sum into the PV matmul (measured
        # 1.14× for static-max, +1.07× for the fused branch).
        kwargs.setdefault("attn_static_max", 0.0)
        super().__init__(*args, **kwargs)
        self.i2v_mode = i2v_mode
        self.use_dynamic_cfg = use_dynamic_cfg
        if isinstance(self.scheduler, DDPMSchedule):
            from videotuna_tpu.schedulers import build_cogvideox_ddim
            self.base_schedule = self.scheduler
            # the CogVideoXDDIMScheduler recipe: trailing spacing +
            # set_alpha_to_one, η=0 (schedulers/cogvideox_dpm.py)
            self.scheduler = build_cogvideox_ddim(self.base_schedule,
                                                  ddim_steps)
        else:
            # e.g. CogVideoXDPMSchedule (the 004/005 configs' default,
            # mirroring diffusers.CogVideoXDPMScheduler)
            self.base_schedule = self.scheduler.base

    def example_inputs(self) -> Dict[str, Any]:
        zc = self.latent_channels * (2 if self.i2v_mode else 1)
        cap = getattr(self.cond_stage, "dim", 4096) \
            if self.cond_stage is not None else 4096
        return {
            "denoiser": (jnp.zeros((1, 2, 8, 8, zc)),
                         jnp.zeros((1,), jnp.int32),
                         jnp.zeros((1, 8, cap))),
            "first_stage": (jnp.zeros((1, 5, 32, 32, 3)),),
            "cond_stage": (jnp.zeros((1, 8), jnp.int32),
                           jnp.ones((1, 8), bool)),
        }

    def latent_shape(self, batch, num_frames, height, width):
        return (batch,
                (num_frames - 1) // self.vae_temporal_ratio + 1,
                height // self.vae_spatial_ratio,
                width // self.vae_spatial_ratio,
                self.latent_channels)

    # --------------------------------------------------------------- encoders
    def encode_video(self, params: Params, video: jnp.ndarray,
                     key: jax.Array) -> jnp.ndarray:
        from videotuna_tpu.models.vae2d import DiagonalGaussian
        moments = self.first_stage.apply({"params": params["first_stage"]},
                                         video,
                                         method=self.first_stage.encode)
        z = DiagonalGaussian(moments).sample(key)
        return z * self.scale_factor

    def decode_latents(self, params: Params, z: jnp.ndarray) -> jnp.ndarray:
        if self.first_stage is None:
            return z
        return self.first_stage.apply({"params": params["first_stage"]},
                                      z / self.scale_factor,
                                      method=self.first_stage.decode)

    def denoise_apply(self, params: Params, x, t, cond):
        if self.i2v_mode and cond.get("image_latents") is not None:
            x = jnp.concatenate([x, cond["image_latents"]], axis=-1)
        return self.denoiser.apply({"params": params["denoiser"]},
                                   x, t, cond["y"])

    # --------------------------------------------------------------- training
    def training_loss(self, params: Params, batch: Dict[str, Any],
                      key: jax.Array) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        """v-prediction with alpha-weighted MSE (reference
        cogvideo_pl.py:815-887: weights 1/(1−ᾱ_t) applied per sample)."""
        k_enc, k_t, k_noise = jax.random.split(key, 3)
        z = batch.get("latents")
        if z is None:
            z = self.encode_video(params, batch["video"], k_enc)
        b = z.shape[0]
        sched = self.base_schedule
        t = jax.random.randint(k_t, (b,), 0, sched.num_timesteps)
        noise = jax.random.normal(k_noise, z.shape, z.dtype)
        x_t = sched.q_sample(z, t, noise)
        cond = {"y": batch["text_states"],
                "image_latents": batch.get("image_latents")}
        model_out = self.denoise_apply(params, x_t, t, cond)
        target = sched.get_v(z, noise, t)
        w = 1.0 / (1.0 - extract_into(sched.alphas_cumprod, t, z.ndim))
        per = jnp.mean(w * (model_out - target) ** 2,
                       axis=tuple(range(1, z.ndim)))
        per = jnp.where(jnp.isnan(per), 0.0, per)
        loss = jnp.mean(per)
        return loss, {"loss": loss}

    # -------------------------------------------------------------- sampling
    def sample(self, params: Params, cond, uncond, shape, key,
               cfg_scale: float = 6.0) -> jnp.ndarray:
        """CogVideoX sampling: optional cosine dynamic guidance
        (``use_dynamic_cfg`` in the diffusers CogVideoX pipeline;
        reference cogvideo_pl.py:711-723)."""
        if not self.use_dynamic_cfg:
            return super().sample(params, cond, uncond, shape, key,
                                  cfg_scale)
        from videotuna_tpu.schedulers import dynamic_cfg_denoise
        model_fn = lambda x, t, c: self.denoise_apply(params, x, t, c)
        denoise = dynamic_cfg_denoise(model_fn, cond, uncond, cfg_scale,
                                      self.scheduler.num_steps,
                                      timesteps=self.scheduler.timesteps)
        return self.scheduler.sample(denoise, shape, key)

    def prepare_image_cond(self, params, cond, uncond, images, frames,
                           height, width, key):
        """i2v: first-frame latents concatenated on channels; the
        reference's CFG pair shares the same image latents (text CFG
        only, cogvideo_i2v pipeline)."""
        lat = self.latent_shape(images.shape[0], frames, height, width)[1]
        il = self.prepare_image_latents(params, images, lat, key)
        cond = dict(cond, image_latents=il)
        if uncond is not None:
            uncond = dict(uncond, image_latents=il)
        return cond, uncond

    def prepare_image_latents(self, params: Params, image: jnp.ndarray,
                              num_latent_frames: int,
                              key: jax.Array) -> jnp.ndarray:
        """First-frame conditioning: encode image, pad over latent time
        (reference cogvideo_i2v.py:34 prepare_latents)."""
        img_video = image[:, None] if image.ndim == 4 else image
        z0 = self.encode_video(params, img_video, key)
        pad = jnp.zeros((z0.shape[0], num_latent_frames - z0.shape[1],
                         *z0.shape[2:]), z0.dtype)
        return jnp.concatenate([z0, pad], axis=1)
