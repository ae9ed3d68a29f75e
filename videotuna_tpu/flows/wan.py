"""WanVideoFlow — Wan 2.1 T2V/I2V (1.3B / 14B), flow matching with
UniPC/DPM++ sampling.

Capability parity with the reference ``WanVideoModelFlow``
(/root/reference/videotuna/flow/wanvideo.py:39; pipelines
models/wan/wan/text2video.py:27 generate :97-255, image2video.py:373):
umT5 text encoding, sp-padded sequence lengths, FlowUniPC / FlowDPM
schedulers (:190-209), CFG loop (:217-238), negative-prompt support,
I2V via CLIP image features + masked first-frame latents. FSDP/SP come from
the mesh (parallel/), not per-model wrappers (wan/distributed/fsdp.py:11-33).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from videotuna_tpu.core.registry import register
from videotuna_tpu.flows.generation import GenerationFlow, Params
from videotuna_tpu.schedulers import (FlowMatchSchedule, flow_interpolate,
                                      flow_target, sample_sigmas)
from videotuna_tpu.schedulers.fm_solvers import (FlowDPMSolverSchedule,
                                                 FlowUniPCSchedule)

DEFAULT_NEGATIVE = ("low quality, blurry, distorted, text, watermark, "
                    "static, worst quality")


@register("videotuna_tpu.flows.WanVideoFlow",
          aliases=["videotuna.flow.wanvideo.WanVideoModelFlow"])
class WanVideoFlow(GenerationFlow):
    latent_channels = 16
    vae_spatial_ratio = 8
    vae_temporal_ratio = 4

    def __init__(self, *args,
                 num_inference_steps: int = 50,
                 flow_shift: float = 5.0,
                 sample_solver: str = "unipc",
                 negative_prompt: str = DEFAULT_NEGATIVE,
                 i2v_mode: bool = False,
                 **kwargs):
        kwargs.setdefault("model_max_length", 512)
        # qk-RMSNormed DiT attention opts in via bounded_logits=True;
        # exactness comes from exp2's shift window (scaled log2-scores in
        # (M-126, M+127)), NOT from scores staying below M — at d=128
        # the bound is sqrt(128)*log2(e) ~= 16.3, inside M=0's window
        # (-126, 127), and M=0 also elides the -M subtract (one fewer
        # VPU pass over the score tile; kernels/_exp2_sub). Measured
        # 1.08x for static-max on the plain d=128 kernel (126 TF/s).
        kwargs.setdefault("attn_static_max", 0.0)
        super().__init__(*args, **kwargs)
        self.i2v_mode = i2v_mode
        self.negative_prompt = negative_prompt
        if not isinstance(self.scheduler, (FlowUniPCSchedule,
                                           FlowDPMSolverSchedule,
                                           FlowMatchSchedule)):
            if sample_solver == "dpm++":
                self.scheduler = FlowDPMSolverSchedule.create(
                    num_inference_steps, flow_shift)
            else:
                self.scheduler = FlowUniPCSchedule.create(
                    num_inference_steps, flow_shift)

    def example_inputs(self) -> Dict[str, Any]:
        # i2v DiTs take x + [mask ; first-frame latents] on channels
        zc = getattr(self.denoiser, "in_channels", self.latent_channels)
        td = getattr(self.cond_stage, "dim", 4096) \
            if self.cond_stage is not None else 4096
        ex = {
            "denoiser": (jnp.zeros((1, 2, 8, 8, zc)),
                         jnp.zeros((1,)),
                         jnp.zeros((1, 8, td))),
            "first_stage": (jnp.zeros((1, 5, 32, 32, 3)),),
            "cond_stage": (jnp.zeros((1, 8), jnp.int32),
                           jnp.ones((1, 8), bool)),
        }
        if self.i2v_mode and getattr(self.denoiser, "img_dim", None):
            ex["denoiser"] = ex["denoiser"] + (
                jnp.zeros((1, 4, self.denoiser.img_dim)),)
        if self.cond_stage_2 is not None:
            ex["cond_stage_2"] = (jnp.zeros((1, 32, 32, 3)),)
        return ex

    def latent_shape(self, batch, num_frames, height, width):
        return (batch,
                (num_frames - 1) // self.vae_temporal_ratio + 1,
                height // self.vae_spatial_ratio,
                width // self.vae_spatial_ratio,
                self.latent_channels)

    def denoise_apply(self, params: Params, x, t, cond):
        if cond.get("first_frame_latents") is not None:
            # WanI2V channel concat: [mask ; padded first-frame latents]
            # appended to x (reference image2video.py:373 y=concat(msk, y))
            x = jnp.concatenate([x, cond["first_frame_latents"]], axis=-1)
        return self.denoiser.apply({"params": params["denoiser"]},
                                   x, t, cond["y"],
                                   cond.get("image_features"))

    def prepare_image_cond(self, params, cond, uncond, images, frames,
                           height, width, key):
        """WanI2V: CLIP patch features for the blocks' image cross-attn +
        masked first-frame latents concatenated on channels when the DiT
        takes extra input channels (in_dim 36 = 16 x + 4 mask + 16 y)."""
        cond = dict(cond)
        if self.cond_stage_2 is not None:
            cond["image_features"] = self.prepare_image_features(params,
                                                                 images)
        in_ch = getattr(self.denoiser, "in_channels",
                        self.latent_channels)
        extra = in_ch - self.latent_channels
        if extra > 0:
            lat = self.latent_shape(images.shape[0], frames, height,
                                    width)[1]
            ffl = self.prepare_first_frame_latents(params, images, lat,
                                                   key)
            n_mask = extra - ffl.shape[-1]
            if n_mask > 0:
                mask = jnp.zeros((*ffl.shape[:-1], n_mask), ffl.dtype)
                mask = mask.at[:, 0].set(1.0)     # first frame known
                ffl = jnp.concatenate([mask, ffl], axis=-1)
            cond["first_frame_latents"] = ffl
        if uncond is not None:
            uncond = dict(uncond)
            for k in ("image_features", "first_frame_latents"):
                if k in cond:
                    uncond[k] = cond[k]
        return cond, uncond

    # ------------------------------------------------------------------ vae
    # The weight-faithful WanVAE standardizes latents with per-channel
    # mean/std and encodes to the deterministic mean (reference
    # wan/modules/vae.py:518-567, WanVAE wrapper :600-610) — no global
    # scale_factor, no sampling.  Fall back to the generic moments path for
    # other first stages (e.g. the trainable CausalVAE3D).
    def encode_video(self, params: Params, video, key):
        from videotuna_tpu.models.wan.vae import WanVAE
        if isinstance(self.first_stage, WanVAE):
            return self.first_stage.apply(
                {"params": params["first_stage"]}, video,
                method=self.first_stage.encode)
        return super().encode_video(params, video, key)

    def decode_latents(self, params: Params, z):
        from videotuna_tpu.models.wan.vae import WanVAE
        if isinstance(self.first_stage, WanVAE):
            out = self.first_stage.apply(
                {"params": params["first_stage"]}, z,
                method=self.first_stage.decode)
            return jnp.clip(out, -1.0, 1.0)
        return super().decode_latents(params, z)

    def prepare_image_features(self, params: Params,
                               image: jnp.ndarray) -> jnp.ndarray:
        """I2V conditioning: CLIP-ViT patch tokens of the reference frame
        feed the blocks' image cross-attention (reference WanI2V,
        wan/image2video.py:373 — CLIP features + masked first-frame
        latents). Requires cond_stage_2 = CLIPImageEmbedder."""
        if self.cond_stage_2 is None:
            raise ValueError("i2v needs cond_stage_2 (CLIP image encoder)")
        return self.cond_stage_2.apply(
            {"params": params["cond_stage_2"]}, image)

    def prepare_first_frame_latents(self, params: Params,
                                    image: jnp.ndarray,
                                    num_latent_frames: int,
                                    key) -> jnp.ndarray:
        """Masked first-frame latent condition: encode the frame, zero-pad
        the remaining latent time (concatenated on channels by i2v DiTs)."""
        vid = image[:, None] if image.ndim == 4 else image
        z0 = self.encode_video(params, vid, key)
        pad = jnp.zeros((z0.shape[0], num_latent_frames - z0.shape[1],
                         *z0.shape[2:]), z0.dtype)
        return jnp.concatenate([z0, pad], axis=1)

    # --------------------------------------------------------------- training
    def training_loss(self, params: Params, batch: Dict[str, Any],
                      key: jax.Array) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        k_enc, k_sig, k_noise = jax.random.split(key, 3)
        z = batch.get("latents")
        if z is None:
            z = self.encode_video(params, batch["video"], k_enc)
        b = z.shape[0]
        sigma = sample_sigmas(k_sig, b, "logit_normal")
        noise = jax.random.normal(k_noise, z.shape, z.dtype)
        x_t = flow_interpolate(z, noise, sigma)
        cond = {"y": batch["text_states"]}
        v_pred = self.denoise_apply(params, x_t, sigma * 1000.0, cond)
        per = jnp.mean((v_pred - flow_target(z, noise)) ** 2,
                       axis=tuple(range(1, z.ndim)))
        per = jnp.where(jnp.isnan(per), 0.0, per)
        loss = jnp.mean(per)
        return loss, {"loss": loss}

    # -------------------------------------------------------------- sampling
    def sample(self, params: Params, cond, uncond, shape, key,
               cfg_scale: float = 5.0):
        from videotuna_tpu.schedulers import cfg_denoise
        model_fn = lambda x, t, c: self.denoise_apply(params, x, t, c)
        denoise = cfg_denoise(model_fn, cond, uncond, cfg_scale)
        return self.scheduler.sample(denoise, shape, key)

    def inference(self, config: Dict[str, Any]) -> Dict[str, Any]:
        """Wan uses a rich default negative prompt instead of empty uncond
        (reference wan/text2video.py sample_neg_prompt)."""
        inf = config.get("inference", config)
        inf.setdefault("negative_prompt", self.negative_prompt)
        return super().inference(config)
