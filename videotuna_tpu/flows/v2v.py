"""V2VEnhanceFlow — dedicated video-to-video enhancement model.

The reference's ``inference-v2v-ms`` shells into ModelScope's
Video-to-Video (MS-Vid2Vid-XL) pipeline
(/root/reference/scripts/inference_v2v_ms.py:28-33); the modelscope
package is neither installed nor vendored there, so no import-parity
gate is possible. This flow implements the Vid2Vid enhancement
*protocol* on an in-family backbone — ModelScope's UNetSD is the direct
ancestor of VideoCrafter's 3D UNet, so the ``lvdm.UNet3D`` here (itself
whole-model parity-tested against the imported reference VideoCrafter
module) is configured with doubled input channels for the concat
conditioning:

- the source video is VAE-encoded frame-wise and bilinearly upsampled
  in latent space to the target resolution;
- the conditioning latents are NOISE-AUGMENTED to a small timestep
  ``t_aug`` (the Vid2Vid/cascade trick that hides codec/upsample
  artifacts from the enhancer; strength maps to t_aug here);
- generation starts from PURE noise (not SDEdit re-noising): every DDIM
  step sees ``concat([x_t, z_cond])`` on the channel axis, text via the
  usual CLIP cross-attention + CFG;
- training is self-supervised degradation: downscale the batch video,
  re-encode, condition on it, and learn to reconstruct the full-res
  latents (the standard enhancement-model recipe — gives ``train-v2v``
  a real objective).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from videotuna_tpu.core.registry import register
from videotuna_tpu.flows.generation import Params
from videotuna_tpu.flows.videocrafter import VideocrafterFlow


def _latent_bilinear(z: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """(B, T, h, w, C) → (B, T, H, W, C) bilinear in latent space."""
    b, t, h, w, c = z.shape
    return jax.image.resize(z, (b, t, hw[0], hw[1], c), "bilinear")


@register("videotuna_tpu.flows.V2VEnhanceFlow",
          aliases=["videotuna.flow.v2v.V2VEnhanceFlow"])
class V2VEnhanceFlow(VideocrafterFlow):
    """Concat-conditioned enhancement flow (UNet in_channels must be
    2 × latent_channels)."""

    def __init__(self, *args, t_aug_frac: float = 0.1,
                 upscale: int = 1, **kwargs):
        super().__init__(*args, **kwargs)
        self.t_aug_frac = t_aug_frac
        self.upscale = upscale

    # example_inputs: the base class already sizes the init x to the
    # UNet's in_channels (= 2 × latent_channels here)

    def denoise_apply(self, params: Params, x, t, cond):
        z_cond = cond.get("z_cond")
        if z_cond is None:  # uncond stream in CFG: zero conditioning video
            z_cond = jnp.zeros_like(x)
        rest = {k: v for k, v in cond.items() if k != "z_cond"}
        return super().denoise_apply(
            params, jnp.concatenate([x, z_cond], axis=-1), t, rest)

    def _prepare_cond_latents(self, params: Params, video: jnp.ndarray,
                              key: jax.Array,
                              strength: float) -> jnp.ndarray:
        k_enc, k_aug = jax.random.split(key)
        z = self.encode_video(params, video, k_enc)
        if self.upscale > 1:
            z = _latent_bilinear(z, (z.shape[2] * self.upscale,
                                     z.shape[3] * self.upscale))
        sched = self.base_schedule
        t_aug = max(int(sched.num_timesteps * strength * self.t_aug_frac), 1)
        noise = jax.random.normal(k_aug, z.shape, z.dtype)
        return sched.q_sample(
            z, jnp.full((z.shape[0],), t_aug, jnp.int32), noise)

    def enhance(self, params: Params, video: jnp.ndarray,
                cond: Dict[str, Any], key: jax.Array,
                strength: float = 0.4,
                cfg_scale: float = 7.5,
                uncond: Optional[Dict[str, Any]] = None) -> jnp.ndarray:
        """Full Vid2Vid generation conditioned on ``video`` (B,T,H,W,3).
        ``strength`` scales the conditioning noise augmentation (NOT an
        SDEdit start point — sampling always runs the full schedule)."""
        k_cond, k_samp = jax.random.split(key)
        z_cond = self._prepare_cond_latents(params, video, k_cond, strength)
        cond = dict(cond)
        cond["z_cond"] = z_cond
        if uncond is not None:
            uncond = dict(uncond)
            # zero conditioning video on the uncond CFG stream
            uncond.setdefault("z_cond", jnp.zeros_like(z_cond))
        shape = z_cond.shape
        x = self.sample(params, cond, uncond, shape, k_samp,
                        cfg_scale=cfg_scale)
        return self.decode_latents(params, x)

    def training_loss(self, params: Params, batch: Dict[str, Any],
                      key: jax.Array) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        """Self-supervised degradation objective: condition on the
        2× downscaled + noise-augmented re-encode of the clip, predict
        the full-res latents' noise."""
        k_enc, k_lr, k_t, k_noise, k_drop = jax.random.split(key, 5)
        video = batch["video"]
        z = batch.get("latents")
        if z is None:
            z = self.encode_video(params, video, k_enc)
        b, tt, hh, ww, _ = video.shape
        lr = jax.image.resize(video, (b, tt, hh // 2, ww // 2,
                                      video.shape[-1]), "bilinear")
        lr = jax.image.resize(lr, video.shape, "bilinear")
        z_cond = self._prepare_cond_latents(params, lr, k_lr, 1.0)

        sched = self.base_schedule
        t = jax.random.randint(k_t, (b,), 0, sched.num_timesteps)
        noise = jax.random.normal(k_noise, z.shape, z.dtype)
        x_t = sched.q_sample(z, t, noise)
        y = batch["text_states"]
        if self.uncond_prob > 0:
            drop = jax.random.bernoulli(k_drop, self.uncond_prob, (b,))
            y = jnp.where(drop[:, None, None], jnp.zeros_like(y), y)
        cond = {"y": y, "fps": batch.get("fps"), "z_cond": z_cond}
        model_out = self.denoise_apply(params, x_t, t, cond)
        target = sched.training_target(z, noise, t)
        per = jnp.mean((model_out - target) ** 2,
                       axis=tuple(range(1, z.ndim)))
        per = jnp.where(jnp.isnan(per), 0.0, per)
        loss = jnp.mean(per)
        return loss, {"loss": loss}
