"""HunyuanVideoFlow — HunyuanVideo T2V/I2V: flow-matching inference +
training (the reference's two trees unified).

Capability parity:
- inference: ``HunyuanVideoFlow`` (/root/reference/videotuna/flow/
  hunyuanvideo.py:181) — flow-match Euler sampling with shift, CFG, RoPE with
  RIFLEx extrapolation beyond 192 frames (:55-109,425-517), Ulysses+ring SP
  (:302-319 — here via parallel/sequence.py over the mesh ``sp`` axis);
- training: ``HunyuanVideoWorkFlow`` (models/hunyuan/hyvideo_t2v/
  hunyuanvideo.py:193) — logit-normal sigma sampling, x_t=(1−σ)x+σε,
  target = ε − x (:883-971).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from videotuna_tpu.core.registry import register
from videotuna_tpu.flows.generation import GenerationFlow, Params
from videotuna_tpu.schedulers import (FlowMatchSchedule, flow_interpolate,
                                      flow_target, sample_sigmas)


def riflex_temporal_scale(dim_t: int, num_latent_frames: int,
                          k: int = 4, L_test: Optional[int] = None,
                          theta: float = 256.0) -> Optional[jnp.ndarray]:
    """RIFLEx frequency adjustment (reference flow/hunyuanvideo.py:55-109):
    cap the k-th intrinsic temporal frequency so one period covers the test
    length, preventing repetition beyond the 192-frame training horizon.
    Returns per-frequency multipliers for the temporal rope axis, or None."""
    if L_test is None or L_test <= 48:   # ≤ 192 pixel frames (4× compressed)
        return None
    inv = 1.0 / (theta ** (jnp.arange(0, dim_t, 2, dtype=jnp.float32)
                           / dim_t))
    scale = jnp.ones_like(inv)
    # frequency index k-1 (1-based k): force period ≥ L_test
    target = 2.0 * math.pi / L_test
    idx = k - 1
    scale = scale.at[idx].set(jnp.minimum(1.0, target / inv[idx]))
    return scale


@register("videotuna_tpu.flows.HunyuanVideoFlow",
          aliases=["videotuna.flow.hunyuanvideo.HunyuanVideoFlow",
                   "videotuna.models.hunyuan.hyvideo_t2v.hunyuanvideo."
                   "HunyuanVideoWorkFlow"])
class HunyuanVideoFlow(GenerationFlow):
    latent_channels = 16
    vae_spatial_ratio = 8
    vae_temporal_ratio = 4

    def __init__(self, *args,
                 num_inference_steps: int = 50,
                 flow_shift: float = 7.0,
                 embedded_cfg_scale: Optional[float] = 6.0,
                 i2v_mode: bool = False,
                 riflex_k: int = 4,
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
        kwargs.setdefault("scale_factor", 0.476986)
        super().__init__(*args, **kwargs)
        self.i2v_mode = i2v_mode
        self.embedded_cfg_scale = embedded_cfg_scale
        self.riflex_k = riflex_k
        if not isinstance(self.scheduler, FlowMatchSchedule):
            self.scheduler = FlowMatchSchedule.create(
                num_inference_steps, flow_shift)

    def example_inputs(self) -> Dict[str, Any]:
        zc = self.latent_channels * (2 if self.i2v_mode else 1)
        td = getattr(self.cond_stage, "dim", 4096) \
            if self.cond_stage is not None else 4096
        pd = getattr(self.cond_stage_2, "dim", 768) \
            if self.cond_stage_2 is not None else 768
        ex = {
            "denoiser": (jnp.zeros((1, 2, 8, 8, zc)),
                         jnp.zeros((1,)),
                         jnp.zeros((1, 8, td)),
                         jnp.zeros((1, pd)),
                         jnp.ones((1, 8), bool),
                         jnp.ones((1,))),
            "first_stage": (jnp.zeros((1, 5, 32, 32, 3)),),
            "cond_stage": (jnp.zeros((1, 8), jnp.int32),
                           jnp.ones((1, 8), bool)),
        }
        if self.cond_stage_2 is not None:
            ex["cond_stage_2"] = (jnp.zeros((1, 8), jnp.int32),)
        return ex

    def latent_shape(self, batch, num_frames, height, width):
        return (batch,
                (num_frames - 1) // self.vae_temporal_ratio + 1,
                height // self.vae_spatial_ratio,
                width // self.vae_spatial_ratio,
                self.latent_channels)

    # --------------------------------------------------------------- encoders
    def encode_text(self, params: Params, texts):
        """LLaMA states (cond_stage) + CLIP pooled (cond_stage_2)."""
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
            # pooled = last valid token's state
            last = jnp.sum(jnp.asarray(mask2), axis=1) - 1
            pooled = seq2[jnp.arange(seq2.shape[0]), last]
        return {"y": states, "mask": jnp.asarray(mask), "pooled": pooled}

    def encode_text_i2v(self, params: Params, texts, image_states,
                        i2v_condition_type: str = "token_replace"):
        """Faithful i2v prompt encode: LLaVA chat template with the
        <image> slot spliced with 576 projected CLIP patch states, then
        the reference's crop/splice into [image ; text] conditioning
        (reference hyvideo_i2v/text_encoder/__init__.py:292-517,
        TextEncoderWrapper :539-660). ``image_states``: (B, 576, D_lm)
        from tools.captioner.LlavaCaptioner.image_tokens (CLIP tower +
        mm projector)."""
        import numpy as np
        from videotuna_tpu.models.text_encoders import (encode_hunyuan_i2v,
                                                        tokenize)
        y, mask = encode_hunyuan_i2v(
            self.cond_stage, params["cond_stage"], texts, image_states,
            tokenizer=self.tokenizer,
            i2v_condition_type=i2v_condition_type,
            text_len=self.model_max_length)
        pooled = None
        if self.cond_stage_2 is not None:
            max2 = getattr(self.cond_stage_2, "max_len", 77)
            ids2, mask2 = tokenize(texts, pretrained=self.tokenizer,
                                   max_length=max2)
            seq2 = self.cond_stage_2.apply(
                {"params": params["cond_stage_2"]}, jnp.asarray(ids2))
            last = jnp.sum(jnp.asarray(mask2), axis=1) - 1
            pooled = seq2[jnp.arange(seq2.shape[0]), last]
        return {"y": jnp.asarray(y), "mask": jnp.asarray(np.asarray(mask)),
                "pooled": pooled}

    def prepare_image_cond(self, params, cond, uncond, images, frames,
                           height, width, key):
        """HunyuanVideo-I2V latent_concat conditioning: first-frame
        latents zero-padded over latent time, concatenated on channels
        (i2v_mode doubles the DiT's in_channels; token_replace i2v
        additionally flows through the model's vec_tr path)."""
        if not self.i2v_mode:
            raise NotImplementedError(
                "HunyuanVideoFlow i2v inference needs i2v_mode=true")
        lat = self.latent_shape(images.shape[0], frames, height, width)[1]
        vid = images[:, None]
        z0 = self.encode_video(params, vid, key)
        pad = jnp.zeros((z0.shape[0], lat - z0.shape[1], *z0.shape[2:]),
                        z0.dtype)
        il = jnp.concatenate([z0, pad], axis=1)
        cond = dict(cond, image_latents=il)
        if uncond is not None:
            uncond = dict(uncond, image_latents=il)
        return cond, uncond

    def denoise_apply(self, params: Params, x, t, cond,
                      temporal_rope_scale=None):
        if self.i2v_mode and cond.get("image_latents") is not None:
            x = jnp.concatenate([x, cond["image_latents"]], axis=-1)
        guidance = None
        if self.embedded_cfg_scale is not None:
            guidance = jnp.full((x.shape[0],),
                                self.embedded_cfg_scale * 1000.0)
        return self.denoiser.apply(
            {"params": params["denoiser"]}, x, t, cond["y"],
            cond.get("pooled"), cond.get("mask"), guidance,
            temporal_rope_scale)

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
        t = sigma * 1000.0
        cond = {"y": batch["text_states"], "mask": batch.get("text_mask"),
                "pooled": batch.get("pooled_text")}
        v_pred = self.denoise_apply(params, x_t, t, cond)
        target = flow_target(z, noise)
        per = jnp.mean((v_pred - target) ** 2,
                       axis=tuple(range(1, z.ndim)))
        per = jnp.where(jnp.isnan(per), 0.0, per)
        loss = jnp.mean(per)
        return loss, {"loss": loss, "sigma_mean": jnp.mean(sigma)}

    # -------------------------------------------------------------- sampling
    def sample(self, params: Params, cond, uncond, shape, key,
               cfg_scale: float = 1.0):
        """Euler flow-matching loop; RIFLEx scale injected for long videos.
        HunyuanVideo ships CFG-distilled (embedded guidance) so the default
        is a single (non-doubled) forward; cfg_scale>1 with uncond enables
        true CFG."""
        num_lat_frames = shape[1]
        hd = self.denoiser.dim // self.denoiser.heads
        dt_r = hd - 2 * (((hd - hd // 4) // 2))
        scale = riflex_temporal_scale(dt_r, num_lat_frames, self.riflex_k,
                                      L_test=num_lat_frames
                                      if num_lat_frames > 48 else None,
                                      theta=self.denoiser.rope_theta)
        if uncond is not None and cfg_scale != 1.0:
            from videotuna_tpu.schedulers import cfg_denoise
            model_fn = lambda x, t, c: self.denoise_apply(
                params, x, t, c, temporal_rope_scale=scale)
            denoise = cfg_denoise(model_fn, cond, uncond, cfg_scale)
        else:
            denoise = lambda x, t: self.denoise_apply(
                params, x, t, cond, temporal_rope_scale=scale)
        return self.scheduler.sample(denoise, shape, key)
