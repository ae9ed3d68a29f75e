"""StepVideoFlow — Step-Video-T2V 30B with tensor parallelism.

Capability parity with the reference ``StepVideoModelFlow``
(/root/reference/videotuna/flow/stepvideo.py:41: xfuser TP+SP init :37-38,
liboptimus loading :93-111 — neither needed here) and its pipeline
(models/stepvideo/stepvideo/diffusion/video_pipeline.py:575,
scheduler diffusion/scheduler.py — flow-match discrete Euler).

TP is parameter placement over the mesh ``tp`` axis
(parallel/tensor_parallel.py); the denoise step is an ordinary jit under the
mesh — GSPMD inserts Megatron's all-reduces.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from videotuna_tpu.core.registry import register
from videotuna_tpu.flows.generation import GenerationFlow, Params
from videotuna_tpu.schedulers import (FlowMatchSchedule, flow_interpolate,
                                      flow_target, sample_sigmas)


@register("videotuna_tpu.flows.StepVideoFlow",
          aliases=["videotuna.flow.stepvideo.StepVideoModelFlow"])
class StepVideoFlow(GenerationFlow):
    latent_channels = 64
    vae_spatial_ratio = 16
    vae_temporal_ratio = 8

    def __init__(self, *args,
                 num_inference_steps: int = 50,
                 flow_shift: float = 13.0,
                 **kwargs):
        kwargs.setdefault("model_max_length", 320)
        super().__init__(*args, **kwargs)
        if not isinstance(self.scheduler, FlowMatchSchedule):
            self.scheduler = FlowMatchSchedule.create(
                num_inference_steps, flow_shift)

    def example_inputs(self) -> Dict[str, Any]:
        td = getattr(self.cond_stage, "dim", 6144) \
            if self.cond_stage is not None else 6144
        zc = getattr(self.denoiser, "in_channels", self.latent_channels)
        den_args = [jnp.zeros((1, 2, 8, 8, zc)), jnp.zeros((1,)),
                    jnp.zeros((1, 8, td))]
        if self.cond_stage_2 is not None:
            cd = getattr(self.denoiser, "clip_dim", None) or \
                getattr(self.cond_stage_2, "dim", 1024)
            den_args += [jnp.zeros((1, 4, cd)), jnp.ones((1, 8), bool)]
        ex = {
            "denoiser": tuple(den_args),
            "first_stage": (jnp.zeros((1, 9, 32, 32, 3)),),
            "cond_stage": (jnp.zeros((1, 8), jnp.int32),
                           jnp.ones((1, 8), bool)),
        }
        if self.cond_stage_2 is not None:
            ex["cond_stage_2"] = (jnp.zeros((1, 8), jnp.int32),)
        return ex

    def latent_shape(self, batch, num_frames, height, width):
        return (batch,
                max(num_frames // self.vae_temporal_ratio, 1),
                height // self.vae_spatial_ratio,
                width // self.vae_spatial_ratio,
                self.latent_channels)

    def encode_text(self, params: Params, texts):
        """Dual-tower conditioning (reference video_pipeline.py:575
        encode_prompt: Step-1 LLM states + HunyuanClip sequence states,
        clip tokens concatenated BEFORE the captions inside the model):
        y = StepLLM states, y2 = CLIP states, y_mask = caption mask."""
        out = super().encode_text(params, texts)
        out["y_mask"] = out.get("mask")
        if self.cond_stage_2 is not None:
            from videotuna_tpu.models.text_encoders import tokenize
            max2 = getattr(self.cond_stage_2, "max_len", 77)
            ids2, _ = tokenize(texts, pretrained=self.tokenizer,
                               max_length=max2)
            out["y2"] = self.cond_stage_2.apply(
                {"params": params["cond_stage_2"]}, jnp.asarray(ids2))
        return out

    def denoise_apply(self, params: Params, x, t, cond):
        # y2 = optional CLIP states concatenated before the caption tokens;
        # y_mask = caption attention mask (reference video_pipeline.py
        # passes encoder_hidden_states_2 + encoder_attention_mask)
        return self.denoiser.apply({"params": params["denoiser"]},
                                   x, t, cond["y"], cond.get("y2"),
                                   cond.get("y_mask"))

    def shard_for_tp(self, mesh) -> None:
        """Place denoiser params with TP(+FSDP) shardings."""
        from videotuna_tpu.parallel.tensor_parallel import apply_tp
        self.params["denoiser"] = apply_tp(self.params["denoiser"], mesh)

    def training_loss(self, params: Params, batch: Dict[str, Any],
                      key: jax.Array) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        k_enc, k_sig, k_noise = jax.random.split(key, 3)
        z = batch.get("latents")
        if z is None:
            z = self.encode_video(params, batch["video"], k_enc)
        sigma = sample_sigmas(k_sig, z.shape[0], "uniform")
        noise = jax.random.normal(k_noise, z.shape, z.dtype)
        x_t = flow_interpolate(z, noise, sigma)
        v = self.denoise_apply(params, x_t, sigma * 1000.0,
                               {"y": batch["text_states"]})
        per = jnp.mean((v - flow_target(z, noise)) ** 2,
                       axis=tuple(range(1, z.ndim)))
        loss = jnp.mean(jnp.where(jnp.isnan(per), 0.0, per))
        return loss, {"loss": loss}
