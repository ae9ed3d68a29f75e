"""DDPM/LDM scheduler as a pytree of precomputed buffers + pure methods.

Re-provides the reference ``DDPMScheduler``/``LDMScheduler``
(videotuna/schedulers/diffusion_schedulers.py:18-350): q_sample, q_posterior,
p_mean_variance helpers, v-prediction (get_v / predict_start_from_z_and_v),
and an ancestral ``lax.scan`` sampling loop (schedulers/ddpm.py in the
reference is the Python-loop equivalent).

Being a flax.struct PyTreeNode, a schedule threads through jit/pjit/scan with
zero host sync — the reference registers the same quantities as torch buffers.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from videotuna_tpu.core.registry import register
from videotuna_tpu.schedulers.common import (extract_into, make_beta_schedule,
                                             rescale_zero_terminal_snr)

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
# denoise_fn(x_t, t_batch) -> model output (eps / x0 / v depending on param.)


@struct.dataclass
class DDPMSchedule:
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    parameterization: str = struct.field(pytree_node=False, default="eps")
    v_posterior: float = struct.field(pytree_node=False, default=0.0)

    # ------------------------------------------------------------------ build
    @classmethod
    def create(cls,
               timesteps: int = 1000,
               beta_schedule: str = "linear",
               linear_start: float = 1e-4,
               linear_end: float = 2e-2,
               cosine_s: float = 8e-3,
               given_betas: Optional[jnp.ndarray] = None,
               parameterization: str = "eps",
               v_posterior: float = 0.0,
               rescale_betas_zero_snr: bool = False,
               snr_shift_scale: float = 1.0) -> "DDPMSchedule":
        betas = (jnp.asarray(given_betas) if given_betas is not None else
                 make_beta_schedule(beta_schedule, timesteps,
                                    linear_start, linear_end, cosine_s))
        if snr_shift_scale != 1.0:
            # diffusers CogVideoX order of ops (scheduling_ddim_cogvideox
            # __init__): betas → cumprod → SNR shift → zero-SNR rescale
            # directly on ᾱ; betas are re-derived so every downstream
            # buffer (posterior, √ᾱ tables) stays consistent. Gated vs an
            # fp64 twin in tests/test_cogvideox_dpm.py.
            from videotuna_tpu.schedulers.common import (
                rescale_zero_terminal_snr_alphas, snr_shift_alphas_cumprod)
            acp = jnp.cumprod(1.0 - betas, axis=0)
            acp = snr_shift_alphas_cumprod(acp, snr_shift_scale)
            if rescale_betas_zero_snr:
                acp = rescale_zero_terminal_snr_alphas(acp)
            alphas = jnp.concatenate([acp[:1], acp[1:] / acp[:-1]])
            betas = 1.0 - alphas
            alphas_cumprod = acp   # exact ᾱ, no cumprod roundtrip
        else:
            if rescale_betas_zero_snr:
                betas = rescale_zero_terminal_snr(betas)
            alphas = 1.0 - betas
            alphas_cumprod = jnp.cumprod(alphas, axis=0)
        alphas_cumprod_prev = jnp.concatenate(
            [jnp.ones((1,), betas.dtype), alphas_cumprod[:-1]])

        posterior_variance = ((1 - v_posterior) * betas
                              * (1.0 - alphas_cumprod_prev)
                              / (1.0 - alphas_cumprod)
                              + v_posterior * betas)
        return cls(
            betas=betas,
            alphas_cumprod=alphas_cumprod,
            alphas_cumprod_prev=alphas_cumprod_prev,
            sqrt_alphas_cumprod=jnp.sqrt(alphas_cumprod),
            sqrt_one_minus_alphas_cumprod=jnp.sqrt(1.0 - alphas_cumprod),
            sqrt_recip_alphas_cumprod=jnp.sqrt(1.0 / alphas_cumprod),
            sqrt_recipm1_alphas_cumprod=jnp.sqrt(1.0 / alphas_cumprod - 1),
            posterior_variance=posterior_variance,
            posterior_log_variance_clipped=jnp.log(
                jnp.maximum(posterior_variance, 1e-20)),
            posterior_mean_coef1=(betas * jnp.sqrt(alphas_cumprod_prev)
                                  / (1.0 - alphas_cumprod)),
            posterior_mean_coef2=((1.0 - alphas_cumprod_prev)
                                  * jnp.sqrt(alphas)
                                  / (1.0 - alphas_cumprod)),
            parameterization=parameterization,
            v_posterior=v_posterior,
        )

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]

    # -------------------------------------------------------------- forward q
    def q_sample(self, x_start: jnp.ndarray, t: jnp.ndarray,
                 noise: jnp.ndarray) -> jnp.ndarray:
        nd = x_start.ndim
        return (extract_into(self.sqrt_alphas_cumprod, t, nd) * x_start
                + extract_into(self.sqrt_one_minus_alphas_cumprod, t, nd)
                * noise)

    def q_posterior(self, x_start, x_t, t):
        nd = x_t.ndim
        mean = (extract_into(self.posterior_mean_coef1, t, nd) * x_start
                + extract_into(self.posterior_mean_coef2, t, nd) * x_t)
        var = extract_into(self.posterior_variance, t, nd)
        log_var = extract_into(self.posterior_log_variance_clipped, t, nd)
        return mean, var, log_var

    # ------------------------------------------------------ parameterizations
    def predict_start_from_noise(self, x_t, t, noise):
        nd = x_t.ndim
        return (extract_into(self.sqrt_recip_alphas_cumprod, t, nd) * x_t
                - extract_into(self.sqrt_recipm1_alphas_cumprod, t, nd)
                * noise)

    def predict_eps_from_start(self, x_t, t, x0):
        nd = x_t.ndim
        return ((extract_into(self.sqrt_recip_alphas_cumprod, t, nd) * x_t
                 - x0)
                / extract_into(self.sqrt_recipm1_alphas_cumprod, t, nd))

    def get_v(self, x, noise, t):
        nd = x.ndim
        return (extract_into(self.sqrt_alphas_cumprod, t, nd) * noise
                - extract_into(self.sqrt_one_minus_alphas_cumprod, t, nd) * x)

    def predict_start_from_z_and_v(self, x_t, t, v):
        nd = x_t.ndim
        return (extract_into(self.sqrt_alphas_cumprod, t, nd) * x_t
                - extract_into(self.sqrt_one_minus_alphas_cumprod, t, nd) * v)

    def predict_eps_from_z_and_v(self, x_t, t, v):
        nd = x_t.ndim
        return (extract_into(self.sqrt_alphas_cumprod, t, nd) * v
                + extract_into(self.sqrt_one_minus_alphas_cumprod, t, nd)
                * x_t)

    def to_x0_and_eps(self, x_t, t, model_out
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Convert model output under this parameterization to (x0, eps)."""
        if self.parameterization == "eps":
            eps = model_out
            x0 = self.predict_start_from_noise(x_t, t, eps)
        elif self.parameterization == "x0":
            x0 = model_out
            eps = self.predict_eps_from_start(x_t, t, x0)
        elif self.parameterization == "v":
            x0 = self.predict_start_from_z_and_v(x_t, t, model_out)
            eps = self.predict_eps_from_z_and_v(x_t, t, model_out)
        else:
            raise ValueError(self.parameterization)
        return x0, eps

    # ------------------------------------------------------------ train target
    def training_target(self, x_start, noise, t) -> jnp.ndarray:
        if self.parameterization == "eps":
            return noise
        if self.parameterization == "x0":
            return x_start
        if self.parameterization == "v":
            return self.get_v(x_start, noise, t)
        raise ValueError(self.parameterization)

    # --------------------------------------------------------------- sampling
    def p_sample_step(self, denoise_fn: DenoiseFn, x, t, key,
                      clip_denoised: bool = False):
        """One ancestral step; t is a (batch,) int array."""
        model_out = denoise_fn(x, t)
        x0, _ = self.to_x0_and_eps(x, t, model_out)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        mean, _, log_var = self.q_posterior(x0, x, t)
        noise = jax.random.normal(key, x.shape, x.dtype)
        nonzero = (t > 0).astype(x.dtype).reshape(
            -1, *([1] * (x.ndim - 1)))
        return mean + nonzero * jnp.exp(0.5 * log_var) * noise

    def sample(self, denoise_fn: DenoiseFn, shape, key,
               clip_denoised: bool = False) -> jnp.ndarray:
        """Full ancestral DDPM loop as one ``lax.scan``."""
        key, init_key = jax.random.split(key)
        x_T = jax.random.normal(init_key, shape)
        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        keys = jax.random.split(key, self.num_timesteps)

        def body(x, inp):
            t_scalar, k = inp
            t = jnp.full((shape[0],), t_scalar, jnp.int32)
            return self.p_sample_step(denoise_fn, x, t, k,
                                      clip_denoised), None

        x0, _ = jax.lax.scan(body, x_T, (ts, keys))
        return x0


@register("videotuna_tpu.schedulers.DDPMSchedule",
          aliases=[
              "videotuna.schedulers.diffusion_schedulers.DDPMScheduler",
              "videotuna.schedulers.diffusion_schedulers.LDMScheduler",
          ])
def build_ddpm_schedule(**kwargs) -> DDPMSchedule:
    """Config-surface constructor accepting the reference's YAML params."""
    kwargs.pop("loss_type", None)  # handled by the flow's loss, not here
    kwargs.pop("logvar_init", None)
    return DDPMSchedule.create(**{
        k: v for k, v in kwargs.items()
        if k in DDPMSchedule.create.__func__.__code__.co_varnames
    })
