"""DDIM sampler as a single ``lax.scan`` over precomputed step parameters.

Re-provides the reference ``DDIMSampler`` (videotuna/schedulers/ddim.py:27-560)
and its multi-condition variant (ddim_multiplecond.py): schedule construction,
eta/sigma parameters, CFG (single guidance, separate image+text guidance, and
guidance_rescale), temporal CFG hooks.

Design difference from the reference: the Python ``for i in iterator`` loop
(ddim.py:193-258) becomes a scan body whose per-step parameters
(alpha, alpha_prev, sigma, t) are gathered from precomputed arrays, so the
whole denoise loop jit-compiles once; CFG is expressed by wrapping the model
function (batch-doubling happens inside the wrapper, so the scan sees a single
call with static shapes).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from videotuna_tpu.core.registry import register
from videotuna_tpu.schedulers.common import (make_ddim_sampling_parameters,
                                             make_ddim_timesteps,
                                             rescale_noise_cfg)
from videotuna_tpu.schedulers.ddpm import DDPMSchedule

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


@struct.dataclass
class DDIMSchedule:
    """Per-step buffers for a DDIM run (indices ascend in model-t order)."""
    timesteps: jnp.ndarray      # (S,) int32, ascending
    alphas: jnp.ndarray         # (S,) alpha_cumprod at each step
    alphas_prev: jnp.ndarray    # (S,)
    sigmas: jnp.ndarray         # (S,)
    base: DDPMSchedule

    @classmethod
    def create(cls, base: DDPMSchedule, num_steps: int, eta: float = 0.0,
               method: str = "uniform") -> "DDIMSchedule":
        ddim_ts = make_ddim_timesteps(num_steps, base.num_timesteps, method)
        ddim_ts = np.minimum(ddim_ts, base.num_timesteps - 1)
        alphas, alphas_prev, sigmas = make_ddim_sampling_parameters(
            base.alphas_cumprod, ddim_ts, eta)
        return cls(timesteps=jnp.asarray(ddim_ts, jnp.int32),
                   alphas=alphas, alphas_prev=alphas_prev, sigmas=sigmas,
                   base=base)

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]

    # ------------------------------------------------------------------ steps
    def step(self, denoise_fn: DenoiseFn, x: jnp.ndarray, i: jnp.ndarray,
             key: jax.Array, clip_denoised: bool = False) -> jnp.ndarray:
        """One DDIM update at schedule index ``i`` (descending during
        sampling). Mirrors p_sample_ddim (reference ddim.py:344-440)."""
        b = x.shape[0]
        t = jnp.full((b,), self.timesteps[i], jnp.int32)
        model_out = denoise_fn(x, t)
        x0, eps = self.base.to_x0_and_eps(x, t, model_out)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)

        a_prev = self.alphas_prev[i]
        sigma = self.sigmas[i]
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma ** 2, 0.0)) * eps
        noise = sigma * jax.random.normal(key, x.shape, x.dtype)
        return jnp.sqrt(a_prev) * x0 + dir_xt + noise

    def sample(self, denoise_fn: DenoiseFn, shape, key,
               x_T: Optional[jnp.ndarray] = None,
               clip_denoised: bool = False,
               mask: Optional[jnp.ndarray] = None,
               x0: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Full DDIM loop as one scan (reference ddim_sampling ddim.py:193).

        ``mask``/``x0`` implement the inpainting blend at ddim.py:236-243.
        """
        if x_T is None:
            key, init_key = jax.random.split(key)
            x = jax.random.normal(init_key, shape)
        else:
            x = x_T
        n = self.num_steps
        idxs = jnp.arange(n - 1, -1, -1)
        keys = jax.random.split(key, n)

        def body(carry, inp):
            i, k = inp
            xc = carry
            if mask is not None and x0 is not None:
                t = jnp.full((shape[0],), self.timesteps[i], jnp.int32)
                k, k2 = jax.random.split(k)
                img_orig = self.base.q_sample(
                    x0, t, jax.random.normal(k2, x0.shape, x0.dtype))
                xc = img_orig * mask + (1.0 - mask) * xc
            return self.step(denoise_fn, xc, i, k, clip_denoised), None

        out, _ = jax.lax.scan(body, x, (idxs, keys))
        return out


# ---------------------------------------------------------------------------
# CFG wrappers — replace the reference's in-loop unconditional branches
# (ddim.py:371-394, ddim_multiplecond.py CFG) by composing the model fn.
# ---------------------------------------------------------------------------

def cfg_denoise(model_fn: Callable[..., jnp.ndarray],
                cond, uncond, scale: float,
                guidance_rescale: float = 0.0) -> DenoiseFn:
    """Classifier-free guidance with batch-doubling (one model call)."""

    def fn(x, t):
        if scale == 1.0 or uncond is None:
            return model_fn(x, t, cond)
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        c2 = jax.tree.map(
            lambda u, c: jnp.concatenate([u, c], axis=0), uncond, cond)
        out = model_fn(x2, t2, c2)
        e_u, e_c = jnp.split(out, 2, axis=0)
        e = e_u + scale * (e_c - e_u)
        if guidance_rescale > 0.0:
            e = rescale_noise_cfg(e, e_c, guidance_rescale)
        return e

    return fn


def dynamic_cfg_denoise(model_fn: Callable[..., jnp.ndarray],
                        cond, uncond, scale: float,
                        num_inference_steps: int,
                        timesteps=None,
                        guidance_rescale: float = 0.0) -> DenoiseFn:
    """CogVideoX cosine dynamic guidance (reference
    cogvideo_pl.py:711-723): per-step scale
    ``1 + s·(1 − cos(π·((N − t)/N)^5))/2`` computed from the raw timestep
    value ``t`` (reference semantics preserved exactly, including the
    t > N regime where the cosine argument is huge). The reference does
    this in python float64; float32-on-device diverges for large
    arguments, so when the (static) ``timesteps`` schedule is given the
    table is precomputed host-side in float64 and looked up by matching
    the traced ``t`` against the schedule."""
    import numpy as np

    if timesteps is not None:
        ts64 = np.asarray(jax.device_get(timesteps), np.float64)
        frac64 = (num_inference_steps - ts64) / num_inference_steps
        tab = 1.0 + scale * ((1.0 - np.cos(np.pi * frac64 ** 5)) / 2.0)
        ts_j = jnp.asarray(ts64, jnp.float32)
        tab_j = jnp.asarray(tab, jnp.float32)

        def gs_of(tf):
            idx = jnp.argmin(jnp.abs(ts_j - tf))
            return tab_j[idx]
    else:
        def gs_of(tf):
            frac = (num_inference_steps - tf) / num_inference_steps
            return 1.0 + scale * ((1.0 - jnp.cos(jnp.pi * frac ** 5)) / 2.0)

    def fn(x, t):
        if uncond is None:
            return model_fn(x, t, cond)
        gs = gs_of(t.reshape(-1)[0].astype(jnp.float32))
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        c2 = jax.tree.map(
            lambda u, c: jnp.concatenate([u, c], axis=0), uncond, cond)
        out = model_fn(x2, t2, c2)
        e_u, e_c = jnp.split(out, 2, axis=0)
        e = e_u + gs * (e_c - e_u)
        if guidance_rescale > 0.0:
            e = rescale_noise_cfg(e, e_c, guidance_rescale)
        return e

    return fn


def multicond_cfg_denoise(model_fn: Callable[..., jnp.ndarray],
                          cond, uncond, img_uncond,
                          text_scale: float,
                          img_scale: float) -> DenoiseFn:
    """Separate image-CFG + text-CFG (DynamiCrafter i2v;
    reference ddim_multiplecond.py:14 and p_sample path)."""

    def fn(x, t):
        e_c = model_fn(x, t, cond)
        e_u = model_fn(x, t, uncond)
        e_iu = model_fn(x, t, img_uncond)
        return (e_iu
                + img_scale * (e_u - e_iu)
                + text_scale * (e_c - e_u))

    return fn


@register("videotuna_tpu.schedulers.DDIMSchedule",
          aliases=["videotuna.schedulers.ddim.DDIMSampler",
                   "videotuna.schedulers.ddim_multiplecond.DDIMSampler"])
def build_ddim(base: Optional[DDPMSchedule] = None,
               num_steps: int = 50, eta: float = 0.0,
               method: str = "uniform", **base_kwargs) -> DDIMSchedule:
    if base is None:
        base = DDPMSchedule.create(**base_kwargs) if base_kwargs else \
            DDPMSchedule.create()
    return DDIMSchedule.create(base, num_steps, eta, method)
