"""Flow-matching schedulers: discrete Euler (Hunyuan/StepVideo style) and the
training-side sigma sampling used by CogVideoX/Hunyuan/Wan flows.

Re-provides:
- ``FlowMatchDiscreteScheduler`` (reference models/hunyuan/hyvideo_i2v/
  diffusion/schedulers/scheduling_flow_match_discrete.py:48) — Euler steps over
  a shifted sigma schedule, velocity prediction x_{t-1} = x_t + v * dt.
- Hunyuan training-side flow interpolation (hyvideo_t2v/hunyuanvideo.py:
  910-971): sigma sampling (uniform/logit-normal), x_t = (1-σ)x + σε, target
  v = ε − x.
- Sigma shift: σ' = shift·σ / (1 + (shift−1)·σ) (same formula used by Wan's
  fm_solvers ``get_sampling_sigmas`` and Hunyuan's scheduler).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from videotuna_tpu.core.registry import register

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def shift_sigmas(sigmas: jnp.ndarray, shift: float) -> jnp.ndarray:
    return shift * sigmas / (1.0 + (shift - 1.0) * sigmas)


@struct.dataclass
class FlowMatchSchedule:
    """Discrete flow-matching schedule. sigmas descend from 1 → 0 with
    ``num_steps + 1`` entries; timesteps are ``sigma * num_train_timesteps``.
    """
    sigmas: jnp.ndarray          # (S+1,)
    timesteps: jnp.ndarray       # (S,)
    num_train_timesteps: int = struct.field(pytree_node=False, default=1000)
    reverse: bool = struct.field(pytree_node=False, default=True)

    @classmethod
    def create(cls, num_steps: int, shift: float = 7.0,
               num_train_timesteps: int = 1000,
               reverse: bool = True) -> "FlowMatchSchedule":
        sigmas = jnp.linspace(1.0, 0.0, num_steps + 1)
        if shift != 1.0:
            sigmas = shift_sigmas(sigmas, shift)
        if not reverse:
            sigmas = sigmas[::-1]
        timesteps = sigmas[:-1] * num_train_timesteps
        return cls(sigmas=sigmas, timesteps=timesteps,
                   num_train_timesteps=num_train_timesteps, reverse=reverse)

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]

    def step(self, x: jnp.ndarray, v: jnp.ndarray,
             i: jnp.ndarray) -> jnp.ndarray:
        """Euler update: x += (σ_{i+1} − σ_i)·v. With the reverse (descending)
        schedule and model predicting v = ε − x0 this integrates to x0."""
        dt = self.sigmas[i + 1] - self.sigmas[i]
        return x + v * dt

    def sample(self, denoise_fn: DenoiseFn, shape, key,
               x_T: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if x_T is None:
            x = jax.random.normal(key, shape)
        else:
            x = x_T
        n = self.num_steps

        def body(xc, i):
            t = jnp.full((shape[0],), self.timesteps[i], jnp.float32)
            v = denoise_fn(xc, t)
            return self.step(xc, v, i), None

        out, _ = jax.lax.scan(body, x, jnp.arange(n))
        return out


# ---------------------------------------------------------------------------
# Training-side helpers
# ---------------------------------------------------------------------------

def sample_sigmas(key: jax.Array, batch: int,
                  weighting_scheme: str = "logit_normal",
                  logit_mean: float = 0.0, logit_std: float = 1.0
                  ) -> jnp.ndarray:
    """Sigma sampling for flow training (reference hyvideo_t2v
    hunyuanvideo.py:910-921; also diffusers' compute_density_for_timestep_
    sampling used by CogVideoX LoRA)."""
    if weighting_scheme == "logit_normal":
        u = jax.random.normal(key, (batch,)) * logit_std + logit_mean
        return jax.nn.sigmoid(u)
    if weighting_scheme == "uniform":
        return jax.random.uniform(key, (batch,))
    if weighting_scheme == "mode":
        u = jax.random.uniform(key, (batch,))
        return 1.0 - u - 1.29 * (jnp.cos(jnp.pi * u / 2) ** 2 - 1 + u)
    raise ValueError(weighting_scheme)


def flow_interpolate(x0: jnp.ndarray, noise: jnp.ndarray,
                     sigma: jnp.ndarray) -> jnp.ndarray:
    """x_t = (1−σ)·x0 + σ·ε (reference hunyuanvideo.py:933)."""
    s = sigma.reshape(-1, *([1] * (x0.ndim - 1)))
    return (1.0 - s) * x0 + s * noise


def flow_target(x0: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """v-target = ε − x0 (reference prepare_target hunyuanvideo.py:178)."""
    return noise - x0


@register("videotuna_tpu.schedulers.FlowMatchSchedule",
          aliases=[
              "videotuna.models.hunyuan.hyvideo_i2v.diffusion.schedulers."
              "scheduling_flow_match_discrete.FlowMatchDiscreteScheduler",
              "diffusers.FlowMatchEulerDiscreteScheduler",
          ])
def build_flow_match(num_steps: int = 50, shift: float = 7.0,
                     num_train_timesteps: int = 1000, reverse: bool = True,
                     **_ignored) -> FlowMatchSchedule:
    return FlowMatchSchedule.create(num_steps, shift, num_train_timesteps,
                                    reverse)
