"""Flow-matching multistep solvers: DPM-Solver++(2M) and UniPC (order 2).

Capability parity with the reference's Wan solvers
(/root/reference/videotuna/models/wan/wan/utils/fm_solvers.py —
``FlowDPMSolverMultistepScheduler``, fm_solvers_unipc.py —
``FlowUniPCMultistepScheduler``, plus ``get_sampling_sigmas`` sigma shift).

For the flow-matching path x_σ = (1−σ)·x₀ + σ·ε the model predicts
v = ε − x₀, so the data prediction is x₀ = x_σ − σ·v. In diffusion notation
α_σ = 1−σ, with λ = log(α/σ); the DPM-Solver++ data-prediction update is

    x_{i+1} = (σ_{i+1}/σ_i)·x_i − α_{i+1}·(e^{−h} − 1)·D_i ,
    h = λ_{i+1} − λ_i ,

with D_i the (multistep) extrapolation of x₀ history; UniPC adds a corrector
using the model output at the *new* point.

TPU design: the whole solver runs as one ``lax.scan``; the multistep history
(previous x₀ prediction + previous h) rides in the carry with a validity flag
for the first step, so there is no Python-level warmup loop and the jit sees
a single static graph.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from videotuna_tpu.core.registry import register
from videotuna_tpu.schedulers.flow_match import shift_sigmas

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]

_EPS = 1e-6


def get_sampling_sigmas(num_steps: int, shift: float) -> jnp.ndarray:
    """Shifted descending sigma grid with terminal 0 (reference
    wan/utils/fm_solvers.py get_sampling_sigmas)."""
    sigmas = jnp.linspace(1.0, 0.0, num_steps + 1)
    return shift_sigmas(sigmas, shift) if shift != 1.0 else sigmas


def _lam(sigma):
    s = jnp.clip(sigma, _EPS, 1.0 - _EPS)
    return jnp.log((1.0 - s) / s)


@struct.dataclass
class FlowDPMSolverSchedule:
    """DPM-Solver++(2M) for flow matching."""
    sigmas: jnp.ndarray          # (S+1,) descending, last ≈ 0
    timesteps: jnp.ndarray       # (S,) = σ·num_train_timesteps
    num_train_timesteps: int = struct.field(pytree_node=False, default=1000)

    @classmethod
    def create(cls, num_steps: int, shift: float = 5.0,
               num_train_timesteps: int = 1000) -> "FlowDPMSolverSchedule":
        sigmas = get_sampling_sigmas(num_steps, shift)
        return cls(sigmas=sigmas,
                   timesteps=sigmas[:-1] * num_train_timesteps,
                   num_train_timesteps=num_train_timesteps)

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]

    def sample(self, denoise_fn: DenoiseFn, shape, key,
               x_T: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x = jax.random.normal(key, shape) if x_T is None else x_T
        sig = self.sigmas

        def body(carry, i):
            x, x0_prev, h_prev, have_prev = carry
            s_i = sig[i]
            s_n = sig[i + 1]
            t = jnp.full((shape[0],), self.timesteps[i])
            v = denoise_fn(x, t)
            x0 = x - s_i * v
            lam_i, lam_n = _lam(s_i), _lam(s_n)
            h = lam_n - lam_i
            alpha_n = 1.0 - s_n

            # second-order extrapolation when history exists
            r = h_prev / jnp.where(jnp.abs(h) < _EPS, _EPS, h)
            d1 = (x0 - x0_prev) / jnp.where(jnp.abs(r) < _EPS, _EPS, r)
            D = jnp.where(have_prev, x0 + 0.5 * d1, x0)

            ratio = s_n / jnp.maximum(s_i, _EPS)
            x_next = ratio * x - alpha_n * (jnp.exp(-h) - 1.0) * D
            # final step (σ→0): land exactly on x0 extrapolation
            x_next = jnp.where(s_n <= _EPS, x0, x_next)
            return (x_next, x0, h, jnp.array(True)), None

        init = (x, jnp.zeros_like(x), jnp.zeros(()), jnp.array(False))
        (x, _, _, _), _ = jax.lax.scan(body, init,
                                       jnp.arange(self.num_steps))
        return x


@struct.dataclass
class FlowUniPCSchedule:
    """UniPC (order 2, B(h)=h) predictor-corrector for flow matching."""
    sigmas: jnp.ndarray
    timesteps: jnp.ndarray
    num_train_timesteps: int = struct.field(pytree_node=False, default=1000)

    @classmethod
    def create(cls, num_steps: int, shift: float = 5.0,
               num_train_timesteps: int = 1000) -> "FlowUniPCSchedule":
        sigmas = get_sampling_sigmas(num_steps, shift)
        return cls(sigmas=sigmas,
                   timesteps=sigmas[:-1] * num_train_timesteps,
                   num_train_timesteps=num_train_timesteps)

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]

    def sample(self, denoise_fn: DenoiseFn, shape, key,
               x_T: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x = jax.random.normal(key, shape) if x_T is None else x_T
        sig = self.sigmas

        def model_x0_at(x, s):
            t = jnp.full((shape[0],), s * self.num_train_timesteps)
            v = denoise_fn(x, t)
            return x - s * v

        def body(carry, i):
            x, x0_prev, h_prev, have_prev = carry
            s_i, s_n = sig[i], sig[i + 1]
            lam_i, lam_n = _lam(s_i), _lam(s_n)
            h = lam_n - lam_i
            alpha_n = 1.0 - s_n
            ratio = s_n / jnp.maximum(s_i, _EPS)
            phi1 = jnp.exp(-h) - 1.0

            x0 = model_x0_at(x, s_i)
            # predictor (order 2 via history)
            r = h_prev / jnp.where(jnp.abs(h) < _EPS, _EPS, h)
            d1 = (x0 - x0_prev) / jnp.where(jnp.abs(r) < _EPS, _EPS, r)
            D = jnp.where(have_prev, x0 + 0.5 * d1, x0)
            x_pred = ratio * x - alpha_n * phi1 * D

            # corrector: evaluate at the predicted point (σ_{i+1})
            x0_new = model_x0_at(x_pred, s_n)
            D_c = 0.5 * (x0 + x0_new)
            x_corr = ratio * x - alpha_n * phi1 * jnp.where(
                have_prev, 0.5 * D + 0.5 * D_c, D_c)
            x_next = jnp.where(s_n <= _EPS, x0_new, x_corr)
            return (x_next, x0, h, jnp.array(True)), None

        init = (x, jnp.zeros_like(x), jnp.zeros(()), jnp.array(False))
        (x, _, _, _), _ = jax.lax.scan(body, init,
                                       jnp.arange(self.num_steps))
        return x


@register("videotuna_tpu.schedulers.FlowUniPCSchedule",
          aliases=["videotuna.models.wan.wan.utils.fm_solvers_unipc."
                   "FlowUniPCMultistepScheduler"])
def build_unipc(num_steps: int = 50, shift: float = 5.0,
                **_ignored) -> FlowUniPCSchedule:
    return FlowUniPCSchedule.create(num_steps, shift)


@register("videotuna_tpu.schedulers.FlowDPMSolverSchedule",
          aliases=["videotuna.models.wan.wan.utils.fm_solvers."
                   "FlowDPMSolverMultistepScheduler"])
def build_dpm(num_steps: int = 50, shift: float = 5.0,
              **_ignored) -> FlowDPMSolverSchedule:
    return FlowDPMSolverSchedule.create(num_steps, shift)
