"""IDDPM / spaced diffusion with learned variance — Open-Sora's sampler.

Capability parity with the reference ``IDDPMScheduler``/``SpacedDiffusion``
(/root/reference/videotuna/models/opensora/models/iddpm3d.py:185,869;
``space_timesteps`` :816): timestep respacing of a trained 1000-step chain,
model outputs 2·C channels — (mean-prediction eps, variance interpolation v)
— with the posterior variance interpolated between β_t and β̃_t in log space,
and the hybrid vb loss's sampling-side machinery (the training loss uses the
simple eps-MSE + vb term).

TPU design: respaced buffers precomputed once; the ancestral loop is a
``lax.scan``.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from videotuna_tpu.core.registry import register
from videotuna_tpu.schedulers.common import extract_into
from videotuna_tpu.schedulers.ddpm import DDPMSchedule

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def space_timesteps(num_timesteps: int,
                    section_counts: Union[str, Sequence[int]]) -> List[int]:
    """Respacing (reference iddpm3d.py:816): e.g. "100" → 100 evenly spaced
    steps; "ddim50" → DDIM-style stride; [10,10,10] → per-section counts."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired:
                    return list(range(0, num_timesteps, i))
            raise ValueError(f"cannot create exactly {desired} ddim steps")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps: List[int] = []
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f"cannot divide section of {size} into {count}")
        stride = 1 if count <= 1 else (size - 1) / (count - 1)
        cur = 0.0
        taken = []
        for _ in range(count):
            taken.append(start_idx + round(cur))
            cur += stride
        all_steps += taken
        start_idx += size
    return sorted(set(all_steps))


def p_mean_variance(sched: DDPMSchedule, model_out: jnp.ndarray,
                    x: jnp.ndarray, t: jnp.ndarray):
    """Split eps/variance channels of a 2·C model output; interpolate the
    log-variance between β̃ (posterior) and β (reference LEARNED_RANGE,
    iddpm3d.py:LEARNED_RANGE branch)."""
    c = x.shape[-1]
    eps, var_v = jnp.split(model_out, [c], axis=-1)
    nd = x.ndim
    min_log = extract_into(sched.posterior_log_variance_clipped, t, nd)
    max_log = jnp.log(extract_into(sched.betas, t, nd))
    frac = (var_v + 1.0) / 2.0
    log_var = frac * max_log + (1.0 - frac) * min_log

    x0 = sched.predict_start_from_noise(x, t, eps)
    x0 = jnp.clip(x0, -1.0, 1.0)
    mean, _, _ = sched.q_posterior(x0, x, t)
    return mean, log_var


def vb_loss_term(sched: DDPMSchedule, model_out, x_start, x_t, t):
    """KL(q(x_{t-1}|x_t,x_0) ‖ p(x_{t-1}|x_t)) in bits, per sample — the vb
    term of IDDPM's hybrid loss with the mean frozen (stop-gradient on eps)
    so only the learned variance trains through it (iddpm3d.py:1366-1379)."""
    c = x_start.shape[-1]
    eps, _ = jnp.split(model_out, [c], axis=-1)
    mean, log_var = p_mean_variance(
        sched, jnp.concatenate([jax.lax.stop_gradient(eps),
                                model_out[..., c:]], axis=-1), x_t, t)
    true_mean, _, true_log_var = sched.q_posterior(x_start, x_t, t)
    kl = 0.5 * (-1.0 + log_var - true_log_var
                + jnp.exp(true_log_var - log_var)
                + (true_mean - mean) ** 2 * jnp.exp(-log_var))
    axes = tuple(range(1, x_start.ndim))
    return jnp.mean(kl, axis=axes) / np.log(2.0)


@struct.dataclass
class SpacedSchedule:
    """Respaced DDPM with learned-variance sampling."""
    base: DDPMSchedule                    # rebuilt over the spaced betas
    timestep_map: jnp.ndarray             # (S,) spaced → original t
    full: DDPMSchedule = None             # the unrespaced training chain

    @classmethod
    def create(cls, timesteps: int = 1000,
               section_counts: Union[str, Sequence[int]] = "100",
               beta_schedule: str = "linear",
               linear_start: float = 1e-4, linear_end: float = 2e-2,
               parameterization: str = "eps") -> "SpacedSchedule":
        full = DDPMSchedule.create(timesteps, beta_schedule, linear_start,
                                   linear_end,
                                   parameterization=parameterization)
        use = space_timesteps(timesteps, section_counts)
        last_alpha = 1.0
        new_betas = []
        for i, ac in enumerate(np.asarray(full.alphas_cumprod)):
            if i in set(use):
                new_betas.append(1.0 - ac / last_alpha)
                last_alpha = ac
        spaced = DDPMSchedule.create(
            given_betas=jnp.asarray(new_betas, jnp.float32),
            timesteps=len(new_betas), parameterization=parameterization)
        return cls(base=spaced,
                   timestep_map=jnp.asarray(sorted(use), jnp.int32),
                   full=full)

    @property
    def num_steps(self) -> int:
        return self.timestep_map.shape[0]

    def p_mean_variance(self, model_out: jnp.ndarray, x: jnp.ndarray,
                        t: jnp.ndarray):
        return p_mean_variance(self.base, model_out, x, t)

    def sample(self, denoise_fn: DenoiseFn, shape, key,
               x_T: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Ancestral loop over the spaced chain. ``denoise_fn`` receives the
        ORIGINAL timestep values (via timestep_map) and must return 2·C
        channels."""
        if x_T is None:
            key, k0 = jax.random.split(key)
            x = jax.random.normal(k0, shape)
        else:
            x = x_T
        n = self.num_steps
        keys = jax.random.split(key, n)
        idxs = jnp.arange(n - 1, -1, -1)

        def body(xc, inp):
            i, k = inp
            t = jnp.full((shape[0],), i, jnp.int32)
            t_orig = jnp.full((shape[0],), self.timestep_map[i], jnp.int32)
            out = denoise_fn(xc, t_orig)
            mean, log_var = self.p_mean_variance(out, xc, t)
            noise = jax.random.normal(k, xc.shape, xc.dtype)
            nonzero = (t > 0).astype(xc.dtype).reshape(
                -1, *([1] * (xc.ndim - 1)))
            return mean + nonzero * jnp.exp(0.5 * log_var) * noise, None

        out, _ = jax.lax.scan(body, x, (idxs, keys))
        return out

    def vb_loss_term(self, model_out, x_start, x_t, t, key=None):
        """Hybrid-loss vb term against the respaced chain."""
        return vb_loss_term(self.base, model_out, x_start, x_t, t)


@register("videotuna_tpu.schedulers.SpacedSchedule",
          aliases=["videotuna.models.opensora.models.iddpm3d.IDDPMScheduler",
                   "videotuna.models.opensora.models.iddpm3d.SpacedDiffusion"])
def build_spaced(**kwargs) -> SpacedSchedule:
    allowed = {"timesteps", "section_counts", "beta_schedule",
               "linear_start", "linear_end", "parameterization"}
    return SpacedSchedule.create(**{k: v for k, v in kwargs.items()
                                    if k in allowed})
