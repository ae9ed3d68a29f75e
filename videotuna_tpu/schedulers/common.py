"""Diffusion math shared by all schedulers.

Covers the reference's utils/diffusion_utils.py (beta schedules,
zero-terminal-SNR rescale, DDIM timestep/param construction, CFG rescale) as
pure jnp functions so the whole sampler loop can live under one jit.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def make_beta_schedule(schedule: str,
                       n_timestep: int,
                       linear_start: float = 1e-4,
                       linear_end: float = 2e-2,
                       cosine_s: float = 8e-3) -> jnp.ndarray:
    """Beta schedules (reference utils/diffusion_utils.py make_beta_schedule).

    ``linear`` is the LDM convention: linear in sqrt(beta) space.
    """
    if schedule == "linear":
        betas = np.linspace(linear_start ** 0.5, linear_end ** 0.5,
                            n_timestep, dtype=np.float64) ** 2
    elif schedule == "scaled_linear":
        betas = np.linspace(linear_start ** 0.5, linear_end ** 0.5,
                            n_timestep, dtype=np.float64) ** 2
    elif schedule == "simple_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep,
                            dtype=np.float64)
    elif schedule == "cosine":
        timesteps = (np.arange(n_timestep + 1, dtype=np.float64) / n_timestep
                     + cosine_s)
        alphas = timesteps / (1 + cosine_s) * np.pi / 2
        alphas = np.cos(alphas) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep,
                            dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep,
                            dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"Unknown beta schedule {schedule!r}")
    return jnp.asarray(betas, dtype=jnp.float32)


def rescale_zero_terminal_snr(betas: jnp.ndarray) -> jnp.ndarray:
    """Zero-terminal-SNR rescale (arXiv:2305.08891; reference
    diffusion_utils.rescale_zero_terminal_snr)."""
    alphas = 1.0 - betas
    alphas_cumprod = jnp.cumprod(alphas, axis=0)
    alphas_bar_sqrt = jnp.sqrt(alphas_cumprod)

    a0 = alphas_bar_sqrt[0]
    aT = alphas_bar_sqrt[-1]
    alphas_bar_sqrt = alphas_bar_sqrt - aT
    alphas_bar_sqrt = alphas_bar_sqrt * a0 / (a0 - aT)

    alphas_bar = alphas_bar_sqrt ** 2
    alphas = alphas_bar[1:] / alphas_bar[:-1]
    alphas = jnp.concatenate([alphas_bar[:1], alphas])
    return 1.0 - alphas


def snr_shift_alphas_cumprod(alphas_cumprod: jnp.ndarray,
                             snr_shift_scale: float) -> jnp.ndarray:
    """SD3-style SNR shift used by the CogVideoX schedulers
    (diffusers ``scheduling_ddim_cogvideox.py`` ``__init__``; the
    reference instantiates those schedulers from the published
    CogVideoX config with ``snr_shift_scale=3.0``,
    /root/reference/configs/004_cogvideox/cogvideo5b.yaml:38-42):
    ᾱ ← ᾱ / (s + (1 − s)·ᾱ), which divides every SNR = ᾱ/(1−ᾱ) by s."""
    return alphas_cumprod / (snr_shift_scale
                             + (1.0 - snr_shift_scale) * alphas_cumprod)


def rescale_zero_terminal_snr_alphas(alphas_cumprod: jnp.ndarray
                                     ) -> jnp.ndarray:
    """Zero-terminal-SNR rescale operating directly on ᾱ (the diffusers
    CogVideoX convention — applied AFTER the SNR shift, unlike the
    betas-space variant above). Same linear map of √ᾱ."""
    alphas_bar_sqrt = jnp.sqrt(alphas_cumprod)
    a0 = alphas_bar_sqrt[0]
    aT = alphas_bar_sqrt[-1]
    alphas_bar_sqrt = (alphas_bar_sqrt - aT) * a0 / (a0 - aT)
    return alphas_bar_sqrt ** 2


def make_trailing_timesteps(num_steps: int,
                            num_train_timesteps: int) -> np.ndarray:
    """``timestep_spacing="trailing"`` (diffusers set_timesteps; the
    CogVideoX schedulers' published config): descending grid ending at
    the schedule tail — round(arange(N, 0, −N/S)) − 1."""
    step_ratio = num_train_timesteps / num_steps
    ts = np.round(np.arange(num_train_timesteps, 0, -step_ratio))
    return ts.astype(np.int64) - 1


def make_ddim_timesteps(num_ddim_timesteps: int,
                        num_ddpm_timesteps: int,
                        method: str = "uniform") -> np.ndarray:
    """DDIM timestep subset (reference diffusion_utils.make_ddim_timesteps).
    Returns ascending int timesteps of length ``num_ddim_timesteps``."""
    if method == "uniform":
        c = num_ddpm_timesteps // num_ddim_timesteps
        steps = np.asarray(list(range(0, num_ddpm_timesteps, c)))
    elif method == "quad":
        steps = (np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8),
                             num_ddim_timesteps) ** 2).astype(int)
    else:
        raise ValueError(f"Unknown ddim discretization {method!r}")
    # +1 to get alpha values of "previous" step boundaries, as in the reference
    return steps + 1


def make_ddim_sampling_parameters(alphacums: jnp.ndarray,
                                  ddim_timesteps: np.ndarray,
                                  eta: float
                                  ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                             jnp.ndarray]:
    """alphas, alphas_prev, sigmas for the DDIM subset."""
    alphas = alphacums[ddim_timesteps]
    alphas_prev = jnp.concatenate(
        [alphacums[:1], alphacums[ddim_timesteps[:-1]]])
    sigmas = eta * jnp.sqrt((1 - alphas_prev) / (1 - alphas)
                            * (1 - alphas / alphas_prev))
    return alphas, alphas_prev, sigmas


def rescale_noise_cfg(noise_cfg: jnp.ndarray,
                      noise_pred_text: jnp.ndarray,
                      guidance_rescale: float = 0.0) -> jnp.ndarray:
    """CFG rescale (arXiv:2305.08891 §3.4; reference
    diffusion_utils.rescale_noise_cfg). torch.std is Bessel-corrected
    (ddof=1) — matched here, trajectory-gated by
    tests/test_ddim_parity.py."""
    axes = tuple(range(1, noise_pred_text.ndim))
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True, ddof=1)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True, ddof=1)
    rescaled = noise_cfg * (std_text / (std_cfg + 1e-8))
    return (guidance_rescale * rescaled
            + (1 - guidance_rescale) * noise_cfg)


def extract_into(a: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """a[t] broadcast to an ``ndim``-dim tensor (reference extract_into_tensor).
    ``t`` has shape (batch,)."""
    out = a[t].astype(jnp.float32)
    return out.reshape(out.shape[0], *([1] * (ndim - 1)))
