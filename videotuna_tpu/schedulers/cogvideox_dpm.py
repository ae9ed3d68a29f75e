"""CogVideoX samplers: SDE-DPM-Solver++(2M) and trailing-spaced DDIM.

The reference's CogVideoX configs instantiate
``diffusers.CogVideoXDPMScheduler`` (every YAML under
/root/reference/configs/004_cogvideox/ and 005_cogvideox1.5/) and drive it
with ``old_pred_original_sample`` threading in the sampling loop
(/root/reference/videotuna/models/cogvideo_hf/cogvideo_pl.py:732-744).
That scheduler is SDE-DPM-Solver++(2M) (Lu et al., arXiv:2211.01095 §4,
data-prediction SDE variant) on the VP schedule with the CogVideoX quirks:

- scaled-linear betas with SD3-style SNR shift (s=3.0) then zero-terminal
  -SNR rescale on ᾱ (see ``DDPMSchedule.create(snr_shift_scale=...)``);
- ``timestep_spacing="trailing"`` — the grid ENDS at t=N−1 (999) instead
  of starting at t≈1, so the first model call sees the fully-noised ᾱ≈0
  regime the zero-SNR rescale creates;
- ``set_alpha_to_one=True`` — the virtual step past the grid end uses
  ᾱ=1 (λ=+∞; the IEEE inf arithmetic lands the final update exactly on
  the data prediction, like the Wan solvers in fm_solvers.py);
- first-order (DDIM-SDE) steps on the first step and on the final step
  (``prev_timestep < 0`` — the 2nd-order r=h_last/h would be 0 there).

With λ = log(√(ᾱ/(1−ᾱ))), h = λ_next − λ, σ = √(1−ᾱ):

    x⁺ = (σ⁺/σ)·e^{−h}·x + α⁺·(1−e^{−2h})·D + σ⁺·√(1−e^{−2h})·ξ
    D  = x₀                                  (first order)
    D  = (1 + 1/(2r))·x₀ − (1/(2r))·x₀_prev  (2M, r = h_last/h)

diffusers itself is NOT importable in this environment, so the trajectory
gate (tests/test_cogvideox_dpm.py) pins this scan implementation against
an independent fp64 NumPy twin of the published update equations instead
of the imported class (documented there; the per-step algebra above is
the entire step() of scheduling_dpm_cogvideox.py).

TPU design: one ``lax.scan`` over precomputed per-step (ᾱ, ᾱ_prev,
ᾱ_back) tables; the 2M history (previous x₀) rides in the carry and the
order switches are ``jnp.where`` selects, so jit sees one static graph.
One ξ draw per step (the torch step() draws once per branch, but only one
branch's output is ever used — distributionally identical).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from videotuna_tpu.core.registry import register
from videotuna_tpu.schedulers.common import make_trailing_timesteps
from videotuna_tpu.schedulers.ddim import DDIMSchedule
from videotuna_tpu.schedulers.ddpm import DDPMSchedule

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _lam(acp):
    # unclipped: ᾱ=0 → −inf, ᾱ=1 → +inf (IEEE semantics make the
    # terminal step exact, as in fm_solvers._lam)
    return jnp.log(jnp.sqrt(acp / (1.0 - acp)))


@struct.dataclass
class CogVideoXDPMSchedule:
    """Per-step buffers for a CogVideoX SDE-DPM++(2M) run.

    ``timesteps`` descend (trailing spacing); index i is sampling order.
    """
    timesteps: jnp.ndarray    # (S,) int32, DESCENDING
    alphas: jnp.ndarray       # (S,) ᾱ[t_i]
    alphas_prev: jnp.ndarray  # (S,) ᾱ[t_i − N/S] (1.0 past the end)
    is_final: jnp.ndarray     # (S,) bool, prev_timestep < 0
    base: DDPMSchedule
    second_order: bool = struct.field(pytree_node=False, default=True)

    @classmethod
    def create(cls, base: DDPMSchedule, num_steps: int,
               second_order: bool = True) -> "CogVideoXDPMSchedule":
        n_train = int(base.alphas_cumprod.shape[0])
        ts = make_trailing_timesteps(num_steps, n_train)   # descending
        prev_ts = ts - n_train // num_steps
        acp = np.asarray(jax.device_get(base.alphas_cumprod), np.float64)
        alphas = acp[ts]
        # set_alpha_to_one=True (published CogVideoX scheduler config):
        # the step past the grid end targets ᾱ=1
        alphas_prev = np.where(prev_ts >= 0, acp[np.maximum(prev_ts, 0)],
                               1.0)
        return cls(timesteps=jnp.asarray(ts, jnp.int32),
                   alphas=jnp.asarray(alphas, jnp.float32),
                   alphas_prev=jnp.asarray(alphas_prev, jnp.float32),
                   is_final=jnp.asarray(prev_ts < 0),
                   base=base, second_order=second_order)

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])

    # ------------------------------------------------------------------ step
    def step(self, denoise_fn: DenoiseFn, x: jnp.ndarray,
             old_x0: jnp.ndarray, i: jnp.ndarray, noise: jnp.ndarray,
             force_first=None):
        """One SDE-DPM++(2M) update at sampling index ``i`` with explicit
        ξ; returns (x_next, x0) — the caller threads x0 as old_x0.

        ``force_first`` (bool array, optional) additionally demotes the
        update to first order — used by partial walks (v2v enhance) whose
        entry index has no valid 2M history."""
        b = x.shape[0]
        t = jnp.full((b,), self.timesteps[i], jnp.int32)
        model_out = denoise_fn(x, t)
        x0, _ = self.base.to_x0_and_eps(x, t, model_out)
        x0 = x0.astype(jnp.float32)   # 2M history carried in f32

        a_t = self.alphas[i]
        a_prev = self.alphas_prev[i]
        lam = _lam(a_t)
        lam_next = _lam(a_prev)
        h = lam_next - lam
        # back step (the PREVIOUS, larger timestep) for r = h_last/h
        a_back = self.alphas[jnp.maximum(i - 1, 0)]
        r = (lam - _lam(a_back)) / h

        mult1 = jnp.sqrt((1.0 - a_prev) / (1.0 - a_t)) * jnp.exp(-h)
        mult2 = jnp.expm1(-2.0 * h) * jnp.sqrt(a_prev)
        mult_noise = jnp.sqrt(1.0 - a_prev) * jnp.sqrt(-jnp.expm1(-2.0 * h))

        first = jnp.logical_or(i == 0, self.is_final[i])
        if force_first is not None:
            first = jnp.logical_or(first, force_first)
        if not self.second_order:
            first = jnp.full_like(first, True)
        # 2M: D = (1 + 1/(2r))·x0 − (1/(2r))·old_x0. r is 0 at i=0
        # (λ_back=λ) and 0/NaN on the final step (h=∞) — exactly the
        # first-order steps — so sanitize BEFORE the reciprocal: a bare
        # where() would still propagate inf·0=NaN through BOTH branches
        # when differentiating through sample() (reward finetuning).
        r_safe = jnp.where(first, 1.0, r)
        c2 = 1.0 / (2.0 * r_safe)
        d = jnp.where(first, x0, (1.0 + c2) * x0 - c2 * old_x0)
        x_next = (mult1 * x - mult2 * d
                  + mult_noise * noise.astype(jnp.float32)).astype(x.dtype)
        return x_next, x0

    # ---------------------------------------------------------------- sample
    def sample(self, denoise_fn: DenoiseFn, shape, key,
               x_T: Optional[jnp.ndarray] = None,
               noises: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Full loop as one scan (reference sampling loop
        cogvideo_pl.py:725-744 threads old_pred_original_sample exactly
        like the carry here). ``noises`` (S, *shape) overrides the
        per-step ξ draws — used by the fp64 trajectory-parity gate."""
        if x_T is None:
            key, init_key = jax.random.split(key)
            x = jax.random.normal(init_key, shape)
        else:
            x = x_T
        n = self.num_steps
        keys = jax.random.split(key, n)

        def body(carry, inp):
            xc, old_x0 = carry
            if noises is None:
                i, k = inp
                xi = jax.random.normal(k, xc.shape, jnp.float32)
            else:
                i, xi = inp
            x_next, x0 = self.step(denoise_fn, xc, old_x0, i, xi)
            return (x_next, x0), None

        idxs = jnp.arange(n)
        xs = (idxs, keys) if noises is None else (idxs, noises)
        old0 = jnp.zeros(x.shape, jnp.float32)
        (out, _), _ = jax.lax.scan(body, (x, old0), xs)
        return out


def build_cogvideox_ddim(base: Optional[DDPMSchedule] = None,
                         num_steps: int = 50,
                         **base_kwargs) -> DDIMSchedule:
    """Trailing-spaced, eta=0 DDIM — ``diffusers.CogVideoXDDIMScheduler``.

    Its published step() uses the a_t/b_t form
        x⁺ = a_t·x + b_t·x₀,  a_t = √((1−ᾱ⁺)/(1−ᾱ)),  b_t = √ᾱ⁺ − √ᾱ·a_t
    which is algebraically identical to the η=0 DDIM update
    (√ᾱ⁺·x₀ + √(1−ᾱ⁺)·ε — substitute ε=(x−√ᾱ·x₀)/√(1−ᾱ); equivalence
    pinned in fp64 by tests/test_cogvideox_dpm.py), so this reuses
    DDIMSchedule with the CogVideoX grid: trailing spacing +
    set_alpha_to_one.
    """
    if base is None:
        base = DDPMSchedule.create(**base_kwargs)
    n_train = int(base.alphas_cumprod.shape[0])
    ts_desc = make_trailing_timesteps(num_steps, n_train)
    ts = ts_desc[::-1].copy()          # DDIMSchedule stores ascending
    prev_ts = ts - n_train // num_steps
    acp = np.asarray(jax.device_get(base.alphas_cumprod), np.float64)
    alphas = acp[ts]
    alphas_prev = np.where(prev_ts >= 0, acp[np.maximum(prev_ts, 0)], 1.0)
    return DDIMSchedule(timesteps=jnp.asarray(ts, jnp.int32),
                        alphas=jnp.asarray(alphas, jnp.float32),
                        alphas_prev=jnp.asarray(alphas_prev, jnp.float32),
                        sigmas=jnp.zeros((num_steps,), jnp.float32),
                        base=base)


@register("videotuna_tpu.schedulers.CogVideoXDPMSchedule",
          aliases=["diffusers.CogVideoXDPMScheduler"])
def build_cogvideox_dpm(base: Optional[DDPMSchedule] = None,
                        num_steps: int = 50, second_order: bool = True,
                        **base_kwargs) -> CogVideoXDPMSchedule:
    if base is None:
        base_kwargs.setdefault("timesteps", 1000)
        base_kwargs.setdefault("beta_schedule", "scaled_linear")
        base_kwargs.setdefault("linear_start", 0.00085)
        base_kwargs.setdefault("linear_end", 0.012)
        base_kwargs.setdefault("parameterization", "v")
        base_kwargs.setdefault("rescale_betas_zero_snr", True)
        base_kwargs.setdefault("snr_shift_scale", 3.0)
        base = DDPMSchedule.create(**base_kwargs)
    return CogVideoXDPMSchedule.create(base, num_steps, second_order)


register("videotuna_tpu.schedulers.build_cogvideox_ddim",
         aliases=["diffusers.CogVideoXDDIMScheduler"])(build_cogvideox_ddim)
