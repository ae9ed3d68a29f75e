"""Flow-matching multistep solvers: DPM-Solver++(2M) and UniPC.

Trajectory-faithful ports of the reference's Wan solvers
(/root/reference/videotuna/models/wan/wan/utils/fm_solvers.py —
``FlowDPMSolverMultistepScheduler``, fm_solvers_unipc.py —
``FlowUniPCMultistepScheduler`` at their default configs:
solver_order=2, predict_x0, solver_type bh2 (UniPC) / midpoint (DPM++),
lower_order_final=True, final_sigmas_type="zero"), gated step-by-step
against the imported reference in tests/test_fm_solver_parity.py.

For the flow-matching path x_σ = (1−σ)·x₀ + σ·ε the model predicts
v = ε − x₀, so the data prediction is x₀ = x_σ − σ·v. In diffusion notation
α_σ = 1−σ, λ = log(α/σ), h = λ_next − λ_cur, and (with hh = −h)

    DPM++(2M) midpoint:  x⁺ = (σ⁺/σ)·x − α⁺·(e^{−h}−1)·(m + ½·D1) ,
    UniPC-2 (bh2):       predictor adds −α⁺·B(h)·½·D1 with B(h)=e^{hh}−1,
                         and a CORRECTOR that re-updates the PREVIOUS
                         sample with the current model output — one model
                         call per step (unlike a Heun-style 2-NFE step).

Both replicate the reference's order schedule exactly: order 1 on the
first step (multistep warmup), order decay near the end
(``lower_order_final``), and a pure first-order final step onto σ=0
(which lands exactly on the data prediction). λ is computed UNCLIPPED —
σ=1 → λ=−∞ and σ=0 → λ=+∞ flow through the same IEEE arithmetic as the
torch reference (e^{−∞}=0 etc.), which is what makes trajectories match
to float rounding instead of ~1e-3.

TPU design: the whole solver runs as one ``lax.scan``; the multistep
history (previous model outputs + the pre-predictor sample) rides in the
carry, and the per-step order switches are ``jnp.where`` selects over
precomputed per-step coefficient tables — the jit sees a single static
graph, no Python warmup loop.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from videotuna_tpu.core.registry import register
from videotuna_tpu.schedulers.flow_match import shift_sigmas

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def get_sampling_sigmas(num_steps: int, shift: float) -> jnp.ndarray:
    """Shifted descending sigma grid with terminal 0 — the DPM++ grid
    (reference wan/utils/fm_solvers.py:22 get_sampling_sigmas feeds
    linspace(1, 0, N+1)[:N] shifted, then set_timesteps appends 0;
    shift fixes 0 and 1 so this equals shifting the full linspace)."""
    sigmas = jnp.linspace(1.0, 0.0, num_steps + 1)
    return shift_sigmas(sigmas, shift) if shift != 1.0 else sigmas


def unipc_sigmas(num_steps: int, shift: float,
                 num_train_timesteps: int = 1000) -> jnp.ndarray:
    """The UniPC grid differs from DPM++'s: set_timesteps starts from
    sigma_max = 1 − 1/num_train_timesteps (fm_solvers_unipc.py:108-118,
    183-185), i.e. linspace(0.999, 0, N+1)[:N] shifted, then appends 0."""
    sig_max = 1.0 - 1.0 / num_train_timesteps
    sigmas = np.linspace(sig_max, 0.0, num_steps + 1)[:-1]
    sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
    return jnp.asarray(np.concatenate([sigmas, [0.0]]), jnp.float32)


def _lam(sigma):
    # UNCLIPPED: λ(1)=−inf, λ(0)=+inf, matching the reference's
    # torch.log(alpha)−torch.log(sigma) IEEE behavior exactly
    return jnp.log1p(-sigma) - jnp.log(sigma)


def _order_schedule(num_steps: int) -> np.ndarray:
    """Per-step predictor order for solver_order=2 with warmup +
    lower_order_final (reference step(): this_order = min(2, N−i,
    lower_order_nums+1))."""
    return np.array([min(2, num_steps - i, i + 1)
                     for i in range(num_steps)], np.int32)


@struct.dataclass
class FlowDPMSolverSchedule:
    """DPM-Solver++(2M), midpoint, flow prediction — reference
    fm_solvers.py:706-789 step() semantics (one model call per step)."""
    sigmas: jnp.ndarray          # (S+1,) descending, last = 0
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
        n = self.num_steps
        lam = _lam(sig)
        # first-order steps: warmup (i=0) and the final step onto σ=0
        # (lower_order_final with final_sigmas_type="zero"); for short
        # schedules (<15) the reference also drops the second-to-last
        # step to the safer order (a no-op at solver_order=2)
        first_order = np.zeros(n, bool)
        first_order[0] = True
        first_order[-1] = True
        first_order_t = jnp.asarray(first_order)

        def body(carry, i):
            x, m_prev = carry
            s_i, s_n = sig[i], sig[i + 1]
            t = jnp.full((shape[0],), self.timesteps[i])
            v = denoise_fn(x, t)
            m = x - s_i * v                      # x₀ prediction
            h = lam[i + 1] - lam[i]
            alpha_n = 1.0 - s_n
            ratio = s_n / jnp.where(s_i == 0, 1.0, s_i)
            phi1 = jnp.expm1(-h)                 # e^{−h} − 1
            x1 = ratio * x - alpha_n * phi1 * m  # first order
            # second order (midpoint): D1 = (m − m_prev)/r0, r0 = h0/h
            h0 = lam[i] - lam[i - 1]             # i≥1 whenever used
            r0 = h0 / h
            d1 = (m - m_prev) / r0
            x2 = x1 - 0.5 * alpha_n * phi1 * d1
            x_next = jnp.where(first_order_t[i], x1, x2)
            return (x_next, m), None

        (x, _), _ = jax.lax.scan(body, (x, jnp.zeros_like(x)),
                                 jnp.arange(n))
        return x


@struct.dataclass
class FlowUniPCSchedule:
    """UniPC (solver_order 2, bh2, predict_x0) predictor-corrector for
    flow matching — reference fm_solvers_unipc.py:655-741 step()
    semantics: ONE model call per step; the corrector re-derives the
    current sample from the PREVIOUS one using the fresh model output."""
    sigmas: jnp.ndarray
    timesteps: jnp.ndarray
    num_train_timesteps: int = struct.field(pytree_node=False, default=1000)

    @classmethod
    def create(cls, num_steps: int, shift: float = 5.0,
               num_train_timesteps: int = 1000) -> "FlowUniPCSchedule":
        sigmas = unipc_sigmas(num_steps, shift, num_train_timesteps)
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
        n = self.num_steps
        lam = _lam(sig)
        order = _order_schedule(n)               # predictor order per step
        # corrector at step i uses the PREVIOUS step's order
        # (self.this_order is set by step i−1's predictor)
        c_order = np.concatenate([[1], order[:-1]])
        order_t = jnp.asarray(order)
        c_order_t = jnp.asarray(c_order)

        def bh2_b(hh):
            """b coefficients of the bh2 family at solver degree 2:
            b1 = (φ₁/hh − 1)/B, b2 = 2·((φ₁/hh − 1)/hh − ½)/B with
            φ₁ = e^{hh} − 1 and B(h) = e^{hh} − 1 (bh2)."""
            phi1 = jnp.expm1(hh)
            b_h = phi1
            k1 = phi1 / hh - 1.0
            b1 = k1 / b_h
            b2 = 2.0 * (k1 / hh - 0.5) / b_h
            return phi1, b_h, b1, b2

        def body(carry, i):
            x, x_last, m_prev, m_prev2 = carry
            s_i, s_n = sig[i], sig[i + 1]
            t = jnp.full((shape[0],), self.timesteps[i])
            v = denoise_fn(x, t)
            m = x - s_i * v                      # convert_model_output

            # ---- corrector (UniC) on the CURRENT sample, from x_last,
            # using the fresh m (i≥1; order = previous predictor order)
            hc = lam[i] - lam[i - 1]
            hhc = -hc
            phi1c, bhc, b1c, b2c = bh2_b(hhc)
            alpha_i = 1.0 - s_i
            ratio_c = s_i / jnp.where(sig[i - 1] == 0, 1.0, sig[i - 1])
            xc_base = ratio_c * x_last - alpha_i * phi1c * m_prev
            d1_t = m - m_prev
            # order 1: rhos_c = [0.5]
            xc1 = xc_base - alpha_i * bhc * 0.5 * d1_t
            # order 2: rks = [r0, 1], R = [[1,1],[r0,1]], b = [b1,b2]
            # → rho0 = (b1 − b2)/(1 − r0), rho1 = b1 − rho0
            r0c = (lam[i - 2] - lam[i - 1]) / hc
            d1s = (m_prev2 - m_prev) / r0c
            rho0 = (b1c - b2c) / (1.0 - r0c)
            rho1 = b1c - rho0
            xc2 = xc_base - alpha_i * bhc * (rho0 * d1s + rho1 * d1_t)
            x_corr = jnp.where(i == 0, x,
                               jnp.where(c_order_t[i] == 1, xc1, xc2))

            # ---- predictor (UniP) from the corrected sample
            h = lam[i + 1] - lam[i]
            hh = -h
            phi1, bh, _, _ = bh2_b(hh)
            alpha_n = 1.0 - s_n
            ratio = s_n / jnp.where(s_i == 0, 1.0, s_i)
            xp_base = ratio * x_corr - alpha_n * phi1 * m
            xp1 = xp_base
            # order 2: rhos_p = [0.5] (reference's simplified order-2)
            r0p = (lam[i - 1] - lam[i]) / h
            d1p = (m_prev - m) / r0p
            xp2 = xp_base - alpha_n * bh * 0.5 * d1p
            x_next = jnp.where(order_t[i] == 1, xp1, xp2)
            return (x_next, x_corr, m, m_prev), None

        init = (x, jnp.zeros_like(x), jnp.zeros_like(x), jnp.zeros_like(x))
        (x, _, _, _), _ = jax.lax.scan(body, init, jnp.arange(n))
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
