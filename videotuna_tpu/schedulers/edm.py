"""EDM / k-diffusion sampler family — the SAT ``sgm`` sampler equivalents.

Capability parity with the reference's vendored sgm sampling stack
(/root/reference/videotuna/models/cogvideo_sat/sgm/modules/diffusionmodules/
sampling.py: EulerEDMSampler :254, HeunEDMSampler :261,
EulerAncestralSampler :280, DPMPP2SAncestralSampler :290, DPMPP2MSampler
:330, LinearMultistepSampler :216; CFG guiding via the sgm guiders), used
by the CogVideoX-SAT engine.

Design: everything is expressed against the EDM denoiser convention
D(x; σ) ≈ x₀ (the sgm denoiser wrapper's output). Each sampler is one
``lax.scan`` over a static sigma schedule — no Python-level step loops, no
data-dependent control flow; stochastic samplers thread explicit PRNG keys
(SURVEY §5.2). Karras-ρ and legacy-DDPM discretizations supported.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from videotuna_tpu.core.registry import register

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]  # (x, σ)→x₀


def karras_sigmas(n: int, sigma_min: float = 0.002,
                  sigma_max: float = 80.0, rho: float = 7.0) -> jnp.ndarray:
    """Karras et al. ρ-schedule, descending, with a terminal 0."""
    ramp = np.linspace(0, 1, n)
    mn, mx = sigma_min ** (1 / rho), sigma_max ** (1 / rho)
    sig = (mx + ramp * (mn - mx)) ** rho
    return jnp.asarray(np.append(sig, 0.0), jnp.float32)


def ddpm_sigmas(n: int, timesteps: int = 1000,
                linear_start: float = 0.00085,
                linear_end: float = 0.012) -> jnp.ndarray:
    """Legacy DDPM discretization (sgm LegacyDDPMDiscretization): σ =
    sqrt((1−ᾱ)/ᾱ) on n evenly spaced steps of the scaled-linear chain."""
    betas = np.linspace(linear_start ** 0.5, linear_end ** 0.5,
                        timesteps) ** 2
    abar = np.cumprod(1.0 - betas)
    idx = np.linspace(0, timesteps - 1, n).round().astype(int)
    sig = np.sqrt((1 - abar[idx]) / abar[idx])[::-1]   # descending
    return jnp.asarray(np.append(sig, 0.0), jnp.float32)


def cfg_denoiser(model_fn: Callable, cond, uncond,
                 scale: float) -> DenoiseFn:
    """sgm VanillaCFG guider: batched cond/uncond forward, combined at the
    denoised level."""
    def fn(x, sigma):
        d_c = model_fn(x, sigma, cond)
        if uncond is None or scale == 1.0:
            return d_c
        d_u = model_fn(x, sigma, uncond)
        return d_u + scale * (d_c - d_u)
    return fn


@struct.dataclass
class EDMSamplerFamily:
    """Shared sigma schedule + the six sgm sampler algorithms."""
    sigmas: jnp.ndarray                  # (N+1,) descending, last == 0

    @classmethod
    def create(cls, num_steps: int = 30, discretization: str = "karras",
               sigma_min: float = 0.002, sigma_max: float = 80.0,
               rho: float = 7.0) -> "EDMSamplerFamily":
        if discretization == "karras":
            s = karras_sigmas(num_steps, sigma_min, sigma_max, rho)
        elif discretization in ("ddpm", "legacy"):
            s = ddpm_sigmas(num_steps)
        else:
            raise ValueError(discretization)
        return cls(sigmas=s)

    @property
    def num_steps(self) -> int:
        return self.sigmas.shape[0] - 1

    # ------------------------------------------------------------- helpers
    def _scan(self, body, x, key: Optional[jax.Array], extra=None):
        n = self.num_steps
        keys = jax.random.split(key, n) if key is not None \
            else jnp.zeros((n, 2), jnp.uint32)
        carry = (x, extra) if extra is not None else x
        carry, _ = jax.lax.scan(body, carry,
                                (jnp.arange(n), keys))
        return carry

    # ------------------------------------------------------------ samplers
    def sample_euler(self, denoise: DenoiseFn, x: jnp.ndarray,
                     key: Optional[jax.Array] = None,
                     s_churn: float = 0.0, s_noise: float = 1.0
                     ) -> jnp.ndarray:
        """EulerEDMSampler (:254): 1st-order ODE step, optional churn."""
        gamma_max = min(s_churn / max(self.num_steps, 1), 2 ** 0.5 - 1)

        def body(xc, inp):
            i, k = inp
            sig, sig_n = self.sigmas[i], self.sigmas[i + 1]
            if s_churn > 0.0 and key is not None:
                sig_hat = sig * (1.0 + gamma_max)
                eps = jax.random.normal(k, xc.shape, xc.dtype) * s_noise
                xc = xc + eps * jnp.sqrt(
                    jnp.maximum(sig_hat ** 2 - sig ** 2, 0.0))
                sig = sig_hat
            d = (xc - denoise(xc, sig)) / sig
            return xc + d * (sig_n - sig), None

        return self._scan(body, x, key if s_churn > 0 else None)

    def sample_heun(self, denoise: DenoiseFn, x: jnp.ndarray,
                    key: Optional[jax.Array] = None) -> jnp.ndarray:
        """HeunEDMSampler (:261): 2nd-order correction except at σ→0."""
        def body(xc, inp):
            i, _ = inp
            sig, sig_n = self.sigmas[i], self.sigmas[i + 1]
            d = (xc - denoise(xc, sig)) / sig
            x_e = xc + d * (sig_n - sig)
            # 2nd-order correction only when sig_n > 0 (lax.cond keeps the
            # graph static)
            def corr(_):
                d2 = (x_e - denoise(x_e, sig_n)) / jnp.maximum(sig_n, 1e-12)
                return xc + 0.5 * (d + d2) * (sig_n - sig)
            return jax.lax.cond(sig_n > 0, corr, lambda _: x_e, None), None

        return self._scan(body, x, None)

    def sample_euler_ancestral(self, denoise: DenoiseFn, x: jnp.ndarray,
                               key: jax.Array, eta: float = 1.0
                               ) -> jnp.ndarray:
        """EulerAncestralSampler (:280)."""
        def body(xc, inp):
            i, k = inp
            sig, sig_n = self.sigmas[i], self.sigmas[i + 1]
            up, down = _ancestral_steps(sig, sig_n, eta)
            d = (xc - denoise(xc, sig)) / sig
            xc = xc + d * (down - sig)
            noise = jax.random.normal(k, xc.shape, xc.dtype)
            return xc + noise * up, None

        return self._scan(body, x, key)

    def sample_dpmpp2s_ancestral(self, denoise: DenoiseFn, x: jnp.ndarray,
                                 key: jax.Array, eta: float = 1.0
                                 ) -> jnp.ndarray:
        """DPMPP2SAncestralSampler (:290): 2S midpoint in log-σ space."""
        def body(xc, inp):
            i, k = inp
            sig, sig_n = self.sigmas[i], self.sigmas[i + 1]
            up, down = _ancestral_steps(sig, sig_n, eta)
            d0 = denoise(xc, sig)

            def euler(_):
                d = (xc - d0) / sig
                return xc + d * (down - sig)

            def dpm2s(_):
                t, t_n = -jnp.log(sig), -jnp.log(jnp.maximum(down, 1e-12))
                r = 0.5
                s_mid = t + r * (t_n - t)
                x_mid = (jnp.exp(-s_mid) / jnp.exp(-t)) * xc \
                    - jnp.expm1(-(s_mid - t)) * d0
                d_mid = denoise(x_mid, jnp.exp(-s_mid))
                return (jnp.exp(-t_n) / jnp.exp(-t)) * xc \
                    - jnp.expm1(-(t_n - t)) * d_mid

            xc = jax.lax.cond(down > 1e-10, dpm2s, euler, None)
            noise = jax.random.normal(k, xc.shape, xc.dtype)
            return xc + noise * up, None

        return self._scan(body, x, key)

    def sample_dpmpp2m(self, denoise: DenoiseFn,
                       x: jnp.ndarray) -> jnp.ndarray:
        """DPMPP2MSampler (:330): deterministic 2nd-order multistep with a
        carried previous denoised estimate."""
        def body(carry, inp):
            xc, d_prev, has_prev = carry
            i, _ = inp
            sig, sig_n = self.sigmas[i], self.sigmas[i + 1]
            d0 = denoise(xc, sig)
            sig_n_c = jnp.maximum(sig_n, 1e-12)
            t, t_n = -jnp.log(sig), -jnp.log(sig_n_c)
            h = t_n - t

            def first(_):
                return (sig_n_c / sig) * xc - jnp.expm1(-h) * d0

            def multi(_):
                sig_p = self.sigmas[jnp.maximum(i - 1, 0)]
                h_last = t - (-jnp.log(sig_p))
                r = h_last / h
                d_d = (1 + 1 / (2 * r)) * d0 - (1 / (2 * r)) * d_prev
                return (sig_n_c / sig) * xc - jnp.expm1(-h) * d_d

            x_new = jax.lax.cond(has_prev, multi, first, None)
            x_new = jnp.where(sig_n > 0, x_new, d0)   # final step → x₀
            return (x_new, d0, jnp.asarray(True)), None

        n = self.num_steps
        (out, _, _), _ = jax.lax.scan(
            body, (x, jnp.zeros_like(x), jnp.asarray(False)),
            (jnp.arange(n), jnp.zeros((n,), jnp.uint32)))
        return out

    def sample_lms(self, denoise: DenoiseFn, x: jnp.ndarray,
                   order: int = 4) -> jnp.ndarray:
        """LinearMultistepSampler (:216): Adams-Bashforth over d = (x−D)/σ
        with coefficients integrated offline (sigmas are static)."""
        sig_np = np.asarray(self.sigmas)
        n = self.num_steps

        def lms_coeffs(i, cur_order):
            cs = []
            for j in range(cur_order):
                def poly(tau, j=j):
                    prod = 1.0
                    for kk in range(cur_order):
                        if kk == j:
                            continue
                        prod *= (tau - sig_np[i - kk]) / \
                            (sig_np[i - j] - sig_np[i - kk])
                    return prod
                from numpy.polynomial.legendre import leggauss
                xs, ws = leggauss(8)
                a, bq = sig_np[i], sig_np[i + 1]
                tau = 0.5 * (bq - a) * xs + 0.5 * (bq + a)
                cs.append(0.5 * (bq - a) * np.sum(ws * [poly(t)
                                                        for t in tau]))
            return cs

        coeff_table = np.zeros((n, order), np.float64)
        for i in range(n):
            cur = min(i + 1, order)
            coeff_table[i, :cur] = lms_coeffs(i, cur)
        coeff_t = jnp.asarray(coeff_table, jnp.float32)

        def body(carry, inp):
            xc, ds = carry                       # ds: (order, ...) newest 0
            i, _ = inp
            sig = self.sigmas[i]
            d = (xc - denoise(xc, sig)) / sig
            ds = jnp.concatenate([d[None], ds[:-1]], axis=0)
            xc = xc + jnp.tensordot(coeff_t[i], ds, axes=1)
            return (xc, ds), None

        ds0 = jnp.zeros((order,) + x.shape, x.dtype)
        (out, _), _ = jax.lax.scan(
            body, (x, ds0), (jnp.arange(n), jnp.zeros((n,), jnp.uint32)))
        return out

    def sample(self, denoise: DenoiseFn, x: jnp.ndarray,
               key: Optional[jax.Array] = None,
               method: str = "euler", **kw) -> jnp.ndarray:
        fn = {"euler": self.sample_euler,
              "heun": self.sample_heun,
              "euler_ancestral": self.sample_euler_ancestral,
              "dpmpp2s_ancestral": self.sample_dpmpp2s_ancestral,
              "dpmpp2m": self.sample_dpmpp2m,
              "lms": self.sample_lms}[method]
        if method in ("euler_ancestral", "dpmpp2s_ancestral"):
            return fn(denoise, x, key, **kw)
        if method == "euler":
            return fn(denoise, x, key, **kw)
        return fn(denoise, x, **kw)


def _ancestral_steps(sig, sig_n, eta):
    up = jnp.minimum(
        sig_n,
        eta * jnp.sqrt(jnp.maximum(
            sig_n ** 2 * (sig ** 2 - sig_n ** 2) / jnp.maximum(
                sig ** 2, 1e-12), 0.0)))
    down = jnp.sqrt(jnp.maximum(sig_n ** 2 - up ** 2, 0.0))
    return up, down


_SGM = ("videotuna.models.cogvideo_sat.sgm.modules.diffusionmodules."
        "sampling.")


@register("videotuna_tpu.schedulers.EDMSamplerFamily",
          aliases=[_SGM + "EulerEDMSampler", _SGM + "HeunEDMSampler",
                   _SGM + "EulerAncestralSampler",
                   _SGM + "DPMPP2SAncestralSampler",
                   _SGM + "DPMPP2MSampler",
                   _SGM + "LinearMultistepSampler"])
def build_edm(**kwargs) -> EDMSamplerFamily:
    allowed = {"num_steps", "discretization", "sigma_min", "sigma_max",
               "rho"}
    return EDMSamplerFamily.create(**{k: v for k, v in kwargs.items()
                                      if k in allowed})
