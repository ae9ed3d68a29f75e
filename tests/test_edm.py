"""EDM / sgm sampler family tests.

Key invariant: with a PERFECT denoiser D(x,σ) = x₀ (constant), the
probability-flow ODE solution at σ=0 is exactly x₀ — every sampler in the
family must recover it (the reference's samplers share this property)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotuna_tpu.schedulers.edm import (EDMSamplerFamily, cfg_denoiser,
                                          ddpm_sigmas, karras_sigmas)

X0 = jnp.asarray(np.random.RandomState(0).normal(
    size=(1, 4, 4, 2)).astype(np.float32))


def perfect_denoise(x, sigma):
    return jnp.broadcast_to(X0, x.shape)


@pytest.fixture(scope="module")
def fam():
    return EDMSamplerFamily.create(num_steps=25)


@pytest.mark.parametrize("method,needs_key", [
    ("euler", False), ("heun", False), ("euler_ancestral", True),
    ("dpmpp2s_ancestral", True), ("dpmpp2m", False), ("lms", False)])
def test_perfect_denoiser_recovers_x0(fam, method, needs_key):
    x = X0 + 80.0 * jax.random.normal(jax.random.key(1), X0.shape)
    kw = {}
    if needs_key:
        kw["key"] = jax.random.key(2)
        kw["eta"] = 0.0          # deterministic: exact recovery expected
    out = fam.sample(perfect_denoise, x, method=method, **kw)
    tol = 0.25 if method == "lms" else 2e-2
    np.testing.assert_allclose(np.asarray(out), np.asarray(X0), atol=tol)


def test_euler_ancestral_eta0_equals_euler(fam):
    x = X0 + 80.0 * jax.random.normal(jax.random.key(3), X0.shape)

    def lin(xc, sigma):          # a non-trivial linear denoiser
        return 0.9 * xc / (1.0 + sigma)

    e = fam.sample_euler(lin, x)
    a = fam.sample_euler_ancestral(lin, x, jax.random.key(4), eta=0.0)
    np.testing.assert_allclose(np.asarray(e), np.asarray(a), atol=1e-5)


def test_sigma_schedules():
    s = karras_sigmas(20, 0.002, 80.0)
    assert s.shape == (21,) and float(s[0]) == pytest.approx(80.0)
    assert float(s[-1]) == 0.0 and bool(jnp.all(jnp.diff(s) < 0))
    d = ddpm_sigmas(20)
    assert d.shape == (21,) and float(d[-1]) == 0.0
    assert bool(jnp.all(jnp.diff(d[:-1]) < 0))


def test_cfg_denoiser_combines():
    def model(x, sigma, cond):
        return x * 0 + cond

    den = cfg_denoiser(model, 2.0, 1.0, scale=3.0)
    out = den(jnp.zeros((2, 2)), 1.0)
    np.testing.assert_allclose(np.asarray(out), 1.0 + 3.0 * (2.0 - 1.0))


def test_registry_resolves_sgm_aliases():
    from videotuna_tpu.core.registry import resolve
    fn = resolve("videotuna.models.cogvideo_sat.sgm.modules."
                 "diffusionmodules.sampling.EulerEDMSampler")
    fam = fn(num_steps=5)
    assert fam.num_steps == 5


def test_churn_runs_finite(fam):
    x = X0 + 80.0 * jax.random.normal(jax.random.key(5), X0.shape)
    out = fam.sample_euler(perfect_denoise, x, key=jax.random.key(6),
                           s_churn=1.0)
    assert np.isfinite(np.asarray(out)).all()
