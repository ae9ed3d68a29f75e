"""Numerical golden tests for schedulers — the coverage the reference lacks
(SURVEY.md §4: 'No unit tests for models, schedulers, flows')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotuna_tpu.schedulers import (DDIMSchedule, DDPMSchedule,
                                      FlowMatchSchedule, cfg_denoise,
                                      flow_interpolate, flow_target,
                                      make_beta_schedule, sample_sigmas,
                                      shift_sigmas)


class TestBetaSchedules:
    def test_linear_endpoints(self):
        betas = make_beta_schedule("linear", 1000, 1e-4, 2e-2)
        assert betas.shape == (1000,)
        np.testing.assert_allclose(betas[0], 1e-4, rtol=1e-5)
        np.testing.assert_allclose(betas[-1], 2e-2, rtol=1e-5)
        assert bool(jnp.all(betas[1:] >= betas[:-1]))

    def test_cosine_bounded(self):
        betas = make_beta_schedule("cosine", 1000)
        assert bool(jnp.all(betas > 0)) and bool(jnp.all(betas <= 0.999))


class TestDDPM:
    def setup_method(self):
        self.s = DDPMSchedule.create(timesteps=1000)

    def test_alphas_monotone(self):
        ac = self.s.alphas_cumprod
        assert bool(jnp.all(ac[1:] <= ac[:-1]))
        assert float(ac[0]) > 0.99

    def test_q_sample_t0_near_identity(self):
        x = jnp.ones((2, 3, 4, 4, 1))
        noise = jnp.zeros_like(x)
        t = jnp.zeros((2,), jnp.int32)
        out = self.s.q_sample(x, t, noise)
        np.testing.assert_allclose(out, x * float(
            self.s.sqrt_alphas_cumprod[0]), rtol=1e-5)

    def test_parameterization_roundtrip(self):
        """x0/eps/v conversions must be mutually consistent."""
        key = jax.random.key(1)
        x0 = jax.random.normal(key, (2, 8))
        noise = jax.random.normal(jax.random.key(2), (2, 8))
        t = jnp.array([100, 700])
        x_t = self.s.q_sample(x0, t, noise)
        # eps param
        x0_hat = self.s.predict_start_from_noise(x_t, t, noise)
        np.testing.assert_allclose(x0_hat, x0, atol=1e-4)
        # v param
        v = self.s.get_v(x0, noise, t)
        x0_hat2 = self.s.predict_start_from_z_and_v(x_t, t, v)
        eps_hat = self.s.predict_eps_from_z_and_v(x_t, t, v)
        np.testing.assert_allclose(x0_hat2, x0, atol=1e-4)
        np.testing.assert_allclose(eps_hat, noise, atol=1e-4)

    def test_training_target(self):
        x0 = jnp.ones((2, 4))
        noise = jnp.full((2, 4), 2.0)
        t = jnp.array([10, 20])
        assert jnp.allclose(self.s.training_target(x0, noise, t), noise)
        sv = DDPMSchedule.create(parameterization="v")
        np.testing.assert_allclose(sv.training_target(x0, noise, t),
                                   sv.get_v(x0, noise, t))


class TestDDIM:
    def test_perfect_model_recovers_x0(self):
        """With the exact eps oracle, eta=0 DDIM recovers x0 closely."""
        base = DDPMSchedule.create(timesteps=1000)
        sched = DDIMSchedule.create(base, num_steps=50, eta=0.0)
        x0_true = jnp.full((1, 8), 0.5)

        def oracle(x, t):
            a = base.alphas_cumprod[t].reshape(-1, 1)
            return (x - jnp.sqrt(a) * x0_true) / jnp.sqrt(1 - a)

        out = sched.sample(oracle, (1, 8), jax.random.key(0))
        # the final DDIM step lands at t=1, keeping sqrt(1-acum[0])≈1% noise
        np.testing.assert_allclose(out, x0_true, atol=5e-2)

    def test_schedule_shapes(self):
        base = DDPMSchedule.create(timesteps=1000)
        sched = DDIMSchedule.create(base, num_steps=25, eta=0.0)
        assert sched.num_steps == 25
        assert bool(jnp.all(sched.sigmas == 0.0))
        assert bool(jnp.all(sched.alphas_prev >= sched.alphas))

    def test_cfg_wrapper_batches_once(self):
        calls = []

        def model(x, t, c):
            calls.append(x.shape[0])
            return x * 0 + c["y"].mean(axis=(1, 2))[:, None]

        fn = cfg_denoise(model, {"y": jnp.ones((2, 4, 8))},
                         {"y": jnp.zeros((2, 4, 8))}, scale=3.0)
        out = fn(jnp.zeros((2, 8)), jnp.zeros((2,), jnp.int32))
        assert calls == [4]  # one doubled call
        # e_u=0, e_c=1 → 0 + 3*(1-0) = 3
        np.testing.assert_allclose(out, 3.0, atol=1e-6)


class TestFlowMatch:
    def test_shift_identity(self):
        s = jnp.linspace(0, 1, 11)
        np.testing.assert_allclose(shift_sigmas(s, 1.0), s, atol=1e-7)

    def test_exact_linear_path(self):
        """Constant-velocity oracle → Euler recovers x0 exactly."""
        sched = FlowMatchSchedule.create(num_steps=10, shift=3.0)
        x0_true = jnp.full((2, 16), -0.3)
        key = jax.random.key(3)
        eps = jax.random.normal(key, (2, 16))

        def oracle(x, t):
            return eps - x0_true  # v = ε − x0 everywhere on the path

        out = sched.sample(oracle, (2, 16), key, x_T=eps)
        np.testing.assert_allclose(out, x0_true, atol=1e-5)

    def test_interpolation_and_target(self):
        x0 = jnp.zeros((2, 4))
        eps = jnp.ones((2, 4))
        sig = jnp.array([0.0, 1.0])
        xt = flow_interpolate(x0, eps, sig)
        np.testing.assert_allclose(xt[0], 0.0)
        np.testing.assert_allclose(xt[1], 1.0)
        np.testing.assert_allclose(flow_target(x0, eps), eps - x0)

    def test_sigma_sampling_in_range(self):
        for scheme in ("logit_normal", "uniform"):
            s = sample_sigmas(jax.random.key(0), 512, scheme)
            assert s.shape == (512,)
            assert float(s.min()) >= 0.0 and float(s.max()) <= 1.0

    def test_timesteps_descend(self):
        sched = FlowMatchSchedule.create(num_steps=30, shift=7.0)
        assert bool(jnp.all(jnp.diff(sched.timesteps) < 0))
        np.testing.assert_allclose(float(sched.sigmas[-1]), 0.0, atol=1e-6)
