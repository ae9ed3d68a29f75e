"""Analytic golden tests for training losses — each family's loss formula
checked against hand-computed values (the numerical-parity depth SURVEY §4
says the reference lacks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotuna_tpu.schedulers import (DDPMSchedule, flow_interpolate,
                                      flow_target)
from videotuna_tpu.schedulers.common import extract_into


class TestDiffusionLossAlgebra:
    def test_eps_loss_zero_for_oracle(self):
        """If the model returned the exact noise, eps-MSE is 0."""
        s = DDPMSchedule.create(timesteps=100)
        x0 = jax.random.normal(jax.random.key(0), (2, 8))
        noise = jax.random.normal(jax.random.key(1), (2, 8))
        t = jnp.array([10, 50])
        target = s.training_target(x0, noise, t)
        np.testing.assert_allclose(np.asarray(target), np.asarray(noise))

    def test_v_loss_identity(self):
        """v-target satisfies x_t = sqrt(a)·x0 + sqrt(1−a)·eps and
        v = sqrt(a)·eps − sqrt(1−a)·x0 exactly."""
        s = DDPMSchedule.create(timesteps=100, parameterization="v")
        x0 = jax.random.normal(jax.random.key(2), (2, 8))
        noise = jax.random.normal(jax.random.key(3), (2, 8))
        t = jnp.array([3, 77])
        v = s.training_target(x0, noise, t)
        a = extract_into(s.alphas_cumprod, t, 2)
        expected = jnp.sqrt(a) * noise - jnp.sqrt(1 - a) * x0
        np.testing.assert_allclose(np.asarray(v), np.asarray(expected),
                                   atol=1e-6)

    def test_cogvideox_alpha_weight_formula(self):
        """The CogVideoX loss weight is 1/(1−ᾱ_t) (reference
        cogvideo_pl.py:815-887)."""
        s = DDPMSchedule.create(timesteps=100, parameterization="v")
        t = jnp.array([0, 50, 99])
        w = 1.0 / (1.0 - extract_into(s.alphas_cumprod, t, 2)[:, 0])
        # early timesteps (high ᾱ) get the largest weights
        assert float(w[0]) > float(w[1]) > float(w[2])
        assert float(w[2]) > 1.0

    def test_flow_loss_zero_for_oracle(self):
        """Flow loss target ε−x0: interpolant derivative d(x_σ)/dσ = ε−x0
        for every σ — the loss of the true velocity is 0."""
        x0 = jax.random.normal(jax.random.key(4), (2, 8))
        eps = jax.random.normal(jax.random.key(5), (2, 8))
        sig = jnp.array([0.3, 0.9])
        # finite-difference the interpolant
        d = 1e-3
        xd = (flow_interpolate(x0, eps, sig + d)
              - flow_interpolate(x0, eps, sig)) / d
        np.testing.assert_allclose(np.asarray(xd),
                                   np.asarray(flow_target(x0, eps)),
                                   atol=1e-2)

    def test_nan_guard_zeroes_bad_samples(self):
        """Per-sample NaN losses must be zeroed, not poison the mean
        (reference flow/videocrafter.py:447-451)."""
        per = jnp.array([0.5, jnp.nan, 1.5])
        guarded = jnp.where(jnp.isnan(per), 0.0, per)
        assert float(jnp.mean(guarded)) == pytest.approx(2.0 / 3.0)


class TestCogVideoX15Patch:
    def test_temporal_patch_2(self):
        """v1.5 uses (2,2,2) patches — latent T must be even and the output
        round-trips the shape."""
        from videotuna_tpu.models.cogvideo.mmdit import CogVideoXTransformer
        m = CogVideoXTransformer(in_channels=16, out_channels=16, dim=32,
                                 num_layers=1, heads=2, text_dim=16,
                                 patch_size=(2, 2, 2), use_rope=True)
        x = jnp.zeros((1, 4, 8, 8, 16))
        p = m.init(jax.random.key(0), x, jnp.array([1]),
                   jnp.zeros((1, 6, 16)))["params"]
        out = m.apply({"params": p}, x, jnp.array([1]),
                      jnp.zeros((1, 6, 16)))
        assert out.shape == (1, 4, 8, 8, 16)
