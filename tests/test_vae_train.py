"""VAE-training tests: losses behave, GAN step runs, recon improves."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from videotuna_tpu.models.vae2d import DiagonalGaussian
from videotuna_tpu.models.vae3d import CausalVAE3D
from videotuna_tpu.training.vae_train import (Discriminator3D,
                                              d_hinge_loss, g_hinge_loss,
                                              init_vae_train_state,
                                              make_vae_train_step,
                                              multiscale_perceptual,
                                              vae_loss)


class TestLosses:
    def test_perceptual_zero_for_identical(self):
        x = jax.random.normal(jax.random.key(0), (1, 2, 16, 16, 3))
        np.testing.assert_allclose(multiscale_perceptual(x, x), 0.0,
                                   atol=1e-6)
        y = x + 0.5
        assert float(multiscale_perceptual(x, y).mean()) > 0.0

    def test_vae_loss_components(self):
        x = jax.random.normal(jax.random.key(1), (2, 2, 8, 8, 3))
        recon = x + 0.1
        post = DiagonalGaussian(jnp.zeros((2, 2, 2, 2, 8)))
        loss, aux = vae_loss(recon, x, post)
        assert jnp.isfinite(loss)
        np.testing.assert_allclose(float(aux["rec"]), 0.1, atol=1e-5)
        np.testing.assert_allclose(float(aux["kl"]), 0.0, atol=1e-6)

    def test_hinge_losses(self):
        real = jnp.full((2, 1, 2, 2, 1), 2.0)
        fake = jnp.full((2, 1, 2, 2, 1), -2.0)
        assert float(d_hinge_loss(real, fake)) == 0.0  # perfectly separated
        assert float(g_hinge_loss(fake)) == 2.0


class TestDiscriminator:
    def test_output_patch_logits(self):
        d = Discriminator3D(base=8, num_layers=2)
        v = jnp.zeros((1, 4, 32, 32, 3))
        params = d.init(jax.random.key(0), v)["params"]
        out = d.apply({"params": params}, v)
        assert out.ndim == 5 and out.shape[-1] == 1


class TestVAETrainStep:
    def test_recon_improves(self):
        vae = CausalVAE3D(ch=8, ch_mult=(1, 2), num_res_blocks=1,
                          z_channels=4, embed_dim=4)
        disc = Discriminator3D(base=8, num_layers=2)
        g_opt = optax.adam(2e-3)
        d_opt = optax.adam(1e-4)
        video = jax.random.uniform(jax.random.key(0), (1, 5, 16, 16, 3),
                                   minval=-0.5, maxval=0.5)
        state = init_vae_train_state(vae, disc, g_opt, d_opt, video,
                                     jax.random.key(1))
        step = jax.jit(make_vae_train_step(vae, disc, g_opt, d_opt,
                                           gan_weight=0.1,
                                           gan_start_step=2))
        recs = []
        for i in range(12):
            state, m = step(state, video, jax.random.key(2))
            recs.append(float(m["rec"]))
        assert recs[-1] < recs[0], recs[::4]
        assert np.isfinite(float(m["d_loss"]))
