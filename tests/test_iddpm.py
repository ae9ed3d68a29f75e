"""IDDPM / spaced diffusion + image-conditioning tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotuna_tpu.models.lvdm.image_cond import (CLIPImageEmbedder,
                                                  ImageProjModel, Resampler)
from videotuna_tpu.schedulers.iddpm import SpacedSchedule, space_timesteps


class TestSpaceTimesteps:
    def test_even_spacing(self):
        steps = space_timesteps(1000, "100")
        assert len(steps) == 100
        assert steps[0] == 0

    def test_ddim_style(self):
        steps = space_timesteps(1000, "ddim50")
        assert len(steps) == 50
        diffs = set(np.diff(steps))
        assert len(diffs) == 1  # uniform stride

    def test_sections(self):
        steps = space_timesteps(100, [5, 5])
        assert len(steps) == 10


class TestSpacedSchedule:
    def test_respaced_chain_consistent(self):
        """The respaced chain's cumulative alphas must match the original at
        the selected timesteps."""
        from videotuna_tpu.schedulers.ddpm import DDPMSchedule
        full = DDPMSchedule.create(timesteps=1000)
        sp = SpacedSchedule.create(timesteps=1000, section_counts="50")
        orig_ac = np.asarray(full.alphas_cumprod)[
            np.asarray(sp.timestep_map)]
        np.testing.assert_allclose(np.asarray(sp.base.alphas_cumprod),
                                   orig_ac, rtol=1e-5)

    def test_sample_learned_variance(self):
        """With the exact eps oracle + min-variance prediction the sampler
        recovers a constant target."""
        sp = SpacedSchedule.create(timesteps=1000, section_counts="25")
        x0_true = jnp.full((1, 8), 0.4)

        def oracle(x, t_orig):
            # map original t back to spaced index for alphas
            idx = jnp.searchsorted(sp.timestep_map, t_orig[0])
            t = jnp.full((x.shape[0],), idx, jnp.int32)
            a = sp.base.alphas_cumprod[t].reshape(-1, 1)
            eps = (x - jnp.sqrt(a) * x0_true) / jnp.sqrt(1 - a)
            var_v = -jnp.ones_like(x)   # frac 0 → min (posterior) variance
            return jnp.concatenate([eps, var_v], axis=-1)

        out = sp.sample(oracle, (1, 8), jax.random.key(0))
        np.testing.assert_allclose(out, x0_true, atol=0.15)

    def test_vb_loss_finite(self):
        sp = SpacedSchedule.create(timesteps=100, section_counts="10")
        x0 = jax.random.normal(jax.random.key(0), (2, 8))
        t = jnp.array([3, 7])
        noise = jax.random.normal(jax.random.key(1), (2, 8))
        x_t = sp.base.q_sample(x0, t, noise)
        model_out = jnp.concatenate([noise, jnp.zeros_like(noise)], -1)
        vb = sp.vb_loss_term(model_out, x0, x_t, t)
        assert vb.shape == (2,)
        assert bool(jnp.all(jnp.isfinite(vb)))


class TestImageConditioning:
    def test_clip_image_embedder_tokens(self):
        enc = CLIPImageEmbedder(image_size=28, patch=14, dim=16, heads=2,
                                num_layers=1)
        img = jnp.zeros((2, 28, 28, 3))
        params = enc.init(jax.random.key(0), img)["params"]
        out = enc.apply({"params": params}, img)
        assert out.shape == (2, 4, 16)  # (28/14)^2 patches

    def test_resampler_queries(self):
        rs = Resampler(dim=16, depth=1, heads=2, num_queries=4,
                       embedding_dim=16, output_dim=24)
        x = jax.random.normal(jax.random.key(0), (2, 9, 16))
        params = rs.init(jax.random.key(1), x)["params"]
        out = rs.apply({"params": params}, x)
        assert out.shape == (2, 4, 24)

    def test_resampler_video_length(self):
        rs = Resampler(dim=16, depth=1, heads=2, num_queries=4,
                       embedding_dim=16, output_dim=24, video_length=3)
        x = jax.random.normal(jax.random.key(0), (1, 9, 16))
        params = rs.init(jax.random.key(1), x)["params"]
        assert rs.apply({"params": params}, x).shape == (1, 12, 24)

    def test_image_proj_model(self):
        pm = ImageProjModel(cross_attention_dim=16, clip_embeddings_dim=8,
                            clip_extra_context_tokens=4)
        emb = jnp.zeros((2, 8))
        params = pm.init(jax.random.key(0), emb)["params"]
        assert pm.apply({"params": params}, emb).shape == (2, 4, 16)
