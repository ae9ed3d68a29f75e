"""V2VEnhanceFlow — the dedicated Vid2Vid enhancement model (concat
conditioning, noise-augmented cond latents, full-schedule generation,
self-supervised degradation training). Capability parity target:
reference scripts/inference_v2v_ms.py (ModelScope Video-to-Video)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotuna_tpu.flows.v2v import V2VEnhanceFlow

from tests.test_lvdm import TINY_UNET, VC_TINY


@pytest.fixture(scope="module")
def flow():
    cfg = dict(VC_TINY)
    cfg["denoiser_config"] = {
        "target": "videotuna_tpu.models.lvdm.UNet3D",
        "params": {**TINY_UNET, "in_channels": 8, "fps_cond": True},
    }
    f = V2VEnhanceFlow(**cfg, ddim_steps=3, uncond_prob=0.1)
    f.init_params(seed=0)
    return f


def test_enhance_shapes_and_finite(flow):
    video = jax.random.uniform(jax.random.key(0), (1, 4, 64, 64, 3),
                               minval=-1.0, maxval=1.0)
    cond = {"y": jnp.zeros((1, 8, 16)), "fps": jnp.array([8.0])}
    uncond = {"y": jnp.zeros((1, 8, 16)), "fps": jnp.array([8.0])}
    out = flow.enhance(flow.params, video, cond, jax.random.key(1),
                       strength=0.4, cfg_scale=7.5, uncond=uncond)
    assert out.shape == video.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_conditioning_latents_change_output(flow):
    """The concat conditioning must actually steer the sample: two
    different source videos from the same noise seed must differ."""
    params = jax.tree.map(lambda p: p + 0.01 * jnp.ones_like(p),
                          flow.params)
    cond = {"y": jnp.zeros((1, 8, 16)), "fps": jnp.array([8.0])}
    v1 = jnp.zeros((1, 4, 64, 64, 3))
    v2 = jnp.ones((1, 4, 64, 64, 3)) * 0.5
    o1 = flow.enhance(params, v1, cond, jax.random.key(2), cfg_scale=1.0)
    o2 = flow.enhance(params, v2, cond, jax.random.key(2), cfg_scale=1.0)
    assert float(jnp.abs(o1 - o2).max()) > 1e-5


def test_degradation_training_loss(flow):
    batch = {
        "video": jax.random.uniform(jax.random.key(3), (2, 4, 64, 64, 3),
                                    minval=-1.0, maxval=1.0),
        "text_states": jnp.zeros((2, 8, 16)),
        "fps": jnp.array([8.0, 8.0]),
    }
    loss, aux = flow.training_loss(flow.params, batch, jax.random.key(4))
    assert jnp.isfinite(loss)
    # gradients flow to the denoiser
    g = jax.grad(lambda p: flow.training_loss(p, batch,
                                              jax.random.key(4))[0])(
        flow.params)
    gnorm = sum(float(jnp.abs(x).sum())
                for x in jax.tree.leaves(g["denoiser"]))
    assert np.isfinite(gnorm) and gnorm > 0


def test_upscale_latents():
    from videotuna_tpu.flows.v2v import _latent_bilinear
    z = jnp.arange(2 * 3 * 4 * 4 * 2, dtype=jnp.float32).reshape(
        2, 3, 4, 4, 2)
    up = _latent_bilinear(z, (8, 8))
    assert up.shape == (2, 3, 8, 8, 2)
