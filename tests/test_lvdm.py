"""VideoCrafter family tests: UNet3D shapes/behavior + VideocrafterFlow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotuna_tpu.flows.videocrafter import VideocrafterFlow
from videotuna_tpu.models.lvdm.unet3d import UNet3D

TINY_UNET = dict(in_channels=4, model_channels=32, out_channels=4,
                 num_res_blocks=1, attention_resolutions=(1, 2),
                 channel_mult=(1, 2), num_head_channels=8,
                 context_dim=16, temporal_conv=True, temporal_length=4)

VC_TINY = dict(
    denoiser_config={
        "target": "videotuna_tpu.models.lvdm.UNet3D",
        "params": {**TINY_UNET, "fps_cond": True},
    },
    scheduler_config={
        "target": "videotuna_tpu.schedulers.DDPMSchedule",
        "params": dict(timesteps=100, parameterization="v"),
    },
    first_stage_config={
        "target": "videotuna_tpu.models.AutoencoderKL2D",
        "params": dict(ch=8, ch_mult=(1, 2, 2, 2), num_res_blocks=1,
                       z_channels=4, embed_dim=4),
    },
    cond_stage_config={
        "target": "videotuna_tpu.models.CLIPTextEncoder",
        "params": dict(vocab_size=30002, dim=16, heads=2, num_layers=2,
                       max_len=8),
    },
)


class TestUNet3D:
    @pytest.fixture(scope="class")
    def tiny(self):
        model = UNet3D(**TINY_UNET, fps_cond=True)
        x = jnp.zeros((1, 4, 16, 16, 4))
        t = jnp.array([10])
        ctx = jnp.zeros((1, 8, 16))
        params = model.init(jax.random.key(0), x, t, ctx,
                            fps=jnp.array([8.0]))["params"]
        return model, params

    def test_shape_preserved(self, tiny):
        model, params = tiny
        x = jax.random.normal(jax.random.key(1), (2, 4, 16, 16, 4))
        out = model.apply({"params": params}, x, jnp.array([5, 50]),
                          jnp.zeros((2, 8, 16)), fps=jnp.array([8.0, 24.0]))
        assert out.shape == (2, 4, 16, 16, 4)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_zero_init_output(self, tiny):
        """conv_out is zero-initialized → output at init is exactly 0
        (standard diffusion-UNet init; makes eps-pred start at identity)."""
        model, params = tiny
        x = jax.random.normal(jax.random.key(2), (1, 4, 16, 16, 4))
        out = model.apply({"params": params}, x, jnp.array([10]),
                          jnp.zeros((1, 8, 16)), fps=jnp.array([8.0]))
        np.testing.assert_allclose(out, 0.0, atol=1e-6)

    def test_context_changes_output(self, tiny):
        model, params = tiny
        # perturb params away from zero-init output conv to see ctx effects
        params = jax.tree.map(
            lambda p: p + 0.01 * jnp.ones_like(p), params)
        x = jax.random.normal(jax.random.key(3), (1, 4, 16, 16, 4))
        o1 = model.apply({"params": params}, x, jnp.array([10]),
                         jnp.zeros((1, 8, 16)), fps=jnp.array([8.0]))
        o2 = model.apply({"params": params}, x, jnp.array([10]),
                         jnp.ones((1, 8, 16)), fps=jnp.array([8.0]))
        assert float(jnp.abs(o1 - o2).max()) > 1e-6

    def test_image_cross_attention(self):
        """DynamiCrafter mode: image context tokens participate."""
        model = UNet3D(**TINY_UNET, use_image_attention=True)
        x = jnp.zeros((1, 2, 16, 16, 4))
        t = jnp.array([1])
        ctx = jnp.zeros((1, 8, 16))
        ctx_img = jnp.zeros((1, 4, 16))
        params = model.init(jax.random.key(0), x, t, ctx, ctx_img)["params"]
        out = model.apply({"params": params}, x, t, ctx, ctx_img)
        assert out.shape == (1, 2, 16, 16, 4)


class TestVideocrafterFlow:
    @pytest.fixture(scope="class")
    def flow(self):
        f = VideocrafterFlow(**VC_TINY, ddim_steps=4, uncond_prob=0.1)
        f.init_params(seed=0)
        return f

    def test_v_parameterization_loss(self, flow):
        batch = {
            "video": jnp.zeros((2, 4, 64, 64, 3)),
            "text_states": jnp.zeros((2, 8, 16)),
            "fps": jnp.array([8.0, 8.0]),
        }
        loss, aux = flow.training_loss(flow.params, batch, jax.random.key(0))
        assert jnp.isfinite(loss)

    def test_sample_shapes(self, flow):
        cond = {"y": jnp.zeros((1, 8, 16)), "fps": jnp.array([8.0])}
        uncond = {"y": jnp.zeros((1, 8, 16)), "fps": jnp.array([8.0])}
        z = flow.sample(flow.params, cond, uncond, (1, 4, 8, 8, 4),
                        jax.random.key(1), cfg_scale=7.5)
        assert z.shape == (1, 4, 8, 8, 4)
        assert bool(jnp.all(jnp.isfinite(z)))

    def test_inference_end_to_end(self, flow, tmp_path):
        cfg = {"inference": {
            "savedir": str(tmp_path), "prompt": "a dog", "bs": 1,
            "height": 64, "width": 64, "frames": 4, "seed": 1,
        }}
        result = flow.inference(cfg)
        assert len(result["videos"]) == 1
