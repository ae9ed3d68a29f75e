"""Flux T2I tests: model shapes, resolution shift, flow e2e."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotuna_tpu.flows.flux import FluxFlow, flux_shift_for_resolution
from videotuna_tpu.models.flux.dit import FluxModel

TINY_DIT = dict(in_channels=64, dim=32, heads=2, double_blocks=1,
                single_blocks=1, text_dim=24, pooled_dim=12,
                guidance_embed=True)

FLUX_TINY = dict(
    denoiser_config={
        "target": "videotuna_tpu.models.flux.FluxModel",
        "params": TINY_DIT,
    },
    scheduler_config={
        "target": "videotuna_tpu.schedulers.FlowMatchSchedule",
        "params": dict(num_steps=4, shift=1.0, num_train_timesteps=1),
    },
    first_stage_config={
        "target": "videotuna_tpu.models.AutoencoderKL2D",
        "params": dict(ch=8, ch_mult=(1, 2, 2, 2), num_res_blocks=1,
                       z_channels=16, embed_dim=16),
    },
    cond_stage_config={
        "target": "videotuna_tpu.models.T5Encoder",
        "params": dict(vocab_size=30002, dim=24, heads=2, head_dim=8,
                       ff_dim=48, num_layers=1),
    },
    cond_stage_2_config={
        "target": "videotuna_tpu.models.CLIPTextEncoder",
        "params": dict(vocab_size=30002, dim=12, heads=2, num_layers=1,
                       max_len=8),
    },
)


class TestFluxModel:
    def test_shapes(self):
        model = FluxModel(**TINY_DIT)
        x = jnp.zeros((1, 4, 4, 64))
        args = (x, jnp.array([0.5]), jnp.zeros((1, 6, 24)),
                jnp.zeros((1, 12)), jnp.array([3.5]))
        params = model.init(jax.random.key(0), *args)["params"]
        out = model.apply({"params": params}, *args)
        assert out.shape == (1, 4, 4, 64)
        np.testing.assert_allclose(out, 0.0, atol=1e-6)  # zero-init head


class TestShift:
    def test_monotone_in_resolution(self):
        small = flux_shift_for_resolution(256)
        big = flux_shift_for_resolution(4096)
        assert big > small > 0


class TestFluxFlow:
    @pytest.fixture(scope="class")
    def flow(self):
        f = FluxFlow(**FLUX_TINY, model_max_length=6, schnell=False,
                     num_inference_steps=2)
        f.init_params(seed=0)
        return f

    def test_latent_pack_unpack(self, flow):
        zp = jax.random.normal(jax.random.key(0), (1, 4, 4, 64))
        z = flow.unpack_latents(zp)
        assert z.shape == (1, 1, 8, 8, 16)

    def test_training_loss(self, flow):
        batch = {"latents": jnp.zeros((1, 4, 4, 64)),
                 "text_states": jnp.zeros((1, 6, 24)),
                 "pooled_text": jnp.zeros((1, 12))}
        loss, _ = flow.training_loss(flow.params, batch, jax.random.key(0))
        assert jnp.isfinite(loss)

    def test_inference_end_to_end(self, flow, tmp_path):
        cfg = {"inference": {
            "savedir": str(tmp_path), "prompt": "a castle", "bs": 1,
            "height": 64, "width": 64, "frames": 1, "seed": 2,
            "unconditional_guidance_scale": 1.0,
        }}
        result = flow.inference(cfg)
        assert len(result["videos"]) == 1
