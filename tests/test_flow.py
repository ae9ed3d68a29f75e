"""End-to-end flow tests: the PR1 slice (tiny OpenSora STDiT T2V) —
init → sample → decode, and the training loss."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotuna_tpu.core.registry import populate
from videotuna_tpu.flows.opensora import OpenSoraFlow

populate()

TINY = dict(
    denoiser_config={
        "target": "videotuna_tpu.models.opensora.STDiT",
        "params": dict(input_size=(4, 8, 8), in_channels=4, hidden_size=32,
                       depth=1, num_heads=2, caption_channels=16,
                       pred_sigma=False),
    },
    scheduler_config={
        "target": "videotuna_tpu.schedulers.DDPMSchedule",
        "params": dict(timesteps=100),
    },
    first_stage_config={
        "target": "videotuna_tpu.models.AutoencoderKL2D",
        "params": dict(ch=8, ch_mult=(1, 2, 2, 2), num_res_blocks=1,
                       z_channels=4, embed_dim=4),
    },
    cond_stage_config={
        "target": "videotuna_tpu.models.T5Encoder",
        "params": dict(vocab_size=30002, dim=16, heads=2, head_dim=8,
                       ff_dim=32, num_layers=1),
    },
)


@pytest.fixture(scope="module")
def flow():
    f = OpenSoraFlow(**TINY, ddim_steps=4, model_max_length=8)
    f.init_params(seed=0)
    return f


class TestOpenSoraFlow:
    def test_init_components(self, flow):
        assert set(flow.params) == {"denoiser", "first_stage", "cond_stage"}

    def test_latent_shape(self, flow):
        assert flow.latent_shape(2, 4, 64, 64) == (2, 4, 8, 8, 4)

    def test_training_loss_finite(self, flow):
        batch = {
            "video": jnp.zeros((2, 4, 64, 64, 3)),
            "text_states": jax.random.normal(jax.random.key(0), (2, 8, 16)),
            "text_mask": jnp.ones((2, 8), bool),
        }
        loss, aux = flow.training_loss(flow.params, batch, jax.random.key(1))
        assert jnp.isfinite(loss)
        assert "loss" in aux

    def test_inference_end_to_end(self, flow, tmp_path):
        cfg = {"inference": {
            "savedir": str(tmp_path), "prompt": "a cat", "bs": 1,
            "n_samples_prompt": 1, "height": 64, "width": 64, "frames": 4,
            "seed": 7, "unconditional_guidance_scale": 2.0,
        }}
        result = flow.inference(cfg)
        assert len(result["videos"]) == 1
        assert os.path.exists(result["videos"][0])
        assert os.path.exists(tmp_path / "metric.json")

    def test_sample_deterministic_under_seed(self, flow):
        cond = {"y": jnp.zeros((1, 8, 16)), "mask": jnp.ones((1, 8), bool)}
        shape = (1, 4, 8, 8, 4)
        z1 = flow.sample(flow.params, cond, None, shape, jax.random.key(5),
                         cfg_scale=1.0)
        z2 = flow.sample(flow.params, cond, None, shape, jax.random.key(5),
                         cfg_scale=1.0)
        np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))

    def test_save_and_restore_roundtrip(self, flow, tmp_path):
        root = str(tmp_path / "ckpt")
        flow.save_pretrained(root, step=3)
        f2 = OpenSoraFlow(**TINY, ddim_steps=4, model_max_length=8)
        f2.init_params(seed=123)  # different init
        f2.from_pretrained(root)
        d1 = jax.tree.leaves(flow.params["denoiser"])
        d2 = jax.tree.leaves(f2.params["denoiser"])
        for a, b in zip(d1, d2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
