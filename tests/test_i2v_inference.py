"""End-to-end image-conditioned (i2v) inference from an input directory.

The reference protocol (utils/inference_utils.py:78-125): a directory with
one prompts .txt + images paired by sorted order. Here that routes through
GenerationFlow.inference → load_inputs_i2v → flow.prepare_image_cond:
DynamiCrafter-style concat conditioning (UNet in_channels 8) + CLIP→
resampler context tokens, all the way to mp4s on disk.
"""

import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotuna_tpu.flows.generation import load_inputs_i2v
from videotuna_tpu.flows.videocrafter import VideocrafterFlow

TINY_UNET_I2V = dict(in_channels=8, model_channels=32, out_channels=4,
                     num_res_blocks=1, attention_resolutions=(1, 2),
                     channel_mult=(1, 2), num_head_channels=8,
                     context_dim=16, temporal_conv=True, temporal_length=4,
                     use_image_attention=True)

DC_TINY = dict(
    denoiser_config={
        "target": "videotuna_tpu.models.lvdm.UNet3D",
        "params": {**TINY_UNET_I2V},
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
    cond_stage_2_config={
        "target": "videotuna_tpu.models.lvdm.ImageConditioner",
        "params": dict(image_size=28, clip_dim=16, clip_heads=2,
                       clip_layers=1, dim=16, depth=1, heads=2,
                       num_queries=4, output_dim=16),
    },
)


def _write_input_dir(d, n=2, w=40, h=30):
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(d, f"img_{i}.png"), img)
    with open(os.path.join(d, "prompts.txt"), "w") as f:
        f.write("\n".join(f"prompt {i}" for i in range(n)) + "\n")


class TestLoadInputsI2V:
    def test_pairing_and_normalization(self, tmp_path):
        d = str(tmp_path / "in")
        _write_input_dir(d, n=3)
        names, images, prompts = load_inputs_i2v(d, (16, 24))
        assert names == ["img_0", "img_1", "img_2"]
        assert images.shape == (3, 16, 24, 3)
        assert prompts == ["prompt 0", "prompt 1", "prompt 2"]
        assert float(images.max()) <= 1.0 and float(images.min()) >= -1.0

    def test_missing_prompt_file_raises(self, tmp_path):
        d = str(tmp_path / "empty")
        os.makedirs(d)
        with pytest.raises(ValueError, match="NO prompt"):
            load_inputs_i2v(d, (16, 16))

    def test_fewer_images_than_prompts_raises(self, tmp_path):
        d = str(tmp_path / "short")
        _write_input_dir(d, n=1)
        with open(os.path.join(d, "prompts.txt"), "w") as f:
            f.write("a\nb\n")
        with pytest.raises(ValueError, match="only 1 images"):
            load_inputs_i2v(d, (16, 16))


class TestDynamiCrafterI2VInference:
    @pytest.fixture(scope="class")
    def flow(self):
        f = VideocrafterFlow(**DC_TINY, ddim_steps=3, i2v_mode=True)
        f.init_params(seed=0)
        return f

    def test_end_to_end_from_input_dir(self, flow, tmp_path):
        d = str(tmp_path / "in")
        _write_input_dir(d, n=2, w=72, h=48)
        cfg = {"inference": {
            "savedir": str(tmp_path / "out"), "input_dir": d, "bs": 1,
            "height": 32, "width": 32, "frames": 4, "seed": 1,
            "unconditional_guidance_scale": 7.5,
        }}
        result = flow.inference(cfg)
        assert len(result["videos"]) == 2
        assert all(os.path.exists(p) for p in result["videos"])

    def test_image_changes_output(self, flow):
        """Concat conditioning must actually steer the sample."""
        # zero-init output conv ⇒ identical zero outputs at init; nudge
        # the denoiser so conditioning differences reach the output
        params = dict(flow.params)
        params["denoiser"] = jax.tree.map(
            lambda p: p + 0.01 * jnp.ones_like(p),
            flow.params["denoiser"])
        cond = flow.encode_text(params, ["a dog"])
        key = jax.random.key(0)
        img1 = jnp.zeros((1, 32, 32, 3))
        img2 = jnp.ones((1, 32, 32, 3)) * 0.5
        c1, _ = flow.prepare_image_cond(params, cond, None, img1, 4, 32,
                                        32, key)
        c2, _ = flow.prepare_image_cond(params, cond, None, img2, 4, 32,
                                        32, key)
        assert c1["img_latents"].shape == (1, 4, 4, 4, 4)
        assert c1["context_img"].shape[0] == 1
        z1 = flow.sample(params, c1, None, (1, 4, 4, 4, 4), key,
                         cfg_scale=1.0)
        z2 = flow.sample(params, c2, None, (1, 4, 4, 4, 4), key,
                         cfg_scale=1.0)
        assert float(jnp.abs(z1 - z2).max()) > 1e-6
