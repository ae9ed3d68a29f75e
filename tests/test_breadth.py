"""Breadth features: SDEdit v2v enhance, prompt extension, Mochi flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotuna_tpu.data.prompt_extend import (extend_prompts, get_expander,
                                              template_expander)
from videotuna_tpu.flows.mochi import MochiFlow
from videotuna_tpu.flows.opensora import OpenSoraFlow
from tests.test_flow import TINY


@pytest.fixture(scope="module")
def flow():
    f = OpenSoraFlow(**TINY, ddim_steps=4, model_max_length=8)
    f.init_params(seed=0)
    return f


class TestEnhance:
    def test_v2v_shapes_and_strength(self, flow):
        video = jnp.zeros((1, 4, 64, 64, 3))
        cond = {"y": jnp.zeros((1, 8, 16)), "mask": jnp.ones((1, 8), bool)}
        out = flow.enhance(flow.params, video, cond, jax.random.key(0),
                           strength=0.5, cfg_scale=1.0)
        assert out.shape == video.shape
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_v2v_cogvideox_dpm_scheduler(self):
        """enhance() must work when the flow's scheduler is the CogVideoX
        SDE-DPM++(2M) schedule (the 004/005 configs' default since round
        4 — ADVICE r4: v2v on those configs raised TypeError)."""
        from videotuna_tpu.flows.cogvideo import CogVideoXFlow
        from tests.test_cogvideo import COG_TINY
        cfg = dict(COG_TINY)
        cfg["scheduler_config"] = {
            "target": "videotuna_tpu.schedulers.CogVideoXDPMSchedule",
            "params": dict(num_steps=4, timesteps=100),
        }
        f = CogVideoXFlow(**cfg, ddim_steps=4, model_max_length=6)
        f.init_params(seed=0)
        video = jnp.zeros((1, 5, 16, 16, 3)) + 0.1
        cond = {"y": jnp.zeros((1, 6, 16))}
        for strength in (0.5, 1.0):
            out = f.enhance(f.params, video, cond, jax.random.key(0),
                            strength=strength, cfg_scale=1.0)
            assert out.shape == video.shape
            assert bool(jnp.all(jnp.isfinite(out)))

    def test_low_strength_stays_close(self, flow):
        """strength→small keeps the output near the VAE roundtrip of the
        input; strength→large diverges more."""
        video = jnp.zeros((1, 4, 64, 64, 3)) + 0.2
        cond = {"y": jnp.zeros((1, 8, 16)), "mask": jnp.ones((1, 8), bool)}
        base = flow.decode_latents(
            flow.params,
            flow.encode_video(flow.params, video, jax.random.key(9)))
        lo = flow.enhance(flow.params, video, cond, jax.random.key(1),
                          strength=0.25, cfg_scale=1.0)
        hi = flow.enhance(flow.params, video, cond, jax.random.key(1),
                          strength=1.0, cfg_scale=1.0)
        d_lo = float(jnp.mean(jnp.abs(lo - base)))
        d_hi = float(jnp.mean(jnp.abs(hi - base)))
        assert d_lo < d_hi


class TestPromptExtend:
    def test_template_deterministic_and_appends(self):
        p = "a cat on a roof"
        e1 = template_expander(p)
        e2 = template_expander(p)
        assert e1 == e2
        assert e1.startswith(p) and len(e1) > len(p)

    def test_hook_callable(self):
        fn = get_expander(lambda s: s.upper())
        assert extend_prompts(["abc"], fn) == ["ABC"]

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            get_expander("nonexistent")


class TestMochi:
    def test_flow_composes_and_samples(self):
        f = MochiFlow(
            denoiser_config={
                "target": "videotuna_tpu.models.MochiDiT",
                "params": dict(in_channels=12, dim=32, dim_y=16, depth=2,
                               heads=2, caption_channels=24,
                               scan_blocks=False),
            },
            scheduler_config={
                "target": "videotuna_tpu.schedulers.FlowMatchSchedule",
                "params": dict(num_steps=3, shift=6.0),
            },
            first_stage_config=None,
            cond_stage_config={
                "target": "videotuna_tpu.models.LlamaTextEncoder",
                "params": dict(vocab_size=30002, dim=24, heads=2,
                               num_layers=1),
            },
            model_max_length=6,
        )
        f.init_params(seed=0)
        assert f.latent_shape(1, 84, 480, 848) == (1, 14, 60, 106, 12)
        cond = f.encode_text(f.params, ["a glass of water"])
        z = f.sample(f.params, cond, None, (1, 2, 4, 4, 12),
                     jax.random.key(0))
        assert z.shape == (1, 2, 4, 4, 12)
