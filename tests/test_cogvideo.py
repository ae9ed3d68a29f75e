"""CogVideoX family tests: MMDiT joint attention + flow train/sample/i2v."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotuna_tpu.flows.cogvideo import CogVideoXFlow
from videotuna_tpu.models.cogvideo.mmdit import CogVideoXTransformer

TINY_DIT = dict(in_channels=16, out_channels=16, dim=32, num_layers=2,
                heads=2, text_dim=16, patch_size=(1, 2, 2), use_rope=True)

COG_TINY = dict(
    denoiser_config={
        "target": "videotuna_tpu.models.cogvideo.CogVideoXTransformer",
        "params": TINY_DIT,
    },
    scheduler_config={
        "target": "videotuna_tpu.schedulers.DDPMSchedule",
        "params": dict(timesteps=100, beta_schedule="scaled_linear",
                       parameterization="v",
                       rescale_betas_zero_snr=True),
    },
    first_stage_config={
        "target": "videotuna_tpu.models.CausalVAE3D",
        "params": dict(ch=8, ch_mult=(1, 2, 2), num_res_blocks=1,
                       z_channels=16, embed_dim=16),
    },
    cond_stage_config={
        "target": "videotuna_tpu.models.T5Encoder",
        "params": dict(vocab_size=30002, dim=16, heads=2, head_dim=8,
                       ff_dim=32, num_layers=1),
    },
)


class TestCogVideoXTransformer:
    @pytest.fixture(scope="class")
    def tiny(self):
        model = CogVideoXTransformer(**TINY_DIT)
        x = jnp.zeros((1, 2, 8, 8, 16))
        t = jnp.array([10])
        txt = jnp.zeros((1, 6, 16))
        params = model.init(jax.random.key(0), x, t, txt)["params"]
        return model, params

    def test_shapes(self, tiny):
        model, params = tiny
        x = jax.random.normal(jax.random.key(1), (2, 2, 8, 8, 16))
        out = model.apply({"params": params}, x, jnp.array([1, 99]),
                          jax.random.normal(jax.random.key(2), (2, 6, 16)))
        assert out.shape == (2, 2, 8, 8, 16)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_text_participates(self, tiny):
        """Joint attention: text token changes must alter video output."""
        model, params = tiny
        x = jax.random.normal(jax.random.key(3), (1, 2, 8, 8, 16))
        t = jnp.array([10])
        t1 = jax.random.normal(jax.random.key(4), (1, 6, 16))
        o1 = model.apply({"params": params}, x, t, t1)
        o2 = model.apply({"params": params}, x, t, t1 + 1.0)
        assert float(jnp.abs(o1 - o2).max()) > 1e-6

    def test_scan_mode_runs(self):
        model = CogVideoXTransformer(**TINY_DIT, scan_blocks=True)
        x = jnp.zeros((1, 2, 8, 8, 16))
        params = model.init(jax.random.key(0), x, jnp.array([1]),
                            jnp.zeros((1, 6, 16)))["params"]
        out = model.apply({"params": params}, x, jnp.array([1]),
                          jnp.zeros((1, 6, 16)))
        assert out.shape == (1, 2, 8, 8, 16)


class TestCogVideoXFlow:
    @pytest.fixture(scope="class")
    def flow(self):
        f = CogVideoXFlow(**COG_TINY, ddim_steps=4, model_max_length=6)
        f.init_params(seed=0)
        return f

    def test_latent_shape_temporal_compression(self, flow):
        # 9 frames → 3 latent frames (4×), 32→8 spatial (/4 for tiny vae)
        assert flow.latent_shape(1, 9, 64, 64)[1] == 3

    def test_training_loss(self, flow):
        batch = {
            "video": jnp.zeros((1, 9, 32, 32, 3)),
            "text_states": jnp.zeros((1, 6, 16)),
        }
        loss, _ = flow.training_loss(flow.params, batch, jax.random.key(0))
        assert jnp.isfinite(loss)

    def test_sample_and_decode(self, flow):
        cond = {"y": jnp.zeros((1, 6, 16))}
        z = flow.sample(flow.params, cond, None, (1, 2, 4, 4, 16),
                        jax.random.key(1), cfg_scale=1.0)
        assert z.shape == (1, 2, 4, 4, 16)
        vid = flow.decode_latents(flow.params, z)
        assert vid.shape == (1, 5, 16, 16, 3)  # 2 latent → 4k+1=5 frames

    def test_attn_static_max_scope_active(self, flow):
        """CogVideoXFlow defaults to the fixed-max softmax (qk-LN bounds
        the logits) and the scope is live when the denoiser traces, so
        the Pallas kernel picks it up on TPU; exactness is pinned by
        test_attention.py::test_static_max_*."""
        from videotuna_tpu.kernels import attention as A
        assert flow.attn_static_max == 0.0   # M=0: subtract-free
        seen = {}
        orig = flow.denoise_apply

        def spy(params, x, t, c):
            seen["cfg"] = getattr(A._ATTN_OPTS, "cfg", None)
            return orig(params, x, t, c)

        flow.denoise_apply = spy
        try:
            flow.sample(flow.params, {"y": jnp.zeros((1, 6, 16))}, None,
                        (1, 2, 4, 4, 16), jax.random.key(0), cfg_scale=1.0)
        finally:
            del flow.denoise_apply
        assert seen["cfg"] == {"static_max": 0.0}

    def test_i2v_image_latents(self):
        f = CogVideoXFlow(**{**COG_TINY,
                             "denoiser_config": {
                                 "target": ("videotuna_tpu.models.cogvideo."
                                            "CogVideoXTransformer"),
                                 "params": {**TINY_DIT, "in_channels": 32},
                             }},
                          ddim_steps=4, model_max_length=6, i2v_mode=True)
        f.init_params(seed=0)
        img = jnp.zeros((1, 16, 16, 3))
        il = f.prepare_image_latents(f.params, img, 2, jax.random.key(0))
        assert il.shape == (1, 2, 4, 4, 16)
        cond = {"y": jnp.zeros((1, 6, 16)), "image_latents": il}
        z = f.sample(f.params, cond, None, (1, 2, 4, 4, 16),
                     jax.random.key(1), cfg_scale=1.0)
        assert z.shape == (1, 2, 4, 4, 16)
