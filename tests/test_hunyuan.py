"""HunyuanVideo family tests: double/single-stream DiT + flow-matching flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotuna_tpu.flows.hunyuan import (HunyuanVideoFlow,
                                         riflex_temporal_scale)
from videotuna_tpu.models.hunyuan.dit import HYVideoDiT

TINY_DIT = dict(in_channels=16, out_channels=16, dim=32, heads=2,
                double_blocks=1, single_blocks=2, text_dim=24,
                pooled_dim=12, guidance_embed=True)

HY_TINY = dict(
    denoiser_config={
        "target": "videotuna_tpu.models.hunyuan.HYVideoDiT",
        "params": TINY_DIT,
    },
    scheduler_config={
        "target": "videotuna_tpu.schedulers.FlowMatchSchedule",
        "params": dict(num_steps=4, shift=7.0),
    },
    first_stage_config={
        "target": "videotuna_tpu.models.CausalVAE3D",
        "params": dict(ch=8, ch_mult=(1, 2, 2), num_res_blocks=1,
                       z_channels=16, embed_dim=16),
    },
    cond_stage_config={
        "target": "videotuna_tpu.models.LlamaTextEncoder",
        "params": dict(vocab_size=30002, dim=24, heads=2, num_layers=1),
    },
    cond_stage_2_config={
        "target": "videotuna_tpu.models.CLIPTextEncoder",
        "params": dict(vocab_size=30002, dim=12, heads=2, num_layers=1,
                       max_len=8),
    },
)


class TestHYVideoDiT:
    @pytest.fixture(scope="class")
    def tiny(self):
        model = HYVideoDiT(**TINY_DIT)
        x = jnp.zeros((1, 2, 8, 8, 16))
        args = (x, jnp.array([500.0]), jnp.zeros((1, 6, 24)),
                jnp.zeros((1, 12)), jnp.ones((1, 6), bool),
                jnp.array([6000.0]))
        params = model.init(jax.random.key(0), *args)["params"]
        return model, params

    def test_shapes(self, tiny):
        model, params = tiny
        x = jax.random.normal(jax.random.key(1), (2, 2, 8, 8, 16))
        out = model.apply({"params": params}, x, jnp.array([1.0, 999.0]),
                          jax.random.normal(jax.random.key(2), (2, 6, 24)),
                          jnp.zeros((2, 12)), jnp.ones((2, 6), bool),
                          jnp.array([6000.0, 6000.0]))
        assert out.shape == (2, 2, 8, 8, 16)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_zero_init_final(self, tiny):
        """final_proj zero-init → output 0 at init (v-field starts at 0)."""
        model, params = tiny
        x = jax.random.normal(jax.random.key(3), (1, 2, 8, 8, 16))
        out = model.apply({"params": params}, x, jnp.array([10.0]),
                          jnp.zeros((1, 6, 24)), jnp.zeros((1, 12)),
                          jnp.ones((1, 6), bool), jnp.array([6000.0]))
        np.testing.assert_allclose(out, 0.0, atol=1e-6)

    def test_text_participates(self, tiny):
        model, params = tiny
        # random (not constant) perturbation: zero-init projections follow
        # LayerNorms, and a constant kernel annihilates zero-mean features
        keys = iter(jax.random.split(jax.random.key(99), 10_000))
        params = jax.tree.map(
            lambda p: p + 0.02 * jax.random.normal(next(keys), p.shape,
                                                   p.dtype), params)
        x = jax.random.normal(jax.random.key(4), (1, 2, 8, 8, 16))
        y1 = jax.random.normal(jax.random.key(5), (1, 6, 24))
        common = (jnp.array([10.0]),)
        o1 = model.apply({"params": params}, x, *common, y1,
                         jnp.zeros((1, 12)), jnp.ones((1, 6), bool),
                         jnp.array([6000.0]))
        o2 = model.apply({"params": params}, x, *common, y1 + 1.0,
                         jnp.zeros((1, 12)), jnp.ones((1, 6), bool),
                         jnp.array([6000.0]))
        assert float(jnp.abs(o1 - o2).max()) > 1e-6

    def test_scan_mode(self):
        model = HYVideoDiT(**TINY_DIT, scan_blocks=True)
        x = jnp.zeros((1, 2, 8, 8, 16))
        args = (x, jnp.array([1.0]), jnp.zeros((1, 6, 24)),
                jnp.zeros((1, 12)), jnp.ones((1, 6), bool),
                jnp.array([6000.0]))
        params = model.init(jax.random.key(0), *args)["params"]
        out = model.apply({"params": params}, *args)
        assert out.shape == (1, 2, 8, 8, 16)


class TestRiflex:
    def test_disabled_for_short(self):
        assert riflex_temporal_scale(16, 16, L_test=None) is None
        assert riflex_temporal_scale(16, 16, L_test=40) is None

    def test_caps_kth_frequency(self):
        s = riflex_temporal_scale(16, 60, k=4, L_test=60)
        assert s is not None and s.shape == (8,)
        assert float(s[3]) < 1.0          # k-th freq slowed down
        others = jnp.concatenate([s[:3], s[4:]])
        np.testing.assert_allclose(others, 1.0)


class TestHunyuanFlow:
    @pytest.fixture(scope="class")
    def flow(self):
        f = HunyuanVideoFlow(**HY_TINY, model_max_length=6)
        f.init_params(seed=0)
        return f

    def test_components(self, flow):
        assert set(flow.params) == {"denoiser", "first_stage", "cond_stage",
                                    "cond_stage_2"}

    def test_encode_text_pooled(self, flow):
        cond = flow.encode_text(flow.params, ["a cat", "a dog"])
        assert cond["y"].shape == (2, 6, 24)
        assert cond["pooled"].shape == (2, 12)

    def test_training_loss(self, flow):
        batch = {
            "video": jnp.zeros((1, 9, 32, 32, 3)),
            "text_states": jnp.zeros((1, 6, 24)),
            "text_mask": jnp.ones((1, 6), bool),
            "pooled_text": jnp.zeros((1, 12)),
        }
        loss, aux = flow.training_loss(flow.params, batch, jax.random.key(0))
        assert jnp.isfinite(loss)
        assert 0.0 < float(aux["sigma_mean"]) < 1.0

    def test_sample_embedded_guidance(self, flow):
        cond = flow.encode_text(flow.params, ["a cat"])
        z = flow.sample(flow.params, cond, None, (1, 2, 4, 4, 16),
                        jax.random.key(1))
        assert z.shape == (1, 2, 4, 4, 16)
        assert bool(jnp.all(jnp.isfinite(z)))

    def test_inference_end_to_end(self, flow, tmp_path):
        cfg = {"inference": {
            "savedir": str(tmp_path), "prompt": "ocean waves", "bs": 1,
            "height": 32, "width": 32, "frames": 9, "seed": 3,
            "unconditional_guidance_scale": 1.0,
        }}
        result = flow.inference(cfg)
        assert len(result["videos"]) == 1


class TestStageParity:
    """Staged execution (embed → double chunks → single chunks → head)
    must equal the monolithic forward — the contract tools/offload's
    host-streaming and bench.py's full-depth measurement rely on."""

    def test_staged_equals_monolithic(self):
        model = HYVideoDiT(**{**TINY_DIT, "scan_blocks": True})
        x = jax.random.normal(jax.random.key(0), (1, 2, 8, 8, 16)) * 0.3
        t = jnp.array([500.0])
        y = jax.random.normal(jax.random.key(1), (1, 6, 24)) * 0.2
        pooled = jax.random.normal(jax.random.key(2), (1, 12)) * 0.2
        mask = jnp.ones((1, 6), bool)
        g = jnp.array([6000.0])
        args = (x, t, y, pooled, mask, g)
        params = model.init(jax.random.key(3), *args)["params"]
        # perturb so zero-init modulations don't make stages vacuous
        params = jax.tree.map(
            lambda a: a + 0.02 * np.random.default_rng(5)
            .standard_normal(a.shape).astype(a.dtype), params)
        ref = model.apply({"params": params}, *args)

        grid = (2, 4, 4)
        emb_params = {k: v for k, v in params.items()
                      if k not in ("double_blocks", "single_blocks",
                                   "final_mod", "final_norm",
                                   "final_proj")}
        head_params = {k: params[k] for k in ("final_mod", "final_proj")
                       if k in params}
        img, txt, vec, vec_tr = model.apply(
            {"params": emb_params}, x, t, y, pooled, mask, g,
            stage="embed")
        nd = TINY_DIT["double_blocks"]
        ns = TINY_DIT["single_blocks"]
        sub_d = HYVideoDiT(**{**TINY_DIT, "scan_blocks": True,
                              "double_blocks": 1})
        for i in range(nd):
            chunk = {"double_blocks":
                     jax.tree.map(lambda a: a[i:i + 1],
                                  params["double_blocks"])}
            img, txt = sub_d.apply({"params": chunk}, stage="double",
                                   img=img, txt=txt, vec=vec,
                                   vec_tr=vec_tr, grid=grid)
        xcat = jnp.concatenate([img, txt], axis=1)
        sub_s = HYVideoDiT(**{**TINY_DIT, "scan_blocks": True,
                              "single_blocks": 1})
        for i in range(ns):
            chunk = {"single_blocks":
                     jax.tree.map(lambda a: a[i:i + 1],
                                  params["single_blocks"])}
            xcat = sub_s.apply({"params": chunk}, stage="single",
                               xcat=xcat, vec=vec, vec_tr=vec_tr,
                               grid=grid)
        img_len = grid[0] * grid[1] * grid[2]
        out = model.apply({"params": head_params}, stage="head",
                          img=xcat[:, :img_len], vec=vec, grid=grid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
