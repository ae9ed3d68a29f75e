"""Wan family tests: DiT, flow solvers, WanVideoFlow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotuna_tpu.flows.wan import WanVideoFlow
from videotuna_tpu.models.wan.dit import WanModel
from videotuna_tpu.schedulers.fm_solvers import (FlowDPMSolverSchedule,
                                                 FlowUniPCSchedule,
                                                 get_sampling_sigmas)

TINY_DIT = dict(in_channels=16, out_channels=16, dim=32, ffn_dim=64,
                num_layers=2, heads=2, text_dim=24)

WAN_TINY = dict(
    denoiser_config={
        "target": "videotuna_tpu.models.wan.WanModel",
        "params": TINY_DIT,
    },
    scheduler_config={
        "target": "videotuna_tpu.schedulers.FlowUniPCSchedule",
        "params": dict(num_steps=4, shift=5.0),
    },
    first_stage_config={
        "target": "videotuna_tpu.models.CausalVAE3D",
        "params": dict(ch=8, ch_mult=(1, 2, 2), num_res_blocks=1,
                       z_channels=16, embed_dim=16),
    },
    cond_stage_config={
        "target": "videotuna_tpu.models.T5Encoder",
        "params": dict(vocab_size=30002, dim=24, heads=2, head_dim=8,
                       ff_dim=48, num_layers=1),
    },
)


class TestFlowSolvers:
    def test_sigma_grid(self):
        s = get_sampling_sigmas(10, 5.0)
        assert s.shape == (11,)
        assert float(s[0]) == 1.0 and abs(float(s[-1])) < 1e-6
        assert bool(jnp.all(jnp.diff(s) < 0))

    @pytest.mark.parametrize("cls", [FlowUniPCSchedule,
                                     FlowDPMSolverSchedule])
    def test_exact_for_linear_field(self, cls):
        """Constant velocity oracle → multistep solvers land on x0.
        Start from the solver's OWN σ₀ (the faithful UniPC grid begins
        at shifted(1 − 1/1000), like the reference, not at exactly 1)."""
        sched = cls.create(num_steps=8, shift=3.0)
        x0_true = jnp.full((2, 16), 0.7)
        eps = jax.random.normal(jax.random.key(0), (2, 16))
        s0 = sched.sigmas[0]
        x_T = (1.0 - s0) * x0_true + s0 * eps

        def oracle(x, t):
            return eps - x0_true

        out = sched.sample(oracle, (2, 16), jax.random.key(1), x_T=x_T)
        np.testing.assert_allclose(out, x0_true, atol=1e-4)

    @pytest.mark.parametrize("cls", [FlowUniPCSchedule,
                                     FlowDPMSolverSchedule])
    def test_nontrivial_field_converges(self, cls):
        """For v(x,σ) of a quadratic path the multistep solver at 30 steps
        should be closer to the true endpoint than Euler at 30 steps."""
        from videotuna_tpu.schedulers import FlowMatchSchedule
        # target distribution: deterministic map x0 = tanh(ε); path linear
        # per-sample so the instantaneous field is still v = ε − x0(ε), but
        # the solver only sees x_σ: reconstruct ε = (x_σ + σ·v)… use a field
        # defined directly: v(x, σ) = (x − tanh(g(x,σ)))/σ' form is messy —
        # instead integrate v(x,t) = −x (exponential decay field).
        def field(x, t):
            return -x

        x_T = jnp.full((1, 8), 2.0)
        sched = cls.create(num_steps=30, shift=1.0)
        out = sched.sample(field, (1, 8), jax.random.key(0), x_T=x_T)
        euler = FlowMatchSchedule.create(num_steps=30, shift=1.0)
        out_e = euler.sample(field, (1, 8), jax.random.key(0), x_T=x_T)
        # exact solution of dx/dσ = −x from σ=1→0: x(0) = x(1)·e^{1}
        exact = x_T * jnp.exp(1.0)
        err_ms = float(jnp.abs(out - exact).max())
        err_eu = float(jnp.abs(out_e - exact).max())
        assert err_ms < err_eu


class TestWanModel:
    @pytest.fixture(scope="class")
    def tiny(self):
        model = WanModel(**TINY_DIT)
        x = jnp.zeros((1, 2, 8, 8, 16))
        args = (x, jnp.array([500.0]), jnp.zeros((1, 6, 24)))
        params = model.init(jax.random.key(0), *args)["params"]
        return model, params

    def test_shapes(self, tiny):
        model, params = tiny
        x = jax.random.normal(jax.random.key(1), (2, 2, 8, 8, 16))
        out = model.apply({"params": params}, x, jnp.array([1.0, 99.0]),
                          jax.random.normal(jax.random.key(2), (2, 6, 24)))
        assert out.shape == (2, 2, 8, 8, 16)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_i2v_image_features(self):
        model = WanModel(**TINY_DIT, img_dim=20)
        x = jnp.zeros((1, 2, 8, 8, 16))
        args = (x, jnp.array([1.0]), jnp.zeros((1, 6, 24)),
                jnp.zeros((1, 4, 20)))
        params = model.init(jax.random.key(0), *args)["params"]
        keys = iter(jax.random.split(jax.random.key(7), 10_000))
        params = jax.tree.map(
            lambda p: p + 0.02 * jax.random.normal(next(keys), p.shape,
                                                   p.dtype), params)
        img1 = jax.random.normal(jax.random.key(3), (1, 4, 20))
        o1 = model.apply({"params": params}, x, jnp.array([1.0]),
                         jnp.zeros((1, 6, 24)), img1)
        o2 = model.apply({"params": params}, x, jnp.array([1.0]),
                         jnp.zeros((1, 6, 24)), img1 + 1.0)
        assert float(jnp.abs(o1 - o2).max()) > 1e-6

    def test_scan_mode(self):
        model = WanModel(**TINY_DIT, scan_blocks=True)
        x = jnp.zeros((1, 2, 8, 8, 16))
        args = (x, jnp.array([1.0]), jnp.zeros((1, 6, 24)))
        params = model.init(jax.random.key(0), *args)["params"]
        out = model.apply({"params": params}, *args)
        assert out.shape == (1, 2, 8, 8, 16)


class TestWanFlow:
    @pytest.fixture(scope="class")
    def flow(self):
        f = WanVideoFlow(**WAN_TINY, model_max_length=6)
        f.init_params(seed=0)
        return f

    def test_training_loss(self, flow):
        batch = {"video": jnp.zeros((1, 9, 32, 32, 3)),
                 "text_states": jnp.zeros((1, 6, 24))}
        loss, _ = flow.training_loss(flow.params, batch, jax.random.key(0))
        assert jnp.isfinite(loss)

    def test_inference_with_negative_prompt(self, flow, tmp_path):
        cfg = {"inference": {
            "savedir": str(tmp_path), "prompt": "a red car", "bs": 1,
            "height": 32, "width": 32, "frames": 9, "seed": 5,
            "unconditional_guidance_scale": 5.0,
        }}
        result = flow.inference(cfg)
        assert len(result["videos"]) == 1
        assert cfg["inference"]["negative_prompt"]  # default injected
