"""Tensor-parallel tests: TP specs, sharded forward parity on the 8-device
mesh, StepVideo flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from videotuna_tpu.core.mesh import MeshConfig, make_mesh
from videotuna_tpu.flows.stepvideo import StepVideoFlow
from videotuna_tpu.models.stepvideo.dit import StepVideoModel
from videotuna_tpu.parallel.tensor_parallel import apply_tp, tp_specs

TINY_DIT = dict(in_channels=8, out_channels=8, dim=32, ffn_dim=64,
                num_layers=2, heads=4, text_dim=24)

STEP_TINY = dict(
    denoiser_config={
        "target": "videotuna_tpu.models.stepvideo.StepVideoModel",
        "params": TINY_DIT,
    },
    scheduler_config={
        "target": "videotuna_tpu.schedulers.FlowMatchSchedule",
        "params": dict(num_steps=4, shift=13.0),
    },
    first_stage_config=None,
    cond_stage_config={
        "target": "videotuna_tpu.models.T5Encoder",
        "params": dict(vocab_size=30002, dim=24, heads=2, head_dim=8,
                       ff_dim=48, num_layers=1),
    },
)


@pytest.fixture(scope="module")
def model_and_params():
    model = StepVideoModel(**TINY_DIT)
    x = jnp.zeros((1, 2, 8, 8, 8))
    args = (x, jnp.array([500.0]), jnp.zeros((1, 6, 24)))
    params = model.init(jax.random.key(0), *args)["params"]
    return model, params


class TestTPSpecs:
    def test_rules_applied(self, model_and_params):
        _, params = model_and_params
        specs = tp_specs(params, tp_size=4)
        blk = specs["block_0"]
        assert blk["self_q"]["kernel"] == P(None, "tp", None)
        assert blk["self_out"]["kernel"] == P("tp", None)
        assert blk["ffn1"]["kernel"] == P(None, "tp")
        assert blk["ffn2"]["kernel"] == P("tp", None)

    def test_unshardable_falls_back(self, model_and_params):
        _, params = model_and_params
        # tp=64 cannot divide head dim 4 / heads 4 kernels → replicate
        specs = tp_specs(params, tp_size=64)
        assert specs["block_0"]["self_q"]["kernel"] == P()


class TestTPForwardParity:
    def test_sharded_matches_single(self, model_and_params, devices8):
        """TP+dp sharded forward must equal the unsharded forward."""
        model, params = model_and_params
        x = jax.random.normal(jax.random.key(1), (2, 2, 8, 8, 8))
        t = jnp.array([10.0, 500.0])
        ctx = jax.random.normal(jax.random.key(2), (2, 6, 24))
        ref = model.apply({"params": params}, x, t, ctx)

        mesh = make_mesh(MeshConfig(dp=2, tp=4), devices=devices8)
        with mesh:
            sharded = apply_tp(params, mesh)
            fwd = jax.jit(lambda p, *a: model.apply({"params": p}, *a))
            out = fwd(sharded, x, t, ctx)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)
        # at least the big kernels must actually be sharded
        qk = sharded["block_0"]["ffn1"]["kernel"]
        assert not qk.sharding.is_fully_replicated


class TestStepVideoFlow:
    def test_training_and_sampling(self):
        f = StepVideoFlow(**STEP_TINY, model_max_length=6)
        f.init_params(seed=0)
        batch = {"latents": jnp.zeros((1, 2, 8, 8, 8)),
                 "text_states": jnp.zeros((1, 6, 24))}
        loss, _ = f.training_loss(f.params, batch, jax.random.key(0))
        assert jnp.isfinite(loss)
        cond = {"y": jnp.zeros((1, 6, 24))}
        z = f.sample(f.params, cond, None, (1, 2, 8, 8, 8),
                     jax.random.key(1), cfg_scale=1.0)
        assert z.shape == (1, 2, 8, 8, 8)
