"""Training-loop tests: loss decreases, EMA, FSDP sharding on the 8-device
CPU mesh, checkpoint/resume."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from videotuna_tpu.core.mesh import MeshConfig, make_mesh
from videotuna_tpu.flows.opensora import OpenSoraFlow
from videotuna_tpu.parallel.sharding import fsdp_spec, shard_params
from videotuna_tpu.training.trainer import (TrainConfig, Trainer, TrainState,
                                            make_optimizer, make_train_step)
from tests.test_flow import TINY


@pytest.fixture(scope="module")
def flow():
    f = OpenSoraFlow(**TINY, ddim_steps=4, model_max_length=8)
    f.init_params(seed=0)
    return f


def tiny_batch(key, b=4):
    return {
        "video": jax.random.normal(key, (b, 4, 64, 64, 3)) * 0.1,
        "text_states": jnp.zeros((b, 8, 16)),
        "text_mask": jnp.ones((b, 8), bool),
    }


class TestTrainStep:
    def test_loss_decreases(self, flow):
        cfg = TrainConfig(learning_rate=1e-3, grad_clip=1.0)
        opt = make_optimizer(cfg)
        step = jax.jit(make_train_step(flow.training_loss, opt))
        train = {"denoiser": flow.params["denoiser"]}
        frozen = {k: v for k, v in flow.params.items() if k != "denoiser"}
        state = TrainState(step=jnp.zeros((), jnp.int32), params=train,
                           opt_state=opt.init(train))
        batch = tiny_batch(jax.random.key(0))
        losses = []
        for i in range(30):
            state, m = step(state, frozen, batch, jax.random.key(1))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.9, losses[::10]

    def test_frozen_components_unchanged(self, flow):
        cfg = TrainConfig(learning_rate=1e-2)
        opt = make_optimizer(cfg)
        step = jax.jit(make_train_step(flow.training_loss, opt))
        train = {"denoiser": flow.params["denoiser"]}
        frozen = {k: v for k, v in flow.params.items() if k != "denoiser"}
        state = TrainState(step=jnp.zeros((), jnp.int32), params=train,
                           opt_state=opt.init(train))
        vae_before = jax.tree.leaves(frozen["first_stage"])
        state, _ = step(state, frozen, tiny_batch(jax.random.key(2)),
                        jax.random.key(3))
        vae_after = jax.tree.leaves(frozen["first_stage"])
        for a, b in zip(vae_before, vae_after):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_ema_tracks(self, flow):
        cfg = TrainConfig(learning_rate=1e-3, ema_decay=0.5)
        opt = make_optimizer(cfg)
        step = jax.jit(make_train_step(flow.training_loss, opt,
                                       ema_decay=0.5))
        train = {"denoiser": flow.params["denoiser"]}
        frozen = {k: v for k, v in flow.params.items() if k != "denoiser"}
        state = TrainState(step=jnp.zeros((), jnp.int32), params=train,
                          opt_state=opt.init(train),
                          ema_params=jax.tree.map(lambda x: x, train))
        state, _ = step(state, frozen, tiny_batch(jax.random.key(4)),
                        jax.random.key(5))
        # ema must differ from both old params and new params
        p_new = jax.tree.leaves(state.params["denoiser"])
        e_new = jax.tree.leaves(state.ema_params["denoiser"])
        diffs = [float(jnp.abs(a - b).max()) for a, b in zip(p_new, e_new)]
        assert max(diffs) > 0.0


class TestSharding:
    def test_fsdp_spec_large_param(self):
        p = jnp.zeros((256, 128))
        assert fsdp_spec(p, 4) == P("fsdp", None)

    def test_fsdp_spec_small_replicated(self):
        assert fsdp_spec(jnp.zeros((32,)), 4) == P()

    def test_fsdp_train_on_mesh(self, flow, devices8):
        """Full train step under dp×fsdp mesh (2×4) on virtual devices."""
        mesh = make_mesh(MeshConfig(dp=2, fsdp=4), devices=devices8)
        cfg = TrainConfig(learning_rate=1e-3)
        opt = make_optimizer(cfg)
        step = jax.jit(make_train_step(flow.training_loss, opt))
        train = {"denoiser": flow.params["denoiser"]}
        frozen = {k: v for k, v in flow.params.items() if k != "denoiser"}
        state = TrainState(step=jnp.zeros((), jnp.int32), params=train,
                           opt_state=opt.init(train))
        state = jax.device_put(state, shard_params(state, mesh))
        frozen = jax.device_put(frozen, shard_params(frozen, mesh))
        with mesh:
            batch = tiny_batch(jax.random.key(6), b=8)
            from videotuna_tpu.parallel.sharding import shard_batch
            batch = shard_batch(batch, mesh)
            state, m = step(state, frozen, batch, jax.random.key(7))
        assert np.isfinite(float(m["loss"]))
        # params that were sharded stay sharded
        any_sharded = any(
            not s.is_fully_replicated
            for s in jax.tree.leaves(jax.tree.map(
                lambda x: x.sharding, state.params["denoiser"]),
                is_leaf=lambda s: hasattr(s, "is_fully_replicated")))
        assert any_sharded


class TestTrainerLoop:
    def test_fit_and_resume(self, flow, tmp_path):
        mesh = make_mesh(MeshConfig(dp=1), devices=jax.devices()[:1])
        cfg = TrainConfig(learning_rate=1e-3, max_steps=4, ckpt_every=2,
                          log_every=2)
        trainer = Trainer(flow, cfg, mesh, workdir=str(tmp_path))
        batches = [
            {"video": np.zeros((2, 4, 64, 64, 3), np.float32),
             "caption": ["a", "b"]},
        ] * 4
        state = trainer.fit(batches, max_steps=4)
        assert int(jax.device_get(state.step)) == 4
        assert trainer.metrics_history
        # resume picks up from the saved step
        trainer2 = Trainer(flow, cfg, mesh, workdir=str(tmp_path))
        s2 = trainer2.maybe_resume(trainer2.init_state())
        assert int(jax.device_get(s2.step)) == 4
