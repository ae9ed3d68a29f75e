"""The sharding-rule matrix (SURVEY.md hard part #5): ONE mesh serving
fsdp × sp simultaneously for a training step — params FSDP-sharded while
long attention runs sequence-parallel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotuna_tpu.core.mesh import MeshConfig, make_mesh
from videotuna_tpu.kernels.attention import sequence_parallel
from videotuna_tpu.parallel.sharding import shard_batch, shard_params
from videotuna_tpu.training.trainer import (TrainConfig, TrainState,
                                            make_optimizer, make_train_step)
from videotuna_tpu.flows.wan import WanVideoFlow
from tests.test_wan import WAN_TINY


class TestJointFsdpSp:
    def test_train_step_fsdp_x_sp(self, devices8):
        """dp1×fsdp2×sp4: loss finite, params stay sharded, attention inside
        the loss routed through ulysses SP."""
        flow = WanVideoFlow(**WAN_TINY, model_max_length=6)
        flow.init_params(seed=0)
        mesh = make_mesh(MeshConfig(fsdp=2, sp=4), devices=devices8)

        cfg = TrainConfig(learning_rate=1e-3)
        opt = make_optimizer(cfg)
        step = jax.jit(make_train_step(flow.training_loss, opt))
        train = {"denoiser": flow.params["denoiser"]}
        frozen = {k: v for k, v in flow.params.items() if k != "denoiser"}
        state = TrainState(step=jnp.zeros((), jnp.int32), params=train,
                           opt_state=opt.init(train))
        state = jax.device_put(state, shard_params(state, mesh, min_size=1))
        frozen = jax.device_put(frozen, shard_params(frozen, mesh,
                                                     min_size=1))
        # latents: 8×16×16 grid → 8·8·8 = 512 tokens (divisible by sp=4)
        batch = {
            "latents": jax.random.normal(jax.random.key(0),
                                         (2, 8, 16, 16, 16)) * 0.1,
            "text_states": jnp.zeros((2, 6, 24)),
        }
        with mesh, sequence_parallel(mesh, ulysses_axis="sp",
                                     batch_axes=("dp", "fsdp"),
                                     min_seq=512):
            batch = shard_batch(batch, mesh)
            state, metrics = step(state, frozen, batch, jax.random.key(1))
        assert np.isfinite(float(metrics["loss"]))
        shardings = jax.tree.leaves(jax.tree.map(
            lambda x: x.sharding, state.params),
            is_leaf=lambda s: hasattr(s, "is_fully_replicated"))
        assert any(not s.is_fully_replicated for s in shardings)
