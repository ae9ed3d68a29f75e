"""RLHF tests: truncated-backprop sampling gradients + reward ascent."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotuna_tpu.flows.opensora import OpenSoraFlow
from videotuna_tpu.training.rlhf import (aesthetic_reward, brightness_reward,
                                         make_reward_step,
                                         sample_with_grad_tail)
from videotuna_tpu.training.trainer import TrainConfig, make_optimizer
from tests.test_flow import TINY


@pytest.fixture(scope="module")
def flow():
    f = OpenSoraFlow(**TINY, ddim_steps=4, model_max_length=8)
    f.init_params(seed=0)
    return f


class TestRewards:
    def test_aesthetic_prefers_contrast(self):
        flat = jnp.zeros((1, 4, 16, 16, 3))
        contrasty = jax.random.uniform(jax.random.key(0),
                                       (1, 4, 16, 16, 3),
                                       minval=-0.8, maxval=0.8)
        assert float(aesthetic_reward(contrasty)[0]) > \
            float(aesthetic_reward(flat)[0])

    def test_brightness_peak_at_zero_mean(self):
        dark = -jnp.ones((1, 2, 8, 8, 3))
        mid = jnp.zeros((1, 2, 8, 8, 3))
        assert float(brightness_reward(mid)[0]) > \
            float(brightness_reward(dark)[0])


class TestTruncatedBackprop:
    def test_gradients_flow_only_through_tail(self, flow):
        cond = {"y": jnp.zeros((1, 8, 16)), "mask": jnp.ones((1, 8), bool)}
        shape = (1, 2, 8, 8, 4)

        def loss(dparams):
            params = {**flow.params, "denoiser": dparams}
            z = sample_with_grad_tail(flow, params, cond, shape,
                                      jax.random.key(0), backprop_steps=2)
            return jnp.sum(z ** 2)

        g = jax.grad(loss)(flow.params["denoiser"])
        norms = [float(jnp.linalg.norm(x)) for x in jax.tree.leaves(g)]
        assert max(norms) > 0.0  # gradients reach the model

    def test_reward_ascends(self, flow):
        cond = {"y": jnp.zeros((1, 8, 16)), "mask": jnp.ones((1, 8), bool)}
        shape = (1, 2, 8, 8, 4)
        opt = make_optimizer(TrainConfig(learning_rate=5e-3))
        step = jax.jit(make_reward_step(
            flow, brightness_reward, opt, shape, backprop_steps=2,
            decode_frames=False))
        train = {"denoiser": flow.params["denoiser"]}
        frozen = {k: v for k, v in flow.params.items() if k != "denoiser"}
        opt_state = opt.init(train)
        rewards = []
        for i in range(10):
            train, opt_state, m = step(train, frozen, opt_state, cond,
                                       jax.random.key(3))
            rewards.append(float(m["reward"]))
        # random init already sits near the brightness optimum, so the first
        # update perturbs away; optimization must then climb back up
        assert rewards[-1] > rewards[1], rewards
