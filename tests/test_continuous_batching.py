"""Continuous (step-level) batching exactness.

The rolling slot batch with per-sample schedule indices must reproduce the
one-shot ``scheduler.sample`` loop bit-for-bit-ish (same math, batched),
including requests that BOARD MID-FLIGHT while other slots are already
several steps in — the whole point of continuous batching.
"""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotuna_tpu.schedulers import (DDIMSchedule, DDPMSchedule,
                                      FlowMatchSchedule, cfg_denoise)
from videotuna_tpu.serving import ContinuousBatchEngine


class _ToyFlow:
    """Duck-typed flow: a fixed random linear 'denoiser' conditioned on
    (t, cond['y']); enough structure that wrong indexing/CFG shows up."""

    latent_channels = 4
    vae_spatial_ratio = 8
    vae_temporal_ratio = 1

    def __init__(self, scheduler, key=0):
        self.scheduler = scheduler
        k1, k2 = jax.random.split(jax.random.key(key))
        self.w = jax.random.normal(k1, (4, 4)) * 0.2
        self.wy = jax.random.normal(k2, (6, 4)) * 0.2
        self.params = {}

    def latent_shape(self, batch, num_frames, height, width):
        return (batch, num_frames, height // 8, width // 8, 4)

    def denoise_apply(self, params, x, t, cond):
        tt = t.astype(jnp.float32).reshape(-1, 1, 1, 1, 1) / 1000.0
        y = cond["y"].mean(axis=1)                    # (B, 6)
        bias = (y @ self.wy).reshape(-1, 1, 1, 1, 4)
        return jnp.tanh(x @ self.w) * (1.0 + 0.1 * tt) + bias


def _reference_sample(flow, cond, uncond, x_T, cfg):
    fn = cfg_denoise(
        lambda x, t, c: flow.denoise_apply({}, x, t, c), cond, uncond, cfg)
    return flow.scheduler.sample(fn, x_T.shape, jax.random.key(0), x_T=x_T)


def _mk_req(i, shape):
    kx, ky, ku = jax.random.split(jax.random.key(100 + i), 3)
    x_T = jax.random.normal(kx, shape)
    cond = {"y": jax.random.normal(ky, (1, 3, 6))}
    uncond = {"y": jax.random.normal(ku, (1, 3, 6))}
    return x_T, cond, uncond


@pytest.mark.parametrize("family", ["flow", "ddim"])
def test_staggered_arrivals_match_solo_runs(family):
    if family == "flow":
        sched = FlowMatchSchedule.create(num_steps=6, shift=3.0)
    else:
        sched = DDIMSchedule.create(DDPMSchedule.create(timesteps=50),
                                    num_steps=6, eta=0.0)
    flow = _ToyFlow(sched)
    shape1 = flow.latent_shape(1, 2, 16, 16)
    eng = ContinuousBatchEngine(flow, slots=3, frames=2, height=16,
                                width=16, cfg_scale=5.0)

    reqs = [_mk_req(i, shape1) for i in range(4)]
    refs = [_reference_sample(flow, c, u, x, 5.0) for x, c, u in reqs]

    # requests 0,1 board immediately; 2 boards after two steps; 3 boards
    # only once a slot frees up (slots=3 < 4 requests)
    got = {}
    assert eng.submit(*reqs[0]) is not None
    assert eng.submit(*reqs[1]) is not None
    eng.step(); eng.step()
    slot2 = eng.submit(*reqs[2])
    assert slot2 is not None
    slot3 = eng.submit(*reqs[3])
    assert slot3 is None                       # full → backpressure
    pending = {0: 0, 1: 1, 2: 2}               # slot → request id
    boarded = 3
    safety = 0
    while pending or boarded < 4:
        eng.step()
        for slot, z in eng.poll_completed():
            got[pending.pop(slot)] = z
        if boarded < 4 and eng.submit(*reqs[boarded]) is not None:
            # slots are LIFO-ish; find which slot we landed in
            free_slots = {0, 1, 2} - set(pending)
            pending[(free_slots - {s for s in pending}).pop()] = boarded
            boarded += 1
        safety += 1
        assert safety < 50
    assert sorted(got) == [0, 1, 2, 3]
    for i in range(4):
        np.testing.assert_allclose(np.asarray(got[i]),
                                   np.asarray(refs[i]),
                                   atol=1e-5, rtol=1e-5)


def test_inactive_slots_do_not_move():
    sched = FlowMatchSchedule.create(num_steps=4, shift=1.0)
    flow = _ToyFlow(sched)
    shape1 = flow.latent_shape(1, 2, 16, 16)
    eng = ContinuousBatchEngine(flow, slots=2, frames=2, height=16,
                                width=16, cfg_scale=3.0)
    x, c, u = _mk_req(0, shape1)
    s = eng.submit(x, c, u)
    eng.step()
    other = np.asarray(eng.x[1 - s])
    np.testing.assert_array_equal(other, np.zeros_like(other))


def test_drain_helper():
    sched = FlowMatchSchedule.create(num_steps=3, shift=1.0)
    flow = _ToyFlow(sched)
    shape1 = flow.latent_shape(1, 2, 16, 16)
    eng = ContinuousBatchEngine(flow, slots=2, frames=2, height=16,
                                width=16, cfg_scale=2.0)
    for i in range(2):
        assert eng.submit(*_mk_req(i, shape1)) is not None
    done = eng.run_to_completion(max_steps=10)
    assert len(done) == 2 and eng.n_active == 0
