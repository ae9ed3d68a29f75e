"""RLHF post-training: reward-gradient fine-tuning through the sampler.

Capability parity with the reference's VADER-style RLHF path
(/root/reference/videotuna/models/lvdm/models/rlhf_utils/reward_fn.py —
aesthetic / HPS rewards on decoded frames; rl_ddim.py — DDIM with gradients;
``RewardLVDMTrainer`` models/lvdm/models/ddpm3d.py:1187): sample a video
with the current weights, decode frames, score them with a differentiable
reward, and ascend ∂reward/∂θ — backpropagating through only the last K
denoise steps (truncated backprop keeps memory bounded; the reference
subsamples frames and steps for the same reason).

TPU design: the non-differentiated prefix of the sampler runs under
``stop_gradient`` as one scan; the trailing K differentiable steps unroll
(K is small, 1-5), all inside a single jit with rematerialization available
via jax.checkpoint on the model fn.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

Params = Any
RewardFn = Callable[[jnp.ndarray], jnp.ndarray]   # frames (B,T,H,W,3)→(B,)


# ---------------------------------------------------------------------------
# Differentiable rewards (reference reward_fn.py aesthetic/HPS analogues)
# ---------------------------------------------------------------------------

def aesthetic_proxy_reward(frames: jnp.ndarray) -> jnp.ndarray:
    """Differentiable aesthetic PROXY (contrast + saturation − clipping) —
    weight-free stand-in; the real reward is
    ``make_clip_aesthetic_reward`` below."""
    contrast = jnp.std(frames, axis=(2, 3))          # (B, T, C)
    sat = jnp.std(frames, axis=-1)                   # (B, T, H, W)
    clip_pen = jnp.mean(jnp.maximum(jnp.abs(frames) - 0.95, 0.0),
                        axis=(1, 2, 3, 4))
    return (jnp.mean(contrast, axis=(1, 2))
            + 0.5 * jnp.mean(sat, axis=(1, 2, 3))
            - 5.0 * clip_pen)


# backwards-compatible alias (pre-r2 name)
aesthetic_reward = aesthetic_proxy_reward


def brightness_reward(frames: jnp.ndarray) -> jnp.ndarray:
    return -jnp.abs(jnp.mean(frames, axis=(1, 2, 3, 4)))


def model_reward(apply_fn: Callable, params: Any,
                 frame_stride: int = 4) -> RewardFn:
    """Wrap a learned per-image scorer into a video reward (frame
    subsampling as in the reference's decode_first_stage subsets)."""
    def fn(frames: jnp.ndarray) -> jnp.ndarray:
        sub = frames[:, ::frame_stride]
        b, t = sub.shape[:2]
        flat = sub.reshape(b * t, *sub.shape[2:])
        scores = apply_fn(params, flat)
        return jnp.mean(scores.reshape(b, t), axis=1)
    return fn


def make_clip_aesthetic_reward(vision_params: Any, aesthetic_params: Any,
                               vision=None,
                               frame_stride: int = 4) -> RewardFn:
    """The reference's actual aesthetic reward (reward_fn.py:793 —
    LAION MLP over CLIP ViT-L/14 embeddings), fully differentiable
    through the JAX CLIP tower. Params come from
    ``tools/convert_weights.clip_vision_map`` / ``aesthetic_map``."""
    from videotuna_tpu.models.clip_vision import (AestheticPredictor,
                                                  CLIPVisionEncoder,
                                                  preprocess_frames)
    vision = vision or CLIPVisionEncoder()
    pred = AestheticPredictor()

    def score_images(_, images):
        x = preprocess_frames(images, vision.image_size)
        emb = vision.apply({"params": vision_params}, x)
        return pred.apply({"params": aesthetic_params}, emb)

    return model_reward(score_images, None, frame_stride)


def make_hps_reward(vision_params: Any, text_embed: jnp.ndarray,
                    vision=None, frame_stride: int = 4) -> RewardFn:
    """HPS-style reward: CLIP image↔prompt alignment (HPSv2 is a
    fine-tuned CLIP — load its vision tower through the same conversion
    map). ``text_embed``: (D,) L2-normalized prompt embedding."""
    from videotuna_tpu.models.clip_vision import (CLIPVisionEncoder,
                                                  preprocess_frames)
    vision = vision or CLIPVisionEncoder()

    def score_images(_, images):
        x = preprocess_frames(images, vision.image_size)
        emb = vision.apply({"params": vision_params}, x)
        emb = emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)
        return emb @ text_embed

    return model_reward(score_images, None, frame_stride)


REWARD_REGISTRY: Dict[str, RewardFn] = {
    "aesthetic_proxy": aesthetic_proxy_reward,
    "aesthetic": aesthetic_proxy_reward,   # swapped for the CLIP reward
    "brightness": brightness_reward,       # when weights are provided
}


# ---------------------------------------------------------------------------
# Truncated backprop sampling + reward step
# ---------------------------------------------------------------------------

def sample_with_grad_tail(flow, params: Params, cond, shape,
                          key: jax.Array, backprop_steps: int = 2,
                          cfg_scale: float = 1.0) -> jnp.ndarray:
    """DDIM/flow sampling where only the last ``backprop_steps`` steps carry
    gradients w.r.t. params (VADER truncation; reference rl_ddim.py)."""
    sched = flow.scheduler
    n = sched.num_steps
    k = min(backprop_steps, n)

    from videotuna_tpu.schedulers import cfg_denoise
    model_fn = lambda x, t, c: flow.denoise_apply(params, x, t, c)
    denoise = cfg_denoise(model_fn, cond, None, cfg_scale)

    key, k0 = jax.random.split(key)
    x = jax.random.normal(k0, shape)

    # prefix: no gradients
    if n - k > 0:
        idxs = jnp.arange(n - 1, k - 1, -1)
        keys = jax.random.split(key, n - k)

        def body(xc, inp):
            i, kk = inp
            return _step(sched, denoise, xc, i, kk), None

        x, _ = jax.lax.scan(
            lambda c, i: body(jax.lax.stop_gradient(c), i), x, (idxs, keys))
        x = jax.lax.stop_gradient(x)

    # differentiable tail (unrolled, K small)
    tail_keys = jax.random.split(jax.random.fold_in(key, 7), k)
    for j in range(k):
        i = k - 1 - j
        x = _step(sched, denoise, x, jnp.asarray(i), tail_keys[j])
    return x


def _step(sched, denoise, x, i, key):
    """One sampler step for DDIM- or flow-match-style schedules."""
    from videotuna_tpu.schedulers import FlowMatchSchedule
    if isinstance(sched, FlowMatchSchedule):
        t = jnp.full((x.shape[0],), sched.timesteps[i], jnp.float32)
        v = denoise(x, t)
        return sched.step(x, v, i)
    return sched.step(denoise, x, i, key)


def make_reward_step(flow, reward_fn: RewardFn,
                     optimizer: optax.GradientTransformation,
                     shape, backprop_steps: int = 2,
                     decode_frames: bool = True,
                     cfg_scale: float = 1.0):
    """Build the jittable RLHF update: (params, opt_state, cond, key) →
    (params, opt_state, metrics). Maximizes reward (loss = −reward)."""

    def loss_fn(train_params, frozen, cond, key):
        params = {**frozen, **train_params}
        z = sample_with_grad_tail(flow, params, cond, shape, key,
                                  backprop_steps, cfg_scale)
        frames = flow.decode_latents(params, z) if decode_frames else z
        reward = reward_fn(frames)
        return -jnp.mean(reward), {"reward": jnp.mean(reward)}

    def step(train_params, frozen, opt_state, cond, key):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            train_params, frozen, cond, key)
        updates, opt_state = optimizer.update(grads, opt_state,
                                              train_params)
        train_params = optax.apply_updates(train_params, updates)
        metrics = {**aux, "loss": loss,
                   "grad_norm": optax.global_norm(grads)}
        return train_params, opt_state, metrics

    return step
