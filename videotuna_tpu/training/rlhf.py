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

from typing import Any, Callable, Dict, Optional

import flax.linen as nn
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


class ScoreMLP(nn.Module):
    """The reference reward head shared by the weather and compression
    scorers (rlhf_utils/weather_scorer.py:51, compression_scorer.py:102):
    768→1024→128→64→16→1 + sigmoid over an L2-normalized CLIP embedding
    (dropout layers are eval-mode no-ops)."""
    dims: tuple = (1024, 128, 64, 16, 1)

    @nn.compact
    def __call__(self, emb: jnp.ndarray) -> jnp.ndarray:
        x = emb
        for i, d in enumerate(self.dims):
            x = nn.Dense(d, name=f"fc{i}")(x)
        return jax.nn.sigmoid(x)[..., 0]


def score_mlp_map(sd: Dict[str, Any]) -> Dict[str, Any]:
    """torch ``score_generator.layers`` state dict → ScoreMLP params.
    The torch Sequential indices skip the dropout/sigmoid modules:
    Linear layers sit at 0, 2, 4, 6, 7."""
    import numpy as np
    idxs = [0, 2, 4, 6, 7]
    out = {}
    for i, j in enumerate(idxs):
        w = np.asarray(sd[f"layers.{j}.weight"])
        b = np.asarray(sd[f"layers.{j}.bias"])
        out[f"fc{i}"] = {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)}
    return out


def _clip_embed(vision, vision_params, images, normalize=True):
    from videotuna_tpu.models.clip_vision import preprocess_frames
    x = preprocess_frames(images, vision.image_size)
    emb = vision.apply({"params": vision_params}, x)
    if normalize:
        emb = emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)
    return emb


def make_pickscore_reward(vision_params: Any, text_embed: jnp.ndarray,
                          logit_scale: float = 100.0, vision=None,
                          frame_stride: int = 4) -> RewardFn:
    """PickScore reward (reference reward_fn.py:473 pick_score_loss_fn):
    a CLIP-H fine-tune scoring text↔image alignment; the reference loss
    is |1 − score/100| with score = logit_scale·(text·image). We return
    the NEGATED loss so the reward step (maximizing) matches. PickScore's
    vision tower loads through the standard CLIP conversion map (ViT-H/14
    dims: dim=1280, 32 layers, proj 1024); ``text_embed``: (D,)
    L2-normalized prompt embedding from its text tower."""
    from videotuna_tpu.models.clip_vision import CLIPVisionEncoder
    vision = vision or CLIPVisionEncoder(dim=1280, heads=16, num_layers=32,
                                         proj_dim=1024)

    def score_images(_, images):
        emb = _clip_embed(vision, vision_params, images)
        s = logit_scale * (emb @ text_embed)
        return -jnp.abs(1.0 - s / 100.0)

    return model_reward(score_images, None, frame_stride)


def make_weather_reward(vision_params: Any, mlp_params: Any,
                        target: float = 1.0, grad_scale: float = 1.0,
                        vision=None, frame_stride: int = 4) -> RewardFn:
    """Weather reward (reference reward_fn.py:554 weather_loss_fn):
    CLIP ViT-L/14 embedding → ScoreMLP (rainy/snowy head weights via
    ``score_mlp_map``); reference loss |r − target|·grad_scale, returned
    negated (reward-maximization convention)."""
    from videotuna_tpu.models.clip_vision import CLIPVisionEncoder
    vision = vision or CLIPVisionEncoder()
    head = ScoreMLP()

    def score_images(_, images):
        emb = _clip_embed(vision, vision_params, images)
        r = head.apply({"params": mlp_params}, emb)
        return -grad_scale * jnp.abs(r - target)

    return model_reward(score_images, None, frame_stride)


def make_compression_reward(vision_params: Any, mlp_params: Any,
                            target: Optional[float] = None,
                            grad_scale: float = 1.0, vision=None,
                            frame_stride: int = 4) -> RewardFn:
    """JPEG-compressibility reward (reference reward_fn.py:738
    compression_loss_fn — same CLIP+ScoreMLP shape as weather, trained
    to predict compressed file size); loss r (or |r − target|) scaled,
    negated here."""
    from videotuna_tpu.models.clip_vision import CLIPVisionEncoder
    vision = vision or CLIPVisionEncoder()
    head = ScoreMLP()

    def score_images(_, images):
        emb = _clip_embed(vision, vision_params, images)
        r = head.apply({"params": mlp_params}, emb)
        loss = r if target is None else jnp.abs(r - target)
        return -grad_scale * loss

    return model_reward(score_images, None, frame_stride)


def make_object_removal_reward(heatmap_fn: Callable,
                               vision_params: Any,
                               target_text_embed: jnp.ndarray,
                               vision=None,
                               frame_stride: int = 4) -> RewardFn:
    """Object-removal reward (reference reward_fn.py:594
    objectDetection_loss_fn: minimize the detector's score for the
    target object). TPU-differentiable redesign: the reference backprops
    through grounding-dino box scores whose NMS/thresholding is
    host-side; here presence = max objectness of the GRiT CenterNet
    agnostic heatmap (``heatmap_fn(images) → (B, H', W')`` logits,
    differentiable under jit) × CLIP text-image similarity to the target
    ("is the salient object the target?"). Reward = −presence.

    ``heatmap_fn`` is typically
    ``lambda im: grit.agn_heatmap(grit_params, im)`` from
    evalkit/grit.py's ViTDet→FPN→CenterNetHead stack."""
    from videotuna_tpu.models.clip_vision import CLIPVisionEncoder
    vision = vision or CLIPVisionEncoder()

    def score_images(_, images):
        objness = jax.nn.sigmoid(heatmap_fn(images))       # (B, h, w)
        peak = jnp.max(objness.reshape(objness.shape[0], -1), axis=-1)
        emb = _clip_embed(vision, vision_params, images)
        # cosine → [0, 1] smoothly (a hard clip would zero the gradient
        # exactly where the optimizer needs to push similarity down)
        sim = 0.5 * (1.0 + emb @ target_text_embed)
        return -(peak * sim)

    return model_reward(score_images, None, frame_stride)


def make_actpred_reward(viclip_vision_params: Any,
                        action_text_embed: jnp.ndarray,
                        viclip_vision=None,
                        num_frames: int = 8) -> RewardFn:
    """Action-prediction reward (reference reward_fn.py:769
    actpred_loss_fn: VideoMAE classifier cross-entropy on the target
    action). TPU redesign: contrastive action score through the
    parity-gated ViCLIP video tower (evalkit/viclip.py) — reward =
    cos(video embedding, action label text embedding). Differentiable
    end-to-end (resize via jax.image.resize)."""
    from videotuna_tpu.evalkit.viclip import ViCLIPVision
    enc = viclip_vision or ViCLIPVision()

    def fn(frames: jnp.ndarray) -> jnp.ndarray:
        b, t = frames.shape[:2]
        idx = jnp.linspace(0, t - 1, num_frames).astype(jnp.int32)
        sub = frames[:, idx]                               # (B, 8, H, W, 3)
        size = 224
        sub = jax.image.resize(sub, (b, num_frames, size, size, 3),
                               method="bilinear")
        mean = jnp.array([0.48145466, 0.4578275, 0.40821073])
        std = jnp.array([0.26862954, 0.26130258, 0.27577711])
        sub = ((sub + 1.0) * 0.5 - mean) / std
        emb = enc.apply({"params": viclip_vision_params}, sub)
        emb = emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)
        return emb @ action_text_embed

    return fn


REWARD_REGISTRY: Dict[str, RewardFn] = {
    "aesthetic_proxy": aesthetic_proxy_reward,
    "aesthetic": aesthetic_proxy_reward,   # swapped for the CLIP reward
    "brightness": brightness_reward,       # when weights are provided
}

# Weighted reward factories, name-compatible with the reference's
# --reward_fn choices (rlhf_utils/reward_fn.py:253-789). Each returns a
# RewardFn once its (converted) weights are supplied.
REWARD_FACTORIES: Dict[str, Callable[..., RewardFn]] = {
    "aesthetic": make_clip_aesthetic_reward,
    "hps": make_hps_reward,
    "pick_score": make_pickscore_reward,
    "weather": make_weather_reward,
    "compression": make_compression_reward,
    "objectDetection": make_object_removal_reward,
    "actpred": make_actpred_reward,
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
