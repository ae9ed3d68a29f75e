"""CLIP vision tower + aesthetic predictor + semantic evalkit.

The CLIP vision parity gate runs against the REAL HF transformers
``CLIPVisionModelWithProjection`` (random-init tiny config) — a true
cross-framework numerical gate for the perception backbone behind VBench
semantics / aesthetic / RLHF rewards."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch


@pytest.fixture(scope="module")
def tiny_clip():
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection
    cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=128,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=28, patch_size=14, projection_dim=16,
                           hidden_act="quick_gelu")
    torch.manual_seed(0)
    return CLIPVisionModelWithProjection(cfg).eval()


def test_clip_vision_parity(tiny_clip):
    from videotuna_tpu.models.clip_vision import CLIPVisionEncoder
    from videotuna_tpu.tools.convert_weights import (clip_vision_map,
                                                     verify_tree_shapes)
    ours = CLIPVisionEncoder(dim=32, heads=4, num_layers=2, patch=14,
                             image_size=28, proj_dim=16)
    img = np.random.RandomState(0).uniform(
        -1, 1, (2, 28, 28, 3)).astype(np.float32)
    init = ours.init(jax.random.key(0), jnp.asarray(img))["params"]

    sd = {k: v.numpy() for k, v in tiny_clip.state_dict().items()}
    tree = clip_vision_map(heads=4).convert(sd, strict=True)
    assert not verify_tree_shapes(tree, init), \
        verify_tree_shapes(tree, init)[:8]

    with torch.no_grad():
        ref = tiny_clip(
            pixel_values=torch.from_numpy(
                img.transpose(0, 3, 1, 2))).image_embeds.numpy()
    out = ours.apply({"params": tree}, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_aesthetic_map_parity():
    """LAION aesthetic-MLP layout (Sequential layers.{0,2,4,6,7}) converts
    and reproduces the torch module."""
    import torch.nn as tnn
    from videotuna_tpu.models.clip_vision import AestheticPredictor
    from videotuna_tpu.tools.convert_weights import aesthetic_map

    torch.manual_seed(1)

    class MLP(tnn.Module):
        def __init__(self):
            super().__init__()
            self.layers = tnn.Sequential(
                tnn.Linear(768, 1024), tnn.Dropout(0.2),
                tnn.Linear(1024, 128), tnn.Dropout(0.2),
                tnn.Linear(128, 64), tnn.Dropout(0.1),
                tnn.Linear(64, 16), tnn.Linear(16, 1))

        def forward(self, x):
            return self.layers(x)

    m = MLP().eval()
    emb = torch.randn(3, 768)
    embn = emb / emb.norm(dim=-1, keepdim=True)
    with torch.no_grad():
        ref = m(embn).numpy()[:, 0]

    tree = aesthetic_map().convert(
        {k: v.numpy() for k, v in m.state_dict().items()}, strict=True)
    pred = AestheticPredictor()
    out = pred.apply({"params": tree}, jnp.asarray(emb.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-4)


@pytest.fixture(scope="module")
def scorer():
    from videotuna_tpu.evalkit.semantic import CLIPScorer
    from videotuna_tpu.models.clip_vision import CLIPVisionEncoder
    from videotuna_tpu.models.text_encoders import CLIPTextEncoder
    return CLIPScorer(
        vision=CLIPVisionEncoder(dim=32, heads=4, num_layers=2, patch=14,
                                 image_size=28, proj_dim=16),
        text_encoder=CLIPTextEncoder(vocab_size=512, dim=32, heads=4,
                                     num_layers=2, penultimate=False),
        text_projection=jnp.eye(32, 16))


def test_semantic_dimensions_wiring(scorer):
    from videotuna_tpu.evalkit.semantic import (SEMANTIC_DIMENSIONS,
                                                evaluate_semantics)
    video = jax.random.uniform(jax.random.key(0), (4, 32, 32, 3),
                               minval=-1, maxval=1)
    aux = {"object": "dog", "objects": ["dog", "cat"], "color": "red",
           "scene": "beach", "action": "running", "style": "oil painting"}
    out = evaluate_semantics(scorer, video, "a red dog left of a cat", aux)
    assert set(out) == set(SEMANTIC_DIMENSIONS)
    for k, v in out.items():
        assert 0.0 <= v <= 1.0, (k, v)


def test_evaluate_directory_all_dims(tmp_path, scorer):
    """evaluate_directory with info.json + scorer emits the full dimension
    set: 5 pixel/feature dims + 2 _proxy dims + 9 semantic/aesthetic."""
    from videotuna_tpu.data.video_io import save_video
    from videotuna_tpu.evalkit.runner import evaluate_directory

    rng = np.random.RandomState(0)
    video = rng.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32)
    save_video(video, str(tmp_path / "a dog-0.mp4"), fps=4)
    info = [{"prompt_en": "a dog", "video_list": ["a dog-0.mp4"],
             "auxiliary_info": {"object": "dog"}}]
    (tmp_path / "info.json").write_text(json.dumps(info))

    final = evaluate_directory(str(tmp_path), scorer=scorer)
    dims = set(final["summary"])
    # motion dims report as _proxy without RAFT/AMT weights (honest
    # labels; the faithful paths are gated on --raft / --amt)
    assert {"temporal_flickering", "motion_smoothness_proxy",
            "dynamic_degree_proxy",
            "subject_consistency_proxy", "background_consistency",
            "imaging_quality_proxy", "aesthetic_quality_proxy",
            "aesthetic_quality", "object_class", "spatial_relationship",
            "overall_consistency"} <= dims
    assert all(v is None or 0 <= v <= 1 for v in final["summary"].values())


def test_clip_rlhf_rewards_differentiable():
    from videotuna_tpu.models.clip_vision import CLIPVisionEncoder
    from videotuna_tpu.training.rlhf import (make_clip_aesthetic_reward,
                                             make_hps_reward)
    vision = CLIPVisionEncoder(dim=32, heads=4, num_layers=2, patch=14,
                               image_size=28, proj_dim=16)
    vp = vision.init(jax.random.key(0),
                     jnp.zeros((1, 28, 28, 3)))["params"]
    from videotuna_tpu.models.clip_vision import AestheticPredictor
    ap = AestheticPredictor().init(jax.random.key(1),
                                   jnp.zeros((1, 16)))["params"]
    reward = make_clip_aesthetic_reward(vp, ap, vision=vision,
                                        frame_stride=2)
    frames = jax.random.uniform(jax.random.key(2), (1, 4, 28, 28, 3),
                                minval=-1, maxval=1)
    g = jax.grad(lambda f: jnp.sum(reward(f)))(frames)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.sum(jnp.abs(g))) > 0

    temb = jnp.ones((16,)) / 4.0
    hps = make_hps_reward(vp, temb, vision=vision, frame_stride=2)
    g2 = jax.grad(lambda f: jnp.sum(hps(f)))(frames)
    assert np.isfinite(np.asarray(g2)).all()
