"""LLaVA-style captioner: LM-head parity vs transformers + greedy decode.

``test_llama_lm_head_parity`` is a REAL cross-framework gate: a tiny
random-init HF ``LlamaForCausalLM`` is converted through ``llama_map`` and
must reproduce its logits."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from videotuna_tpu.models.clip_vision import CLIPVisionEncoder
from videotuna_tpu.models.text_encoders import LlamaTextEncoder
from videotuna_tpu.tools.captioner import (LlavaCaptioner, LlavaProjector,
                                           caption_directory)


def test_llama_lm_head_parity():
    from transformers import LlamaConfig, LlamaForCausalLM
    from videotuna_tpu.tools.convert_weights import llama_map
    cfg = LlamaConfig(vocab_size=128, hidden_size=32,
                      intermediate_size=64, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      tie_word_embeddings=False,
                      rms_norm_eps=1e-5)   # LLaMA-2/vicuna value (ours)
    torch.manual_seed(0)
    ref = LlamaForCausalLM(cfg).eval()
    ids = torch.randint(0, 128, (1, 6))
    with torch.no_grad():
        logits_ref = ref(ids).logits.numpy()

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    tree = llama_map(heads=4, kv_heads=2).convert(sd, strict=True)
    ours = LlamaTextEncoder(vocab_size=128, dim=32, heads=4, kv_heads=2,
                            ff_dim=64, num_layers=2, lm_head=True)
    out = ours.apply({"params": tree}, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(out), logits_ref, atol=2e-4,
                               rtol=1e-3)


@pytest.fixture(scope="module")
def tiny_captioner():
    vision = CLIPVisionEncoder(dim=32, heads=4, num_layers=2, patch=14,
                               image_size=28, proj_dim=16,
                               feature_layer=-2)
    vp = vision.init(jax.random.key(0), jnp.zeros((1, 28, 28, 3)),
                     return_states=True)["params"]
    lm = LlamaTextEncoder(vocab_size=64, dim=32, heads=4, num_layers=2,
                          lm_head=True)
    lp = lm.init(jax.random.key(1), jnp.zeros((1, 4), jnp.int32))["params"]
    proj = LlavaProjector(out_dim=32)
    pp = proj.init(jax.random.key(2), jnp.zeros((1, 4, 32)))["params"]
    return LlavaCaptioner(vision, vp, proj, pp, lm, lp, eos_token_id=2)


def test_greedy_caption_deterministic(tiny_captioner):
    frames = jax.random.uniform(jax.random.key(3), (2, 28, 28, 3),
                                minval=-1, maxval=1)
    ids1 = tiny_captioner.caption(frames, [5, 6], max_new_tokens=6)
    ids2 = tiny_captioner.caption(frames, [5, 6], max_new_tokens=6)
    np.testing.assert_array_equal(ids1, ids2)
    assert ids1.ndim == 1 and len(ids1) <= 6
    assert (ids1 != 2).all()          # eos trimmed


def test_caption_prefix_matters(tiny_captioner):
    f1 = jnp.full((1, 28, 28, 3), -0.5)
    f2 = jnp.full((1, 28, 28, 3), 0.5)
    c1 = tiny_captioner.caption(f1, [5], max_new_tokens=5)
    c2 = tiny_captioner.caption(f2, [5], max_new_tokens=5)
    # different visual prefixes should (generically) change the caption
    assert c1.shape != c2.shape or (np.asarray(c1) != np.asarray(c2)).any()


def test_caption_directory(tmp_path, tiny_captioner):
    from videotuna_tpu.data.video_io import save_video
    rng = np.random.RandomState(0)
    for i in range(2):
        save_video(rng.uniform(-1, 1, (2, 28, 28, 3)).astype(np.float32),
                   str(tmp_path / f"v{i}.mp4"), fps=2)
    out_csv = str(tmp_path / "captions.csv")
    n = caption_directory(tiny_captioner, str(tmp_path), out_csv,
                          prompt_ids=[5], num_frames=2)
    assert n == 2
    import csv
    with open(out_csv) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["path", "caption"] and len(rows) == 3
