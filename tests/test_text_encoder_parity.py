"""Text-encoder numerical parity vs the actual HF transformers torch models.

The reference loads exactly these checkpoints (T5: opensora t5.py / wan
modules/t5.py:456; CLIP: lvdm condition.py FrozenOpenCLIPEmbedder /
hyvideo CLIP; LLaMA: hyvideo text_encoder/__init__.py:610), so parity with
random-init transformers modules proves converted real checkpoints
reproduce reference encoder outputs.
"""

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _assert_close(a, b, atol=2e-4):
    np.testing.assert_allclose(np.asarray(a), b.detach().numpy(),
                               atol=atol, rtol=1e-3)


def test_t5_encoder_parity():
    from transformers import T5Config, T5EncoderModel

    from videotuna_tpu.models.text_encoders import T5Encoder
    from videotuna_tpu.tools.convert_weights import t5_map, verify_tree_shapes

    torch.manual_seed(0)
    cfg = T5Config(vocab_size=100, d_model=32, d_kv=8, d_ff=64,
                   num_layers=2, num_heads=4,
                   relative_attention_num_buckets=8,
                   relative_attention_max_distance=16,
                   feed_forward_proj="gated-gelu")
    ref = T5EncoderModel(cfg).eval()

    ids = torch.randint(0, 100, (2, 11))
    mask = torch.ones(2, 11, dtype=torch.long)
    with torch.no_grad():
        out_ref = ref(input_ids=ids,
                      attention_mask=mask).last_hidden_state

    ours = T5Encoder(vocab_size=100, dim=32, heads=4, head_dim=8, ff_dim=64,
                     num_layers=2, rel_buckets=8, rel_max_distance=16)
    init = ours.init(jax.random.key(0), np.asarray(ids.numpy()),
                     np.ones((2, 11), bool))["params"]
    tree = t5_map(heads=4).convert(
        {k: v.numpy() for k, v in ref.state_dict().items()}, strict=True)
    assert not verify_tree_shapes(tree, init)
    out = ours.apply({"params": tree}, np.asarray(ids.numpy()),
                     np.ones((2, 11), bool))
    _assert_close(out, out_ref)


def test_clip_text_encoder_parity():
    from transformers import CLIPTextConfig, CLIPTextModel

    from videotuna_tpu.models.text_encoders import CLIPTextEncoder
    from videotuna_tpu.tools.convert_weights import (
        clip_text_map, verify_tree_shapes)

    torch.manual_seed(1)
    cfg = CLIPTextConfig(vocab_size=100, hidden_size=32,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4,
                         max_position_embeddings=77,
                         hidden_act="quick_gelu")
    ref = CLIPTextModel(cfg).eval()

    ids = torch.randint(0, 100, (2, 9))
    with torch.no_grad():
        out_ref = ref(input_ids=ids).last_hidden_state

    ours = CLIPTextEncoder(vocab_size=100, dim=32, heads=4, num_layers=2,
                           max_len=77, penultimate=False)
    init = ours.init(jax.random.key(0), np.asarray(ids.numpy()))["params"]
    sd = {k: v.numpy() for k, v in ref.state_dict().items()
          if "position_ids" not in k}
    tree = clip_text_map(heads=4).convert(sd, strict=True)
    assert not verify_tree_shapes(tree, init)
    out = ours.apply({"params": tree}, np.asarray(ids.numpy()))
    _assert_close(out, out_ref)


def test_llama_encoder_parity():
    from transformers import LlamaConfig, LlamaModel

    from videotuna_tpu.models.text_encoders import LlamaTextEncoder
    from videotuna_tpu.tools.convert_weights import (
        llama_map, verify_tree_shapes)

    torch.manual_seed(2)
    cfg = LlamaConfig(vocab_size=100, hidden_size=32,
                      intermediate_size=64, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      rms_norm_eps=1e-5, rope_theta=10000.0,
                      attention_bias=False)
    ref = LlamaModel(cfg).eval()

    ids = torch.randint(0, 100, (2, 7))
    with torch.no_grad():
        out_ref = ref(input_ids=ids).last_hidden_state

    ours = LlamaTextEncoder(vocab_size=100, dim=32, heads=4, kv_heads=2,
                            ff_dim=64, num_layers=2)
    init = ours.init(jax.random.key(0), np.asarray(ids.numpy()))["params"]
    sd = {k: v.numpy() for k, v in ref.state_dict().items()
          if "rotary_emb" not in k}
    tree = llama_map(heads=4, kv_heads=2).convert(sd, strict=True)
    assert not verify_tree_shapes(tree, init)
    out = ours.apply({"params": tree}, np.asarray(ids.numpy()))
    _assert_close(out, out_ref)
