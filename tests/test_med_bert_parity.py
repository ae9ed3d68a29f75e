"""med-BERT (BLIP mixture encoder-decoder) conversion parity vs the
imported reference torch module
(/root/reference/eval/vbench/third_party/tag2Text/med.py), across all
three layer modes (text / multimodal / mlr) and the causal LM decoder.
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

MED_FILE = Path("/root/reference/eval/vbench/third_party/tag2Text/med.py")

pytestmark = pytest.mark.skipif(not MED_FILE.exists(),
                                reason="reference tag2Text unavailable")


@pytest.fixture(scope="module")
def ref_med():
    # newer transformers moved these helpers to pytorch_utils; re-expose
    # them where the reference expects them
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu
    for name in ("apply_chunking_to_forward",
                 "find_pruneable_heads_and_indices",
                 "prune_linear_layer"):
        if not hasattr(mu, name):
            setattr(mu, name, getattr(pu, name))
    spec = importlib.util.spec_from_file_location("ref_med", MED_FILE)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_med"] = mod
    spec.loader.exec_module(mod)
    return mod


def _config(vocab=50, hidden=48, layers=2, heads=4, inter=96,
            encoder_width=32):
    from transformers.models.bert.configuration_bert import BertConfig
    cfg = BertConfig(vocab_size=vocab, hidden_size=hidden,
                     num_hidden_layers=layers, num_attention_heads=heads,
                     intermediate_size=inter, max_position_embeddings=64,
                     type_vocab_size=2, layer_norm_eps=1e-12,
                     hidden_act="gelu", hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    cfg.encoder_width = encoder_width
    cfg.add_cross_attention = True
    return cfg


def _my_cfg():
    from videotuna_tpu.evalkit.med_bert import MedBertConfig
    return MedBertConfig(vocab_size=50, hidden=48, layers=2, heads=4,
                         intermediate=96, max_positions=64,
                         encoder_width=32)


def _randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return model.eval()


def _convert(sd, **kw):
    from videotuna_tpu.evalkit.med_bert import med_bert_map
    sd = {k: np.asarray(v) for k, v in sd.items()
          if "position_ids" not in k and k != "cls.predictions.bias"}
    return med_bert_map(**kw).convert(sd, strict=True)


def _rel(got, want):
    return np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-8)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 50, (2, 9)).astype(np.int64)
    mask = np.ones((2, 9), np.int64)
    mask[1, 6:] = 0
    enc = rng.standard_normal((2, 5, 32)).astype(np.float32)
    return ids, mask, enc


def test_text_and_multimodal_parity(ref_med, data):
    from videotuna_tpu.evalkit.med_bert import MedBert
    ids, mask, enc = data
    ref = _randomize(ref_med.BertModel(_config(),
                                       add_pooling_layer=False), 0)
    params = _convert(ref.state_dict(), layers=2)
    model = MedBert(_my_cfg())
    for mode in ("text", "multimodal"):
        kw = {}
        if mode == "multimodal":
            kw = dict(encoder_hidden_states=torch.from_numpy(enc),
                      encoder_attention_mask=torch.ones(2, 5).long())
        with torch.no_grad():
            want = ref(torch.from_numpy(ids),
                       attention_mask=torch.from_numpy(mask),
                       return_dict=True, mode=mode,
                       **kw).last_hidden_state.numpy()
        got = np.asarray(model.apply(
            {"params": params}, ids=ids, mask=mask,
            enc=enc if mode == "multimodal" else None, mode=mode))
        assert _rel(got, want) < 5e-3, mode


def test_mlr_mode_parity(ref_med, data):
    """The Tag2Text tag-head path: cross-attention only, no embeddings,
    query stream fed via encoder_embeds."""
    from videotuna_tpu.evalkit.med_bert import MedBert
    _, _, enc = data
    rng = np.random.default_rng(1)
    label_embed = rng.standard_normal((2, 7, 48)).astype(np.float32)
    ref = _randomize(ref_med.BertModel(_config(),
                                       add_pooling_layer=False), 1)
    params = _convert(ref.state_dict(), layers=2)
    with torch.no_grad():
        want = ref(encoder_embeds=torch.from_numpy(label_embed),
                   encoder_hidden_states=torch.from_numpy(enc),
                   encoder_attention_mask=torch.ones(2, 5).long(),
                   return_dict=False, mode="mlr")[0].numpy()
    got = np.asarray(MedBert(_my_cfg()).apply(
        {"params": params}, embeds=label_embed, enc=enc, mode="mlr"))
    assert _rel(got, want) < 5e-3


def test_causal_lm_decoder_parity(ref_med, data):
    from videotuna_tpu.evalkit.med_bert import (MedBert, MedLMHead)
    ids, mask, enc = data
    ref = _randomize(ref_med.BertLMHeadModel(_config()), 2)
    sd = ref.state_dict()
    params = _convert(sd, layers=2, prefix=r"bert\.", lm_head=True)
    with torch.no_grad():
        want = ref(torch.from_numpy(ids),
                   attention_mask=torch.from_numpy(mask),
                   encoder_hidden_states=torch.from_numpy(enc),
                   encoder_attention_mask=torch.ones(2, 5).long(),
                   return_dict=True, is_decoder=True,
                   mode="multimodal").logits.numpy()
    hidden = MedBert(_my_cfg()).apply(
        {"params": {k: v for k, v in params.items()
                    if k != "lm_head"}},
        ids=ids, mask=mask, enc=enc, mode="multimodal", causal=True)
    got = np.asarray(MedLMHead(_my_cfg()).apply(
        {"params": params["lm_head"]}, hidden))
    assert _rel(got, want) < 5e-3
