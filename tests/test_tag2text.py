"""Tag2Text composite: WordPiece tokenizer behaviour, tag-list loading,
and an end-to-end caption generation smoke with tiny random towers
(component numerics are parity-gated in test_swin_parity.py /
test_med_bert_parity.py)."""

import numpy as np
import pytest

from videotuna_tpu.evalkit.wordpiece import WordPieceTokenizer

VOCAB = ("[PAD] [UNK] [CLS] [SEP] [MASK] a picture of cat dog park "
         "beach sunny play ##ing ##ful the in at , . !").split()


@pytest.fixture()
def tok(tmp_path):
    path = tmp_path / "vocab.txt"
    path.write_text("\n".join(VOCAB) + "\n")
    return WordPieceTokenizer(str(path))


class TestWordPiece:
    def test_basic_encode_decode(self, tok):
        ids = tok.encode("a cat playing in the park")
        assert tok.decode(ids) == "a cat playing in the park"

    def test_wordpiece_continuation(self, tok):
        ids = tok.encode("playful")
        assert [tok.inv[i] for i in ids] == ["play", "##ful"]

    def test_punctuation_split_and_unk(self, tok):
        ids = tok.encode("cat, dog! zebra")
        toks = [tok.inv[i] for i in ids]
        assert toks == ["cat", ",", "dog", "!", "[UNK]"]

    def test_lowercase_and_accents(self, tok):
        assert tok.encode("CAT") == tok.encode("cat")
        assert tok.encode("cát") == tok.encode("cat")

    def test_blip_specials_appended(self, tok):
        assert tok.bos_id == len(VOCAB)      # [DEC]
        assert tok.enc_id == len(VOCAB) + 1  # [ENC]

    def test_call_padding_and_truncation(self, tok):
        ids, mask = tok(["a cat", "a dog in the park at the beach"],
                        max_length=6, pad_to_max=True)
        assert ids.shape == (2, 6)
        assert ids[0, 0] == tok.cls_id
        assert ids[1, -1] == tok.sep_id          # truncation keeps [SEP]
        assert mask[0].sum() < 6 and mask[1].sum() == 6


def test_load_tag_array_from_reference():
    import os
    from videotuna_tpu.evalkit.tag2text import load_tag_array
    ref = ("/root/reference/eval/vbench/third_party/tag2Text/"
           "tag_class.py")
    if not os.path.exists(ref):
        pytest.skip("reference tag list unavailable")
    tags = load_tag_array(ref)
    assert len(tags) == 3429
    assert all(isinstance(t, (str, np.str_)) for t in tags[:10])


class TestCaptionerSmoke:
    def test_generate_and_scene_score(self, tok, tmp_path):
        import jax
        import jax.numpy as jnp
        from videotuna_tpu.evalkit.med_bert import (MedBert,
                                                    MedBertConfig,
                                                    MedLMHead)
        from videotuna_tpu.evalkit.swin import SwinTransformer
        from videotuna_tpu.evalkit.tag2text import (Tag2TextCaptioner,
                                                    scene_score)

        vocab = len(tok.vocab)
        swin = SwinTransformer(img_size=32, embed_dim=8,
                               depths=(1, 1), heads=(2, 2), window=4)
        enc_w = 16  # swin out = embed_dim * 2^(stages-1)
        small = MedBertConfig(vocab_size=vocab, hidden=16, layers=1,
                              heads=2, intermediate=32, max_positions=64,
                              encoder_width=enc_w)
        dec_cfg = MedBertConfig(vocab_size=vocab, hidden=16, layers=1,
                                heads=2, intermediate=32,
                                max_positions=64, encoder_width=16)
        q2l = MedBert(small, has_embeddings=False)
        tag_enc = MedBert(small)
        dec = MedBert(dec_cfg)
        head = MedLMHead(dec_cfg)
        rng = jax.random.PRNGKey(0)
        n_tags = 5
        img = jnp.zeros((1, 32, 32, 3))
        sp = swin.init(rng, img)["params"]
        emb = swin.apply({"params": sp}, img)
        params = {
            "visual_encoder": sp,
            "vision_multi": q2l.init(rng,
                                     embeds=jnp.zeros((1, n_tags, 16)),
                                     enc=emb, mode="mlr")["params"],
            "tag_encoder": tag_enc.init(
                rng, ids=jnp.zeros((1, 40), jnp.int32), enc=emb,
                mode="multimodal")["params"],
            "text_decoder": dec.init(
                rng, ids=jnp.zeros((1, 8), jnp.int32),
                enc=jnp.zeros((1, 40, 16)), mode="multimodal",
                causal=True)["params"],
            "lm_head": head.init(rng, jnp.zeros((1, 8, 16)))["params"],
            "label_embed": np.asarray(
                jax.random.normal(rng, (n_tags, 16))),
            "fc_w": np.asarray(jax.random.normal(rng, (n_tags, 16))),
            "fc_b": np.zeros((n_tags,), np.float32),
        }
        cap = Tag2TextCaptioner(
            params, tok,
            tag_array=np.asarray(["cat", "dog", "park", "beach",
                                  "sunny"]),
            swin=swin, q2l=q2l, tag_encoder=tag_enc, decoder=dec,
            lm_head=head)
        imgs = np.random.default_rng(0).standard_normal(
            (2, 32, 32, 3)).astype(np.float32)
        caps, tags = cap.generate(imgs, max_length=12, min_length=2,
                                  return_tags=True)
        assert len(caps) == 2 and len(tags) == 2
        assert all(isinstance(c, str) for c in caps)
        # determinism
        caps2 = cap.generate(imgs, max_length=12, min_length=2)
        assert caps == caps2

        video = np.random.default_rng(1).integers(
            0, 255, (8, 32, 48, 3)).astype(np.uint8)

        class _FixedCaptioner:
            def generate(self, frames):
                return ["a cat in the park"] * frames.shape[0]

        from videotuna_tpu.evalkit import tag2text as t2t
        score = t2t.scene_score(_FixedCaptioner(), video, "park")
        assert score == 1.0
        score = t2t.scene_score(_FixedCaptioner(), video, "beach")
        assert score == 0.0
