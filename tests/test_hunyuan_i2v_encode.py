"""HunyuanVideo i2v LLaVA prompt-encode protocol: the crop/splice must
match a verbatim torch port of the reference indexing
(hyvideo_i2v/text_encoder/__init__.py:395-510), and the full encode path
must run end-to-end on a tiny LLaMA."""

import numpy as np
import pytest

from videotuna_tpu.models.text_encoders import (HUNYUAN_I2V_INTERLEAVE,
                                                HUNYUAN_PROMPT_TEMPLATES,
                                                hunyuan_i2v_crop)

torch = pytest.importorskip("torch")

TEMPLATE = HUNYUAN_PROMPT_TEMPLATES["dit-llm-encode-video-i2v"]


def reference_crop_torch(last_hidden_state, attention_mask, input_ids,
                         template, image_embed_interleave):
    """Verbatim port of the reference's video-i2v crop logic
    (__init__.py:395-510) for the parity gate."""
    crop_start = template["crop_start"]
    text_crop_start = crop_start - 1 + template.get("image_emb_len", 576)
    image_crop_start = template.get("image_emb_start", 5)
    image_crop_end = template.get("image_emb_end", 581)
    batch_indices, last_double_return_token_indices = torch.where(
        input_ids == template.get("double_return_token_id", 271))
    if last_double_return_token_indices.shape[0] == 3:
        last_double_return_token_indices = torch.cat((
            last_double_return_token_indices,
            torch.tensor([input_ids.shape[-1]])))
    last_double_return_token_indices = \
        last_double_return_token_indices.reshape(
            input_ids.shape[0], -1)[:, -1]
    assistant_crop_start = (last_double_return_token_indices - 1
                            + template.get("image_emb_len", 576) - 4)
    assistant_crop_end = (last_double_return_token_indices - 1
                          + template.get("image_emb_len", 576))
    attention_mask_assistant_crop_start = \
        last_double_return_token_indices - 4
    attention_mask_assistant_crop_end = last_double_return_token_indices

    text_last_hidden_state = []
    text_attention_mask = []
    image_last_hidden_state = []
    image_attention_mask = []
    for i in range(input_ids.shape[0]):
        text_last_hidden_state.append(torch.cat([
            last_hidden_state[i,
                              text_crop_start:
                              assistant_crop_start[i].item()],
            last_hidden_state[i, assistant_crop_end[i].item():]]))
        text_attention_mask.append(torch.cat([
            attention_mask[i, crop_start:
                           attention_mask_assistant_crop_start[i].item()],
            attention_mask[i,
                           attention_mask_assistant_crop_end[i].item():]]))
        image_last_hidden_state.append(
            last_hidden_state[i, image_crop_start:image_crop_end])
        image_attention_mask.append(
            torch.ones(image_last_hidden_state[-1].shape[0])
            .to(attention_mask.dtype))
    text_last_hidden_state = torch.stack(text_last_hidden_state)
    text_attention_mask = torch.stack(text_attention_mask)
    image_last_hidden_state = torch.stack(image_last_hidden_state)
    image_attention_mask = torch.stack(image_attention_mask)
    if 0 < image_embed_interleave < 6:
        image_last_hidden_state = \
            image_last_hidden_state[:, ::image_embed_interleave, :]
        image_attention_mask = \
            image_attention_mask[:, ::image_embed_interleave]
    y = torch.cat([image_last_hidden_state, text_last_hidden_state], dim=1)
    m = torch.cat([image_attention_mask, text_attention_mask], dim=1)
    return y.numpy(), m.numpy()


def _synthetic_batch(b=2, L=140, D=16, seed=0, dr_positions=(3, 30, 60,
                                                             110)):
    rng = np.random.default_rng(seed)
    hidden = rng.normal(size=(b, L + 575, D)).astype(np.float32)
    mask = np.ones((b, L), np.int64)
    mask[0, 120:] = 0
    ids = rng.integers(3, 200, size=(b, L))
    ids[ids == 271] = 3
    for i in range(b):
        for p in dr_positions:
            ids[i, p + i] = 271     # vary positions per sample
    return hidden, mask, ids


class TestCropParity:
    @pytest.mark.parametrize("cond_type", ["token_replace",
                                           "latent_concat"])
    def test_matches_reference_port(self, cond_type):
        hidden, mask, ids = _synthetic_batch()
        interleave = HUNYUAN_I2V_INTERLEAVE[cond_type]
        want_y, want_m = reference_crop_torch(
            torch.from_numpy(hidden), torch.from_numpy(mask),
            torch.from_numpy(ids), TEMPLATE, interleave)
        got_y, got_m = hunyuan_i2v_crop(hidden, mask, ids, TEMPLATE,
                                        interleave)
        np.testing.assert_allclose(got_y, want_y, atol=0)
        np.testing.assert_array_equal(got_m, want_m)

    def test_truncated_prompt_three_tokens(self):
        """Only 3 double-return tokens (prompt too long) → sequence end
        acts as the 4th (reference :412-422)."""
        hidden, mask, ids = _synthetic_batch(b=1,
                                             dr_positions=(3, 30, 60))
        want_y, want_m = reference_crop_torch(
            torch.from_numpy(hidden), torch.from_numpy(mask),
            torch.from_numpy(ids), TEMPLATE, 4)
        got_y, got_m = hunyuan_i2v_crop(hidden, mask, ids, TEMPLATE, 4)
        np.testing.assert_allclose(got_y, want_y, atol=0)
        np.testing.assert_array_equal(got_m, want_m)

    def test_output_geometry(self):
        hidden, mask, ids = _synthetic_batch(b=2, L=140)
        y, m = hunyuan_i2v_crop(hidden, mask, ids, TEMPLATE, 4)
        # 576/4 = 144 image tokens + (L - crop_start - 4) text tokens
        assert y.shape[1] == 144 + (140 - TEMPLATE["crop_start"] - 4)
        assert m.shape[1] == y.shape[1]


class TestEndToEndEncode:
    def test_flow_encode_text_i2v(self):
        import jax
        import jax.numpy as jnp
        from videotuna_tpu.flows.hunyuan import HunyuanVideoFlow
        from tests.test_hunyuan import HY_TINY
        flow = HunyuanVideoFlow(**HY_TINY)
        flow.init_params(seed=0)
        dim = flow.cond_stage.dim
        image_states = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 576, dim)),
            jnp.float32)
        cond = flow.encode_text_i2v(flow.params, ["a cat jumps"],
                                    image_states)
        assert cond["y"].ndim == 3
        # image tokens present: 576/4 = 144 at the front
        assert cond["y"].shape[1] > 144
        assert cond["mask"].shape[:2] == cond["y"].shape[:2]
        assert bool(jnp.all(jnp.isfinite(cond["y"])))
