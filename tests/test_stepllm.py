"""StepLLM text encoder: torch-replica parity through stepllm_map.

The reference Step1Model (stepllm.py) hard-requires the prebuilt
``liboptimus`` torch ops for its flash attention, so it cannot execute
here; this replica reproduces its published math (word embeddings, no
positional encoding, pre-RMSNorm causal MQA with fused wqkv, SwiGLU
silu(first)·second with fused w1) with the same state-dict layout."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from videotuna_tpu.models.text_encoders import StepLLMEncoder
from videotuna_tpu.tools.convert_weights import (stepllm_map,
                                                 verify_tree_shapes)

DIM, HEADS, GROUPS, FFH, LAYERS, VOCAB = 32, 4, 2, 64, 2, 96


def _rms(x, w, eps=1e-5):
    return x * torch.rsqrt(x.float().pow(2).mean(-1, keepdim=True)
                           + eps) * w


class TorchStepBlock(tnn.Module):
    def __init__(self):
        super().__init__()
        hd = DIM // HEADS
        self.attention = tnn.Module()
        self.attention.wqkv = tnn.Linear(DIM, DIM + 2 * GROUPS * hd,
                                         bias=False)
        self.attention.wo = tnn.Linear(DIM, DIM, bias=False)
        self.feed_forward = tnn.Module()
        self.feed_forward.w1 = tnn.Linear(DIM, 2 * FFH, bias=False)
        self.feed_forward.w2 = tnn.Linear(FFH, DIM, bias=False)
        self.attention_norm = tnn.Module()
        self.attention_norm.weight = tnn.Parameter(torch.rand(DIM))
        self.ffn_norm = tnn.Module()
        self.ffn_norm.weight = tnn.Parameter(torch.rand(DIM))

    def forward(self, x):
        b, s, _ = x.shape
        hd = DIM // HEADS
        h = _rms(x, self.attention_norm.weight)
        qkv = self.attention.wqkv(h)
        q, kv = torch.split(qkv, [DIM, 2 * GROUPS * hd], dim=-1)
        q = q.view(b, s, HEADS, hd)
        kv = kv.view(b, s, GROUPS, 2 * hd)
        k, v = kv.chunk(2, -1)
        rep = HEADS // GROUPS
        # reference index_select trick == repeat_interleave (stepllm.py:104)
        k = k.repeat_interleave(rep, dim=2)
        v = v.repeat_interleave(rep, dim=2)
        o = F.scaled_dot_product_attention(
            q.transpose(1, 2).float(), k.transpose(1, 2).float(),
            v.transpose(1, 2).float(), is_causal=True)
        o = o.transpose(1, 2).reshape(b, s, DIM)
        x = x + self.attention.wo(o)
        h = _rms(x, self.ffn_norm.weight)
        a, g = self.feed_forward.w1(h).chunk(2, -1)
        return x + self.feed_forward.w2(F.silu(a) * g)


class TorchStep1(tnn.Module):
    def __init__(self):
        super().__init__()
        self.tok_embeddings = tnn.Module()
        self.tok_embeddings.word_embeddings = tnn.Embedding(VOCAB, DIM)
        self.transformer = tnn.Module()
        self.transformer.layers = tnn.ModuleList(
            [TorchStepBlock() for _ in range(LAYERS)])

    def forward(self, ids):
        x = self.tok_embeddings.word_embeddings(ids)
        for blk in self.transformer.layers:
            x = blk(x)
        return x


def test_stepllm_parity():
    torch.manual_seed(0)
    ref = TorchStep1().eval()
    ids = torch.randint(0, VOCAB, (1, 7))
    with torch.no_grad():
        out_ref = ref(ids).numpy()

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    tree = stepllm_map().convert(sd, strict=True)
    ours = StepLLMEncoder(vocab_size=VOCAB, dim=DIM, heads=HEADS,
                          groups=GROUPS, ff_hidden=FFH, num_layers=LAYERS)
    init = ours.init(jax.random.key(0), jnp.asarray(ids.numpy()))["params"]
    assert not verify_tree_shapes(tree, init), \
        verify_tree_shapes(tree, init)[:8]

    out = ours.apply({"params": tree}, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=3e-4,
                               rtol=1e-3)


def test_stepllm_masking():
    enc = StepLLMEncoder(vocab_size=VOCAB, dim=DIM, heads=HEADS,
                         groups=GROUPS, ff_hidden=FFH, num_layers=1)
    ids = jnp.asarray([[3, 4, 5, 0]])
    mask = jnp.asarray([[1, 1, 1, 0]], bool)
    p = enc.init(jax.random.key(0), ids)["params"]
    out = enc.apply({"params": p}, ids, mask)
    np.testing.assert_allclose(np.asarray(out[0, 3]), 0.0, atol=1e-6)
