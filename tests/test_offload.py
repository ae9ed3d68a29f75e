"""Host-offload block streaming: streamed forward == resident forward."""

import jax
import jax.numpy as jnp
import numpy as np

from videotuna_tpu.models.opensora.stdit import STDiT
from videotuna_tpu.tools.offload import (BlockStreamer, split_stacked,
                                         streamed_stdit_forward, to_host)


def test_streamed_forward_matches_resident():
    kw = dict(input_size=(4, 16, 16), in_channels=4, hidden_size=64,
              depth=4, num_heads=4, caption_channels=32, scan_blocks=True)
    x = jax.random.normal(jax.random.key(1), (1, 4, 16, 16, 4))
    t = jnp.array([5])
    y = jax.random.normal(jax.random.key(2), (1, 8, 32))

    full = STDiT(**kw)
    params = full.init(jax.random.key(0), x, t, y)["params"]
    ref = full.apply({"params": params}, x, t, y)

    sub = STDiT(**{**kw, "depth": 2})
    host = jax.tree.map(np.asarray, params)
    chunks = [{"blocks": c} for c in split_stacked(host["blocks"], 2)]
    out = streamed_stdit_forward(sub, params, params, chunks, x, t, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)


def test_block_streamer_order_and_prefetch():
    seen = []
    chunks = [{"w": np.full((2, 2), float(i))} for i in range(3)]
    streamer = BlockStreamer(chunks)

    def apply_chunk(chunk, carry):
        seen.append(float(np.asarray(chunk["w"])[0, 0]))
        return carry + jnp.sum(jnp.asarray(chunk["w"]))

    out = streamer.run(apply_chunk, jnp.asarray(0.0))
    assert seen == [0.0, 1.0, 2.0]
    assert float(out) == 0.0 * 4 + 1.0 * 4 + 2.0 * 4


def test_to_host_roundtrip():
    p = {"a": jnp.ones((3,)), "b": {"c": jnp.zeros((2, 2))}}
    h = to_host(p)
    assert isinstance(h["a"], np.ndarray)
    assert isinstance(h["b"]["c"], np.ndarray)
