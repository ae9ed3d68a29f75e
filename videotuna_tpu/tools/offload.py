"""Host-offloaded block streaming — the VRAM-management equivalent.

The reference manages GPU VRAM with layer-wise auto-wrapped modules that
hop between onload/offload devices under a parameter budget
(/root/reference/videotuna/utils/inference_utils.py:463-547,
``enable_vram_management``; sequential CPU offload
base/generation_base.py:277-323). The TPU-native equivalent is *block
streaming*: block parameters live in host RAM as numpy arrays; while block
i computes on-chip, block i+1's params are already being transferred
(``jax.device_put`` is async), so a model whose parameters exceed HBM runs
at close to full throughput whenever per-block compute ≥ per-block
transfer time (a 13B bf16 model = 26 GB streams through a 16 GB v5e).

Works with any model exposing stage-wise application (e.g. STDiT's
``stage=`` argument) or any per-block apply function over a chunked param
stack.
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence

import jax
import numpy as np

Params = Any


def split_stacked(params: Params, num_chunks: int) -> List[Params]:
    """Split a scanned (stacked leading axis) param tree into ``num_chunks``
    equal chunks, kept as host numpy arrays."""
    leaves = jax.tree.leaves(params)
    depth = leaves[0].shape[0]
    assert depth % num_chunks == 0, (depth, num_chunks)
    k = depth // num_chunks
    return [jax.tree.map(lambda a: np.asarray(a[i * k:(i + 1) * k]), params)
            for i in range(num_chunks)]


def to_host(params: Params) -> Params:
    """Move a param tree to host numpy (frees HBM)."""
    return jax.tree.map(np.asarray, params)


class BlockStreamer:
    """Double-buffered host→device parameter streaming.

    ``apply_chunk(device_chunk, carry) -> carry`` runs one chunk's compute;
    chunks are prefetched one step ahead so the DMA of chunk i+1 overlaps
    chunk i's compute (device_put returns immediately; XLA orders the
    transfer before first use)."""

    def __init__(self, host_chunks: Sequence[Params],
                 device: Optional[Any] = None):
        self.host_chunks = list(host_chunks)
        self.device = device or jax.devices()[0]

    def _put(self, chunk: Params) -> Params:
        return jax.tree.map(
            lambda a: jax.device_put(a, self.device), chunk)

    def run(self, apply_chunk: Callable[[Params, Any], Any],
            carry: Any) -> Any:
        nxt = self._put(self.host_chunks[0])
        for i in range(len(self.host_chunks)):
            cur = nxt
            if i + 1 < len(self.host_chunks):
                # issue the next transfer BEFORE launching compute: both
                # are async, the DMA rides alongside the chunk-i programs
                nxt = self._put(self.host_chunks[i + 1])
            carry = apply_chunk(cur, carry)
            # drop the device copy eagerly (the dispatched programs hold
            # their own references until they complete)
            del cur
        return carry


def streamed_stdit_forward(model, embed_params: Params,
                           head_params: Params,
                           host_block_chunks: Sequence[Params],
                           x, t, y, mask=None):
    """Run an STDiT whose block params exceed HBM: embed/head params stay
    resident; block chunks stream through a ``BlockStreamer``. ``model``
    must be an STDiT instantiated with depth == chunk depth (see
    ``STDiT.__call__``'s ``stage`` argument)."""
    import functools
    e_fn = jax.jit(functools.partial(model.apply, stage="embed"))
    s_first = jax.jit(functools.partial(model.apply, stage="blocks",
                                        use_tpe=True))
    s_rest = jax.jit(functools.partial(model.apply, stage="blocks",
                                       use_tpe=False))
    h_fn = jax.jit(functools.partial(model.apply, stage="head"))

    tok, t6, y_emb, t_emb = e_fn({"params": embed_params}, x, t, y, mask)
    streamer = BlockStreamer(host_block_chunks)

    def apply_chunk(chunk, carry):
        tok, first = carry
        fn = s_first if first else s_rest
        tok = fn({"params": chunk}, tok=tok, y=y_emb, t6=t6, mask=mask)
        return tok, False

    tok, _ = streamer.run(apply_chunk, (tok, True))
    return h_fn({"params": head_params}, tok=tok, t_emb=t_emb)
