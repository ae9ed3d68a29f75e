"""Pipeline parallelism: pipelined layer stack must equal sequential
application, for MLP layers and for a real DiT block stack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotuna_tpu.core.mesh import MeshConfig, make_mesh
from videotuna_tpu.parallel.pipeline import pipeline_apply


def mlp_block(layer_params, x):
    w1, b1, w2, b2 = (layer_params["w1"], layer_params["b1"],
                      layer_params["w2"], layer_params["b2"])
    h = jnp.tanh(x @ w1 + b1)
    return x + h @ w2 + b2


def make_stack(key, layers, dim, hidden):
    ks = jax.random.split(key, 4)
    return {
        "w1": jax.random.normal(ks[0], (layers, dim, hidden)) * 0.1,
        "b1": jnp.zeros((layers, hidden)),
        "w2": jax.random.normal(ks[1], (layers, hidden, dim)) * 0.1,
        "b2": jnp.zeros((layers, dim)),
    }


def sequential(stack, x):
    def body(carry, layer):
        return mlp_block(layer, carry), None
    out, _ = jax.lax.scan(body, x, stack)
    return out


class TestPipeline:
    @pytest.mark.parametrize("pp,microbatches", [(4, 4), (8, 8), (2, 6)])
    def test_matches_sequential(self, devices8, pp, microbatches):
        layers, dim, hidden = pp * 2, 16, 32
        stack = make_stack(jax.random.key(0), layers, dim, hidden)
        x = jax.random.normal(jax.random.key(1), (microbatches * 2, dim))
        ref = sequential(stack, x)
        mesh = make_mesh(MeshConfig(dp=8 // pp, sp=pp),
                         devices=devices8)
        # use the sp axis as the pipeline axis for the test mesh
        with mesh:
            out = pipeline_apply(mesh, mlp_block, stack, x,
                                 microbatches=microbatches, axis="sp")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_dit_blocks_pipelined(self, devices8):
        """Pipeline a real scanned StepVideoBlock stack across 4 stages."""
        import flax.linen as nn
        from videotuna_tpu.models.stepvideo.dit import StepVideoBlock

        layers, d = 4, 32
        blk = StepVideoBlock(d, heads=4, ffn_dim=64)
        x1 = jnp.zeros((1, 8, d))
        t6 = jnp.zeros((1, 6, d))
        ctx = jnp.zeros((1, 4, d))
        from videotuna_tpu.models.layers import (rope_3d_axis_tables,
                                                 split_rope_dims)
        rope_dims = split_rope_dims(d // 4)
        blk = StepVideoBlock(d, heads=4, ffn_dim=64, rope_dims=rope_dims)
        tables = rope_3d_axis_tables(rope_dims, (2, 2, 2))
        keys = jax.random.split(jax.random.key(2), layers)
        per_layer = [blk.init(k, x1, t6, ctx, tables)["params"]
                     for k in keys]
        stack = jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)

        def block_fn(layer_params, x):
            return blk.apply({"params": layer_params}, x, t6, ctx, tables)

        x = jax.random.normal(jax.random.key(3), (4, 8, d))

        def body(carry, layer):
            return block_fn(layer, carry), None
        ref, _ = jax.lax.scan(body, x, stack)

        mesh = make_mesh(MeshConfig(dp=2, sp=4), devices=devices8)
        with mesh:
            out = pipeline_apply(mesh, block_fn, stack, x,
                                 microbatches=4, axis="sp")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)
