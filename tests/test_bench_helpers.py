"""Pins bench.py's fp8-resident machinery: _mixed_fp8_params quantizes
exactly the block KERNELS, and every family's scan forward runs with the
mixed tree (flax dtype casts dequantize the per-iteration slice in-loop —
the zero-model-change form of the hunyuan chunked-stage fp8 bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bench


def _fp8_leaves(tree):
    return [a for a in jax.tree.leaves(tree)
            if a.dtype.name.startswith("float8")]


def test_mixed_fp8_stepvideo_runs_and_matches_bf16_scale():
    from videotuna_tpu.models.stepvideo.dit import StepVideoModel
    m = StepVideoModel(in_channels=8, out_channels=8, dim=64, ffn_dim=128,
                       num_layers=2, heads=2, text_dim=16,
                       dtype=jnp.bfloat16, scan_blocks=True)
    x = jnp.zeros((1, 2, 4, 4, 8))
    t = jnp.asarray([500.0])
    y = jnp.zeros((1, 6, 16))
    p = bench._mixed_fp8_params(m, (x, t, y), ("blocks",))
    fp8 = _fp8_leaves(p)
    assert fp8, "no fp8 leaves produced"
    # only kernels inside the scanned block stack are quantized
    assert all(a.ndim >= 2 for a in fp8)
    assert p["patch_embed"]["kernel"].dtype == jnp.bfloat16
    out = jax.jit(lambda pp, xx: m.apply({"params": pp}, xx, t, y))(p, x)
    assert bool(jnp.isfinite(out).all())


@pytest.mark.parametrize("family", ["mochi", "flux"])
def test_mixed_fp8_families_run(family):
    if family == "mochi":
        from videotuna_tpu.models.mochi.dit import MochiDiT
        m = MochiDiT(in_channels=4, dim=64, dim_y=32, depth=3, heads=4,
                     patch_size=2, caption_channels=16,
                     dtype=jnp.bfloat16, scan_blocks=True)
        args = (jnp.zeros((1, 2, 4, 4, 4)), jnp.zeros((1,)),
                jnp.zeros((1, 6, 16)), jnp.ones((1, 6), bool))
        blocks = ("blocks", "block_2")
    else:
        from videotuna_tpu.models.flux.dit import FluxModel
        m = FluxModel(dim=64, heads=4, double_blocks=2, single_blocks=2,
                      text_dim=16, pooled_dim=8, dtype=jnp.bfloat16,
                      scan_blocks=True)
        args = (jnp.zeros((1, 4, 4, 64)), jnp.full((1,), 0.5),
                jnp.zeros((1, 6, 16)), jnp.zeros((1, 8)),
                jnp.full((1,), 3.5))
        blocks = ("double_blocks", "single_blocks")
    p = bench._mixed_fp8_params(m, args, blocks)
    assert _fp8_leaves(p)
    out = jax.jit(lambda pp: m.apply({"params": pp}, *args))(p)
    assert bool(jnp.isfinite(out).all())


def test_fp8_quantization_error_is_fp8_scale():
    """Mixed-fp8 forward ≈ bf16 forward within fp8 mantissa error on real
    (non-zero) weights — the in-loop dequant is numerically the identity
    cast chain fp32→fp8→bf16."""
    from videotuna_tpu.models.stepvideo.dit import StepVideoModel
    from ml_dtypes import float8_e4m3fn as fp8
    import jax.tree_util as jtu
    m = StepVideoModel(in_channels=8, out_channels=8, dim=64, ffn_dim=128,
                       num_layers=2, heads=2, text_dim=16,
                       dtype=jnp.bfloat16, scan_blocks=True)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 2, 4, 4, 8) * 0.1,
                    jnp.float32)
    t = jnp.asarray([500.0])
    y = jnp.asarray(np.random.RandomState(1).randn(1, 6, 16) * 0.1,
                    jnp.float32)
    params = m.init(jax.random.key(0), x, t, y)["params"]

    def q(path, p):
        keys = [e.key for e in path if hasattr(e, "key")]
        if keys and keys[-1] == "kernel" and "blocks" in keys:
            return p.astype(fp8)
        return p

    pq = jtu.tree_map_with_path(q, params)
    ref = m.apply({"params": params}, x, t, y)
    out = m.apply({"params": pq}, x, t, y)
    # fp8 e4m3 has a 3-bit mantissa → ~6% relative per-weight error;
    # block outputs stay within a loose absolute envelope
    assert float(jnp.max(jnp.abs(out - ref))) < 0.2 * float(
        jnp.max(jnp.abs(ref)) + 1e-6)
