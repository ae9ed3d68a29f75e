"""INT8 w8a8 serving quantization (tools/int8.py): matmul accuracy,
per-channel scaling, flax interceptor coverage (plain + scan-stacked),
and int8 residency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotuna_tpu.tools.int8 import (int8_matmul, int8_scope,
                                      quantize_params_int8, tree_bytes,
                                      KERNEL_Q, KERNEL_SCALE)
from videotuna_tpu.tools.int8 import _quantize_leaf


def test_int8_matmul_close_to_f32():
    kx, kw = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kx, (64, 256))
    w = jax.random.normal(kw, (256, 128)) * 0.05
    wq, ws = _quantize_leaf(w, stacked=False)
    y = int8_matmul(x, wq, ws)
    ref = x @ w
    rel = float(jnp.linalg.norm(y - ref) / jnp.linalg.norm(ref))
    assert rel < 2e-2, rel


def test_per_channel_scales_survive_wild_columns():
    """Columns with 1000× different magnitudes: per-output-channel
    scales keep every column accurate (a per-tensor scale would zero
    the small ones)."""
    kx, kw = jax.random.split(jax.random.key(1))
    x = jax.random.normal(kx, (32, 64))
    w = jax.random.normal(kw, (64, 16))
    w = w * jnp.logspace(-3, 0, 16)[None, :]
    wq, ws = _quantize_leaf(w, stacked=False)
    y = int8_matmul(x, wq, ws)
    ref = x @ w
    for j in range(16):
        rel = float(jnp.linalg.norm(y[:, j] - ref[:, j])
                    / jnp.maximum(jnp.linalg.norm(ref[:, j]), 1e-9))
        assert rel < 3e-2, (j, rel)


def test_stacked_leaf_scales_per_depth():
    w = jax.random.normal(jax.random.key(2), (3, 8, 4))
    w = w * jnp.array([1.0, 10.0, 100.0])[:, None, None]
    wq, ws = _quantize_leaf(w, stacked=True)
    assert wq.shape == (3, 8, 4) and wq.dtype == jnp.int8
    assert ws.shape == (3, 4)
    back = wq.astype(jnp.float32) * ws[:, None, :]
    rel = float(jnp.linalg.norm(back - w) / jnp.linalg.norm(w))
    assert rel < 1e-2


class TestInterceptor:
    def _model(self, scan):
        from videotuna_tpu.models.cogvideo.mmdit import CogVideoXTransformer
        return CogVideoXTransformer(
            in_channels=16, out_channels=16, dim=64, num_layers=2,
            heads=2, text_dim=16, patch_size=(1, 2, 2), use_rope=True,
            scan_blocks=scan)

    @pytest.mark.parametrize("scan", [False, True])
    def test_w8a8_forward_close_to_bf16(self, scan):
        model = self._model(scan)
        x = jax.random.normal(jax.random.key(3), (1, 2, 8, 8, 16)) * 0.3
        t = jnp.array([10])
        txt = jax.random.normal(jax.random.key(4), (1, 6, 16)) * 0.3
        params = model.init(jax.random.key(5), x, t, txt)["params"]
        ref = model.apply({"params": params}, x, t, txt)

        qparams = quantize_params_int8(params)
        with int8_scope():
            out = model.apply({"params": qparams}, x, t, txt)
        assert out.shape == ref.shape
        rel = float(jnp.linalg.norm((out - ref).astype(jnp.float32))
                    / jnp.linalg.norm(ref.astype(jnp.float32)))
        assert rel < 0.05, rel
        # and it actually rerouted: without the scope the missing
        # `kernel` key must fail
        with pytest.raises(Exception):
            model.apply({"params": qparams}, x, t, txt)

    def test_residency_and_coverage(self):
        model = self._model(True)
        x = jnp.zeros((1, 2, 8, 8, 16))
        params = model.init(jax.random.key(6), x, jnp.array([1]),
                            jnp.zeros((1, 6, 16)))["params"]
        qparams = quantize_params_int8(params)
        names = {p[-1] for p, _ in _iter(qparams)}
        assert KERNEL_Q in names and KERNEL_SCALE in names
        assert tree_bytes(qparams) < 0.45 * tree_bytes(params)

    def test_jit_and_grad_free(self):
        """The serving path must jit cleanly (no tracer leaks from the
        interceptor)."""
        model = self._model(False)
        x = jnp.zeros((1, 2, 8, 8, 16))
        params = model.init(jax.random.key(7), x, jnp.array([1]),
                            jnp.zeros((1, 6, 16)))["params"]
        qparams = quantize_params_int8(params)

        @jax.jit
        def f(xx):
            with int8_scope():
                return model.apply({"params": qparams}, xx,
                                   jnp.array([1]), jnp.zeros((1, 6, 16)))
        out = f(x)
        assert bool(jnp.all(jnp.isfinite(out)))


def test_flow_quantize_int8_samples():
    """GenerationFlow.quantize_int8 (the `inference.quantize: int8`
    config surface): the denoiser goes int8-resident and every sampling
    path runs under the interceptor."""
    from videotuna_tpu.flows.opensora import OpenSoraFlow
    from tests.test_flow import TINY
    f = OpenSoraFlow(**TINY, ddim_steps=2, model_max_length=8)
    f.init_params(seed=0)
    cond = {"y": jnp.zeros((1, 8, 16)), "mask": jnp.ones((1, 8), bool)}
    z_ref = f.sample(f.params, cond, None, (1, 2, 8, 8, 4),
                     jax.random.key(0), cfg_scale=1.0)
    f.quantize_int8()
    names = {p[-1] for p, _ in _iter(f.params["denoiser"])}
    assert KERNEL_Q in names
    z = f.sample(f.params, cond, None, (1, 2, 8, 8, 4),
                 jax.random.key(0), cfg_scale=1.0)
    assert z.shape == z_ref.shape
    assert bool(jnp.all(jnp.isfinite(z)))


def _iter(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _iter(v, prefix + (k,))
    else:
        yield prefix, tree
