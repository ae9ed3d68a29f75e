"""INT8 w8a8 serving quantization (TPU-native).

The fp8 path (tools/fp8.py — capability parity with the reference's
fp8_optimization.py) is memory-only: weights stored fp8, dequantized to
bf16 BEFORE the matmul. Here the projection/MLP matmuls EXECUTE in
int8: the v5e MXU runs int8×int8→int32 at 394 TOPS — 2× the bf16
rate — so compute-bound denoise steps gain on both MXU time and HBM
(4× smaller weights than f32, 2× than fp8's bf16 dequant stream).

Recipe (standard w8a8):
- weights: per-OUTPUT-channel symmetric int8, offline absmax over the
  input axis (``quantize_params_int8`` — kernels are REPLACED by
  ``kernel_q``/``kernel_scale`` so the tree is int8-resident);
- activations: per-ROW dynamic symmetric int8 (runtime absmax over the
  feature axis — one VPU reduction the MXU win dwarfs);
- int32 accumulation, one fused f32 rescale (x_scale ⊗ w_scale) on the
  output tile.

Attention stays on the bf16 Pallas kernels; norms/biases/embeddings
stay in their dtype. Enabled at trace time by ``int8_scope()`` — a flax
method interceptor (same mechanism as training/lora.lora_scope) that
reroutes every Dense/DenseGeneral whose params carry ``kernel_q``.

No reference equivalent: VideoTuna serves bf16, or fp8 that dequants
before the matmul (reference hyvideo_i2v/modules/fp8_optimization.py) —
w8a8 is a TPU-native serving mode. Quality is a quantization trade
(~1% relative on well-conditioned LayerNormed DiT activations, gated
by tests/test_int8.py); bf16 remains the default path.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from videotuna_tpu.training.lora import (MatchFn, _is_stacked,
                                         default_match)

KERNEL_Q = "kernel_q"
KERNEL_SCALE = "kernel_scale"


def int8_matmul(x: jnp.ndarray, wq: jnp.ndarray,
                ws: jnp.ndarray) -> jnp.ndarray:
    """w8a8 matmul: x (..., din) float, wq (din, n) int8, ws (n,) f32
    per-output-channel scales → (..., n) f32 (caller casts).

    Activations are quantized per row (dynamic symmetric absmax); the
    int32 accumulator is rescaled once by x_scale·w_scale.
    """
    xf = x.astype(jnp.float32)
    xs = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(xs, 1e-8) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * xs * ws


def _quantize_leaf(w: jnp.ndarray, stacked: bool):
    """(din, *out) or scan-stacked (depth, din, *out) kernel → (int8
    kernel, f32 per-output-channel scales of shape (*out) / (depth,
    *out)). Absmax is over the INPUT axis only, so every output channel
    keeps its own dynamic range."""
    wf = w.astype(jnp.float32)
    in_axis = 1 if stacked else 0
    amax = jnp.max(jnp.abs(wf), axis=in_axis)          # (*out)/(depth,*out)
    scale = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    wq = jnp.clip(jnp.round(wf / jnp.expand_dims(scale, in_axis)),
                  -127, 127).astype(jnp.int8)
    return wq, scale.astype(jnp.float32)


def quantize_params_int8(params: Any,
                         match: Optional[MatchFn] = None) -> Any:
    """Return a params tree where every matched projection kernel is
    REPLACED by {kernel_q, kernel_scale} (int8-resident); everything
    else (biases, norms, convs, embeddings) passes through unchanged.
    Matching reuses the LoRA coverage rules (Dense 2D, DenseGeneral
    axis=-1 3D, nn.scan stacks 3D/4D)."""
    match = match or default_match

    def rec(node: Any, path: Tuple[str, ...]):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                p = path + (str(k),)
                if (isinstance(v, jnp.ndarray) or hasattr(v, "ndim")) \
                        and str(k) == "kernel" and match(p, v):
                    wq, ws = _quantize_leaf(v, v.ndim > 2
                                            and _is_stacked(p))
                    out[KERNEL_Q] = wq
                    out[KERNEL_SCALE] = ws
                else:
                    out[k] = rec(v, p)
            return out
        return node

    return rec(params, ())


def _int8_interceptor(next_fun, args, kwargs, context):
    import flax.linen as nn
    mod = context.module
    if (context.method_name == "__call__"
            and isinstance(mod, (nn.Dense, nn.DenseGeneral))
            and mod.scope is not None
            and mod.scope.has_variable("params", KERNEL_Q)):
        x = args[0]
        wq = mod.get_variable("params", KERNEL_Q)   # (din, *out)
        ws = mod.get_variable("params", KERNEL_SCALE)
        din = wq.shape[0]
        out_dims = wq.shape[1:]
        y = int8_matmul(x, wq.reshape(din, -1), ws.reshape(-1))
        y = y.reshape(x.shape[:-1] + out_dims)
        if mod.use_bias:
            y = y + mod.get_variable("params", "bias").astype(jnp.float32)
        return y.astype(x.dtype)
    return next_fun(*args, **kwargs)


def int8_scope():
    """Trace-time context: every Dense-like module whose params carry
    ``kernel_q`` runs the w8a8 path (see ``quantize_params_int8``)."""
    import flax.linen as nn
    return nn.intercept_methods(_int8_interceptor)


def tree_bytes(params: Any) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
