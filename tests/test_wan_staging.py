"""WanModel staged execution parity (embed → block chunks → head) — the
contract the 14B host-streaming bench relies on."""

import jax
import jax.numpy as jnp
import numpy as np

from videotuna_tpu.models.wan.dit import WanModel

TINY = dict(dim=32, ffn_dim=64, num_layers=4, heads=4, text_dim=16,
            in_channels=16, out_channels=16, scan_blocks=True)


def test_staged_equals_monolithic():
    model = WanModel(**TINY)
    x = jax.random.normal(jax.random.key(0), (1, 2, 8, 8, 16)) * 0.3
    t = jnp.array([500.0])
    ctx = jax.random.normal(jax.random.key(1), (1, 6, 16)) * 0.2
    params = model.init(jax.random.key(2), x, t, ctx)["params"]
    params = jax.tree.map(
        lambda a: a + 0.02 * np.random.default_rng(5)
        .standard_normal(a.shape).astype(a.dtype), params)
    ref = model.apply({"params": params}, x, t, ctx)

    grid = (2, 4, 4)
    emb_keys = [k for k in params
                if k not in ("blocks", "head_modulation", "head_norm",
                             "head_out")]
    tok, e, e6, c, ci = model.apply(
        {"params": {k: params[k] for k in emb_keys}}, x, t, ctx,
        stage="embed")
    sub = WanModel(**{**TINY, "num_layers": 1})
    for i in range(TINY["num_layers"]):
        chunk = {"blocks": jax.tree.map(lambda a: a[i:i + 1],
                                        params["blocks"])}
        tok = sub.apply({"params": chunk}, stage="blocks", tok=tok,
                        e6=e6, ctx=c, ctx_img=ci, grid=grid)
    head = {k: params[k] for k in ("head_modulation", "head_out")
            if k in params}
    out = model.apply({"params": head}, stage="head", tok=tok, e=e,
                      grid=grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
