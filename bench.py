"""Benchmark: DiT denoise steps/sec/chip (BASELINE.json north-star metric).

Measures the flagship denoiser's CFG-doubled forward step — the hot loop of
inference (SURVEY.md §3.2-3.3) — on the local accelerator in bf16:
Open-Sora STDiT-XL/2 (hidden 1152 × depth 28, 16×32×32 latents ≙ 16f@256²,
120 T5 tokens), the reference's 11 s/50-step H800 headline config
(/root/reference/README.md:177 ⇒ 4.55 denoise steps/s baseline).

Execution strategy: the 28-layer stack runs as embed → 7 × (4-layer scanned
stack) → head, chained asynchronously with ONE device sync at the end — the
identical math to a single jit (verified by the scan-vs-loop parity test),
but each compiled program stays small enough for this rig's remote-compile
transport, whose window a monolithic 28-layer program exceeds. Host dispatch
overhead (~µs per call) is amortized across N_STEPS chained steps.
`--full` benches the single-jit variant when the compile service allows.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_STEPS_PER_SEC = 50.0 / 11.0  # H800: 50 DDIM steps in ≤11 s
N_STEPS = 20
HIDDEN, DEPTH, HEADS, CAP = 1152, 28, 16, 4096
SUB_DEPTH = 4                          # layers per compiled sub-stack


def _sync(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def _bench_partitioned():
    from videotuna_tpu.models.opensora.stdit import (STDiT, STDiTBlock,
                                                     sincos_pos_embed_1d,
                                                     sincos_pos_embed_2d)
    import flax.linen as nn
    from videotuna_tpu.models.layers import TimestepEmbedder

    b, tt, hh, ww = 2, 16, 16, 16      # CFG-doubled batch; 16×(32×32 /2)
    ss = hh * ww
    lt = 120

    # --- embed / head modules (tiny compiles) ---------------------------
    class Embed(nn.Module):
        @nn.compact
        def __call__(self, x, t, y):
            tok = nn.Conv(HIDDEN, (1, 2, 2), strides=(1, 2, 2),
                          padding="VALID", dtype=jnp.bfloat16,
                          name="x_embedder")(x.astype(jnp.bfloat16))
            bb = tok.shape[0]
            tok = tok.reshape(bb, tt, ss, HIDDEN)
            tok = tok + sincos_pos_embed_2d(HIDDEN, hh, ww)[None, None].astype(
                jnp.bfloat16)
            te = TimestepEmbedder(HIDDEN, dtype=jnp.bfloat16,
                                  name="t_embedder")(t)
            t6 = nn.Dense(6 * HIDDEN, dtype=jnp.bfloat16,
                          name="t_block")(nn.silu(te)).reshape(bb, 6, HIDDEN)
            yy = nn.Dense(HIDDEN, dtype=jnp.bfloat16, name="y1")(
                y.astype(jnp.bfloat16))
            yy = nn.Dense(HIDDEN, dtype=jnp.bfloat16, name="y2")(
                nn.gelu(yy, approximate=True))
            return tok, t6, yy, te

    class SubStack(nn.Module):
        @nn.compact
        def __call__(self, tok, y, t6):
            scan = nn.scan(STDiTBlock, variable_axes={"params": 0},
                           split_rngs={"params": True},
                           in_axes=(nn.broadcast,) * 4,
                           length=SUB_DEPTH)
            tok, _ = scan(HIDDEN, HEADS, 4.0, dtype=jnp.bfloat16,
                          as_cell=True, name="blocks")(tok, y, t6, None,
                                                       None)
            return tok

    class Head(nn.Module):
        @nn.compact
        def __call__(self, tok, te):
            tbl = self.param("fst", nn.initializers.normal(0.02),
                             (2, HIDDEN))
            fin = tbl[None] + te.astype(jnp.float32)[:, None]
            sh, sc = [m.astype(jnp.bfloat16)[:, None, None]
                      for m in jnp.split(fin, 2, axis=1)]
            tok = nn.LayerNorm(use_bias=False, use_scale=False,
                               dtype=jnp.bfloat16, name="fn")(tok)
            tok = tok * (1 + sc.reshape(tok.shape[0], 1, 1, -1)) \
                + sh.reshape(tok.shape[0], 1, 1, -1)
            return nn.Dense(1 * 2 * 2 * 8, dtype=jnp.bfloat16,
                            name="fp")(tok)

    x = jnp.zeros((b, tt, hh * 2, ww * 2, 4))
    t = jnp.zeros((b,), jnp.int32)
    y = jnp.zeros((b, lt, CAP))
    embed = Embed()
    sub = SubStack()
    head = Head()
    k = jax.random.key(0)
    pe = jax.jit(embed.init)(k, x, t, y)["params"]
    tok0, t6, yy, te = jax.jit(embed.apply)({"params": pe}, x, t, y)
    ps = [jax.jit(sub.init)(jax.random.fold_in(k, i), tok0, yy, t6)["params"]
          for i in range(DEPTH // SUB_DEPTH)]
    ph = jax.jit(head.init)(jax.random.fold_in(k, 99), tok0, te)["params"]

    e_fn = jax.jit(embed.apply)
    s_fn = jax.jit(sub.apply)
    h_fn = jax.jit(head.apply)

    def one_step(x):
        tok, t6_, yy_, te_ = e_fn({"params": pe}, x, t, y)
        for p in ps:
            tok = s_fn({"params": p}, tok, yy_, t6_)
        out = h_fn({"params": ph}, tok, te_)
        # fold the head output back into latent shape for chaining
        bb = out.shape[0]
        o = out.reshape(bb, tt, ss, 2, 2, 8)[..., :4]
        o = o.reshape(bb, tt, hh, ww, 2, 2, 4)
        o = jnp.einsum("bthwpqc->bthpwqc", o).reshape(
            bb, tt, hh * 2, ww * 2, 4)
        return o.astype(x.dtype)

    _sync(one_step(x))                 # compile + warm + sync
    t0 = time.perf_counter()
    cur = x
    for _ in range(N_STEPS):
        cur = one_step(cur)
    _sync(cur)                         # single sync at the end
    elapsed = time.perf_counter() - t0
    return N_STEPS / elapsed, "partitioned(7x4-layer) chained fwd"


def _bench_full():
    from __graft_entry__ import _flagship, _flagship_params
    model, (x, t, y, mask) = _flagship(dtype=jnp.bfloat16)
    params = _flagship_params(model, jnp.bfloat16)
    x2 = jnp.concatenate([x, x], 0)
    t2 = jnp.concatenate([t, t], 0)
    y2 = jnp.concatenate([y, y], 0)
    m2 = jnp.concatenate([mask, mask], 0)

    @jax.jit
    def step(x):
        out = model.apply({"params": params}, x, t2, y2, m2)
        return out[..., :x.shape[-1]].astype(x.dtype)

    _sync(step(x2))
    t0 = time.perf_counter()
    cur = x2
    for _ in range(N_STEPS):
        cur = step(cur)
    _sync(cur)
    elapsed = time.perf_counter() - t0
    return N_STEPS / elapsed, "single-jit fwd"


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass
    use_full = "--full" in sys.argv
    last_err = None
    for attempt in range(3):
        try:
            fn = _bench_full if use_full else _bench_partitioned
            steps_per_sec, mode = fn()
            print(json.dumps({
                "metric": "stdit_xl2_denoise_steps_per_sec_per_chip",
                "value": round(steps_per_sec, 3),
                "unit": f"steps/s (CFG-doubled, 16x32x32 latents, bf16, "
                        f"{mode})",
                "vs_baseline": round(
                    steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
            }))
            return
        except Exception as e:  # remote compile service can drop requests
            last_err = e
            print(f"bench attempt {attempt + 1} failed: {e}",
                  file=sys.stderr)
            time.sleep(30)
    raise last_err


if __name__ == "__main__":
    main()
