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
    """Stage-partitioned execution of the REAL STDiT module: embed →
    7×(4-layer block chunks) → head, each a small compiled program, all
    running STDiT.__call__'s own code via its ``stage`` argument (staged ==
    monolithic equivalence is pinned by tests/test_models.py's
    stage-parity test)."""
    import functools
    from videotuna_tpu.models.opensora.stdit import STDiT

    b, lt = 2, 120                     # CFG-doubled batch
    kw = dict(input_size=(16, 32, 32), hidden_size=HIDDEN, depth=DEPTH,
              num_heads=HEADS, caption_channels=CAP, dtype=jnp.bfloat16,
              scan_blocks=True)
    sub = STDiT(**{**kw, "depth": SUB_DEPTH})

    x = jnp.zeros((b, 16, 32, 32, 4))
    t = jnp.zeros((b,), jnp.int32)
    y = jnp.zeros((b, lt, CAP))
    k = jax.random.key(0)

    e_fn = jax.jit(functools.partial(sub.apply, stage="embed"))
    s_first = jax.jit(functools.partial(sub.apply, stage="blocks",
                                        use_tpe=True))
    s_rest = jax.jit(functools.partial(sub.apply, stage="blocks",
                                       use_tpe=False))
    h_fn = jax.jit(functools.partial(sub.apply, stage="head"))

    pe = jax.jit(functools.partial(sub.init, stage="embed"))(
        k, x, t, y)["params"]
    tok0, t6, yy, te = e_fn({"params": pe}, x, t, y)
    ps = [jax.jit(functools.partial(sub.init, stage="blocks"))(
        jax.random.fold_in(k, i), tok=tok0, y=yy, t6=t6)["params"]
        for i in range(DEPTH // SUB_DEPTH)]
    ph = jax.jit(functools.partial(sub.init, stage="head"))(
        jax.random.fold_in(k, 99), tok=tok0, t_emb=te)["params"]

    def one_step(x):
        tok, t6_, yy_, te_ = e_fn({"params": pe}, x, t, y)
        for i, p in enumerate(ps):
            fn = s_first if i == 0 else s_rest
            tok = fn({"params": p}, tok=tok, y=yy_, t6=t6_)
        out = h_fn({"params": ph}, tok=tok, t_emb=te_)
        return out[..., :4].astype(x.dtype)

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
