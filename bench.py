"""Benchmark: DiT denoise steps/sec/chip (BASELINE.json north-star metric).

Measures the flagship denoiser's CFG-doubled forward step — the hot loop of
inference (SURVEY.md §3.2-3.3) — on the local accelerator, bf16. Baseline:
Open-Sora v1.0 on H800-80G runs 16f@256×256 DDIM-50 in 11 s end-to-end
(/root/reference/README.md:177) ≈ 4.55 denoise steps/s; ``vs_baseline`` is
our steps/s over that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_STEPS_PER_SEC = 50.0 / 11.0  # H800: 50 DDIM steps in ≤11 s


def main():
    from __graft_entry__ import _flagship
    model, (x, t, y, mask) = _flagship(dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.key(0), x, t, y, mask)["params"]
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)

    # CFG batch-doubling: one denoise step = one forward at batch 2
    x2 = jnp.concatenate([x, x], 0)
    t2 = jnp.concatenate([t, t], 0)
    y2 = jnp.concatenate([y, y], 0)
    m2 = jnp.concatenate([mask, mask], 0)

    @jax.jit
    def step(x, t, y, m):
        return model.apply({"params": params}, x, t, y, m)

    out = step(x2, t2, y2, m2)
    out.block_until_ready()  # compile

    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = step(x2, t2, y2, m2)
    out.block_until_ready()
    elapsed = time.perf_counter() - t0
    steps_per_sec = n / elapsed

    print(json.dumps({
        "metric": "stdit_xl2_denoise_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s (CFG-doubled fwd, 16x32x32 latents, bf16)",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
