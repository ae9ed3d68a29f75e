"""Benchmark: DiT denoise steps/sec/chip (BASELINE.json north-star metric).

Measures the flagship denoiser's CFG-doubled forward step — the hot loop of
inference (SURVEY.md §3.2-3.3) — on the local accelerator in bf16. To exclude
host→device round-trip latency (this rig tunnels to the chip), the N steps run
as one ``lax.scan`` chained on-device and a single scalar is fetched.

Baseline: Open-Sora v1.0 on H800-80G runs 16f@256×256 DDIM-50 in 11 s
end-to-end (/root/reference/README.md:177) ≈ 4.55 denoise steps/s;
``vs_baseline`` is our steps/s over that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_STEPS_PER_SEC = 50.0 / 11.0  # H800: 50 DDIM steps in ≤11 s
N_STEPS = 20


def main():
    for attempt in range(3):
        try:
            _run()
            return
        except Exception as e:  # remote compile service can drop requests
            import sys
            print(f"bench attempt {attempt + 1} failed: {e}",
                  file=sys.stderr)
            time.sleep(30)
    _run()  # final attempt, let it raise


def _run():
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass
    from __graft_entry__ import _flagship, _flagship_params
    model, (x, t, y, mask) = _flagship(dtype=jnp.bfloat16)
    params = _flagship_params(model, jnp.bfloat16)

    # CFG batch-doubling: one denoise step = one forward at batch 2
    x2 = jnp.concatenate([x, x], 0)
    t2 = jnp.concatenate([t, t], 0)
    y2 = jnp.concatenate([y, y], 0)
    m2 = jnp.concatenate([mask, mask], 0)

    # One jitted step; the loop chains outputs into inputs so each dispatch
    # is data-dependent on the previous (device-side serialization), and only
    # ONE scalar fetch at the end — excludes per-step host RTT through the
    # tunnel. (An outer lax.scan would also work but takes far longer to
    # compile through the remote AOT service.)
    @jax.jit
    def step(x):
        out = model.apply({"params": params}, x, t2, y2, m2)
        return out[..., :x.shape[-1]].astype(x.dtype)

    warm = step(x2)
    float(jnp.sum(warm.astype(jnp.float32)))  # compile + warm + sync

    t0 = time.perf_counter()
    cur = x2
    for _ in range(N_STEPS):
        cur = step(cur)
    float(jnp.sum(cur.astype(jnp.float32)))   # single sync
    elapsed = time.perf_counter() - t0
    steps_per_sec = N_STEPS / elapsed

    print(json.dumps({
        "metric": "stdit_xl2_denoise_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s (CFG-doubled fwd, 16x32x32 latents, bf16)",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
