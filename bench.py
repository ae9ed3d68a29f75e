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
    # float(...) forces a device->host fetch, which is the only reliable
    # sync through the axon tunnel (block_until_ready can return early).
    # Accept pytrees: stage APIs return (img, txt, ...) tuples.
    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, "astype")]
    return float(sum(jnp.sum(l.astype(jnp.float32)) for l in leaves))


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


# ---------------------------------------------------------------------------
# North-star suite: CogVideoX-5B-class / Hunyuan-13B-class denoise + MFU,
# end-to-end videos/min incl. VAE decode (BASELINE.md README.md:171-177)
# ---------------------------------------------------------------------------

V5E_PEAK_BF16 = 1.97e14                # TPU v5e peak bf16 FLOP/s per chip


def _dit_flops(seq: int, dim: int, depth: int, batch: int,
               mlp_ratio: float = 4.0) -> float:
    """Analytic forward FLOPs of a standard DiT stack: per layer
    qkv+out (8·s·d²) + MLP (4r·s·d²) + attention (4·s²·d)."""
    per_layer = (8 + 4 * mlp_ratio) * seq * dim * dim + 4 * seq * seq * dim
    return float(batch * depth * per_layer)


def _chain_and_time(step, x0, n_steps: int, static_max=None):
    """``static_max``: fixed-max softmax for qk-NORMED models only (the
    scope matters at trace time, so it must wrap the compiling first
    call); measured 1.14× on the packed d=64 kernel, 1.08× on the plain
    d=128 one. Leave None for un-normed attention (UNets, STDiT)."""
    import contextlib
    from videotuna_tpu.kernels.attention import attention_options
    ctx = (attention_options(static_max=static_max)
           if static_max is not None else contextlib.nullcontext())
    with ctx:
        _sync(step(x0))                # compile + warm + sync
        t0 = time.perf_counter()
        cur = x0
        for _ in range(n_steps):
            cur = step(cur)
        _sync(cur)
    return n_steps / (time.perf_counter() - t0)



def _bf16_params(model, *init_args, **init_kw):
    """Parameter tree at the model's shapes, materialized directly in bf16
    (a 5B fp32 init = 20 GB would OOM the 16 GB chip before the bench
    starts; zeros time identically to random data on the MXU)."""
    import functools
    shapes = jax.eval_shape(
        functools.partial(model.init, jax.random.key(0), **init_kw),
        *init_args)
    def mk(s):
        dt = jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype
        return jnp.zeros(s.shape, dt)
    return jax.tree.map(mk, shapes)["params"]


def _bf16_params_random(model, *init_args, scale: float = 0.02,
                        **init_kw):
    """Like _bf16_params but N(0, scale) — for QUALITY gates, where
    zeros-params would make every output zero and a relative error
    0/0. Still materialized straight to bf16 (no f32 20 GB init)."""
    import functools
    shapes = jax.eval_shape(
        functools.partial(model.init, jax.random.key(0), **init_kw),
        *init_args)
    import numpy as np
    rng = np.random.default_rng(7)

    def mk(s):
        dt = jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype
        if jnp.issubdtype(dt, jnp.floating):
            # host RNG: no per-shape device compiles through the
            # remote compile tunnel
            return jnp.asarray(
                rng.standard_normal(s.shape, np.float32) * scale, dt)
        return jnp.zeros(s.shape, dt)

    return jax.tree.map(mk, shapes)["params"]


def _bench_cogvideox5b(depth: int = 42, n_steps: int = 8,
                       frames: int = 13, hh: int = 60, ww: int = 90,
                       dim: int = 3072, heads: int = 48):
    """CogVideoX-5B class (dim 3072, 48 heads) at the north-star 49f
    480×720 geometry: latents 13×60×90 → 17 550 video tokens + 226 text,
    CFG-doubled. H800 baseline: 2 min/video ⇒ ≥0.42 denoise steps/s
    (BASELINE.md README.md:175)."""
    from videotuna_tpu.models.cogvideo.mmdit import CogVideoXTransformer
    model = CogVideoXTransformer(dim=dim, num_layers=depth, heads=heads,
                                 dtype=jnp.bfloat16, scan_blocks=True)
    b = 2
    x = jnp.zeros((b, frames, hh, ww, 16))
    t = jnp.zeros((b,), jnp.int32)
    y = jnp.zeros((b, 226, 4096))
    params = _bf16_params(model, x, t, y)

    # params must be an ARGUMENT: jit embeds closed-over arrays as HLO
    # constants (host round-trip + device copy — instant OOM at 10 GB)
    @jax.jit
    def step_p(p, x):
        return model.apply({"params": p}, x, t, y)[..., :16] \
            .astype(x.dtype)

    # static-max softmax, matching CogVideoXFlow's default (qk-LN bounds
    # the logits; exactness pinned by test_static_max_packed2t_*). The
    # scope matters at TRACE time, so it must wrap the first call.
    from videotuna_tpu.kernels.attention import attention_options
    with attention_options(static_max=0.0):
        step = lambda x: step_p(params, x)
        sps = _chain_and_time(step, x, n_steps)
    seq = frames * (hh // 2) * (ww // 2) + 226
    mfu = _dit_flops(seq, dim, depth, b) * sps / V5E_PEAK_BF16
    return {"metric": "cogvideox5b_denoise_steps_per_sec_per_chip",
            "value": round(sps, 3),
            "unit": f"steps/s (CFG-doubled, 13x60x90 latents, depth "
                    f"{depth}, bf16, static-max softmax)",
            "mfu": round(mfu, 3),
            "vs_baseline": round(sps / (50.0 / 120.0), 3),
            # v5e peak is 197 TF/s bf16 vs H800's ~990: per-chip steps/s
            # cannot reach a compute-bound H800 on a dense 5B model; the
            # peak-normalized ratio is the utilization comparison
            "vs_baseline_peak_normalized": round(
                (sps / (50.0 / 120.0)) * (989e12 / V5E_PEAK_BF16), 3)}


def _bench_hunyuan13b(double: int = 5, single: int = 10, n_steps: int = 4,
                      frames: int = 17, hh: int = 60, ww: int = 80,
                      dim: int = 3072, heads: int = 24):
    """Hunyuan-13B class (dim 3072, 24 heads, full 3D attention) scaled to
    1/4 depth so bf16 params fit one v5e chip; step time extrapolates
    linearly in depth (blocks dominate). Geometry: 65f 480×640 → 20 400
    video tokens + 256 text."""
    from videotuna_tpu.models.hunyuan.dit import HYVideoDiT
    model = HYVideoDiT(dim=dim, heads=heads, double_blocks=double,
                       single_blocks=single, dtype=jnp.bfloat16,
                       scan_blocks=True)
    b = 1                              # CFG-distilled: single forward
    x = jnp.zeros((b, frames, hh, ww, 16))
    t = jnp.zeros((b,))
    y = jnp.zeros((b, 256, 4096))
    pooled = jnp.zeros((b, 768))
    mask = jnp.ones((b, 256), bool)
    params = _bf16_params(model, x, t, y, pooled, mask)

    @jax.jit
    def step_p(p, x):
        return model.apply({"params": p}, x, t, y, pooled,
                           mask)[..., :16].astype(x.dtype)

    step = lambda x: step_p(params, x)
    sps = _chain_and_time(step, x, n_steps, static_max=0.0)
    # single-stream blocks cost ≈ half a double block; extrapolate steps/s
    # linearly in equivalent depth (blocks dominate the step)
    # time scales with FLOPs, and a single block costs the SAME flops as a
    # double block (full concat seq through one stream)
    full_sps = sps * (double + single) / (20 + 40)
    seq = frames * (hh // 2) * (ww // 2) + 256
    # FLOPs: a single-stream block runs the FULL concat sequence through
    # one 12d^2-param stream = the SAME 24*S*d^2 + 4*S^2*d as a double
    # block (half the PARAMS, equal FLOPs) -> depth is double + single
    mfu = _dit_flops(seq, dim, double + single, b) * sps \
        / V5E_PEAK_BF16
    return {"metric": "hunyuan13b_class_denoise_steps_per_sec_per_chip",
            "value": round(sps, 3),
            "unit": f"steps/s ({double}dbl+{single}sgl blocks, 17x60x80 "
                    f"latents, bf16; full-depth extrapolation "
                    f"{round(full_sps, 3)} steps/s)",
            "mfu": round(mfu, 3),
            "full_depth_steps_per_sec": round(full_sps, 4)}


def _bench_hunyuan_breakdown(frames: int = 17, hh: int = 60, ww: int = 80,
                             dim: int = 3072, heads: int = 24,
                             n_iters: int = 4):
    """Diagnosis for the hunyuan13b_class MFU gap (39.4% measured vs the
    ~61% the d=128 kernel and ~78% the MLP matmuls reach in isolation):
    times ONE double block end-to-end against its two compute kernels in
    isolation at the same geometry. block_ms − attn_ms − matmul_ms =
    glue (RoPE, qk-norms, modulation, txt/img concat, residuals)."""
    from videotuna_tpu.kernels.attention import flash_attention
    from videotuna_tpu.models.hunyuan.dit import HYVideoDiT
    seq = frames * (hh // 2) * (ww // 2) + 256
    b = 1

    # (1) one full double block via the stage API
    model = HYVideoDiT(dim=dim, heads=heads, double_blocks=1,
                       single_blocks=1, dtype=jnp.bfloat16,
                       scan_blocks=True)
    x = jnp.zeros((b, frames, hh, ww, 16))
    t = jnp.zeros((b,))
    y = jnp.zeros((b, 256, 4096))
    pooled = jnp.zeros((b, 768))
    mask = jnp.ones((b, 256), bool)
    params = _bf16_params(model, x, t, y, pooled, mask)
    grid = (frames, hh // 2, ww // 2)
    import functools
    e_fn = jax.jit(functools.partial(model.apply, stage="embed"))
    img, txt, vec, vec_tr = jax.block_until_ready(
        e_fn({"params": params}, x, t, y, pooled, mask))
    d_fn = jax.jit(functools.partial(model.apply, stage="double",
                                     grid=grid))

    def timed(fn, *args):
        _sync(fn(*args))
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fn(*args)
        _sync(out)
        return (time.perf_counter() - t0) / n_iters * 1e3

    block_ms = timed(lambda p: d_fn({"params": p}, img=img, txt=txt,
                                    vec=vec, vec_tr=vec_tr), params)

    # (2) the attention kernel alone at the block's exact shapes
    hd = dim // heads
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(k1, (b, seq, heads, hd), jnp.bfloat16)
    k = jax.random.normal(k2, (b, seq, heads, hd), jnp.bfloat16)
    v = jax.random.normal(k3, (b, seq, heads, hd), jnp.bfloat16)
    attn_fn = jax.jit(lambda a, b_, c: flash_attention(a, b_, c))
    attn_ms = timed(attn_fn, q, k, v)

    # (3) the block's matmuls alone (img qkv+out+mlp, txt side ~1% extra)
    h = jnp.zeros((seq, dim), jnp.bfloat16)
    w_qkv = jnp.zeros((dim, 3 * dim), jnp.bfloat16)
    w_out = jnp.zeros((dim, dim), jnp.bfloat16)
    w_up = jnp.zeros((dim, 4 * dim), jnp.bfloat16)
    w_dn = jnp.zeros((4 * dim, dim), jnp.bfloat16)

    @jax.jit
    def mm(h, w_qkv, w_out, w_up, w_dn):
        a = h @ w_qkv
        o = a[:, :dim] @ w_out
        m = jax.nn.gelu(h @ w_up) @ w_dn
        return o + m
    matmul_ms = timed(mm, h, w_qkv, w_out, w_up, w_dn)

    glue_ms = block_ms - attn_ms - matmul_ms
    attn_tf = 4.0 * b * seq * seq * dim / (attn_ms / 1e3) / 1e12
    mm_flops = 2.0 * seq * dim * dim * (3 + 1 + 8)
    mm_tf = mm_flops / (matmul_ms / 1e3) / 1e12
    return {"metric": "hunyuan_double_block_breakdown_ms",
            "value": round(block_ms, 2),
            "unit": f"ms/block (seq {seq}, dim {dim}, d=128, bf16)",
            "attn_ms": round(attn_ms, 2),
            "matmul_ms": round(matmul_ms, 2),
            "glue_ms": round(glue_ms, 2),
            "attn_tf_s": round(attn_tf, 1),
            "matmul_tf_s": round(mm_tf, 1),
            "vs_baseline": None}


def _bench_vae_decode(frames: int = 13, hh: int = 30, ww: int = 45,
                      n_reps: int = 3, tiles: int = 4):
    """Causal-3D VAE decode at the 49f 480×720 north-star geometry,
    measured per spatial quarter-tile (13×30×45×16 → 49×240×360) and
    scaled by the tile count — the full-frame decode runs exactly these
    tiles through ``decode_tiled`` (activations at 480p×128ch exceed HBM
    untiled)."""
    from videotuna_tpu.models.vae3d import CausalVAE3D
    vae = CausalVAE3D(dtype=jnp.bfloat16)
    z = jnp.zeros((1, frames, hh, ww, 16), jnp.bfloat16)
    params = _bf16_params(vae, z, method="decode")
    dec = jax.jit(lambda p, z: vae.apply({"params": p}, z,
                                         method="decode"))
    out = dec(params, z)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n_reps):
        out = dec(params, z)
    _sync(out)
    sec = (time.perf_counter() - t0) / n_reps * tiles
    return {"metric": "vae3d_decode_49f_480p_sec", "value": round(sec, 3),
            "unit": f"s (4x spatial tiles of 13x{hh}x{ww}x16, bf16)"}


def _bench_train_stdit(n_steps: int = 8):
    """Flagship TRAINING step (fwd + bwd + adamw update, bf16 params,
    fp32 master in optimizer): the fine-tune hot loop (BASELINE.md
    fine-tune rows; exercises the fused flash backward in-model)."""
    import optax
    from videotuna_tpu.models.opensora.stdit import STDiT
    model = STDiT(input_size=(16, 32, 32), in_channels=4,
                  hidden_size=HIDDEN, depth=DEPTH, num_heads=HEADS,
                  caption_channels=CAP, pred_sigma=False,
                  dtype=jnp.bfloat16, scan_blocks=True, remat=True)
    b = 1
    x = jnp.zeros((b, 16, 32, 32, 4))
    t = jnp.zeros((b,), jnp.int32)
    y = jnp.zeros((b, 120, CAP))
    params = _bf16_params(model, x, t, y)
    tx = optax.adamw(1e-5)
    opt_state = tx.init(params)

    def loss_fn(p, x):
        out = model.apply({"params": p}, x, t, y)
        return jnp.mean((out - x) ** 2)

    @jax.jit
    def train_step(p, o, x):
        loss, g = jax.value_and_grad(loss_fn)(p, x)
        upd, o = tx.update(g, o, p)
        p = optax.apply_updates(p, upd)
        return p, o, loss

    params, opt_state, loss = train_step(params, opt_state, x)
    _sync(loss)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        params, opt_state, loss = train_step(params, opt_state, x)
    _sync(loss)
    sps = n_steps / (time.perf_counter() - t0)
    return {"metric": "stdit_xl2_train_steps_per_sec_per_chip",
            "value": round(sps, 3),
            "unit": "train steps/s (b=1, 16x32x32 latents, bf16+remat, "
                    "adamw)"}




def _bench_attn_d64(seq: int = 17776, heads: int = 48, batch: int = 2,
                    n_iters: int = 6):
    """d=64 attention micro-bench (CogVideoX geometry: 17 550 video +
    226 text tokens, 48 heads, CFG-doubled batch): zero-padded d→128
    kernel vs the packed two-head 128-lane kernel (VERDICT r2 next-1
    "packed vs unpacked ratio"). Useful-FLOP ceiling at d=64 is 50% of
    the MXU regardless of packing (the contraction carries 64 real
    lanes); packing removes the pad/slice copies and halves KV HBM
    streaming."""
    from videotuna_tpu.kernels.attention import flash_attention
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(k1, (batch, seq, heads, 64), jnp.bfloat16)
    k = jax.random.normal(k2, (batch, seq, heads, 64), jnp.bfloat16)
    v = jax.random.normal(k3, (batch, seq, heads, 64), jnp.bfloat16)
    flops = 4.0 * batch * heads * seq * seq * 64   # QK^T + PV, useful

    def timed(**kw):
        fn = jax.jit(lambda a, b_, c: flash_attention(a, b_, c, **kw))
        _sync(fn(q, k, v))
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fn(q, k, v)
        _sync(out)
        return (time.perf_counter() - t0) / n_iters

    t_padded = timed(pack2=False)
    t_packed = timed(pack2=True)
    t_packedt = timed(pack2="t")
    tf_padded = flops / t_padded / 1e12
    tf_packed = flops / t_packed / 1e12
    tf_packedt = flops / t_packedt / 1e12
    best = min(t_packed, t_packedt)
    return {"metric": "attn_d64_packed_vs_padded",
            "value": round(t_padded / best, 3),
            "unit": "speedup (best packed two-head / zero-padded), d=64 "
                    f"seq {seq} heads {heads}",
            "padded_ms": round(t_padded * 1e3, 2),
            "packed_ms": round(t_packed * 1e3, 2),
            "packed_t_ms": round(t_packedt * 1e3, 2),
            "padded_tf_s": round(tf_padded, 1),
            "packed_tf_s": round(tf_packed, 1),
            "packed_t_tf_s": round(tf_packedt, 1),
            # transposed-PV ceiling: QK 2x + PV 1x -> 2/3 of MXU peak
            "packed_t_mfu_of_ceiling": round(
                tf_packedt / (V5E_PEAK_BF16 / 1e12 * 2 / 3), 3),
            "packed_mfu_of_d64_ceiling": round(
                tf_packed / (V5E_PEAK_BF16 / 1e12 * 0.5), 3),
            "vs_baseline": round(t_padded / best, 3)}


def _bench_attn_d64_sweep(seq: int = 17776, heads: int = 48,
                          batch: int = 2, n_iters: int = 4,
                          static_max: float = 16.0):
    """Block-size sweep for the transposed packed d=64 kernel at the
    CogVideoX-5B geometry. The (512, 1024) packed defaults were tuned for
    the NATURAL-layout packed kernel; the transposed variant has a
    different VMEM footprint (two f32 accumulators of (128, bq) plus a
    (bk, bq) score block), so its optimum may differ — the d=128 kernel
    gained 1.8× from the analogous sweep."""
    from videotuna_tpu.kernels.attention import flash_attention
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(k1, (batch, seq, heads, 64), jnp.bfloat16)
    k = jax.random.normal(k2, (batch, seq, heads, 64), jnp.bfloat16)
    v = jax.random.normal(k3, (batch, seq, heads, 64), jnp.bfloat16)
    flops = 4.0 * batch * heads * seq * seq * 64

    def timed(bq, bk):
        # sweep under static-max — the production config since round 3
        # (the rescale-free inner loop shifts the VPU:MXU balance)
        fn = jax.jit(lambda a, b_, c: flash_attention(
            a, b_, c, pack2="t", block_q=bq, block_k=bk,
            static_max=static_max))
        try:
            _sync(fn(q, k, v))
        except Exception as e:  # VMEM overflow at large blocks
            return None, str(e)[:80]
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fn(q, k, v)
        _sync(out)
        return (time.perf_counter() - t0) / n_iters, None

    grid_ms = {}
    best = (None, float("inf"))
    for bq in (256, 512, 1024, 2048):
        for bk in (256, 512, 1024, 2048):
            t, err = timed(bq, bk)
            key = f"{bq}x{bk}"
            grid_ms[key] = round(t * 1e3, 2) if t is not None else err
            if t is not None and t < best[1]:
                best = (key, t)
    return {"metric": "attn_d64_packed_t_block_sweep",
            "value": round(best[1] * 1e3, 2),
            "unit": f"ms (best blocks {best[0]}, seq {seq}, heads "
                    f"{heads}, batch {batch})",
            "best_blocks": best[0],
            "best_tf_s": round(flops / best[1] / 1e12, 1),
            "grid_ms": grid_ms}


def _bench_attn_d64_staticmax(seq: int = 17776, heads: int = 48,
                              batch: int = 2, n_iters: int = 6):
    """A/B: packed-t online softmax vs packed-t STATIC-MAX (no running
    max, no rescales — valid for qk-normed attention) at the CogVideoX
    geometry. Also checks on-chip numerical agreement of the two paths
    (the flow-level opt-in gate: wire static_max into CogVideoX only if
    this shows both a win and agreement)."""
    from videotuna_tpu.kernels.attention import flash_attention
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(k1, (batch, seq, heads, 64), jnp.bfloat16)
    k = jax.random.normal(k2, (batch, seq, heads, 64), jnp.bfloat16)
    v = jax.random.normal(k3, (batch, seq, heads, 64), jnp.bfloat16)
    flops = 4.0 * batch * heads * seq * seq * 64

    def timed(fn):
        _sync(fn(q, k, v))
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fn(q, k, v)
        _sync(out)
        return (time.perf_counter() - t0) / n_iters

    online = jax.jit(lambda a, b_, c: flash_attention(a, b_, c, pack2="t"))
    static = jax.jit(lambda a, b_, c: flash_attention(a, b_, c, pack2="t",
                                                      static_max=16.0))
    t_on = timed(online)
    t_st = timed(static)
    # numerical agreement on-chip (bf16 inputs, f32 accum)
    err = float(jnp.max(jnp.abs(
        online(q, k, v).astype(jnp.float32)
        - static(q, k, v).astype(jnp.float32))))
    return {"metric": "attn_d64_staticmax_speedup",
            "value": round(t_on / t_st, 3),
            "unit": f"speedup (static-max / online), d=64 seq {seq} "
                    f"heads {heads}",
            "online_ms": round(t_on * 1e3, 2),
            "static_ms": round(t_st * 1e3, 2),
            "online_tf_s": round(flops / t_on / 1e12, 1),
            "static_tf_s": round(flops / t_st / 1e12, 1),
            "max_abs_diff": err}


def _bench_attn_d128_staticmax(seq: int = 20656, heads: int = 24,
                               batch: int = 1, n_iters: int = 6):
    """A/B: plain d=128 online softmax vs STATIC-MAX at the
    Hunyuan-class geometry (all d=128 families qk-RMSNorm, so the
    fixed-max path is valid there too). The d=64 twin measured 1.14×;
    this gates defaulting attn_static_max for hunyuan/wan/mochi flows."""
    from videotuna_tpu.kernels.attention import flash_attention
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(k1, (batch, seq, heads, 128), jnp.bfloat16)
    k = jax.random.normal(k2, (batch, seq, heads, 128), jnp.bfloat16)
    v = jax.random.normal(k3, (batch, seq, heads, 128), jnp.bfloat16)
    flops = 4.0 * batch * heads * seq * seq * 128

    def timed(fn):
        _sync(fn(q, k, v))
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fn(q, k, v)
        _sync(out)
        return (time.perf_counter() - t0) / n_iters

    online = jax.jit(lambda a, b_, c: flash_attention(a, b_, c))
    static = jax.jit(lambda a, b_, c: flash_attention(a, b_, c,
                                                      static_max=16.0))
    t_on = timed(online)
    t_st = timed(static)
    err = float(jnp.max(jnp.abs(
        online(q, k, v).astype(jnp.float32)
        - static(q, k, v).astype(jnp.float32))))
    return {"metric": "attn_d128_staticmax_speedup",
            "value": round(t_on / t_st, 3),
            "unit": f"speedup (static-max / online), d=128 seq {seq} "
                    f"heads {heads}",
            "online_ms": round(t_on * 1e3, 2),
            "static_ms": round(t_st * 1e3, 2),
            "online_tf_s": round(flops / t_on / 1e12, 1),
            "static_tf_s": round(flops / t_st / 1e12, 1),
            "max_abs_diff": err}


def _bench_attn_d128t(seq: int = 20656, heads: int = 24,
                      batch: int = 1, n_iters: int = 6):
    """A/B: natural-layout d=128 static-max (2 VPU passes/score tile) vs
    the TRANSPOSED-score fused-l kernel (_flash_kernel_t128: l rides 8
    aux sublanes of the PV matmul, 1 VPU pass). Serial-VPU model
    predicts 126 → ~150 TF/s at the Hunyuan-class geometry."""
    from videotuna_tpu.kernels.attention import flash_attention
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(k1, (batch, seq, heads, 128), jnp.bfloat16)
    k = jax.random.normal(k2, (batch, seq, heads, 128), jnp.bfloat16)
    v = jax.random.normal(k3, (batch, seq, heads, 128), jnp.bfloat16)
    flops = 4.0 * batch * heads * seq * seq * 128

    def timed(fn):
        _sync(fn(q, k, v))
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fn(q, k, v)
        _sync(out)
        return (time.perf_counter() - t0) / n_iters

    natural = jax.jit(lambda a, b_, c: flash_attention(
        a, b_, c, static_max=0.0, static_fused=False))
    fused = jax.jit(lambda a, b_, c: flash_attention(
        a, b_, c, static_max=0.0, static_fused=True))
    t_n = timed(natural)
    t_f = timed(fused)
    err = float(jnp.max(jnp.abs(
        natural(q, k, v).astype(jnp.float32)
        - fused(q, k, v).astype(jnp.float32))))
    return {"metric": "attn_d128t_speedup",
            "value": round(t_n / t_f, 3),
            "unit": f"speedup (transposed fused-l / natural static-max), "
                    f"d=128 seq {seq} heads {heads}",
            "natural_ms": round(t_n * 1e3, 2),
            "fused_ms": round(t_f * 1e3, 2),
            "natural_tf_s": round(flops / t_n / 1e12, 1),
            "fused_tf_s": round(flops / t_f / 1e12, 1),
            "max_abs_diff": err,
            "vs_baseline": None}


def _bench_cogvideox_breakdown(frames: int = 13, hh: int = 60,
                               ww: int = 90, dim: int = 3072,
                               heads: int = 48, n_iters: int = 4):
    """Diagnosis for the CogVideoX-5B step-time split (52.7% MFU measured):
    times ONE joint block end-to-end against its two compute kernels in
    isolation at the same geometry. block_ms − attn_ms − matmul_ms = glue
    (per-modality adaLN selects, qk-layernorms, RoPE, residuals). The
    attention share tells whether further d=64 kernel work or matmul/glue
    fusion is the next lever."""
    from videotuna_tpu.kernels.attention import flash_attention
    from videotuna_tpu.models.cogvideo.mmdit import CogVideoXBlock
    b = 2                          # CFG-doubled
    lt = 226
    seq = frames * (hh // 2) * (ww // 2) + lt
    hd = dim // heads

    def timed(fn, *args):
        _sync(fn(*args))
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fn(*args)
        _sync(out)
        return (time.perf_counter() - t0) / n_iters * 1e3

    # (1) one full joint block
    block = CogVideoXBlock(dim=dim, heads=heads, text_len=lt,
                           dtype=jnp.bfloat16)
    x = jnp.zeros((b, seq, dim), jnp.bfloat16)
    temb = jnp.zeros((b, dim), jnp.bfloat16)
    cos = jnp.ones((seq - lt, hd // 2), jnp.bfloat16)
    sin = jnp.zeros((seq - lt, hd // 2), jnp.bfloat16)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16),
        block.init(jax.random.key(0), x, temb, cos, sin)["params"])
    from videotuna_tpu.kernels.attention import attention_options
    b_fn = jax.jit(lambda p, x: block.apply({"params": p}, x, temb,
                                            cos, sin))
    with attention_options(static_max=0.0):   # production config
        block_ms = timed(b_fn, params, x)

    # (2) the packed_t attention kernel alone at the block's shapes
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(k1, (b, seq, heads, hd), jnp.bfloat16)
    k = jax.random.normal(k2, (b, seq, heads, hd), jnp.bfloat16)
    v = jax.random.normal(k3, (b, seq, heads, hd), jnp.bfloat16)
    attn_fn = jax.jit(lambda a, b_, c: flash_attention(
        a, b_, c, static_max=0.0))   # production config
    attn_ms = timed(attn_fn, q, k, v)

    # (3) the block's matmuls alone (q/k/v/out + ff1/ff2 = 12·d² weights)
    h = jnp.zeros((b * seq, dim), jnp.bfloat16)
    ws = [jnp.zeros((dim, dim), jnp.bfloat16) for _ in range(4)] + \
         [jnp.zeros((dim, 4 * dim), jnp.bfloat16),
          jnp.zeros((4 * dim, dim), jnp.bfloat16)]

    @jax.jit
    def mm(h, wq, wk, wv, wo, w1, w2):
        a = (h @ wq) + (h @ wk) + (h @ wv)
        a = a @ wo
        z = a @ w1
        return z @ w2
    mm_ms = timed(mm, h, *ws)

    mm_flops = 2.0 * b * seq * 12 * dim * dim
    attn_flops = 4.0 * b * heads * seq * seq * hd
    return {"metric": "cogvideox_block_breakdown_ms",
            "value": round(block_ms, 2),
            "unit": f"ms one joint block (b=2, seq {seq}, dim {dim}, "
                    f"{heads} heads d=64, bf16)",
            "attn_ms": round(attn_ms, 2),
            "matmul_ms": round(mm_ms, 2),
            "glue_ms": round(block_ms - attn_ms - mm_ms, 2),
            "attn_tf_s": round(attn_flops / attn_ms / 1e9, 1),
            "matmul_tf_s": round(mm_flops / mm_ms / 1e9, 1),
            "attn_frac": round(attn_ms / block_ms, 3),
            "full_step_extrapolated_s": round(block_ms * 42 / 1e3, 2)}


def _bench_hunyuan13b_full(n_steps: int = 2, frames: int = 17,
                           hh: int = 60, ww: int = 80, dim: int = 3072,
                           heads: int = 24, double: int = 20,
                           single: int = 40, d_chunk: int = 4,
                           s_chunk: int = 8):
    """Hunyuan-13B FULL depth (20 double + 40 single blocks), MEASURED —
    no extrapolation (VERDICT r2 next-4): bf16 params ≈ 26 GB > 16 GB
    HBM, so block params live in host RAM and stream through
    tools.offload.BlockStreamer (double-buffered device_put) while
    embed/head params stay resident. Geometry: 65f 480×640 → 20 400
    video tokens + 256 text. Reports steps/s and the streaming-bound
    fraction (transfer GB/s implied)."""
    import numpy as np
    from ml_dtypes import bfloat16 as np_bf16
    from videotuna_tpu.models.hunyuan.dit import HYVideoDiT
    from videotuna_tpu.tools.offload import BlockStreamer, split_stacked

    full = HYVideoDiT(dim=dim, heads=heads, double_blocks=double,
                      single_blocks=single, dtype=jnp.bfloat16,
                      scan_blocks=True)
    b = 1
    x = jnp.zeros((b, frames, hh, ww, 16))
    t = jnp.zeros((b,))
    y = jnp.zeros((b, 256, 4096))
    pooled = jnp.zeros((b, 768))
    mask = jnp.ones((b, 256), bool)

    import functools
    shapes = jax.eval_shape(
        functools.partial(full.init, jax.random.key(0)),
        x, t, y, pooled, mask)["params"]

    def host_zeros(tree):
        return jax.tree.map(
            lambda s: np.zeros(s.shape, np_bf16), tree)

    emb_keys = [k for k in shapes
                if k not in ("double_blocks", "single_blocks",
                             "final_mod", "final_norm", "final_proj")]
    emb_params = jax.device_put(host_zeros(
        {k: shapes[k] for k in emb_keys}))
    head_params = jax.device_put(host_zeros(
        {k: shapes[k] for k in ("final_mod", "final_proj")
         if k in shapes}))
    d_chunks = split_stacked(host_zeros(shapes["double_blocks"]),
                             double // d_chunk)
    s_chunks = split_stacked(host_zeros(shapes["single_blocks"]),
                             single // s_chunk)
    bytes_streamed = sum(a.nbytes for c in d_chunks + s_chunks
                         for a in jax.tree.leaves(c))

    grid = (frames, hh // 2, ww // 2)
    sub_d = HYVideoDiT(dim=dim, heads=heads, double_blocks=d_chunk,
                       single_blocks=single, dtype=jnp.bfloat16,
                       scan_blocks=True)
    sub_s = HYVideoDiT(dim=dim, heads=heads, double_blocks=double,
                       single_blocks=s_chunk, dtype=jnp.bfloat16,
                       scan_blocks=True)

    e_fn = jax.jit(functools.partial(full.apply, stage="embed"))
    d_fn = jax.jit(functools.partial(sub_d.apply, stage="double",
                                     grid=grid))
    s_fn = jax.jit(functools.partial(sub_s.apply, stage="single",
                                     grid=grid))
    h_fn = jax.jit(functools.partial(full.apply, stage="head", grid=grid))

    def one_step(x_in):
        img, txt, vec, vec_tr = e_fn({"params": emb_params}, x_in, t, y,
                                     pooled, mask)
        streamer_d = BlockStreamer([{"double_blocks": c}
                                    for c in d_chunks])

        def apply_d(chunk, carry):
            i, tx = carry
            i, tx = d_fn({"params": chunk}, img=i, txt=tx, vec=vec,
                         vec_tr=vec_tr)
            return i, tx
        img, txt = streamer_d.run(apply_d, (img, txt))
        xcat = jnp.concatenate([img, txt], axis=1)
        streamer_s = BlockStreamer([{"single_blocks": c}
                                    for c in s_chunks])

        def apply_s(chunk, carry):
            return s_fn({"params": chunk}, xcat=carry, vec=vec,
                        vec_tr=vec_tr)
        xcat = streamer_s.run(apply_s, xcat)
        img_len = grid[0] * grid[1] * grid[2]
        out = h_fn({"params": head_params}, img=xcat[:, :img_len],
                   vec=vec)
        return out[..., :16].astype(x_in.dtype)

    sps = _chain_and_time(one_step, x, n_steps, static_max=0.0)
    seq = frames * (hh // 2) * (ww // 2) + 256
    # single blocks: half the params, EQUAL flops (full concat seq)
    eq_depth = double + single
    mfu = _dit_flops(seq, dim, eq_depth, b) * sps / V5E_PEAK_BF16
    implied_gbs = bytes_streamed * sps / 1e9
    return {"metric": "hunyuan13b_FULL_depth_denoise_steps_per_sec",
            "value": round(sps, 4),
            "unit": f"steps/s MEASURED ({double}dbl+{single}sgl via host "
                    f"streaming, {bytes_streamed / 1e9:.1f} GB/step, "
                    "17x60x80 latents, bf16)",
            "mfu": round(mfu, 4),
            "streamed_gb_per_step": round(bytes_streamed / 1e9, 1),
            "implied_stream_gb_s": round(implied_gbs, 2),
            "status": "superseded",
            "superseded_by": "hunyuan13b_full_fp8",
            "vs_baseline": round(sps / (50.0 / 1920.0), 3)}



def _bench_hunyuan13b_fp8(n_steps: int = 3, frames: int = 17,
                          hh: int = 60, ww: int = 80, dim: int = 3072,
                          heads: int = 24, double: int = 20,
                          single: int = 40, d_chunk: int = 2,
                          s_chunk: int = 4):
    """Hunyuan-13B FULL depth, fp8-RESIDENT — the reference's deployment
    mode for this model (fp8 weights with per-tensor dequant scales,
    /root/reference/videotuna/models/hunyuan/hyvideo_i2v/modules/
    fp8_optimization.py, enabled at flow/hunyuanvideo.py:336-337).
    ~11.5 GB of fp8 block params stay in HBM; each chunk is dequantized
    to bf16 inside its jitted stage (XLA fuses scale*convert into the
    consuming matmuls where it can, and the per-chunk bf16 temp is
    transient). Unlike the host-streaming bench this measures pure
    compute — no PCIe/tunnel bandwidth in the loop."""
    import numpy as np
    from ml_dtypes import float8_e4m3fn as np_fp8
    from videotuna_tpu.models.hunyuan.dit import HYVideoDiT
    from videotuna_tpu.tools.fp8 import dequantize_tree
    from videotuna_tpu.tools.offload import split_stacked

    full = HYVideoDiT(dim=dim, heads=heads, double_blocks=double,
                      single_blocks=single, dtype=jnp.bfloat16,
                      scan_blocks=True)
    b = 1
    x = jnp.zeros((b, frames, hh, ww, 16))
    t = jnp.zeros((b,))
    y = jnp.zeros((b, 256, 4096))
    pooled = jnp.zeros((b, 768))
    mask = jnp.ones((b, 256), bool)

    import functools
    shapes = jax.eval_shape(
        functools.partial(full.init, jax.random.key(0)),
        x, t, y, pooled, mask)["params"]

    def host_zeros_bf16(tree):
        from ml_dtypes import bfloat16 as np_bf16
        return jax.tree.map(lambda s: np.zeros(s.shape, np_bf16), tree)

    def host_zeros_fp8(tree):
        """fp8 values + unit scales (zeros quantize to zeros; unit scale
        keeps the dequant multiply in the program, which is what costs)."""
        vals = jax.tree.map(lambda s: np.zeros(s.shape, np_fp8), tree)
        scales = jax.tree.map(lambda s: np.float32(1.0), tree)
        return vals, scales

    emb_keys = [k for k in shapes
                if k not in ("double_blocks", "single_blocks",
                             "final_mod", "final_norm", "final_proj")]
    emb_params = jax.device_put(host_zeros_bf16(
        {k: shapes[k] for k in emb_keys}))
    head_params = jax.device_put(host_zeros_bf16(
        {k: shapes[k] for k in ("final_mod", "final_proj")
         if k in shapes}))
    dv, dsc = host_zeros_fp8(shapes["double_blocks"])
    sv, ssc = host_zeros_fp8(shapes["single_blocks"])
    d_chunks = [jax.device_put(c)
                for c in split_stacked(dv, double // d_chunk)]
    s_chunks = [jax.device_put(c)
                for c in split_stacked(sv, single // s_chunk)]
    resident = sum(a.nbytes for c in d_chunks + s_chunks
                   for a in jax.tree.leaves(c))

    grid = (frames, hh // 2, ww // 2)
    sub_d = HYVideoDiT(dim=dim, heads=heads, double_blocks=d_chunk,
                       single_blocks=single, dtype=jnp.bfloat16,
                       scan_blocks=True)
    sub_s = HYVideoDiT(dim=dim, heads=heads, double_blocks=double,
                       single_blocks=s_chunk, dtype=jnp.bfloat16,
                       scan_blocks=True)

    e_fn = jax.jit(functools.partial(full.apply, stage="embed"))
    h_fn = jax.jit(functools.partial(full.apply, stage="head", grid=grid))

    @jax.jit
    def d_fn(chunk, img, txt, vec, vec_tr):
        deq = dequantize_tree(chunk, dsc, jnp.bfloat16)
        return sub_d.apply({"params": {"double_blocks": deq}}, img=img,
                           txt=txt, vec=vec, vec_tr=vec_tr, stage="double",
                           grid=grid)

    @jax.jit
    def s_fn(chunk, xcat, vec, vec_tr):
        deq = dequantize_tree(chunk, ssc, jnp.bfloat16)
        return sub_s.apply({"params": {"single_blocks": deq}}, xcat=xcat,
                           vec=vec, vec_tr=vec_tr, stage="single",
                           grid=grid)

    def one_step(x_in):
        img, txt, vec, vec_tr = e_fn({"params": emb_params}, x_in, t, y,
                                     pooled, mask)
        for c in d_chunks:
            img, txt = d_fn(c, img, txt, vec, vec_tr)
        xcat = jnp.concatenate([img, txt], axis=1)
        for c in s_chunks:
            xcat = s_fn(c, xcat, vec, vec_tr)
        img_len = grid[0] * grid[1] * grid[2]
        out = h_fn({"params": head_params}, img=xcat[:, :img_len],
                   vec=vec)
        return out[..., :16].astype(x_in.dtype)

    sps = _chain_and_time(one_step, x, n_steps, static_max=0.0)
    seq = frames * (hh // 2) * (ww // 2) + 256
    # single blocks: half the params, EQUAL flops (full concat seq)
    eq_depth = double + single
    mfu = _dit_flops(seq, dim, eq_depth, b) * sps / V5E_PEAK_BF16
    return {"metric": "hunyuan13b_FULL_depth_fp8_denoise_steps_per_sec",
            "value": round(sps, 4),
            "unit": f"steps/s MEASURED ({double}dbl+{single}sgl fp8-"
                    f"resident {resident / 1e9:.1f} GB, per-chunk bf16 "
                    "dequant in-jit, 17x60x80 latents)",
            "mfu": round(mfu, 4),
            "fp8_resident_gb": round(resident / 1e9, 1),
            "vs_baseline": round(sps / (50.0 / 1920.0), 3)}


def _bench_hunyuan13b_int8(n_steps: int = 3, frames: int = 17,
                           hh: int = 60, ww: int = 80, dim: int = 3072,
                           heads: int = 24, double: int = 20,
                           single: int = 40, d_chunk: int = 2,
                           s_chunk: int = 4):
    """Hunyuan-13B FULL depth with w8a8 int8 serving: same stage-chunked
    residency protocol as the fp8 bench, but the block projections are
    int8-RESIDENT (kernel_q/kernel_scale, tools/int8.py) and EXECUTE on
    the int8 MXU — the fp8 mode dequantizes to bf16 before every matmul
    (memory-only win, mirroring the reference's fp8_optimization.py);
    this one also halves the MXU time of every projection. Attention,
    norms, embed and head stay bf16. Quality: depth-(1dbl+2sgl) w8a8 vs
    bf16 gate on N(0,0.02) params, plus tests/test_int8.py."""
    import numpy as np
    from videotuna_tpu.models.hunyuan.dit import HYVideoDiT
    from videotuna_tpu.tools.int8 import int8_scope, quantize_params_int8
    from videotuna_tpu.tools.offload import split_stacked

    b = 1
    x = jnp.zeros((b, frames, hh, ww, 16))
    t = jnp.zeros((b,))
    y = jnp.zeros((b, 256, 4096))
    pooled = jnp.zeros((b, 768))
    mask = jnp.ones((b, 256), bool)
    import functools

    # ---- quality gate at 1dbl+2sgl ----
    mg = HYVideoDiT(dim=dim, heads=heads, double_blocks=1,
                    single_blocks=2, dtype=jnp.bfloat16, scan_blocks=True)
    pg = _bf16_params_random(mg, x, t, y, pooled, mask)
    qg = quantize_params_int8(pg)
    xe = jax.random.normal(jax.random.key(3), x.shape, jnp.float32) * 0.5
    from videotuna_tpu.kernels.attention import attention_options
    with attention_options(static_max=0.0):
        ref = jax.jit(lambda p, xx: mg.apply({"params": p}, xx, t, y,
                                             pooled, mask))(
            pg, xe).astype(jnp.float32)
        with int8_scope():
            got = jax.jit(lambda p, xx: mg.apply(
                {"params": p}, xx, t, y, pooled, mask))(
                qg, xe).astype(jnp.float32)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    for leaf in jax.tree.leaves(pg) + jax.tree.leaves(qg) + [ref, got]:
        if hasattr(leaf, "delete"):
            leaf.delete()

    # ---- full-depth timing, int8-resident chunked blocks ----
    full = HYVideoDiT(dim=dim, heads=heads, double_blocks=double,
                      single_blocks=single, dtype=jnp.bfloat16,
                      scan_blocks=True)
    shapes = jax.eval_shape(
        functools.partial(full.init, jax.random.key(0)),
        x, t, y, pooled, mask)["params"]

    def host_zeros_bf16(tree):
        from ml_dtypes import bfloat16 as np_bf16
        return jax.tree.map(lambda s: np.zeros(s.shape, np_bf16), tree)

    def host_int8_tree(tree):
        """Host-materialized int8-quantized block tree: int8 zero
        kernels + UNIT scales (keeps every rescale multiply in the
        program; zeros time identically on the MXU)."""
        qshapes = jax.eval_shape(quantize_params_int8, tree)

        def mk(path, s):
            if s.dtype == jnp.int8:
                return np.zeros(s.shape, np.int8)
            if path and str(getattr(path[-1], "key", path[-1])) \
                    == "kernel_scale":
                return np.ones(s.shape, np.float32)
            from ml_dtypes import bfloat16 as np_bf16
            dt = np_bf16 if s.dtype == jnp.bfloat16 else \
                np.dtype(s.dtype)
            return np.zeros(s.shape, dt)

        return jax.tree_util.tree_map_with_path(mk, qshapes)

    emb_keys = [k for k in shapes
                if k not in ("double_blocks", "single_blocks",
                             "final_mod", "final_norm", "final_proj")]
    emb_params = jax.device_put(host_zeros_bf16(
        {k: shapes[k] for k in emb_keys}))
    head_params = jax.device_put(host_zeros_bf16(
        {k: shapes[k] for k in ("final_mod", "final_proj")
         if k in shapes}))
    dq = host_int8_tree(shapes["double_blocks"])
    sq = host_int8_tree(shapes["single_blocks"])
    d_chunks = [jax.device_put(c)
                for c in split_stacked(dq, double // d_chunk)]
    s_chunks = [jax.device_put(c)
                for c in split_stacked(sq, single // s_chunk)]
    resident = sum(a.nbytes for c in d_chunks + s_chunks
                   for a in jax.tree.leaves(c))

    grid = (frames, hh // 2, ww // 2)
    sub_d = HYVideoDiT(dim=dim, heads=heads, double_blocks=d_chunk,
                       single_blocks=single, dtype=jnp.bfloat16,
                       scan_blocks=True)
    sub_s = HYVideoDiT(dim=dim, heads=heads, double_blocks=double,
                       single_blocks=s_chunk, dtype=jnp.bfloat16,
                       scan_blocks=True)

    e_fn = jax.jit(functools.partial(full.apply, stage="embed"))
    h_fn = jax.jit(functools.partial(full.apply, stage="head", grid=grid))

    @jax.jit
    def d_fn(chunk, img, txt, vec, vec_tr):
        with int8_scope():
            return sub_d.apply({"params": {"double_blocks": chunk}},
                               img=img, txt=txt, vec=vec, vec_tr=vec_tr,
                               stage="double", grid=grid)

    @jax.jit
    def s_fn(chunk, xcat, vec, vec_tr):
        with int8_scope():
            return sub_s.apply({"params": {"single_blocks": chunk}},
                               xcat=xcat, vec=vec, vec_tr=vec_tr,
                               stage="single", grid=grid)

    def one_step(x_in):
        img, txt, vec, vec_tr = e_fn({"params": emb_params}, x_in, t, y,
                                     pooled, mask)
        for c in d_chunks:
            img, txt = d_fn(c, img, txt, vec, vec_tr)
        xcat = jnp.concatenate([img, txt], axis=1)
        for c in s_chunks:
            xcat = s_fn(c, xcat, vec, vec_tr)
        img_len = grid[0] * grid[1] * grid[2]
        out = h_fn({"params": head_params}, img=xcat[:, :img_len],
                   vec=vec)
        return out[..., :16].astype(x_in.dtype)

    sps = _chain_and_time(one_step, x, n_steps, static_max=0.0)
    seq = frames * (hh // 2) * (ww // 2) + 256
    eq_depth = double + single
    mfu_eq = _dit_flops(seq, dim, eq_depth, b) * sps / V5E_PEAK_BF16
    return {"metric": "hunyuan13b_FULL_depth_int8_denoise_steps_per_sec",
            "value": round(sps, 4),
            "unit": f"steps/s MEASURED ({double}dbl+{single}sgl w8a8 "
                    f"int8-resident {resident / 1e9:.1f} GB, projections "
                    "on the int8 MXU, 17x60x80 latents)",
            "bf16_equivalent_mfu": round(mfu_eq, 4),
            "one_step_rel_err_vs_bf16_small": round(rel, 5),
            "int8_resident_gb": round(resident / 1e9, 1),
            "vs_baseline": round(sps / (50.0 / 1920.0), 3)}


def _bench_wan14b(n_steps: int = 2, frames: int = 21, hh: int = 60,
                  ww: int = 90, dim: int = 5120, ffn: int = 13824,
                  layers: int = 40, heads: int = 40, chunk: int = 4):
    """Wan2.1-14B class denoise, MEASURED via host streaming (28 GB bf16
    params > HBM; BlockStreamer chunks of 4 layers). Geometry scaled to
    the 480p class (latents 21×60×90 → 28.4k tokens after (1,2,2)
    patchify; the baseline row is 81f 720p on H800-80G, README.md:172 —
    32 min / 50 steps ⇒ 0.026 steps/s there at 75.6k tokens)."""
    import numpy as np
    from ml_dtypes import bfloat16 as np_bf16
    from videotuna_tpu.models.wan.dit import WanModel
    from videotuna_tpu.tools.offload import BlockStreamer, split_stacked

    full = WanModel(dim=dim, ffn_dim=ffn, num_layers=layers, heads=heads,
                    dtype=jnp.bfloat16, scan_blocks=True)
    b = 1
    x = jnp.zeros((b, frames, hh, ww, 16))
    t = jnp.zeros((b,))
    ctx = jnp.zeros((b, 512, 4096))
    import functools
    shapes = jax.eval_shape(
        functools.partial(full.init, jax.random.key(0)), x, t, ctx
    )["params"]
    hz = lambda tree: jax.tree.map(
        lambda sh: np.zeros(sh.shape, np_bf16), tree)
    emb_keys = [k for k in shapes if k not in
                ("blocks", "head_modulation", "head_norm", "head_out")]
    emb_params = jax.device_put(hz({k: shapes[k] for k in emb_keys}))
    head_params = jax.device_put(hz(
        {k: shapes[k] for k in ("head_modulation", "head_out")
         if k in shapes}))
    chunks = split_stacked(hz(shapes["blocks"]), layers // chunk)
    streamed = sum(a.nbytes for c in chunks for a in jax.tree.leaves(c))

    grid = (frames, hh // 2, ww // 2)
    sub = WanModel(dim=dim, ffn_dim=ffn, num_layers=chunk, heads=heads,
                   dtype=jnp.bfloat16, scan_blocks=True)
    e_fn = jax.jit(functools.partial(full.apply, stage="embed"))
    b_fn = jax.jit(functools.partial(sub.apply, stage="blocks",
                                     grid=grid))
    h_fn = jax.jit(functools.partial(full.apply, stage="head", grid=grid))

    def one_step(x_in):
        tok, e, e6, c, ci = e_fn({"params": emb_params}, x_in, t, ctx)
        streamer = BlockStreamer([{"blocks": ch} for ch in chunks])

        def apply_chunk(ch, carry):
            return b_fn({"params": ch}, tok=carry, e6=e6, ctx=c,
                        ctx_img=ci)
        tok = streamer.run(apply_chunk, tok)
        out = h_fn({"params": head_params}, tok=tok, e=e)
        return out[..., :16].astype(x_in.dtype)

    sps = _chain_and_time(one_step, x, n_steps, static_max=0.0)
    seq = frames * (hh // 2) * (ww // 2)
    # wan blocks: qkvo (8·S·D²) + cross-attn kv/o vs text (≈4·S·D²) +
    # ffn (2·S·D·ffn·2) + self+cross attention quadratic terms
    per_layer = (12 * seq * dim * dim + 4 * seq * dim * ffn
                 + 4 * seq * seq * dim)
    mfu = b * layers * per_layer * sps / V5E_PEAK_BF16
    return {"metric": "wan14b_class_denoise_steps_per_sec",
            "value": round(sps, 4),
            "unit": f"steps/s MEASURED ({layers} layers dim {dim} via "
                    f"host streaming {streamed / 1e9:.1f} GB/step, "
                    "21x60x90 latents, bf16)",
            "mfu": round(mfu, 4),
            "streamed_gb_per_step": round(streamed / 1e9, 1),
            "status": "superseded",
            "superseded_by": "wan14b_fp8",
            "vs_baseline": round(sps / (50.0 / 1920.0), 3)}


def _bench_wan14b_fp8(n_steps: int = 2, frames: int = 21, hh: int = 60,
                      ww: int = 90, dim: int = 5120, ffn: int = 13824,
                      layers: int = 40, heads: int = 40, chunk: int = 1):
    """Wan2.1-14B class, fp8-RESIDENT (the deployment answer to the
    host-streaming wan14b bench above, whose 28 GB/step over the tunnel
    ran at 0.05 GB/s). All 40 transformer layers stay in HBM as fp8
    (~14 GB) with per-tensor dequant scales; each ``chunk``-layer group
    is dequantized to bf16 inside its jitted stage, so only one small
    bf16 temp (~0.7 GB at chunk=1) exists at a time. Mirrors the
    reference's fp8 deployment mode for its largest models
    (/root/reference/videotuna/models/hunyuan/hyvideo_i2v/modules/
    fp8_optimization.py); Wan-14B at bf16 cannot fit a 16 GB chip at
    all, so fp8-resident is the single-chip serving configuration."""
    import numpy as np
    from ml_dtypes import float8_e4m3fn as np_fp8
    from ml_dtypes import bfloat16 as np_bf16
    from videotuna_tpu.models.wan.dit import WanModel
    from videotuna_tpu.tools.fp8 import dequantize_tree
    from videotuna_tpu.tools.offload import split_stacked

    full = WanModel(dim=dim, ffn_dim=ffn, num_layers=layers, heads=heads,
                    dtype=jnp.bfloat16, scan_blocks=True)
    b = 1
    x = jnp.zeros((b, frames, hh, ww, 16))
    t = jnp.zeros((b,))
    ctx = jnp.zeros((b, 512, 4096))
    import functools
    shapes = jax.eval_shape(
        functools.partial(full.init, jax.random.key(0)), x, t, ctx
    )["params"]
    hz = lambda tree: jax.tree.map(
        lambda sh: np.zeros(sh.shape, np_bf16), tree)
    emb_keys = [k for k in shapes if k not in
                ("blocks", "head_modulation", "head_norm", "head_out")]
    emb_params = jax.device_put(hz({k: shapes[k] for k in emb_keys}))
    head_params = jax.device_put(hz(
        {k: shapes[k] for k in ("head_modulation", "head_out")
         if k in shapes}))
    bv = jax.tree.map(lambda sh: np.zeros(sh.shape, np_fp8),
                      shapes["blocks"])
    bsc = jax.tree.map(lambda sh: np.float32(1.0), shapes["blocks"])
    chunks = [jax.device_put(c)
              for c in split_stacked(bv, layers // chunk)]
    resident = sum(a.nbytes for c in chunks for a in jax.tree.leaves(c))

    grid = (frames, hh // 2, ww // 2)
    sub = WanModel(dim=dim, ffn_dim=ffn, num_layers=chunk, heads=heads,
                   dtype=jnp.bfloat16, scan_blocks=True)
    e_fn = jax.jit(functools.partial(full.apply, stage="embed"))
    h_fn = jax.jit(functools.partial(full.apply, stage="head", grid=grid))

    @jax.jit
    def b_fn(ch, tok, e6, c, ci):
        deq = dequantize_tree(ch, bsc, jnp.bfloat16)
        return sub.apply({"params": {"blocks": deq}}, tok=tok, e6=e6,
                         ctx=c, ctx_img=ci, stage="blocks", grid=grid)

    def one_step(x_in):
        tok, e, e6, c, ci = e_fn({"params": emb_params}, x_in, t, ctx)
        for ch in chunks:
            tok = b_fn(ch, tok, e6, c, ci)
        out = h_fn({"params": head_params}, tok=tok, e=e)
        return out[..., :16].astype(x_in.dtype)

    sps = _chain_and_time(one_step, x, n_steps, static_max=0.0)
    seq = frames * (hh // 2) * (ww // 2)
    per_layer = (12 * seq * dim * dim + 4 * seq * dim * ffn
                 + 4 * seq * seq * dim)
    mfu = b * layers * per_layer * sps / V5E_PEAK_BF16
    return {"metric": "wan14b_class_fp8_denoise_steps_per_sec",
            "value": round(sps, 4),
            "unit": f"steps/s MEASURED ({layers} layers dim {dim} fp8-"
                    f"resident {resident / 1e9:.1f} GB, per-layer bf16 "
                    "dequant in-jit, 21x60x90 latents)",
            "mfu": round(mfu, 4),
            "fp8_resident_gb": round(resident / 1e9, 1),
            "vs_baseline": round(sps / (50.0 / 1920.0), 3)}


def _bench_with_oom_fallback(fn, attempts):
    """Run ``fn(**attempts[0])``; on HBM exhaustion retry with the next
    (smaller) config — TPU windows on the degraded tunnel are too scarce
    to waste on a sizing miss.

    Each attempt runs in its OWN subprocess (``--probe``): in-process
    retries inherit the failed attempt's HBM no matter how hard we
    gc+clear_caches (measured: depth-3 CogVideoX LoRA OOMs after a
    depth-21 failure in the same process but runs clean standalone at
    0.79 steps/s) — the PJRT client keeps backing buffers alive until
    process exit. A fresh process per rung guarantees a clean chip."""
    import os
    import subprocess
    last_msg = None
    for kw in attempts:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--probe",
             fn.__name__, json.dumps(kw)],
            capture_output=True, timeout=3600, text=True)
        line = proc.stdout.strip().splitlines()[-1] if \
            proc.stdout.strip() else ""
        if proc.returncode == 0 and line.startswith("{"):
            return json.loads(line)
        full = (proc.stderr or "") + (proc.stdout or "")
        # match on the FULL output: an XLA OOM ends with a long
        # allocation table, so the marker is nowhere near the tail
        if not any(s in full for s in ("RESOURCE_EXHAUSTED",
                                       "ResourceExhausted",
                                       "Out of memory", "out of memory")):
            raise RuntimeError(f"bench probe {fn.__name__} {kw} failed "
                               f"(non-OOM): {full[-2000:]}")
        last_msg = full[-2000:]
        # the remote TPU server frees a dead client's HBM with several
        # minutes of lag; without this, every later (smaller) rung OOMs
        # against the previous rung's still-resident buffers (observed:
        # a depth-3 rung OOM'd at a 384-byte constant 3 min after the
        # depth-21 client exited, then ran clean at 0.79 steps/s)
        time.sleep(90)
    raise RuntimeError(f"all fallback configs exhausted HBM; last: "
                       f"{last_msg}")


def _mixed_fp8_params(model, args, block_names, **init_kw):
    """Host-fabricated param tree with the big block KERNELS in fp8 and
    everything else bf16, device_put once. flax modules with an explicit
    ``dtype`` cast params to it at use sites; inside ``nn.scan`` the cast
    consumes the per-iteration dynamic-slice of the stacked fp8 params, so
    XLA cannot hoist it — each layer dequantizes transiently in-loop.
    This is the zero-model-change form of the hunyuan fp8 chunked-stage
    bench (fp8 weights resident, bf16 compute — the reference's fp8
    deployment mode, hyvideo fp8_optimization.py)."""
    import functools

    import jax.tree_util as jtu
    import numpy as np
    from ml_dtypes import bfloat16 as np_bf16
    from ml_dtypes import float8_e4m3fn as np_fp8
    shapes = jax.eval_shape(
        functools.partial(model.init, jax.random.key(0), **init_kw),
        *args)["params"]

    def mk(path, s):
        keys = [p.key for p in path if hasattr(p, "key")]
        is_fp8 = keys and keys[-1] == "kernel" and \
            any(k in block_names for k in keys)
        return np.zeros(s.shape, np_fp8 if is_fp8 else np_bf16)

    host = jtu.tree_map_with_path(mk, shapes)
    return jax.device_put(host)


def _bench_stepvideo_class(layers: int = 20, n_steps: int = 3,
                           frames: int = 7, hh: int = 34, ww: int = 62):
    """StepVideo-30B class (BASELINE README.md:173: 51f 544×992, 8 min /
    61 GB on H800): dim 6144 / 48 heads / ffn 24576 geometry with
    ``layers`` of the 48 blocks fp8-resident (full depth = 30 GB fp8,
    beyond one v5e's 16 GB HBM — per-layer time is depth-independent
    since every block is identical; full-depth needs the tp=4 mesh in
    configs/009_stepvideo). CFG-doubled batch, 320 caption + 77 CLIP
    context tokens, 7×34×62 latents."""
    from videotuna_tpu.models.stepvideo.dit import StepVideoModel
    b, d, s_ctx = 2, 6144, 320 + 77
    model = StepVideoModel(in_channels=64, out_channels=64, dim=d,
                           ffn_dim=4 * d, num_layers=layers, heads=48,
                           text_dim=6144, clip_dim=1024,
                           dtype=jnp.bfloat16, scan_blocks=True)
    x = jnp.zeros((b, frames, hh, ww, 64))
    t = jnp.zeros((b,))
    cap = jnp.zeros((b, 320, 6144))
    clip = jnp.zeros((b, 77, 1024))
    params = _mixed_fp8_params(model, (x, t, cap, clip), ("blocks",))
    resident = sum(a.nbytes for a in jax.tree.leaves(params))

    fn = jax.jit(lambda p, xx: model.apply({"params": p}, xx, t, cap,
                                           clip))
    sps = _chain_and_time(lambda xx: fn(params, xx), x, n_steps,
                          static_max=0.0)
    seq = frames * hh * ww
    per_layer = (8 + 16) * seq * d * d + 4 * seq * seq * d \
        + 4 * seq * d * d + 4 * s_ctx * d * d + 4 * seq * s_ctx * d
    mfu = b * layers * per_layer * sps / V5E_PEAK_BF16
    return {"metric": "stepvideo30b_class_denoise_steps_per_sec",
            "value": round(sps, 4),
            "unit": f"steps/s MEASURED ({layers}/48 layers dim {d} fp8-"
                    f"resident {resident / 1e9:.1f} GB, in-scan bf16 "
                    f"dequant, CFG-doubled 7x34x62 latents)",
            "mfu": round(mfu, 4),
            "fp8_resident_gb": round(resident / 1e9, 1),
            "ms_per_layer": round(1e3 / (sps * layers), 2),
            # H800 row: 50 steps in 8 min at FULL 48-layer depth
            "vs_baseline_at_measured_depth": round(
                sps / (50.0 / 480.0 * 48.0 / layers), 3)}


def _bench_mochi_fp8(n_steps: int = 3, frames: int = 14, hh: int = 60,
                     ww: int = 106):
    """Mochi-1 10B (BASELINE README.md:174: 84f 480×848, 2 min / 26 GB on
    H800): FULL-depth AsymmDiT (48 layers, dim 3072/1536) fp8-resident
    (~10 GB), true-CFG doubled batch, 14×60×106 latents (6× temporal /
    8× spatial VAE), 256 T5 tokens."""
    from videotuna_tpu.models.mochi.dit import MochiDiT
    b = 2
    model = MochiDiT(in_channels=12, dim=3072, dim_y=1536, depth=48,
                     heads=24, patch_size=2, caption_channels=4096,
                     dtype=jnp.bfloat16, scan_blocks=True)
    x = jnp.zeros((b, frames, hh, ww, 12))
    t = jnp.zeros((b,))
    y = jnp.zeros((b, 256, 4096))
    mask = jnp.ones((b, 256), bool)
    params = _mixed_fp8_params(model, (x, t, y, mask),
                               ("blocks", "block_47"))
    resident = sum(a.nbytes for a in jax.tree.leaves(params))

    fn = jax.jit(lambda p, xx: model.apply({"params": p}, xx, t, y, mask))
    sps = _chain_and_time(lambda xx: fn(params, xx), x, n_steps,
                          static_max=0.0)
    seq = frames * (hh // 2) * (ww // 2)
    mfu = _dit_flops(seq, 3072, 48, b) * sps / V5E_PEAK_BF16
    return {"metric": "mochi10b_full_depth_fp8_denoise_steps_per_sec",
            "value": round(sps, 4),
            "unit": "steps/s MEASURED (48 layers fp8-resident, in-scan "
                    "bf16 dequant, CFG-doubled 14x60x106 latents)",
            "mfu": round(mfu, 4),
            "fp8_resident_gb": round(resident / 1e9, 1),
            # H800 row: 64 flow steps in 2 min
            "vs_baseline": round(sps / (64.0 / 120.0), 3)}


def _bench_flux_fp8(n_steps: int = 6, hh: int = 48, ww: int = 85):
    """Flux-dev 12B T2I (BASELINE README.md:202: 768×1360 in 4 s / 37 GB
    on H800 ⇒ ~12.5 steps/s at 50 steps): FULL 19-double + 38-single
    stack fp8-resident (~12 GB), guidance-distilled (no CFG doubling),
    48×85 packed latent tokens + 512 T5 tokens."""
    from videotuna_tpu.models.flux.dit import FluxModel
    b = 1
    model = FluxModel(dim=3072, heads=24, double_blocks=19,
                      single_blocks=38, dtype=jnp.bfloat16,
                      scan_blocks=True)
    x = jnp.zeros((b, hh, ww, 64))
    t = jnp.full((b,), 0.5)
    y = jnp.zeros((b, 512, 4096))
    pooled = jnp.zeros((b, 768))
    g = jnp.full((b,), 3.5)
    params = _mixed_fp8_params(model, (x, t, y, pooled, g),
                               ("double_blocks", "single_blocks"))
    resident = sum(a.nbytes for a in jax.tree.leaves(params))

    fn = jax.jit(lambda p, xx: model.apply({"params": p}, xx, t, y,
                                           pooled, g))
    sps = _chain_and_time(lambda xx: fn(params, xx), x, n_steps,
                          static_max=0.0)
    seq = hh * ww + 512
    eq_depth = 19 + 38     # single blocks: half params, EQUAL flops
    mfu = _dit_flops(seq, 3072, eq_depth, b) * sps / V5E_PEAK_BF16
    return {"metric": "flux_dev_fp8_denoise_steps_per_sec",
            "value": round(sps, 4),
            "unit": "steps/s MEASURED (19dbl+38sgl fp8-resident, in-scan "
                    "bf16 dequant, 768x1360 = 4080+512 tokens)",
            "mfu": round(mfu, 4),
            "fp8_resident_gb": round(resident / 1e9, 1),
            "vs_baseline": round(sps / 12.5, 4)}


def _bench_vc2_unet(n_steps: int = 10, frames: int = 16, hh: int = 40,
                    ww: int = 64):
    """VideoCrafter2 UNet3D inference step (16f 320×512 latents 40×64,
    CFG-doubled). H800 baseline: 26 s / 50 DDIM steps ⇒ 1.92 steps/s
    (README.md:178)."""
    from videotuna_tpu.models.lvdm.unet3d import UNet3D
    model = UNet3D(in_channels=4, out_channels=4, model_channels=320,
                   num_res_blocks=2, attention_resolutions=(4, 2, 1),
                   channel_mult=(1, 2, 4, 4), num_head_channels=64,
                   context_dim=1024, temporal_conv=True,
                   temporal_attention=True, temporal_length=frames,
                   addition_attention=True, fps_cond=True,
                   dtype=jnp.bfloat16)
    b = 2
    x = jnp.zeros((b, frames, hh, ww, 4))
    t = jnp.zeros((b,), jnp.int32)
    ctx = jnp.zeros((b, 77, 1024))
    fps = jnp.full((b,), 24.0)
    params = _bf16_params(model, x, t, ctx, fps=fps)

    @jax.jit
    def step_p(p, x):
        return model.apply({"params": p}, x, t, ctx,
                           fps=fps).astype(x.dtype)

    step = lambda x: step_p(params, x)
    sps = _chain_and_time(step, x, n_steps)
    return {"metric": "vc2_unet_denoise_steps_per_sec_per_chip",
            "value": round(sps, 3),
            "unit": "steps/s (CFG-doubled, 16x40x64 latents, bf16)",
            "vs_baseline": round(sps / (50.0 / 26.0), 3)}


def _bench_hunyuan_lora_train(double: int = 5, single: int = 10,
                              n_steps: int = 3, frames: int = 9,
                              hh: int = 45, ww: int = 60,
                              dim: int = 3072, heads: int = 24,
                              rank: int = 32, fp8_base: bool = False):
    """HunyuanVideo LoRA fine-tune step (BASELINE README.md:217 names
    this the north-star finetune): fwd+bwd+adamw on rank-32 deltas over
    frozen bf16 base params, remat'd blocks. Depth 5dbl+10sgl (the
    fits-on-one-chip configuration, measured — full 13B LoRA training is
    a multi-chip fsdp workload, validated on the virtual mesh)."""
    import optax
    from videotuna_tpu.models.hunyuan.dit import HYVideoDiT
    from videotuna_tpu.training.lora import (default_match, init_lora,
                                             inject_lora, lora_scope)
    model = HYVideoDiT(dim=dim, heads=heads, double_blocks=double,
                       single_blocks=single, dtype=jnp.bfloat16,
                       scan_blocks=True, remat=True)
    b = 1
    x = jnp.zeros((b, frames, hh, ww, 16))
    t = jnp.zeros((b,))
    y = jnp.zeros((b, 256, 4096))
    pooled = jnp.zeros((b, 768))
    mask = jnp.ones((b, 256), bool)
    # fp8_base: frozen base kernels fp8-resident (QLoRA-style); the full
    # 13B 20dbl+40sgl stack is 12.5 GB fp8 and fits one chip
    base = (_mixed_fp8_params(model, (x, t, y, pooled, mask),
                              ("double_blocks", "single_blocks"))
            if fp8_base else _bf16_params(model, x, t, y, pooled, mask))
    lora = init_lora(base, rank=rank, match=default_match,
                     dtype=jnp.bfloat16)
    opt = optax.adamw(1e-4)
    opt_state = opt.init(lora)

    def loss_fn(lr, bp, xx):
        # side-branch LoRA: y = xW + (xA)B — neither merged kernels nor
        # full-size dW cotangents materialize (merge-based OOMed, round 3)
        with lora_scope():
            out = model.apply({"params": inject_lora(bp, lr, 1.0)},
                              xx, t, y, pooled, mask)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    import functools

    # base params MUST be jit arguments: closed-over they become HLO
    # constants (6.9 GB embedded in the program — host round-trip + copy).
    # lora+opt_state donated: without it the ~1 GB of outputs shares 0 B
    # with arguments (measured in the 20dbl+40sgl OOM breakdown) and the
    # extra live set inflates HLO-temp fragmentation
    @functools.partial(jax.jit, donate_argnums=(0, 2))
    def train_step(lr, bp, os_, xx):
        loss, g = jax.value_and_grad(loss_fn)(lr, bp, xx)
        upd, os2 = opt.update(g, os_, lr)
        return optax.apply_updates(lr, upd), os2, loss

    # chain on the lora tree; sync via the loss scalar. Fixed-max
    # softmax scope wraps the COMPILING first call (qk-normed model:
    # fwd + remat-refwd take the subtract-free/fused kernels; the LSE
    # stays exact so the backward is unchanged)
    from videotuna_tpu.kernels.attention import attention_options
    with attention_options(static_max=0.0):
        lora, opt_state, loss = train_step(lora, base, opt_state, x)
        _ = float(loss)
        t0 = time.perf_counter()
        for _ in range(n_steps):
            lora, opt_state, loss = train_step(lora, base, opt_state, x)
        _ = float(loss)
    sps = n_steps / (time.perf_counter() - t0)
    n_lora = sum(int(a.size) for a in jax.tree.leaves(lora))
    # single blocks have EQUAL FLOPs to double blocks (full concat seq
    # through one 12d² stream) — extrapolate to 20dbl+40sgl by FLOPs
    full_sps = sps * (double + single) / 60.0
    basestr = "fp8-resident base, " if fp8_base else ""
    # equal-FLOPs depth: each single block = one double block (full
    # concat seq through a 12d² stream); train ≈ 4× forward FLOPs
    seq = frames * (hh // 2) * (ww // 2) + 256
    mfu = (4.0 * _dit_flops(seq, dim, double + single, b) * sps
           / V5E_PEAK_BF16)
    return {"metric": "hunyuan_lora_train_steps_per_sec",
            "train_mfu": round(mfu, 4),
            "value": round(sps, 3),
            "unit": f"train steps/s ({double}dbl+{single}sgl incl. "
                    f"block-kernel side-branch LoRA, rank {rank} = "
                    f"{n_lora / 1e6:.0f}M deltas, {basestr}"
                    f"9x45x60 latents, bf16+remat; full-depth "
                    f"extrapolation {round(full_sps, 3)} steps/s)",
            "full_depth_steps_per_sec": round(full_sps, 4),
            "fp8_base": fp8_base,
            "vs_baseline": None}

def _bench_cogvideox_lora_train(depth: int = 21, n_steps: int = 3,
                                frames: int = 13, hh: int = 60,
                                ww: int = 90, dim: int = 3072,
                                heads: int = 48, rank: int = 32,
                                fp8_base: bool = False):
    """CogVideoX-5B LoRA fine-tune step at the north-star 49f 480×720
    geometry (BASELINE README.md:218: 'CogVideoX LoRA, 1 GPU'):
    fwd+bwd+adamw on rank-32 deltas (incl. the scan-stacked block
    attention/MLP kernels) over frozen bf16 base params, remat'd blocks,
    no CFG doubling (training). Depth-reduced to fit 16 GB HBM — the
    merge-based LoRA costs base + delta stack + dW stack; full 42-layer
    steps/s is the uniform per-block extrapolation (single-chip full
    depth is an fsdp multi-chip workload, validated on the virtual
    mesh)."""
    import optax
    from videotuna_tpu.models.cogvideo.mmdit import CogVideoXTransformer
    from videotuna_tpu.training.lora import (default_match, init_lora,
                                             inject_lora, lora_scope)
    model = CogVideoXTransformer(dim=dim, num_layers=depth, heads=heads,
                                 dtype=jnp.bfloat16, scan_blocks=True,
                                 remat=True)
    b = 1
    x = jnp.zeros((b, frames, hh, ww, 16))
    t = jnp.zeros((b,), jnp.int32)
    y = jnp.zeros((b, 226, 4096))
    # fp8_base: frozen base kernels fp8-resident (QLoRA-style — the side
    # branch y = xW + (xA)B never differentiates W, so the in-scan bf16
    # dequant has no backward cost; halves base HBM → full 42-layer depth
    # fits one 16 GB chip)
    base = (_mixed_fp8_params(model, (x, t, y), ("blocks",)) if fp8_base
            else _bf16_params(model, x, t, y))
    lora = init_lora(base, rank=rank, match=default_match,
                     dtype=jnp.bfloat16)
    opt = optax.adamw(1e-4)
    opt_state = opt.init(lora)

    def loss_fn(lr, bp, xx):
        # side-branch LoRA (see _bench_hunyuan_lora_train)
        with lora_scope():
            out = model.apply({"params": inject_lora(bp, lr, 1.0)},
                              xx, t, y)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 2))  # see hunyuan note
    def train_step(lr, bp, os_, xx):
        loss, g = jax.value_and_grad(loss_fn)(lr, bp, xx)
        upd, os2 = opt.update(g, os_, lr)
        return optax.apply_updates(lr, upd), os2, loss

    from videotuna_tpu.kernels.attention import attention_options
    with attention_options(static_max=0.0):   # see hunyuan bench note
        lora, opt_state, loss = train_step(lora, base, opt_state, x)
        _ = float(loss)
        t0 = time.perf_counter()
        for _ in range(n_steps):
            lora, opt_state, loss = train_step(lora, base, opt_state, x)
        _ = float(loss)
    sps = n_steps / (time.perf_counter() - t0)
    n_lora = sum(int(a.size) for a in jax.tree.leaves(lora))
    full_sps = sps * depth / 42.0
    basestr = "fp8-resident base, " if fp8_base else ""
    # train step ≈ fwd + remat-refwd + bwd(2×) = 4× forward FLOPs
    seq = frames * (hh // 2) * (ww // 2) + 226
    mfu = 4.0 * _dit_flops(seq, dim, depth, b) * sps / V5E_PEAK_BF16
    return {"metric": "cogvideox_lora_train_steps_per_sec",
            "train_mfu": round(mfu, 4),
            "value": round(sps, 3),
            "unit": f"train steps/s ({depth}/42 layers incl. block-kernel "
                    f"side-branch LoRA, rank {rank} = "
                    f"{n_lora / 1e6:.0f}M deltas, {basestr}"
                    f"13x60x90 latents, bf16+remat; full-depth "
                    f"extrapolation {round(full_sps, 3)} steps/s)",
            "full_depth_steps_per_sec": round(full_sps, 4),
            "fp8_base": fp8_base,
            "vs_baseline": None}


SUITE_BENCHES = {
    "stdit": lambda: dict(zip(("value", "unit"), _bench_partitioned())),
    "stdit_train": lambda: _bench_train_stdit(),
    "cogvideox5b": lambda: _bench_cogvideox5b(),
    "hunyuan13b_class": lambda: _bench_hunyuan13b(),
    "vae_decode": lambda: _bench_vae_decode(),
    "attn_d64": lambda: _bench_attn_d64(),
    "hunyuan13b_full": lambda: _bench_hunyuan13b_full(),
    "hunyuan13b_full_fp8": lambda: _bench_hunyuan13b_fp8(),
    "wan14b": lambda: _bench_wan14b(),
    "wan14b_fp8": lambda: _bench_wan14b_fp8(),
    "stepvideo_class": lambda: _bench_with_oom_fallback(
        _bench_stepvideo_class, [{"layers": 20}, {"layers": 12},
                                 {"layers": 8}]),
    "mochi_fp8": lambda: _bench_mochi_fp8(),
    "flux_fp8": lambda: _bench_flux_fp8(),
    "vc2_unet": lambda: _bench_vc2_unet(),
    # side-branch LoRA (round 4): no merged kernels / dW stacks, so the
    # ladders START at full depth — CogVideoX 42 layers is ~10 GB bf16
    # base + rank-32 deltas, expected to fit 16 GB HBM outright
    "hunyuan_lora_train": lambda: _bench_with_oom_fallback(
        _bench_hunyuan_lora_train,
        [{"double": 20, "single": 40, "fp8_base": True},
         {"double": 10, "single": 20}, {"double": 5, "single": 10},
         {"double": 3, "single": 6}]),
    "cogvideox_lora_train": lambda: _bench_with_oom_fallback(
        _bench_cogvideox_lora_train,
        [{"depth": 42, "fp8_base": True}, {"depth": 42}, {"depth": 28},
         {"depth": 21}, {"depth": 14}]),
    # w8a8 serving mode (tools/int8.py): projections on the int8 MXU
    "cogvideox5b_int8": lambda: _bench_cogvideox5b_w8a8(),
    "hunyuan13b_int8": lambda: _bench_hunyuan13b_int8(),
}

def _bench_dataloader(n_clips: int = 24, frames: int = 16, src_hw=(360,
                      640), dst_hw=(256, 448), seconds: float = 6.0):
    """Host data-pipeline throughput (SURVEY §7 hard-part 6: video decode
    keeping the chip fed): synthesize mp4 clips, then measure
    decode→crop→resize→normalize clips/s through the python path vs the
    native C++ path (native/frameproc.cpp std::thread pool). CPU-side —
    runs anywhere; a v5e needs ~0.2 clips/s/chip at the CogVideoX
    north-star (0.147 steps/s × 50 steps per 49f clip) so double-digit
    clips/s means the host pipeline is never the bottleneck."""
    import os
    import tempfile

    import numpy as np

    from videotuna_tpu.data import native_loader
    from videotuna_tpu.data.video_io import load_video, save_video

    tmp = tempfile.mkdtemp(prefix="benchdata_")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n_clips):
        clip = rng.random((frames, src_hw[0], src_hw[1], 3),
                          dtype=np.float32)
        p = os.path.join(tmp, f"clip_{i}.mp4")
        save_video(clip, p, fps=8)
        paths.append(p)

    def run(use_native: bool):
        done = 0
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < seconds:
            p = paths[done % n_clips]
            frames_u8 = load_video(p, num_frames=frames)
            if use_native and native_loader.native_available():
                _ = native_loader.crop_resize_normalize(frames_u8, dst_hw)
            else:
                # apples-to-apples python baseline: resize uint8 FIRST
                # (like the native path), normalize last — the repo's own
                # transform pipeline order
                from videotuna_tpu.data.transforms import (CenterCropResize,
                                                           Normalize)
                _ = Normalize()(CenterCropResize(dst_hw)(frames_u8))
            done += 1
        return done / (time.perf_counter() - t0)

    py_cps = run(False)
    nat_cps = run(True) if native_loader.native_available() else None
    out = {"metric": "dataloader_clips_per_sec",
           "value": round(nat_cps or py_cps, 2),
           "unit": f"clips/s ({frames}f {src_hw[0]}x{src_hw[1]} → "
                   f"{dst_hw[0]}x{dst_hw[1]}, decode+crop+resize+norm)",
           "python_clips_per_sec": round(py_cps, 2),
           "vs_baseline": None}
    if nat_cps is not None:
        out["native_clips_per_sec"] = round(nat_cps, 2)
        out["native_speedup"] = round(nat_cps / py_cps, 2)
    return out


# diagnosis-only benches: reachable via --one / --merge, excluded from
# the --suite sweep (they measure breakdowns, not headline metrics)
def _bench_attn_d128_sweep(seq: int = 20656, heads: int = 24,
                           batch: int = 1, n_iters: int = 4,
                           static_max: float = 16.0):
    """Block-size sweep for the plain d=128 kernel UNDER static-max at
    the Hunyuan-class geometry. The (1024, 2048) defaults were tuned for
    the online-softmax kernel; with the max/rescale chain gone the
    VPU:MXU balance shifts, so the optimum may move (larger bk amortizes
    the per-block exp2 into fewer, bigger MXU calls)."""
    from videotuna_tpu.kernels.attention import flash_attention
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(k1, (batch, seq, heads, 128), jnp.bfloat16)
    k = jax.random.normal(k2, (batch, seq, heads, 128), jnp.bfloat16)
    v = jax.random.normal(k3, (batch, seq, heads, 128), jnp.bfloat16)
    flops = 4.0 * batch * heads * seq * seq * 128
    results = {}
    best = (None, 1e9)
    for bq in (512, 1024, 2048):
        for bk in (1024, 2048, 4096):
            fn = jax.jit(lambda a, b_, c, bq=bq, bk=bk: flash_attention(
                a, b_, c, block_q=bq, block_k=bk, static_max=static_max))
            try:
                _sync(fn(q, k, v))
                t0 = time.perf_counter()
                for _ in range(n_iters):
                    out = fn(q, k, v)
                _sync(out)
                t = (time.perf_counter() - t0) / n_iters
            except Exception as e:  # VMEM overflow at big blocks
                results[f"{bq}x{bk}"] = f"fail: {str(e)[:60]}"
                continue
            results[f"{bq}x{bk}"] = round(flops / t / 1e12, 1)
            if t < best[1]:
                best = (f"{bq}x{bk}", t)
    return {"metric": "attn_d128_staticmax_block_sweep",
            "value": round(flops / best[1] / 1e12, 1),
            "unit": f"best TF/s (blocks {best[0]}), d=128 seq {seq} "
                    f"static_max={static_max}",
            "sweep_tf_s": results,
            "vs_baseline": None}


def _bench_attn_d64_bwd(seq: int = 17776, heads: int = 48, batch: int = 1,
                        n_iters: int = 4):
    """d=64 fused fwd+bwd A/B at the CogVideoX training geometry: the
    round-4 packed two-head backward (full-rate gradient contractions,
    no 64→128 pad) vs the padded path. The packed path is the
    auto-dispatch; the padded baseline is reproduced by lying about the
    head pairing (odd head count forces the padded kernels)."""
    import videotuna_tpu.kernels.attention as A
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(k1, (batch, seq, heads, 64), jnp.bfloat16)
    k = jax.random.normal(k2, (batch, seq, heads, 64), jnp.bfloat16)
    v = jax.random.normal(k3, (batch, seq, heads, 64), jnp.bfloat16)
    # fwd 4·S²·d + bwd 2.5× (FA2: 5 matmuls of S²·d vs 2 fwd)
    flops = (4.0 + 10.0) * batch * heads * seq * seq * 64

    def loss(fn_inputs):
        qq, kk, vv = fn_inputs
        return jnp.sum(A.flash_attention_diff(qq, kk, vv).astype(
            jnp.float32) ** 2)

    grad_fn = jax.jit(jax.grad(loss))

    def timed():
        g = grad_fn((q, k, v))
        _sync(g[0])
        t0 = time.perf_counter()
        for _ in range(n_iters):
            g = grad_fn((q, k, v))
        _sync(g[0])
        return (time.perf_counter() - t0) / n_iters

    t_packed = timed()
    # padded baseline: strip one head → odd count disables the packed path
    qo, ko, vo = q[:, :, :heads - 1], k[:, :, :heads - 1], v[:, :, :heads - 1]
    grad_fn_o = jax.jit(jax.grad(loss))
    g = grad_fn_o((qo, ko, vo))
    _sync(g[0])
    t0 = time.perf_counter()
    for _ in range(n_iters):
        g = grad_fn_o((qo, ko, vo))
    _sync(g[0])
    t_padded_raw = (time.perf_counter() - t0) / n_iters
    t_padded = t_padded_raw * heads / (heads - 1)   # per-head normalize
    tf_packed = flops / t_packed / 1e12
    return {"metric": "attn_d64_bwd_packed_vs_padded",
            "value": round(t_padded / t_packed, 3),
            "unit": f"fwd+bwd speedup (packed bwd / padded bwd), d=64 seq "
                    f"{seq} heads {heads} (padded per-head-normalized)",
            "packed_ms": round(t_packed * 1e3, 2),
            "padded_ms_normalized": round(t_padded * 1e3, 2),
            "packed_useful_tf_s": round(tf_packed, 1),
            # packed bwd ceiling: 11 performed / 8 useful-at-128 units
            "packed_mfu_of_bwd_ceiling": round(
                tf_packed / (V5E_PEAK_BF16 / 1e12 * 8 / 11), 3),
            "vs_baseline": None}


def _bench_attn_d64_fusedsm(seq: int = 17776, heads: int = 48,
                            batch: int = 2, n_iters: int = 6):
    """A/B: FUSED static-max (−M folded into QK via indicator lanes,
    l-sum folded into PV via a ones-row — two VPU passes over the score
    tile removed) vs the plain static-max branch, at the CogVideoX-5B
    geometry. Serial-VPU model predicts ~1.11×: per score element
    336→~302 MAC-equivalents (sub −26, sum −26, PV M 64→72 +8, small
    qa/va builds +10)."""
    from videotuna_tpu.kernels.attention import flash_attention
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(k1, (batch, seq, heads, 64), jnp.bfloat16)
    k = jax.random.normal(k2, (batch, seq, heads, 64), jnp.bfloat16)
    v = jax.random.normal(k3, (batch, seq, heads, 64), jnp.bfloat16)
    flops = 4.0 * batch * heads * seq * seq * 64

    def timed(fn):
        _sync(fn(q, k, v))
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fn(q, k, v)
        _sync(out)
        return (time.perf_counter() - t0) / n_iters

    plain = jax.jit(lambda a, b_, c: flash_attention(
        a, b_, c, pack2="t", static_max=16.0, static_fused=False))
    fused = jax.jit(lambda a, b_, c: flash_attention(
        a, b_, c, pack2="t", static_max=16.0))
    t_p = timed(plain)
    t_f = timed(fused)
    err = float(jnp.max(jnp.abs(
        plain(q, k, v).astype(jnp.float32)
        - fused(q, k, v).astype(jnp.float32))))
    return {"metric": "attn_d64_fusedsm_speedup",
            "value": round(t_p / t_f, 3),
            "unit": f"speedup (fused static-max / plain static-max), "
                    f"d=64 seq {seq} heads {heads}",
            "plain_ms": round(t_p * 1e3, 2),
            "fused_ms": round(t_f * 1e3, 2),
            "plain_tf_s": round(flops / t_p / 1e12, 1),
            "fused_tf_s": round(flops / t_f / 1e12, 1),
            "max_abs_err": err,
            "vs_baseline": None}


def _bench_attn_d64_bwd_sp(seq: int = 17776, heads: int = 48,
                           batch: int = 1, n_iters: int = 4):
    """A/B: SINGLE-PASS packed backward (dq as per-k-tile HBM partials
    inside the dkv kernel; the score tile is built and exp2'd once for
    all three gradients — 8 vs 11 MXU units/pair, one exp2 set instead
    of two) vs the two-kernel backward."""
    import videotuna_tpu.kernels.attention as A
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(k1, (batch, seq, heads, 64), jnp.bfloat16)
    k = jax.random.normal(k2, (batch, seq, heads, 64), jnp.bfloat16)
    v = jax.random.normal(k3, (batch, seq, heads, 64), jnp.bfloat16)
    flops = (4.0 + 10.0) * batch * heads * seq * seq * 64

    def timed(sp):
        def loss(t):
            qq, kk, vv = t
            return jnp.sum(A.flash_attention_diff(
                qq, kk, vv, False, None, None, True,
                sp).astype(jnp.float32) ** 2)

        grad_fn = jax.jit(jax.grad(loss))
        g = grad_fn((q, k, v))
        _sync(g[0])
        t0 = time.perf_counter()
        for _ in range(n_iters):
            g = grad_fn((q, k, v))
        _sync(g[0])
        return (time.perf_counter() - t0) / n_iters, g

    t_two, g2 = timed(False)
    t_sp, g1 = timed(True)
    err = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - b.astype(jnp.float32))))
              for a, b in zip(g1, g2))
    return {"metric": "attn_d64_bwd_single_pass_speedup",
            "value": round(t_two / t_sp, 3),
            "unit": f"fwd+bwd speedup (single-pass bwd / two-kernel), "
                    f"d=64 seq {seq} heads {heads}",
            "two_pass_ms": round(t_two * 1e3, 2),
            "single_pass_ms": round(t_sp * 1e3, 2),
            "sp_useful_tf_s": round(flops / t_sp / 1e12, 1),
            "max_abs_grad_diff": err,
            "vs_baseline": None}


def _bench_int8_matmul(m: int = 17776, kdim: int = 3072,
                       n: int = 12288, n_iters: int = 20):
    """A/B: bf16 matmul vs w8a8 (dynamic per-row activation quant +
    per-channel int8 weights, int32 accum) at a DiT MLP-projection
    geometry. v5e int8 MXU peak is 2x bf16; the measured ratio nets out
    the activation-quant VPU cost."""
    from videotuna_tpu.tools.int8 import _quantize_leaf, int8_matmul
    kx, kw = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kx, (m, kdim), jnp.bfloat16)
    w = jax.random.normal(kw, (kdim, n), jnp.bfloat16) * 0.02
    wq, ws = _quantize_leaf(w, stacked=False)
    flops = 2.0 * m * kdim * n

    bf = jax.jit(lambda a, b_: (a @ b_).astype(jnp.bfloat16))
    q = jax.jit(lambda a, b_, c: int8_matmul(a, b_, c)
                .astype(jnp.bfloat16))

    def timed(fn, *args):
        _sync(fn(*args))
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fn(*args)
        _sync(out)
        return (time.perf_counter() - t0) / n_iters

    t_bf = timed(bf, x, w)
    t_q = timed(q, x, wq, ws)
    ref = (x.astype(jnp.float32) @ w.astype(jnp.float32))
    got = int8_matmul(x, wq, ws)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    return {"metric": "int8_matmul_speedup",
            "value": round(t_bf / t_q, 3),
            "unit": f"speedup (w8a8 / bf16), {m}x{kdim}x{n}",
            "bf16_ms": round(t_bf * 1e3, 2),
            "int8_ms": round(t_q * 1e3, 2),
            "bf16_tf_s": round(flops / t_bf / 1e12, 1),
            "int8_tops": round(flops / t_q / 1e12, 1),
            "rel_err": round(rel, 5),
            "vs_baseline": None}


def _bench_cogvideox5b_w8a8(depth: int = 42, n_steps: int = 8,
                            frames: int = 13, hh: int = 60, ww: int = 90,
                            dim: int = 3072, heads: int = 48):
    """CogVideoX-5B class with w8a8 int8 serving (tools/int8.py): every
    projection/MLP matmul executes on the int8 MXU (2x bf16 peak),
    attention stays on the bf16 Pallas kernels.

    Memory protocol (16 GB chip): the QUALITY gate (w8a8 vs bf16 output)
    runs at depth 4 where both trees fit; full-depth TIMING quantizes a
    depth-2 init and TILES the scan-stacked int8 leaves to `depth` —
    values repeat across layers, which changes nothing about MXU/HBM
    timing and avoids the 10 GB bf16 + 5 GB int8 double residency.
    Speedup reads against the suite's bf16 cogvideox5b row."""
    from videotuna_tpu.kernels.attention import attention_options
    from videotuna_tpu.models.cogvideo.mmdit import CogVideoXTransformer
    from videotuna_tpu.tools.int8 import int8_scope, quantize_params_int8
    from videotuna_tpu.training.lora import _is_stacked
    b = 2
    x = jnp.zeros((b, frames, hh, ww, 16))
    t = jnp.zeros((b,), jnp.int32)
    y = jnp.zeros((b, 226, 4096))

    # ---- quality gate at depth 4 ----
    m4 = CogVideoXTransformer(dim=dim, num_layers=4, heads=heads,
                              dtype=jnp.bfloat16, scan_blocks=True)
    p4 = _bf16_params_random(m4, x, t, y)
    q4 = quantize_params_int8(p4)
    xe = jax.random.normal(jax.random.key(3), x.shape, jnp.float32) * 0.5
    with attention_options(static_max=0.0):
        ref = jax.jit(lambda p, xx: m4.apply({"params": p}, xx, t, y))(
            p4, xe).astype(jnp.float32)
        with int8_scope():
            got = jax.jit(lambda p, xx: m4.apply(
                {"params": p}, xx, t, y))(q4, xe).astype(jnp.float32)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    for leaf in jax.tree.leaves(p4) + jax.tree.leaves(q4) + [ref, got]:
        if hasattr(leaf, "delete"):
            leaf.delete()

    # ---- full-depth timing (tiled int8 tree) ----
    m2 = CogVideoXTransformer(dim=dim, num_layers=2, heads=heads,
                              dtype=jnp.bfloat16, scan_blocks=True)
    p2 = _bf16_params(m2, x, t, y)
    q2 = quantize_params_int8(p2)
    # non-kernel leaves (biases/norm scales) are shared BY REFERENCE
    # between p2 and q2 — only drop the bf16 kernels q2 replaced
    q2_ids = {id(leaf) for leaf in jax.tree.leaves(q2)}
    for leaf in jax.tree.leaves(p2):
        if id(leaf) not in q2_ids and hasattr(leaf, "delete"):
            leaf.delete()

    reps = depth // 2
    assert depth % 2 == 0

    def _tile(path, leaf):
        if _is_stacked(path) and leaf.ndim >= 1 and leaf.shape[0] == 2:
            return jnp.tile(leaf, (reps,) + (1,) * (leaf.ndim - 1))
        return leaf

    def _rec(node, path=()):
        if isinstance(node, dict):
            return {k: _rec(v, path + (str(k),)) for k, v in node.items()}
        return _tile(path, node)

    qfull = jax.jit(_rec, donate_argnums=(0,))(q2)
    model = CogVideoXTransformer(dim=dim, num_layers=depth, heads=heads,
                                 dtype=jnp.bfloat16, scan_blocks=True)

    @jax.jit
    def step_q(p, x):
        with int8_scope():
            return model.apply({"params": p}, x, t, y)[..., :16] \
                .astype(x.dtype)

    with attention_options(static_max=0.0):
        sps_q = _chain_and_time(lambda xx: step_q(qfull, xx), x, n_steps)
    seq = frames * (hh // 2) * (ww // 2) + 226
    mfu_eq = _dit_flops(seq, dim, depth, b) * sps_q / V5E_PEAK_BF16
    return {"metric": "cogvideox5b_w8a8_denoise_steps_per_sec_per_chip",
            "value": round(sps_q, 3),
            "unit": f"steps/s (CFG-doubled, 13x60x90 latents, depth "
                    f"{depth}, w8a8 int8 projections + bf16 attention)",
            "one_step_rel_err_vs_bf16_depth4": round(rel, 5),
            "bf16_equivalent_mfu": round(mfu_eq, 3),
            "vs_baseline": round(sps_q / (50.0 / 120.0), 3)}


def _bench_attn_d128_bwd_sp(seq: int = 20656, heads: int = 24,
                            batch: int = 1, n_iters: int = 4):
    """A/B: d=128 generic single-pass backward vs the two-kernel
    backward at the Hunyuan-class geometry (the d=128 LoRA-train
    families: hunyuan/wan/stepvideo/flux)."""
    import videotuna_tpu.kernels.attention as A
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(k1, (batch, seq, heads, 128), jnp.bfloat16)
    k = jax.random.normal(k2, (batch, seq, heads, 128), jnp.bfloat16)
    v = jax.random.normal(k3, (batch, seq, heads, 128), jnp.bfloat16)
    flops = (4.0 + 10.0) * batch * heads * seq * seq * 128

    def timed(sp):
        def loss(t):
            qq, kk, vv = t
            return jnp.sum(A.flash_attention_diff(
                qq, kk, vv, False, None, None, True,
                sp).astype(jnp.float32) ** 2)

        grad_fn = jax.jit(jax.grad(loss))
        g = grad_fn((q, k, v))
        _sync(g[0])
        t0 = time.perf_counter()
        for _ in range(n_iters):
            g = grad_fn((q, k, v))
        _sync(g[0])
        return (time.perf_counter() - t0) / n_iters, g

    t_two, g2 = timed(False)
    t_sp, g1 = timed(True)
    err = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - b.astype(jnp.float32))))
              for a, b in zip(g1, g2))
    return {"metric": "attn_d128_bwd_single_pass_speedup",
            "value": round(t_two / t_sp, 3),
            "unit": f"fwd+bwd speedup (single-pass bwd / two-kernel), "
                    f"d=128 seq {seq} heads {heads}",
            "two_pass_ms": round(t_two * 1e3, 2),
            "single_pass_ms": round(t_sp * 1e3, 2),
            "sp_useful_tf_s": round(flops / t_sp / 1e12, 1),
            "max_abs_grad_diff": err,
            "vs_baseline": None}


def _bench_attn_d64_bwd_fold(seq: int = 17776, heads: int = 48,
                             batch: int = 1, n_iters: int = 4):
    """A/B: packed d=64 fused fwd+bwd with the backward stat folds
    (−lse/−delta folded into the s/dp matmuls via indicator lanes) vs
    the unfolded backward — four VPU passes over the score tile removed
    per pair per tile."""
    import videotuna_tpu.kernels.attention as A
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(k1, (batch, seq, heads, 64), jnp.bfloat16)
    k = jax.random.normal(k2, (batch, seq, heads, 64), jnp.bfloat16)
    v = jax.random.normal(k3, (batch, seq, heads, 64), jnp.bfloat16)
    flops = (4.0 + 10.0) * batch * heads * seq * seq * 64

    def timed(fold):
        def loss(t):
            qq, kk, vv = t
            return jnp.sum(A.flash_attention_diff(
                qq, kk, vv, False, None, None,
                fold).astype(jnp.float32) ** 2)

        grad_fn = jax.jit(jax.grad(loss))
        g = grad_fn((q, k, v))
        _sync(g[0])
        t0 = time.perf_counter()
        for _ in range(n_iters):
            g = grad_fn((q, k, v))
        _sync(g[0])
        return (time.perf_counter() - t0) / n_iters

    t_plain = timed(False)
    t_fold = timed(True)
    return {"metric": "attn_d64_bwd_fold_speedup",
            "value": round(t_plain / t_fold, 3),
            "unit": f"fwd+bwd speedup (stat-folded bwd / unfolded), "
                    f"d=64 seq {seq} heads {heads}",
            "plain_ms": round(t_plain * 1e3, 2),
            "fold_ms": round(t_fold * 1e3, 2),
            "fold_useful_tf_s": round(flops / t_fold / 1e12, 1),
            "vs_baseline": None}


DIAG_BENCHES = {
    "hunyuan_breakdown": lambda: _bench_hunyuan_breakdown(),
    "attn_d64_fusedsm": lambda: _bench_attn_d64_fusedsm(),
    "attn_d64_bwd_fold": lambda: _bench_attn_d64_bwd_fold(),
    "attn_d64_bwd_sp": lambda: _bench_attn_d64_bwd_sp(),
    "attn_d128_bwd_sp": lambda: _bench_attn_d128_bwd_sp(),
    "int8_matmul": lambda: _bench_int8_matmul(),
    "cogvideox5b_w8a8": lambda: _bench_cogvideox5b_w8a8(),
    "attn_d64_bwd": lambda: _bench_attn_d64_bwd(),
    "cogvideox_breakdown": lambda: _bench_cogvideox_breakdown(),
    "attn_d64_sweep": lambda: _bench_attn_d64_sweep(),
    "attn_d128_sweep": lambda: _bench_attn_d128_sweep(),
    "attn_d64_staticmax": lambda: _bench_attn_d64_staticmax(),
    "attn_d128_staticmax": lambda: _bench_attn_d128_staticmax(),
    "attn_d128t": lambda: _bench_attn_d128t(),
    "dataloader": lambda: _bench_dataloader(),
}


def _suite():
    """North-star suite → BENCH_SUITE.json; derives end-to-end videos/min
    at 49f@480p (50 denoise steps + VAE decode; text encode excluded,
    ~1% of budget). Each bench runs in its OWN subprocess so one model's
    resident params/jit buffers never eat the next one's HBM (the 5B
    config needs nearly the whole 16 GB chip)."""
    import os
    import subprocess
    results = {}
    for name in SUITE_BENCHES:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", name],
                # generous: killing a child mid-remote-compile wedges the
                # compile service for every later program
                capture_output=True, timeout=10800, text=True)
            line = proc.stdout.strip().splitlines()[-1] if \
                proc.stdout.strip() else ""
            if proc.returncode == 0 and line.startswith("{"):
                results[name] = json.loads(line)
            else:
                results[name] = {"error":
                                 (proc.stderr or proc.stdout)[-300:]}
            print(f"suite[{name}]: {results[name]}", file=sys.stderr)
        except Exception as e:
            results[name] = {"error": str(e)[:300]}
            print(f"suite[{name}] FAILED: {e}", file=sys.stderr)
    _derive_e2e(results)
    with open("BENCH_SUITE.json", "w") as f:
        json.dump(results, f, indent=2)
    return results


def _derive_e2e(results):
    """Derived 49f@480p end-to-end rows: 50 denoise steps + VAE decode,
    against the reference's 2 min/video H800 number (BASELINE.md)."""
    vae = results.get("vae_decode", {})
    if "value" not in vae:
        return
    for src, dst, note in (
            ("cogvideox5b", "e2e_videos_per_min_49f_480p", ""),
            ("cogvideox5b_int8", "e2e_videos_per_min_49f_480p_int8",
             ", w8a8 int8 serving")):
        row = results.get(src, {})
        if "value" in row:
            per_video = 50.0 / row["value"] + vae["value"]
            results[dst] = {
                "value": round(60.0 / per_video, 3),
                "unit": f"videos/min (50 steps + VAE decode{note})",
                "vs_baseline": round((60.0 / per_video) / 0.5, 3)}


def _merge(names):
    """Re-run a subset of suite benches (own subprocesses, like --suite)
    and merge the results into the existing BENCH_SUITE.json, recomputing
    the derived e2e entry. Lets a kernel change refresh only the benches
    it affects instead of hours of unaffected re-runs on the degraded
    remote compiler."""
    import os
    import subprocess
    try:
        with open("BENCH_SUITE.json") as f:
            results = json.load(f)
    except Exception:
        results = {}
    failed = []
    for name in names:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", name],
                capture_output=True, timeout=10800, text=True)
            line = proc.stdout.strip().splitlines()[-1] if \
                proc.stdout.strip() else ""
            if proc.returncode == 0 and line.startswith("{"):
                results[name] = json.loads(line)
            else:
                err = {"error": (proc.stderr or proc.stdout)[-300:]}
                failed.append(name)
                # never clobber a previously measured value with an error
                if "value" in results.get(name, {}):
                    results[name]["last_error"] = err["error"]
                else:
                    results[name] = err
            print(f"merge[{name}]: {results[name]}", file=sys.stderr)
        except Exception as e:
            failed.append(name)
            if "value" in results.get(name, {}):
                results[name]["last_error"] = str(e)[:300]
            else:
                results[name] = {"error": str(e)[:300]}
            print(f"merge[{name}] FAILED: {e}", file=sys.stderr)
    _derive_e2e(results)
    with open("BENCH_SUITE.json", "w") as f:
        json.dump(results, f, indent=2)
    return results, failed


def _suite_summary():
    """Compact per-bench digest for the ONE-LINE stdout JSON. The full
    BENCH_SUITE.json (with units/notes) is committed in the repo; the
    driver only captures a bounded tail of stdout, and embedding the
    full suite made the line exceed it (BENCH_r04 `parsed: null`)."""
    try:
        with open("BENCH_SUITE.json") as f:
            suite = json.load(f)
    except Exception:
        return None
    keep = ("value", "mfu", "train_mfu", "vs_baseline", "status",
            "full_depth_steps_per_sec")
    return {name: {k: row[k] for k in keep if row.get(k) is not None}
            for name, row in suite.items() if isinstance(row, dict)}


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass
    if "--probe" in sys.argv:
        # one fallback-ladder rung in a fresh process (clean HBM); used
        # by _bench_with_oom_fallback — not a user-facing entry
        i = sys.argv.index("--probe")
        fn = globals()[sys.argv[i + 1]]
        kw = json.loads(sys.argv[i + 2])
        print(json.dumps(fn(**kw)))
        return
    if "--one" in sys.argv:
        name = sys.argv[sys.argv.index("--one") + 1]
        fn = SUITE_BENCHES.get(name) or DIAG_BENCHES[name]
        print(json.dumps(fn()))
        return
    if "--merge" in sys.argv:
        names = sys.argv[sys.argv.index("--merge") + 1].split(",")
        _, failed = _merge(names)
        if failed:  # nonzero so retry loops re-run the failed subset
            print(f"merge failed for: {','.join(failed)}",
                  file=sys.stderr)
            sys.exit(4)
        return
    if "--suite" in sys.argv:
        _suite()
    use_full = "--full" in sys.argv
    last_err = None
    for attempt in range(3):
        try:
            fn = _bench_full if use_full else _bench_partitioned
            steps_per_sec, mode = fn()
            out = {
                "metric": "stdit_xl2_denoise_steps_per_sec_per_chip",
                "value": round(steps_per_sec, 3),
                "unit": f"steps/s (CFG-doubled, 16x32x32 latents, bf16, "
                        f"{mode})",
                "vs_baseline": round(
                    steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
            }
            out["suite"] = _suite_summary()
            print(json.dumps(out))
            return
        except Exception as e:  # remote compile service can drop requests
            last_err = e
            print(f"bench attempt {attempt + 1} failed: {e}",
                  file=sys.stderr)
            time.sleep(30)
    # backend hard-down (the axon tunnel outages last hours): emit an
    # HONESTLY-LABELED line carrying the last measured suite instead of
    # nothing — value=None marks that no fresh number was taken this run
    out = {"metric": "stdit_xl2_denoise_steps_per_sec_per_chip",
           "value": None,
           "unit": "NO FRESH MEASUREMENT — TPU backend unavailable; "
                   "suite payload is the last measured BENCH_SUITE.json",
           "error": str(last_err)[:300],
           "vs_baseline": None}
    out["suite"] = _suite_summary()
    print(json.dumps(out))
    sys.exit(3)


if __name__ == "__main__":
    main()
