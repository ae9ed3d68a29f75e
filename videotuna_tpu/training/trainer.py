"""Training loop: the pjit replacement for PyTorch-Lightning `Trainer.fit`.

Parity with the reference train path (SURVEY.md §3.1, §2.1): optimizer
assembly (`configure_optimizers`, base/generation_base.py:135-154), LR scaling
by world size (scripts/train.py:180-185), trainable-component selection
(set_trainable_components, generation_base.py:188-208), EMA (utils/ema.py:5),
gradient accumulation / clipping, checkpoint-every-N + auto-resume
(utils/callbacks.py, train_utils.py:251-288).

Design: a single jitted ``train_step(state, batch, key) → (state, metrics)``
with in-sharding = out-sharding (param FSDP over the mesh's ``fsdp`` axis,
batch over ``dp×fsdp``), donated state. Optimizer state inherits parameter
shardings automatically from pjit propagation.
"""

from __future__ import annotations

import contextlib
import dataclasses
import signal
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from videotuna_tpu.core import checkpoint as ckpt_lib
from videotuna_tpu.core.prng import KeyChain
from videotuna_tpu.parallel.sharding import shard_batch, shard_params

Params = Any


class TrainState(struct.PyTreeNode):
    """Holds ONLY the trainable sub-trees (donation-safe: frozen components —
    VAE, text encoders — are passed to the step separately and never donated,
    so host-side helpers like encode_text can keep using them)."""
    step: jnp.ndarray
    params: Params                    # trainable components only
    opt_state: Any
    ema_params: Optional[Params] = None


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 1e-2
    beta1: float = 0.9
    beta2: float = 0.999
    grad_clip: float = 1.0
    warmup_steps: int = 0
    max_steps: int = 1000
    ema_decay: Optional[float] = None        # e.g. 0.9999; None disables
    accumulate_grad_batches: int = 1         # lightning accumulate_grad_batches
    optimizer: str = "adamw"                 # adamw | adafactor (13B-scale:
    # adafactor's factored second moment cuts optimizer HBM ~2x vs adam)
    scale_lr_by_devices: bool = False        # reference train.py:180-185
    log_every: int = 10
    ckpt_every: int = 500
    ckpt_keep: int = 3
    # LoRA fine-tuning (reference peft injection, ddpm3d.py:434-445 +
    # configs `train.lora`): {"rank": N, "alpha": a, "targets": [substr…]}.
    # When set, only low-rank delta trees for the trainable components are
    # optimized; base weights ride in `frozen` (passed as jit arguments,
    # never closed over — multi-GB constants would OOM the compile).
    lora: Optional[Dict[str, Any]] = None


def make_optimizer(cfg: TrainConfig, num_devices: int = 1
                   ) -> optax.GradientTransformation:
    lr = cfg.learning_rate * (num_devices if cfg.scale_lr_by_devices else 1)
    if cfg.warmup_steps > 0:
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, lr, cfg.warmup_steps, max(cfg.max_steps, cfg.warmup_steps + 1))
    else:
        schedule = lr
    if cfg.optimizer == "adafactor":
        opt = optax.adafactor(schedule)
    else:
        opt = optax.adamw(schedule, b1=cfg.beta1, b2=cfg.beta2,
                          weight_decay=cfg.weight_decay)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        opt,
    )
    if cfg.accumulate_grad_batches > 1:
        # gradient accumulation (lightning accumulate_grad_batches):
        # params update every N micro-batches, grads averaged in between
        tx = optax.MultiSteps(tx, cfg.accumulate_grad_batches)
    return tx


LossFn = Callable[[Params, Dict[str, Any], jax.Array],
                  Tuple[jnp.ndarray, Dict[str, Any]]]


def _stack_ctx(*factories):
    """Compose context-manager factories into one (for loss_ctx)."""
    @contextlib.contextmanager
    def ctx():
        with contextlib.ExitStack() as st:
            for f in factories:
                st.enter_context(f())
            yield
    return ctx


def make_train_step(loss_fn: LossFn,
                    optimizer: optax.GradientTransformation,
                    ema_decay: Optional[float] = None,
                    merge_fn: Optional[Callable] = None,
                    loss_ctx: Optional[Callable] = None) -> Callable:
    """Build the pure train step ``(state, frozen, batch, key) → (state,
    metrics)``. Frozen components get zero gradients by exclusion: grads are
    taken only w.r.t. the trainable sub-trees in ``state.params`` (the JAX
    equivalent of requires_grad_(False) in set_trainable_components).

    ``merge_fn(frozen, train_params) → full params`` defaults to dict
    overlay; LoRA training passes the side-branch injection instead (the
    trainable tree is then the delta, not the weights). ``loss_ctx`` is an
    optional context-manager factory held open while the loss traces (the
    LoRA path passes ``lora_scope`` so the flax interceptor is live)."""
    merge_fn = merge_fn or (lambda frozen, train: {**frozen, **train})

    def step(state: TrainState, frozen: Params, batch: Dict[str, Any],
             key: jax.Array) -> Tuple[TrainState, Dict[str, Any]]:
        def loss_of(train_params):
            params = merge_fn(frozen, train_params)
            with (loss_ctx() if loss_ctx is not None
                  else contextlib.nullcontext()):
                return loss_fn(params, batch, key)

        (loss, aux), grads = jax.value_and_grad(loss_of, has_aux=True)(
            state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_train = optax.apply_updates(state.params, updates)

        new_ema = state.ema_params
        if ema_decay is not None and state.ema_params is not None:
            d = ema_decay
            # With optax.MultiSteps (accumulate_grad_batches > 1) params only
            # change when mini_step wraps to 0; updating EMA on every
            # micro-step would make the effective decay `accumulate`× faster
            # than the reference's per-optimizer-step LitEma (utils/ema.py:5).
            applied = (new_opt.mini_step == 0) if hasattr(
                new_opt, "mini_step") else jnp.array(True)
            new_ema = jax.tree.map(
                lambda e, p: jnp.where(applied, d * e + (1 - d) * p, e),
                state.ema_params, new_train)
        gnorm = optax.global_norm(grads)
        metrics = {**aux, "loss": loss, "grad_norm": gnorm}
        return state.replace(step=state.step + 1, params=new_train,
                             opt_state=new_opt, ema_params=new_ema), metrics

    return step


@contextlib.contextmanager
def ema_scope(flow, state: TrainState):
    """Temporarily swap the flow's trainable components for their EMA
    shadows (the reference's ``ema_scope``, flow/videocrafter.py:202-215 —
    validation/log_images sample under EMA weights)."""
    if state.ema_params is None:
        yield flow
        return
    saved = {k: flow.params[k] for k in state.ema_params}
    flow.params.update(jax.device_get(state.ema_params))
    try:
        yield flow
    finally:
        flow.params.update(saved)


class Trainer:
    """Host-side loop: data, jit, logging, checkpoints, signals, resume."""

    def __init__(self, flow, cfg: TrainConfig, mesh: Mesh,
                 workdir: str = "logs/run", seed: int = 42):
        self.flow = flow
        self.cfg = cfg
        self.mesh = mesh
        self.workdir = workdir
        self.keys = KeyChain(seed)
        self.optimizer = make_optimizer(cfg, mesh.size)
        self.frozen: Params = {}
        self.callbacks: list = []     # callables (step, metrics, state)
        self._step_fn = None
        self._want_ckpt = False
        self.metrics_history: list[Dict[str, float]] = []

    # ------------------------------------------------------------- state mgmt
    def _lora_merge_fn(self):
        """merge_fn for LoRA mode (INFERENCE/export paths only: sampling
        callbacks, save). frozen holds ALL components; trainable tree is
        {component: lora_delta}."""
        from videotuna_tpu.training.lora import merge_lora
        alpha = float((self.cfg.lora or {}).get("alpha", 1.0))

        def merge(frozen, train):
            merged = dict(frozen)
            for comp, delta in train.items():
                merged[comp] = merge_lora(frozen[comp], delta, alpha)
            return merged
        return merge

    def _lora_inject_fn(self):
        """merge_fn for the TRAIN step: side-branch injection — y = xW +
        (xA)(αB) via ``lora_scope`` instead of kernel merging, so neither
        merged kernels nor full-size dW cotangents materialize (a 16-GB
        v5e OOMed on merge-based CogVideoX LoRA at any depth, round 3)."""
        from videotuna_tpu.training.lora import inject_lora
        alpha = float((self.cfg.lora or {}).get("alpha", 1.0))

        def inject(frozen, train):
            full = dict(frozen)
            for comp, delta in train.items():
                full[comp] = inject_lora(frozen[comp], delta, alpha)
            return full
        return inject

    def init_state(self) -> TrainState:
        if not self.flow.params:
            self.flow.init_params()
        params = self.flow.params
        if self.cfg.lora:
            from videotuna_tpu.training.lora import (default_match, init_lora,
                                                     lora_target)
            lcfg = dict(self.cfg.lora)
            rank = int(lcfg.get("rank", 16))
            targets = lcfg.get("targets")
            match = lora_target(*targets) if targets else default_match
            train = {k: init_lora(params[k], rank=rank, match=match,
                                  key=self.keys("lora_init"))
                     for k in self.flow.trainable_components
                     if k in params}
            self.frozen = dict(params)   # base weights all frozen
        else:
            train = {k: jax.tree.map(jnp.copy, v) for k, v in params.items()
                     if k in self.flow.trainable_components}
            self.frozen = {k: v for k, v in params.items()
                           if k not in self.flow.trainable_components}
        self.frozen = jax.device_put(self.frozen,
                                     shard_params(self.frozen, self.mesh))
        opt_state = self.optimizer.init(train)
        ema = (jax.tree.map(lambda x: x, train)
               if self.cfg.ema_decay else None)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=train,
                           opt_state=opt_state, ema_params=ema)
        return self.shard_state(state)

    def shard_state(self, state: TrainState) -> TrainState:
        shardings = shard_params(state, self.mesh)
        return jax.device_put(state, shardings)

    def maybe_resume(self, state: TrainState) -> TrainState:
        step_dir = ckpt_lib.latest_step_dir(self.workdir)
        if step_dir is None:
            return state
        restored = ckpt_lib.restore_components(step_dir, {"state": state})
        return restored.get("state", state)

    # ---------------------------------------------------------------- running
    def compiled_step(self, state: TrainState):
        if self._step_fn is None:
            merge_fn = None
            ctxs = []
            if self.cfg.lora:
                from videotuna_tpu.training.lora import lora_scope
                merge_fn = self._lora_inject_fn()
                ctxs.append(lora_scope)
            # qk-normed flows (attn_static_max set) trace the loss under
            # the fixed-max softmax scope too: fwd + remat-refwd run the
            # subtract-free/fused kernels while the emitted LSE stays the
            # true log-sum-exp, so gradients are unchanged
            # (test_static_max_training_grads_exact)
            if getattr(self.flow, "attn_static_max", None) is not None:
                ctxs.append(self.flow._attn_scope)
            loss_ctx = _stack_ctx(*ctxs) if ctxs else None
            raw = make_train_step(self.flow.training_loss, self.optimizer,
                                  self.cfg.ema_decay, merge_fn=merge_fn,
                                  loss_ctx=loss_ctx)
            self._step_fn = jax.jit(raw, donate_argnums=(0,))
        return self._step_fn

    def install_signal_checkpoint(self):
        """SIGUSR1 → checkpoint at the next step boundary (reference
        scripts/train.py:243-259)."""
        def handler(signum, frame):
            self._want_ckpt = True
        try:
            signal.signal(signal.SIGUSR1, handler)
        except ValueError:
            pass  # not main thread

    def fit(self, loader, state: Optional[TrainState] = None,
            max_steps: Optional[int] = None,
            val_loader=None, val_every: int = 0) -> TrainState:
        state = state if state is not None else self.init_state()
        state = self.maybe_resume(state)
        import contextlib
        sp_ctx = contextlib.nullcontext()
        if self.mesh.shape.get("sp", 1) > 1:
            # route long self-attention through ulysses/ring SP during the
            # step trace (fused flash fwd+bwd inside shard_map) — training
            # is exactly where the sequence-parallel memory story matters
            from videotuna_tpu.kernels.attention import sequence_parallel
            sp_ctx = sequence_parallel(self.mesh)
        with sp_ctx:
            return self._fit_inner(state, loader, max_steps, val_loader,
                                   val_every)

    def _fit_inner(self, state, loader, max_steps, val_loader, val_every):
        step_fn = self.compiled_step(state)
        self.install_signal_checkpoint()
        max_steps = max_steps or self.cfg.max_steps
        start = int(jax.device_get(state.step))
        done = start
        t_last = time.perf_counter()
        from videotuna_tpu.data.prefetch import DevicePrefetcher
        while done < max_steps:
            epoch_start = done
            prefetched = DevicePrefetcher(loader, self.mesh,
                                          prepare=self.prepare_batch)
            for batch in prefetched:
                state, metrics = step_fn(state, self.frozen, batch,
                                         self.keys("train_step"))
                done += 1
                if done % self.cfg.log_every == 0:
                    m = {k: float(jax.device_get(v))
                         for k, v in metrics.items()}
                    m["step"] = done
                    m["steps_per_sec"] = self.cfg.log_every / (
                        time.perf_counter() - t_last)
                    t_last = time.perf_counter()
                    self.metrics_history.append(m)
                    for cb in self.callbacks:
                        cb(done, m, state)
                if self._want_ckpt or done % self.cfg.ckpt_every == 0:
                    self.save(state, done)
                    self._want_ckpt = False
                if val_loader is not None and val_every and \
                        done % val_every == 0:
                    vm = self.validate(state, val_loader)
                    vm["step"] = done
                    self.metrics_history.append(vm)
                if done >= max_steps:
                    break
            if done == epoch_start:
                # one-shot iterator exhausted (a generator passed as
                # `loader` yields nothing on re-iteration) — spinning the
                # epoch loop forever would hang silently.
                raise RuntimeError(
                    f"data loader yielded no batches at step {done}; pass a "
                    "re-iterable dataset/loader (not an exhausted generator) "
                    f"to reach max_steps={max_steps}")
        self.save(state, done)
        return state

    def validate(self, state: TrainState, val_loader,
                 max_batches: int = 8) -> Dict[str, float]:
        """Mean loss over the validation loader with the CURRENT weights —
        the validation_step analogue (reference base/train_base.py stubs +
        epoch-end aggregation); no gradients, no state mutation."""
        loss_fn = jax.jit(self.flow.training_loss)
        if self.cfg.lora:
            params = self._lora_merge_fn()(self.frozen, state.params)
        else:
            params = {**self.frozen, **state.params}
        losses = []
        for i, batch in enumerate(val_loader):
            if i >= max_batches:
                break
            batch = self.prepare_batch(batch)
            batch = shard_batch(batch, self.mesh)
            loss, _ = loss_fn(params, batch, self.keys("val_step"))
            losses.append(float(jax.device_get(loss)))
        return {"val_loss": sum(losses) / max(len(losses), 1),
                "val_batches": float(len(losses))}

    def prepare_batch(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        """Host batch → model batch: tokenization + text encoding happen here
        (device-side) so the step function sees arrays only."""
        out = dict(batch)
        if "caption" in out and "text_states" not in out:
            cond = self.flow.encode_text(self.flow.params,
                                         out.pop("caption"))
            out["text_states"] = cond["y"]
            if cond.get("mask") is not None:
                out["text_mask"] = cond["mask"]
            if cond.get("pooled") is not None:
                out["pooled_text"] = cond["pooled"]
        out.pop("path", None)
        out.pop("is_image", None)
        return out

    def save(self, state: TrainState, step: int):
        comps: Dict[str, Any] = {"state": state}
        if self.cfg.lora:
            # LoRA-only checkpoint alongside the full state (reference
            # LoraModelCheckpoint, utils/callbacks.py:28-53) — loadable at
            # inference via `--lora` (merged into base params there)
            comps["lora"] = state.params
        ckpt_lib.save_components(self.workdir, step, comps,
                                 keep=self.cfg.ckpt_keep)
        # component-split update (reference VideoTunaModelCheckpoint writes
        # whole-flow + trained-only; here flow.params mirrors the live state)
        if self.cfg.lora:
            merged = self._lora_merge_fn()(self.frozen, state.params)
            self.flow.params.update(
                {k: jax.device_get(merged[k]) for k in state.params})
        else:
            self.flow.params.update(jax.device_get(state.params))
