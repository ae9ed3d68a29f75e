"""LoRA tree tests: identity at init, merge math, training updates only the
deltas, LoRA-only checkpoints."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotuna_tpu.core import checkpoint as ckpt_lib
from videotuna_tpu.training.lora import (count_lora_params, init_lora,
                                         lora_loss_fn, lora_target,
                                         merge_lora)
from videotuna_tpu.training.trainer import (TrainConfig, TrainState,
                                            make_optimizer, make_train_step)
from tests.test_flow import TINY
from tests.test_training import tiny_batch
from videotuna_tpu.flows.opensora import OpenSoraFlow


@pytest.fixture(scope="module")
def flow():
    f = OpenSoraFlow(**TINY, ddim_steps=4, model_max_length=8)
    f.init_params(seed=0)
    return f


class TestLoraTree:
    def test_identity_at_init(self, flow):
        lora = init_lora(flow.params["denoiser"], rank=2)
        merged = merge_lora(flow.params["denoiser"], lora)
        for a, b in zip(jax.tree.leaves(flow.params["denoiser"]),
                        jax.tree.leaves(merged)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_targets_matched(self, flow):
        lora = init_lora(flow.params["denoiser"], rank=2,
                         match=lora_target("attn"))
        n = count_lora_params(lora)
        assert n > 0
        lora_all = init_lora(flow.params["denoiser"], rank=2)
        assert count_lora_params(lora_all) > n

    def test_merge_changes_weights(self, flow):
        lora = init_lora(flow.params["denoiser"], rank=2)
        # poke b away from zero
        lora = jax.tree.map(lambda x: x + 0.1, lora)
        merged = merge_lora(flow.params["denoiser"], lora, alpha=1.0)
        diffs = [float(jnp.abs(a - b).max()) for a, b in
                 zip(jax.tree.leaves(flow.params["denoiser"]),
                     jax.tree.leaves(merged))]
        assert max(diffs) > 0.0


class TestLoraTraining:
    def test_lora_step_trains_only_delta(self, flow):
        lora = {"denoiser": init_lora(flow.params["denoiser"], rank=2)}
        loss_fn = lora_loss_fn(flow.training_loss, flow.params)
        cfg = TrainConfig(learning_rate=1e-3)
        opt = make_optimizer(cfg)
        step = jax.jit(make_train_step(loss_fn, opt))
        state = TrainState(step=jnp.zeros((), jnp.int32), params=lora,
                           opt_state=opt.init(lora))
        base_before = jax.tree.leaves(flow.params["denoiser"])
        losses = []
        for _ in range(20):
            state, m = step(state, {}, tiny_batch(jax.random.key(0)),
                            jax.random.key(1))
            losses.append(float(m["loss"]))
        # base untouched
        for a, b in zip(base_before, jax.tree.leaves(flow.params["denoiser"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # lora b matrices moved
        assert losses[-1] < losses[0]

    def test_lora_only_checkpoint(self, flow, tmp_path):
        lora = init_lora(flow.params["denoiser"], rank=2)
        ckpt_lib.save_components(str(tmp_path), 1, {"lora_denoiser": lora})
        restored = ckpt_lib.restore_components(
            str(tmp_path / "step_1"), {"lora_denoiser": lora})
        for a, b in zip(jax.tree.leaves(lora),
                        jax.tree.leaves(restored["lora_denoiser"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestLoraScanStacked:
    """scan_blocks=True models stack block kernels with a leading depth
    axis (Dense (depth, din, dout), DenseGeneral (depth, din, h, hd));
    LoRA must cover those — they ARE the attention/MLP projections."""

    def _model(self):
        from videotuna_tpu.models.cogvideo.mmdit import CogVideoXTransformer
        model = CogVideoXTransformer(in_channels=4, out_channels=4,
                                     dim=32, num_layers=2, heads=2,
                                     text_dim=8, max_text_len=4,
                                     time_embed_dim=16, scan_blocks=True)
        x = jnp.zeros((1, 2, 4, 4, 4))
        t = jnp.zeros((1,), jnp.int32)
        y = jnp.zeros((1, 4, 8))
        params = model.init(jax.random.key(0), x, t, y)["params"]
        return model, params, (x, t, y)

    def test_stacked_kernels_matched(self):
        _, params, _ = self._model()
        lora = init_lora(params, rank=2)
        stacked = [k for k in
                   {"/".join(str(getattr(x, 'key', x)) for x in p)
                    for p, _ in
                    jax.tree_util.tree_flatten_with_path(lora)[0]}
                   if "blocks" in k]
        assert stacked, "scan-stacked block kernels must be LoRA targets"

    def test_stacked_identity_and_merge(self):
        model, params, (x, t, y) = self._model()
        base_out = model.apply({"params": params}, x, t, y)
        lora = init_lora(params, rank=2)
        merged = merge_lora(params, lora)
        out0 = model.apply({"params": merged}, x, t, y)
        np.testing.assert_allclose(np.asarray(out0), np.asarray(base_out),
                                   atol=1e-6)
        # perturb b: merged output must move (grads can flow to blocks)
        lora_p = jax.tree.map(lambda l: l + 0.05, lora)
        merged_p = merge_lora(params, lora_p)
        out1 = model.apply({"params": merged_p}, x, t, y)
        assert float(jnp.max(jnp.abs(out1 - base_out))) > 1e-5

    def test_stacked_grads_nonzero(self):
        model, params, (x, t, y) = self._model()
        lora = init_lora(params, rank=2)

        def loss(lr):
            merged = merge_lora(params, lr, 1.0)
            out = model.apply({"params": merged}, x, t, y)
            return jnp.mean(out.astype(jnp.float32) ** 2)

        g = jax.grad(loss)(lora)
        # at step 0 b is zero-init, so da = dW·bT = 0 and the signal is
        # in db = aT·dW — require nonzero db on the stacked block kernels
        db = [np.asarray(l) for p, l in
              jax.tree_util.tree_flatten_with_path(g)[0]
              if str(getattr(p[-1], 'key', p[-1])) == "b"
              and any("blocks" in str(getattr(c, 'key', c)) for c in p)]
        assert db and any(np.abs(x).max() > 0 for x in db)


class TestLoraSideBranch:
    """Side-branch application (inject_lora + lora_scope): y = xW + (xA)(αB)
    without merging kernels — must match merge_lora numerically, for both
    scan-stacked and per-layer models, with grads flowing to a/b only."""

    def _model(self, scan):
        from videotuna_tpu.models.cogvideo.mmdit import CogVideoXTransformer
        model = CogVideoXTransformer(in_channels=4, out_channels=4,
                                     dim=32, num_layers=2, heads=2,
                                     text_dim=8, max_text_len=4,
                                     time_embed_dim=16, scan_blocks=scan)
        x = jnp.zeros((1, 2, 4, 4, 4))
        t = jnp.zeros((1,), jnp.int32)
        y = jnp.zeros((1, 4, 8))
        params = model.init(jax.random.key(0), x, t, y)["params"]
        return model, params, (x, t, y)

    @pytest.mark.parametrize("scan", [True, False])
    def test_side_branch_matches_merge(self, scan):
        from videotuna_tpu.training.lora import inject_lora, lora_scope
        model, params, (x, t, y) = self._model(scan)
        x = jax.random.normal(jax.random.key(1), x.shape)
        lora = init_lora(params, rank=2, key=jax.random.key(2))
        # poke both a and b so the delta is nonzero and alpha matters
        lora = jax.tree.map(lambda l: l + 0.05, lora)
        alpha = 0.7
        ref = model.apply({"params": merge_lora(params, lora, alpha)},
                          x, t, y)
        injected = inject_lora(params, lora, alpha)
        with lora_scope():
            out = model.apply({"params": injected}, x, t, y)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        # without the scope the extra entries are inert (base output)
        base = model.apply({"params": params}, x, t, y)
        out_noscope = model.apply({"params": injected}, x, t, y)
        np.testing.assert_array_equal(np.asarray(out_noscope),
                                      np.asarray(base))

    def test_side_branch_grads_match_merge(self):
        from videotuna_tpu.training.lora import inject_lora, lora_scope
        model, params, (x, t, y) = self._model(True)
        x = jax.random.normal(jax.random.key(1), x.shape)
        lora = init_lora(params, rank=2, key=jax.random.key(2))
        lora = jax.tree.map(lambda l: l + 0.03, lora)

        def loss_merge(lr):
            out = model.apply({"params": merge_lora(params, lr, 1.0)},
                              x, t, y)
            return jnp.mean(out.astype(jnp.float32) ** 2)

        def loss_side(lr):
            with lora_scope():
                out = model.apply({"params": inject_lora(params, lr, 1.0)},
                                  x, t, y)
            return jnp.mean(out.astype(jnp.float32) ** 2)

        gm = jax.grad(loss_merge)(lora)
        gs = jax.grad(loss_side)(lora)
        for a, b in zip(jax.tree.leaves(gm), jax.tree.leaves(gs)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)

    def test_nonscan_densegeneral_covered(self):
        """Non-stacked 3D DenseGeneral q/k/v kernels must now be matched
        (round-3 advisor: scan and non-scan builds had different LoRA
        coverage)."""
        _, params_scan, _ = self._model(True)
        _, params_noscan, _ = self._model(False)
        n_scan = count_lora_params(init_lora(params_scan, rank=2))
        n_noscan = count_lora_params(init_lora(params_noscan, rank=2))
        assert n_scan == n_noscan, (
            f"LoRA coverage differs by scan flag: {n_scan} vs {n_noscan}")

    def test_trainer_lora_side_branch_step(self, flow):
        """Trainer cfg.lora path runs the side-branch step and reduces
        the loss while leaving base weights untouched."""
        from jax.sharding import Mesh
        from videotuna_tpu.training.trainer import Trainer
        mesh = Mesh(np.array(jax.devices()[:1]), ("dp",))
        cfg = TrainConfig(learning_rate=1e-2, max_steps=8,
                          lora={"rank": 2, "alpha": 1.0})
        tr = Trainer(flow, cfg, mesh, workdir="/tmp/lora_sb_test")
        state = tr.init_state()
        step = tr.compiled_step(state)
        base_before = [np.asarray(x).copy()
                       for x in jax.tree.leaves(tr.frozen["denoiser"])]
        losses = []
        for i in range(8):
            state, m = step(state, tr.frozen,
                            tiny_batch(jax.random.key(i)),
                            jax.random.key(100 + i))
            losses.append(float(m["loss"]))
        for a, b in zip(base_before,
                        jax.tree.leaves(tr.frozen["denoiser"])):
            np.testing.assert_array_equal(a, np.asarray(b))
        assert losses[-1] < losses[0]
