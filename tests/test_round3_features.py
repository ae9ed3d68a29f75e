"""Round-3 features: CogVideoX dynamic CFG, Trainer LoRA wiring,
`--lora` inference merge, v2v CLI."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotuna_tpu.schedulers import dynamic_cfg_denoise


class TestDynamicCFG:
    def test_matches_reference_formula(self):
        """Per-step scale must equal the reference's python-math expression
        (cogvideo_pl.py:711-723), including raw-timestep semantics."""
        N = 50
        scale = 6.0
        calls = {}

        def model_fn(x, t, c):
            # uncond half returns 0, cond half returns 1 → output == gs
            b = x.shape[0] // 2
            return jnp.concatenate([jnp.zeros((b,) + x.shape[1:]),
                                    jnp.ones((b,) + x.shape[1:])], axis=0)

        schedule = [999, 800, 500, 100, 40, 1]
        fn = dynamic_cfg_denoise(model_fn, {"y": jnp.ones((1, 2))},
                                 {"y": jnp.zeros((1, 2))}, scale, N,
                                 timesteps=jnp.asarray(schedule))
        for t_val in schedule:
            x = jnp.zeros((1, 4))
            t = jnp.full((1,), t_val, jnp.int32)
            got = float(fn(x, t)[0, 0])
            want = 1 + scale * (
                (1 - math.cos(math.pi * ((N - t_val) / N) ** 5.0)) / 2)
            assert got == pytest.approx(want, rel=1e-5), t_val

    def test_flow_dynamic_path_runs_and_differs(self):
        from videotuna_tpu.flows.cogvideo import CogVideoXFlow
        from tests.test_cogvideo import COG_TINY
        flow = CogVideoXFlow(**COG_TINY, ddim_steps=4, use_dynamic_cfg=True)
        flow.init_params(seed=0)
        cond = {"y": jnp.ones((1, 8, 16)) * 0.1}
        uncond = {"y": jnp.zeros((1, 8, 16))}
        shape = flow.latent_shape(1, 5, 32, 32)
        out_dyn = flow.sample(flow.params, cond, uncond, shape,
                              jax.random.key(0), cfg_scale=6.0)
        assert out_dyn.shape == shape
        assert bool(jnp.all(jnp.isfinite(out_dyn)))
        flow.use_dynamic_cfg = False
        out_static = flow.sample(flow.params, cond, uncond, shape,
                                 jax.random.key(0), cfg_scale=6.0)
        assert not np.allclose(np.asarray(out_dyn), np.asarray(out_static))


class TestTrainerLora:
    @pytest.fixture()
    def flow(self):
        from videotuna_tpu.flows.opensora import OpenSoraFlow
        from tests.test_flow import TINY
        f = OpenSoraFlow(**TINY, ddim_steps=2, model_max_length=8)
        f.init_params(seed=0)
        return f

    def _batch(self):
        return {"video": np.zeros((1, 4, 64, 64, 3), np.float32),
                "text_states": np.zeros((1, 8, 16), np.float32)}

    def test_lora_config_trains_only_deltas(self, flow, tmp_path):
        from videotuna_tpu.core.mesh import make_mesh
        from videotuna_tpu.training.trainer import TrainConfig, Trainer
        base = jax.tree.map(np.asarray, flow.params["denoiser"])
        tr = Trainer(flow, TrainConfig(max_steps=2, lora={"rank": 2},
                                       learning_rate=1e-2, log_every=1,
                                       ckpt_every=100),
                     make_mesh(), workdir=str(tmp_path / "w"))
        state = tr.init_state()
        # state params are lora trees for trainable components only
        assert set(state.params) == set(flow.trainable_components)
        # every delta is an (…,r)/(r,…) pair: 2-D for Dense, 3-D for
        # DenseGeneral q/k/v (ADVICE r3: non-scan 3-D kernels matched
        # too), +1 leading dim under scan stacks
        leaves = jax.tree.leaves(state.params)
        assert all(2 in l.shape and l.ndim in (2, 3, 4) for l in leaves)
        state = tr.fit(iter([self._batch(), self._batch()]), state)
        # b-matrices moved away from zero-init
        moved = any(
            float(jnp.max(jnp.abs(l["b"]))) > 0
            for path, l in _iter_ab(state.params["denoiser"]))
        assert moved
        # lora-only checkpoint written next to the state
        import os
        step_dir = [d for d in (tmp_path / "w").iterdir()
                    if d.name.startswith("step_")][0]
        assert (step_dir / "lora").is_dir()
        # base weights in flow.params got the merged update, frozen copy
        # in trainer stays at base
        frz = jax.tree.map(np.asarray, tr.frozen["denoiser"])
        for (a, b) in zip(jax.tree.leaves(base), jax.tree.leaves(frz)):
            np.testing.assert_array_equal(a, b)

    def test_lora_inference_merge_cli(self, flow, tmp_path):
        """`--lora` on the inference CLI merges Trainer.save's lora dir."""
        from videotuna_tpu.core import checkpoint as ckpt_lib
        from videotuna_tpu.training.lora import init_lora, merge_lora
        lora = {"denoiser": init_lora(flow.params["denoiser"], rank=2)}
        # perturb b so the merge is visible
        lora = jax.tree.map(lambda x: x + 0.05, lora)
        ckpt_lib.save_tree(str(tmp_path / "lora"), lora)

        from videotuna_tpu.core.checkpoint import restore_tree
        restored = restore_tree(str(tmp_path / "lora"))
        merged = merge_lora(flow.params["denoiser"],
                            restored["denoiser"], 1.0)
        before = np.concatenate([np.ravel(x)[:3] for x in
                                 jax.tree.leaves(flow.params["denoiser"])])
        after = np.concatenate([np.ravel(x)[:3] for x in
                                jax.tree.leaves(merged)])
        assert not np.allclose(before, after)


def _iter_ab(tree, prefix=()):
    if isinstance(tree, dict):
        if "a" in tree and "b" in tree and not isinstance(tree["a"], dict):
            yield prefix, tree
        else:
            for k, v in tree.items():
                yield from _iter_ab(v, prefix + (k,))


class TestV2VCli:
    def test_v2v_enhances_directory(self, tmp_path, monkeypatch):
        import cv2
        pytest.importorskip("cv2")
        from videotuna_tpu.cli.v2v import run_v2v
        ind = tmp_path / "in"
        ind.mkdir()
        # small synthetic clip
        w = cv2.VideoWriter(str(ind / "clip.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), 8, (64, 64))
        rng = np.random.default_rng(0)
        for _ in range(4):
            w.write(rng.integers(0, 255, (64, 64, 3), np.uint8))
        w.release()
        out = run_v2v(["--config", "configs/000_tiny/tiny_t2v.yaml",
                       "--input-dir", str(ind),
                       "--output-dir", str(tmp_path / "out"),
                       "--strength", "0.5"])
        assert len(out["videos"]) == 1
        assert (tmp_path / "out" / "clip.mp4").exists()


class TestTrainerAttnScope:
    def test_loss_traces_under_static_max_scope(self, tmp_path):
        """Flows with attn_static_max set must trace training_loss under
        the fixed-max softmax scope (fwd + remat-refwd take the
        subtract-free kernels; LSE stays exact so grads are unchanged —
        test_static_max_training_grads_exact)."""
        import numpy as np

        from tests.test_flow import TINY
        from videotuna_tpu.core.mesh import make_mesh
        from videotuna_tpu.flows.opensora import OpenSoraFlow
        from videotuna_tpu.kernels import attention as A
        from videotuna_tpu.training.trainer import TrainConfig, Trainer

        f = OpenSoraFlow(**TINY, ddim_steps=2, model_max_length=8)
        f.init_params(seed=0)
        f.attn_static_max = 0.0          # qk-normed families set this
        seen = {}
        orig = f.training_loss

        def spy(params, batch, key):
            seen["cfg"] = getattr(A._ATTN_OPTS, "cfg", None)
            return orig(params, batch, key)

        f.training_loss = spy
        tr = Trainer(f, TrainConfig(max_steps=1, log_every=1,
                                    ckpt_every=100),
                     make_mesh(), workdir=str(tmp_path / "w"))
        state = tr.init_state()
        batch = {"video": np.zeros((1, 4, 64, 64, 3), np.float32),
                 "text_states": np.zeros((1, 8, 16), np.float32)}
        tr.fit(iter([batch]), state)
        assert seen["cfg"] == {"static_max": 0.0}
