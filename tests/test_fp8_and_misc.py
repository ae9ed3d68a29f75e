"""FP8 compression, T5 tensor parallelism, callbacks, prompt sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotuna_tpu.tools.fp8 import (compression_ratio, dequantize_tree,
                                     fp8_apply_fn, quantize_tree)


class TestFP8:
    def test_roundtrip_error_small(self):
        tree = {"w": jax.random.normal(jax.random.key(0), (256, 256)),
                "b": jnp.ones((256,))}
        vals, scales = quantize_tree(tree, min_size=1024)
        deq = dequantize_tree(vals, scales, jnp.float32)
        rel = float(jnp.abs(deq["w"] - tree["w"]).max()
                    / jnp.abs(tree["w"]).max())
        assert rel < 0.05
        np.testing.assert_array_equal(np.asarray(deq["b"]),
                                      np.asarray(tree["b"]))  # untouched

    def test_compression_ratio(self):
        tree = {"w": jnp.zeros((512, 512), jnp.float32)}
        vals, _ = quantize_tree(tree, min_size=1024)
        assert vals["w"].dtype == jnp.float8_e4m3fn
        assert compression_ratio(tree, vals) >= 3.9

    def test_fp8_model_forward(self):
        """A flax Dense stack runs off fp8 weights with small error."""
        import flax.linen as nn

        class Net(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Dense(128)(x)
                x = nn.relu(x)
                return nn.Dense(128)(x)

        net = Net()
        x = jax.random.normal(jax.random.key(1), (4, 128))
        params = net.init(jax.random.key(2), x)["params"]
        ref = net.apply({"params": params}, x)
        vals, scales = quantize_tree(params, min_size=1024)
        out = fp8_apply_fn(net.apply, vals, scales, jnp.float32)(x)
        err = float(jnp.abs(out - ref).max() / (jnp.abs(ref).max() + 1e-6))
        assert err < 0.1


class TestT5TensorParallel:
    def test_t5_tp_forward_parity(self, devices8):
        """Shardformer-T5 parity (SURVEY P9): TP rules cover T5's
        q/k/v/o + wi_0/wi_1/wo kernels."""
        from videotuna_tpu.core.mesh import MeshConfig, make_mesh
        from videotuna_tpu.models.text_encoders import T5Encoder
        from videotuna_tpu.parallel.tensor_parallel import apply_tp

        enc = T5Encoder(vocab_size=100, dim=32, heads=4, head_dim=8,
                        ff_dim=64, num_layers=2)
        ids = jnp.array([[5, 6, 7, 8]])
        mask = jnp.ones((1, 4), bool)
        params = enc.init(jax.random.key(0), ids, mask)["params"]
        ref = enc.apply({"params": params}, ids, mask)
        mesh = make_mesh(MeshConfig(dp=2, tp=4), devices=jax.devices()[:8])
        with mesh:
            sharded = apply_tp(params, mesh)
            out = jax.jit(lambda p: enc.apply({"params": p}, ids, mask))(
                sharded)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)


class TestCallbacks:
    def test_csv_logger_and_throughput(self, tmp_path):
        from videotuna_tpu.training.callbacks import (CSVMetricsLogger,
                                                      ThroughputMonitor)
        cb = CSVMetricsLogger(str(tmp_path))
        tm = ThroughputMonitor(str(tmp_path), every_n_steps=1)
        for s in (1, 2):
            cb(s, {"loss": 0.5 * s}, None)
            tm(s, {}, None)
        lines = (tmp_path / "metrics.csv").read_text().splitlines()
        assert lines[0] == "step,loss"
        assert len(lines) == 3
        assert (tmp_path / "throughput.jsonl").exists()


class TestPromptSharding:
    def test_shard_splits_prompts(self, tmp_path):
        pf = tmp_path / "prompts.txt"
        pf.write_text("\n".join(f"prompt {i}" for i in range(6)))
        from videotuna_tpu.flows.generation import load_prompts
        prompts = load_prompts({"prompt_file": str(pf)})
        assert len(prompts) == 6
        shard0 = prompts[0::2]
        assert load_prompts({"prompts_list": shard0}) == shard0
