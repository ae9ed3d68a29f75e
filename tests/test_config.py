"""Config-system tests: YAML merge, dotlist overrides, inference.mapping,
registry instantiation — the public surface of reference args_utils.py."""

import jax.numpy as jnp
import pytest

from videotuna_tpu.core.config import (apply_dotlist, apply_inference_mapping,
                                       check_required, deep_merge,
                                       load_configs, resolve_dtype)
from videotuna_tpu.core.registry import instantiate, populate, resolve

populate()


class TestMerge:
    def test_deep_merge_override_wins(self):
        base = {"a": {"b": 1, "c": 2}, "d": 3}
        out = deep_merge(base, {"a": {"b": 10}, "e": 4})
        assert out == {"a": {"b": 10, "c": 2}, "d": 3, "e": 4}
        assert base["a"]["b"] == 1  # no mutation

    def test_dotlist_types(self):
        cfg = apply_dotlist({}, ["train.lr=1e-4", "train.steps=100",
                                 "model.name=stdit", "flag=true"])
        assert cfg["train"]["lr"] == 1e-4
        assert cfg["train"]["steps"] == 100
        assert cfg["model"]["name"] == "stdit"
        assert cfg["flag"] is True

    def test_load_configs_left_to_right(self, tmp_path):
        (tmp_path / "a.yaml").write_text("x: 1\ny:\n  z: 2\n")
        (tmp_path / "b.yaml").write_text("y:\n  z: 5\n")
        cfg = load_configs([tmp_path / "a.yaml", tmp_path / "b.yaml"],
                           ["x=9"])
        assert cfg == {"x": 9, "y": {"z": 5}}


class TestMappingAndChecks:
    def test_inference_mapping(self):
        cfg = {
            "flow": {"params": {}},
            "inference": {"mapping": {"height": "flow.params.height"},
                          "height": 720},
        }
        out = apply_inference_mapping(cfg)
        assert out["flow"]["params"]["height"] == 720

    def test_check_required_raises(self):
        with pytest.raises(ValueError, match="flow.target"):
            check_required({"flow": {}}, ["flow.target"])

    def test_resolve_dtype(self):
        assert resolve_dtype("bf16") == jnp.bfloat16
        assert resolve_dtype("torch.float16") == jnp.float16
        assert resolve_dtype("fp32") == jnp.float32


class TestRegistry:
    def test_resolve_new_and_legacy_targets(self):
        a = resolve("videotuna_tpu.models.opensora.STDiT")
        b = resolve("videotuna.models.opensora.models.stdit.stdit.STDiT")
        assert a is b

    def test_instantiate_sentinel(self):
        assert instantiate("__is_first_stage__") is None

    def test_instantiate_with_params(self):
        sched = instantiate({
            "target": "videotuna_tpu.schedulers.DDPMSchedule",
            "params": {"timesteps": 10},
        })
        assert sched.num_timesteps == 10

    def test_unknown_target_raises(self):
        with pytest.raises(KeyError):
            resolve("torch.nn.Linear")
