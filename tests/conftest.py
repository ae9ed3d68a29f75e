"""Test harness: 8 virtual CPU devices so every mesh axis (dp/fsdp/sp/tp) is
exercised without TPU hardware (SURVEY.md §4 rebuild plan)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var alone is not honored when a TPU PJRT plugin (axon) is present;
# the config update is, and must happen before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs[:8]


@pytest.fixture()
def rng():
    return jax.random.key(0)


_STUB_ROOTS = (
    "videotuna", "pytorch_lightning", "diffusers", "omegaconf",
    "torchvision", "vbench", "colossalai", "deepspeed", "loguru",
    "beartype", "sgm", "vae_modules", "rotary_embedding_torch",
    "refhy", "refstep", "refviclip", "ref_med", "ref_swin",
    "ref_umt_finetune", "refraftcore",
)


@pytest.fixture(autouse=True, scope="module")
def _isolate_reference_stub_namespaces():
    """Parity tests stub reference dependencies (pytorch_lightning,
    diffusers, videotuna.*, …) into sys.modules with just the attributes
    THEY need; without cleanup a later module's reference import finds
    another test's minimal stub (full-suite-only ModuleNotFound /
    AttributeError failures while every file passes standalone). Purge
    those namespaces after each test module so every reference import
    starts clean."""
    yield
    import sys
    for name in list(sys.modules):
        if name.split(".")[0] in _STUB_ROOTS:
            del sys.modules[name]
