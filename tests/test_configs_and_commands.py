"""Every shipped config must parse, resolve, and instantiate its flow
(module definitions only — no parameter allocation); the command registry
must map every command to an existing config."""

from pathlib import Path

import pytest

from videotuna_tpu.cli.commands import COMMANDS, list_commands, main
from videotuna_tpu.core.config import load_configs
from videotuna_tpu.core.registry import instantiate, populate

populate()

REPO = Path(__file__).resolve().parents[1]
ALL_CONFIGS = sorted((REPO / "configs").rglob("*.yaml"))


@pytest.mark.parametrize("cfg_path", ALL_CONFIGS,
                         ids=[str(p.relative_to(REPO)) for p in ALL_CONFIGS])
def test_config_instantiates_flow(cfg_path):
    cfg = load_configs([cfg_path])
    assert "flow" in cfg, f"{cfg_path} missing flow:"
    flow = instantiate(cfg["flow"])
    assert flow.denoiser is not None
    assert flow.scheduler is not None


def test_defaults_inheritance():
    cfg = load_configs([REPO / "configs/004_cogvideox/cogvideo2b_lora.yaml"])
    # inherits the flow from the base config, overrides train
    assert cfg["flow"]["target"].endswith("CogVideoXFlow")
    assert cfg["train"]["lora"]["rank"] == 128


class TestCommands:
    def test_all_commands_reference_existing_configs(self):
        for name, cmd in COMMANDS.items():
            for c in cmd.configs:
                assert (REPO / c).exists(), f"{name}: missing {c}"

    def test_list_and_unknown(self, capsys):
        assert main(["list"]) == 0
        out = capsys.readouterr().out
        assert "inference-wanvideo-t2v-720p" in out
        assert main(["definitely-not-a-command"]) == 2

    def test_tiny_inference_command_runs(self, tmp_path):
        rc = main(["inference-tiny-t2v", "--quiet",
                   "--savedir", str(tmp_path)])
        assert rc == 0
        assert list(tmp_path.glob("*.mp4"))
