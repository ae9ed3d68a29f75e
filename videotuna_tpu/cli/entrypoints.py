"""Console-script entry points — one zero-arg callable per registry command.

The reference exposes ~40 poetry scripts (pyproject.toml:88-126), each a
function in scripts/__init__.py that shells out to a python entry with a
baked-in config. Here every registry command (cli/commands.py COMMANDS +
DEV_COMMANDS + serve/eval) gets a generated function so pyproject's
``[project.scripts]`` can bind ``inference-wanvideo-t2v-720p = "videotuna_tpu
.cli.entrypoints:inference_wanvideo_t2v_720p"`` without subprocess hops.

Functions are generated at import time from the single source of truth
(the registry), so the two surfaces cannot drift.
"""

from __future__ import annotations

import sys

from videotuna_tpu.cli.commands import COMMANDS, DEV_COMMANDS, main


def entry_name(command_name: str) -> str:
    """console-script name → python identifier (mirrors the reference's
    naming: dashes/dots → underscores)."""
    return command_name.replace("-", "_").replace(".", "_")


def _make_entry(command_name: str):
    def entry() -> int:
        return main([command_name, *sys.argv[1:]])
    entry.__name__ = entry_name(command_name)
    entry.__qualname__ = entry.__name__
    entry.__doc__ = f"console entry for `videotuna-tpu {command_name}`"
    return entry


ALL_ENTRIES = {}
for _name in (*COMMANDS, *DEV_COMMANDS, "serve", "eval", "list"):
    _fn = _make_entry(_name)
    globals()[_fn.__name__] = _fn
    ALL_ENTRIES[_name] = _fn.__name__
del _name, _fn
