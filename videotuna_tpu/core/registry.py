"""Component registry: maps config ``target:`` strings to constructors.

The reference resolves ``target: dotted.path.Class`` by importlib reflection
(videotuna/utils/common_utils.py:90-111). We keep that YAML surface but back it
with an explicit registry so that (a) legacy ``videotuna.*`` target strings in
existing configs resolve to the new TPU implementations, and (b) there is no
arbitrary-import code path.

Usage::

    from videotuna_tpu.core.registry import register, resolve

    @register("videotuna_tpu.models.opensora.STDiT",
              aliases=["videotuna.models.opensora.models.stdit.stdit.STDiT_XL_2"])
    class STDiT(nn.Module): ...

    cls = resolve("videotuna.models.opensora.models.stdit.stdit.STDiT_XL_2")
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Dict, Iterable, Optional

_REGISTRY: Dict[str, Any] = {}

# Sentinel used by the reference for "this stage has no module"
# (videotuna/utils/common_utils.py:92-95).
FIRST_STAGE_SENTINEL = "__is_first_stage__"
UNCONDITIONAL_SENTINEL = "__is_unconditional__"


def register(name: str, aliases: Iterable[str] = ()) -> Callable[[Any], Any]:
    """Class/function decorator registering it under ``name`` (+ aliases)."""

    def deco(obj: Any) -> Any:
        _REGISTRY[name] = obj
        for a in aliases:
            _REGISTRY[a] = obj
        return obj

    return deco


def register_alias(alias: str, name: str) -> None:
    _REGISTRY[alias] = _REGISTRY[name]


def resolve(target: str) -> Any:
    """Resolve a ``target:`` string to a constructor.

    Lookup order: explicit registry → import of ``videotuna_tpu.*`` dotted
    paths only (no arbitrary module imports, unlike the reference).
    """
    if target in _REGISTRY:
        return _REGISTRY[target]
    populate()  # load registered modules, then retry
    if target in _REGISTRY:
        return _REGISTRY[target]
    if target.startswith("videotuna_tpu."):
        module, _, attr = target.rpartition(".")
        obj = getattr(importlib.import_module(module), attr)
        _REGISTRY[target] = obj
        return obj
    raise KeyError(
        f"Unknown target {target!r}. Register it with "
        "videotuna_tpu.core.registry.register, or use a videotuna_tpu.* path."
    )


def known_targets() -> list[str]:
    return sorted(_REGISTRY)


def instantiate(config: Any, **extra_kwargs: Any) -> Any:
    """Instantiate from a ``{target: ..., params: {...}}`` mapping.

    Mirrors ``instantiate_from_config`` (reference common_utils.py:90-101),
    including the first-stage / unconditional sentinels.
    """
    if isinstance(config, str):
        target = config
        params: Dict[str, Any] = {}
    else:
        if "target" not in config:
            if config in (FIRST_STAGE_SENTINEL, UNCONDITIONAL_SENTINEL):
                return None
            raise KeyError(f"Expected `target` key in config: {config!r}")
        target = config["target"]
        params = dict(config.get("params") or {})
    if target in (FIRST_STAGE_SENTINEL, UNCONDITIONAL_SENTINEL):
        return None
    params.update(extra_kwargs)
    return resolve(target)(**params)


# ---------------------------------------------------------------------------
# Import model/flow modules for their @register side effects. Kept lazy-ish:
# callers that need the full registry call `populate()` once.
# ---------------------------------------------------------------------------
_POPULATED = False


def populate() -> None:
    global _POPULATED
    if _POPULATED:
        return
    _POPULATED = True
    import importlib as _il

    for mod in (
        "videotuna_tpu.models.opensora.stdit",
        "videotuna_tpu.models.vae2d",
        "videotuna_tpu.models.vae3d",
        "videotuna_tpu.models.wan.vae",
        "videotuna_tpu.models.hunyuan.vae",
        "videotuna_tpu.models.cogvideo.vae",
        "videotuna_tpu.models.text_encoders",
        "videotuna_tpu.models.lvdm.unet3d",
        "videotuna_tpu.models.lvdm.image_cond",
        "videotuna_tpu.schedulers.fm_solvers",
        "videotuna_tpu.schedulers.iddpm",
        "videotuna_tpu.models.cogvideo.mmdit",
        "videotuna_tpu.models.hunyuan.dit",
        "videotuna_tpu.models.wan.dit",
        "videotuna_tpu.models.stepvideo.dit",
        "videotuna_tpu.models.flux.dit",
        "videotuna_tpu.models.mochi.dit",
        "videotuna_tpu.models.mochi_vae",
        "videotuna_tpu.schedulers",
        "videotuna_tpu.flows",
        "videotuna_tpu.data.datasets",
    ):
        try:
            _il.import_module(mod)
        except ModuleNotFoundError:
            # During early bring-up some families may not exist yet.
            pass
