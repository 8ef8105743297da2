"""Registry + config-driven builders, mirroring the mmcv convention.

The reference resolves components from registries by string ``type`` keys or
passes class objects directly in configs
(/root/reference/configs/001_..._rdn_...py:6-14 and SURVEY.md §0.2). We keep
that surface: ``build_from_cfg({'type': 'RDN', ...})`` or
``{'type': SomeClass, ...}`` both work.
"""

from __future__ import annotations

import copy
from typing import Any, Callable


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._registry: dict[str, Any] = {}

    def register(self, obj: Any = None, *, name: str | None = None):
        def _do(o):
            key = name or o.__name__
            if key in self._registry and self._registry[key] is not o:
                raise KeyError(f"{key} already registered in {self.name}")
            self._registry[key] = o
            return o
        if obj is None:
            return _do
        return _do(obj)

    def get(self, key: str) -> Any:
        if key not in self._registry:
            raise KeyError(
                f"'{key}' not found in registry '{self.name}'. "
                f"Available: {sorted(self._registry)}")
        return self._registry[key]

    def __contains__(self, key: str) -> bool:
        return key in self._registry


MODELS = Registry("models")
BACKBONES = Registry("backbones")
COMPONENTS = Registry("components")
LOSSES = Registry("losses")
DATASETS = Registry("datasets")
PIPELINES = Registry("pipelines")


def build_from_cfg(cfg: dict, registry: Registry, default_args: dict | None = None,
                   **extra) -> Any:
    """Instantiate ``cfg['type']`` with the remaining keys as kwargs."""
    if cfg is None:
        return None
    cfg = copy.deepcopy(dict(cfg))
    obj_type = cfg.pop("type")
    if isinstance(obj_type, str):
        cls: Callable = registry.get(obj_type)
    else:
        cls = obj_type
    if default_args:
        for k, v in default_args.items():
            cfg.setdefault(k, v)
    cfg.update(extra)
    return cls(**cfg)
