"""Explicit component registry.

Replaces the reference's OmegaConf dotted-path `instantiate_from_config`
(`modules/ldm/util.py`) with a typed, explicit registry: model specs in
YAML/dicts name a registered builder instead of an arbitrary import path.
This keeps model construction jit-/SPMD-friendly (builders return pure
Flax modules + config dataclasses) and auditable.
"""
from __future__ import annotations

from typing import Callable, Dict, Generic, Iterator, TypeVar

T = TypeVar("T")


class Registry(Generic[T]):
    def __init__(self, kind: str):
        self.kind = kind
        self._items: Dict[str, T] = {}

    def register(self, name: str, item: T | None = None):
        """Register `item` under `name`; usable as a decorator."""
        if item is not None:
            self._items[name] = item
            return item

        def deco(fn: T) -> T:
            self._items[name] = fn
            return fn

        return deco

    def get(self, name: str) -> T:
        try:
            return self._items[name]
        except KeyError:
            known = ", ".join(sorted(self._items)) or "<empty>"
            raise KeyError(f"Unknown {self.kind} {name!r}. Known: {known}") from None

    def __contains__(self, name: str) -> bool:
        return name in self._items

    def names(self) -> list[str]:
        return sorted(self._items)

    def __iter__(self) -> Iterator[str]:
        return iter(sorted(self._items))


# Global registries (populated by samplers/, models/, pipelines/ on import).
SAMPLERS: Registry[Callable] = Registry("sampler")
SCHEDULES: Registry[Callable] = Registry("sigma schedule")
GUIDERS: Registry[Callable] = Registry("guider")
DISCRETIZATIONS: Registry[Callable] = Registry("discretization")
MODELS: Registry[Callable] = Registry("model builder")
PIPELINES: Registry[Callable] = Registry("pipeline")
UPSCALERS: Registry[Callable] = Registry("upscaler")
ANNOTATORS: Registry[Callable] = Registry("annotator")
