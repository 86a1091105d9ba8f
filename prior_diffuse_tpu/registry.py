"""Explicit name registries for models, losses and trainers.

The reference dispatches models/losses/trainers by ``eval()`` on config
strings (reference ``main.py:96``, ``trainer/complex_ddpm_trainer.py:69,668``).
We replace that with typed registries: same config-driven indirection,
no arbitrary code execution.
"""

from __future__ import annotations

from typing import Callable, Dict, Generic, Iterator, TypeVar

T = TypeVar("T")


class Registry(Generic[T]):
    """A simple name -> object registry with decorator support."""

    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, T] = {}

    def register(self, name: str) -> Callable[[T], T]:
        def deco(obj: T) -> T:
            if name in self._entries:
                raise KeyError(f"{self.kind} {name!r} already registered")
            self._entries[name] = obj
            return obj

        return deco

    def get(self, name: str) -> T:
        try:
            return self._entries[name]
        except KeyError:
            known = ", ".join(sorted(self._entries))
            raise KeyError(
                f"unknown {self.kind} {name!r}; registered: {known}"
            ) from None

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def __iter__(self) -> Iterator[str]:
        return iter(sorted(self._entries))

    def names(self):
        return sorted(self._entries)


MODELS: Registry = Registry("model")
LOSSES: Registry = Registry("loss")
TRAINERS: Registry = Registry("trainer")
