"""Component registries.

Reproduces the reference's extension API (css/models/__init__.py:19-23,
css/objectives/__init__.py:19, css/datasets/__init__.py:19-21): every
component class exposes ``add_args(parser)`` and a ``build_*(conf)``
classmethod, and is looked up by name from a registry so CLIs can dispatch
``--model-type``/``--objective-type``/``--dataset-type`` choices and let the
chosen component inject its own flags (two-phase parsing,
scripts/python/train.py:96-101 in the reference).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, Tuple, TypeVar

T = TypeVar("T")


class Registry:
    """A name -> class mapping with decorator-style registration."""

    def __init__(self, kind: str):
        self.kind = kind
        self._items: Dict[str, type] = {}

    def register(self, name: str) -> Callable[[T], T]:
        def deco(cls: T) -> T:
            if name in self._items:
                raise KeyError(f"{self.kind} '{name}' already registered")
            self._items[name] = cls
            return cls

        return deco

    def __getitem__(self, name: str) -> type:
        try:
            return self._items[name]
        except KeyError:
            raise KeyError(
                f"Unknown {self.kind} '{name}'. Available: {sorted(self._items)}"
            ) from None

    def __contains__(self, name: str) -> bool:
        return name in self._items

    def __iter__(self) -> Iterator[Tuple[str, type]]:
        return iter(self._items.items())

    def keys(self):
        return self._items.keys()

    def add_all_args(self, parser) -> None:
        """Let every registered component inject its flags into ``parser``."""
        for cls in self._items.values():
            add = getattr(cls, "add_args", None)
            if add is not None:
                add(parser)
