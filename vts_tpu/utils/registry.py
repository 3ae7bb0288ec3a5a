"""Name-keyed registries.

The reference discovers models/datasets by module-name reflection
(reference models/__init__.py:25-45, data/__init__.py:18-38) and fetches
losses/visuals via ``getattr``.  Here the same ``--model``/``--dataset_mode``
UX is kept, but discovery is an explicit registry: decorating a class with
``@register_model("sinskit")`` makes it reachable by name.  No getattr magic —
everything the training loop touches is an explicit pytree/dataclass.
"""

from __future__ import annotations

from typing import Callable, Dict, Generic, Iterable, TypeVar

T = TypeVar("T")


class Registry(Generic[T]):
    def __init__(self, kind: str):
        self.kind = kind
        self._items: Dict[str, T] = {}

    def register(self, name: str) -> Callable[[T], T]:
        def deco(obj: T) -> T:
            key = name.lower()
            if key in self._items:
                raise KeyError(f"{self.kind} {name!r} registered twice")
            self._items[key] = obj
            return obj

        return deco

    def get(self, name: str) -> T:
        key = name.lower()
        if key not in self._items:
            raise KeyError(
                f"unknown {self.kind} {name!r}; available: {sorted(self._items)}"
            )
        return self._items[key]

    def __contains__(self, name: str) -> bool:
        return name.lower() in self._items

    def names(self) -> Iterable[str]:
        return sorted(self._items)


MODELS: Registry = Registry("model")
DATASETS: Registry = Registry("dataset")
GENERATORS: Registry = Registry("generator")
DISCRIMINATORS: Registry = Registry("discriminator")
SCHEDULES: Registry = Registry("lr schedule")

register_model = MODELS.register
register_dataset = DATASETS.register
register_generator = GENERATORS.register
register_discriminator = DISCRIMINATORS.register
register_schedule = SCHEDULES.register
