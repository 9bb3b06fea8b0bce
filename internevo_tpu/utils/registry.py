"""Model registry, parity with reference ``internlm/utils/registry.py:5``."""

from __future__ import annotations

from typing import Callable


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._registry: dict[str, Callable] = {}

    def register_module(self, module_name: str):
        def decorator(fn):
            if module_name in self._registry:
                raise KeyError(f"{module_name} already registered in {self.name}")
            self._registry[module_name] = fn
            return fn

        return decorator

    def get_module(self, module_name: str) -> Callable:
        if module_name not in self._registry:
            raise KeyError(
                f"{module_name} not found in registry {self.name}; "
                f"available: {sorted(self._registry)}"
            )
        return self._registry[module_name]

    def has(self, module_name: str) -> bool:
        return module_name in self._registry

    def keys(self):
        return self._registry.keys()


MODEL_INITIALIZER = Registry("model_initializer")
