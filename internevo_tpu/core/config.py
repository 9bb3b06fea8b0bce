"""Executable-python config system.

Mirrors the reference semantics (InternEvo `internlm/core/context/parallel_context.py:39-127`):
configs are plain ``.py`` files whose module-level variables become entries of an
attribute-accessible dict.  A ``read_base()`` context manager (reference
`internlm/utils/utils.py:6`) lets a config file splice in base configs by importing
them inside the ``with`` block.
"""

from __future__ import annotations

import contextlib
import inspect
import os
from importlib.machinery import SourceFileLoader
from pathlib import Path
from typing import Any


class Config(dict):
    """A dict with attribute access, nested-auto-wrapping, and a python-file loader."""

    def __init__(self, config: dict | None = None):
        super().__init__()
        if config is not None:
            for k, v in config.items():
                self[k] = v

    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, Config):
            return value
        if isinstance(value, dict):
            return Config(value)
        if isinstance(value, (list, tuple)):
            return type(value)(Config._wrap(v) for v in value)
        return value

    def __setitem__(self, key: str, value: Any) -> None:
        super().__setitem__(key, Config._wrap(value))

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError as exc:
            raise AttributeError(key) from exc

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __deepcopy__(self, memo):
        import copy

        out = Config()
        for k, v in self.items():
            out[k] = copy.deepcopy(v, memo)
        return out

    def setdefault(self, key: str, default: Any = None) -> Any:
        if key not in self:
            self[key] = default
        return self[key]

    @staticmethod
    def from_file(filename: str | os.PathLike) -> "Config":
        """Exec a python file and collect its module-level variables into a Config."""
        path = Path(filename).resolve()
        if not path.exists():
            raise FileNotFoundError(f"config file not found: {path}")
        module = SourceFileLoader(f"_ievo_config_{path.stem}", str(path)).load_module()
        cfg = Config()
        for name in dir(module):
            if name.startswith("_"):
                continue
            value = getattr(module, name)
            if inspect.ismodule(value) or inspect.isfunction(value) or inspect.isclass(value):
                continue
            cfg[name] = value
        return cfg

    def to_dict(self) -> dict:
        out = {}
        for k, v in self.items():
            if isinstance(v, Config):
                out[k] = v.to_dict()
            else:
                out[k] = v
        return out


@contextlib.contextmanager
def read_base():
    """Within ``with read_base():`` a config file may ``from .base_cfg import *``.

    The reference (``internlm/utils/utils.py``) uses this purely as a marker; the
    import machinery does the work because base configs are plain python modules.
    """
    yield
