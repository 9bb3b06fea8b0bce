"""Memory accounting and live device-memory reporting.

Parity: reference ``internlm/utils/simple_memory_profiler.py`` — module-tree
parameter/gradient/optimizer-state memory layout + activation estimation.  On
TPU the real numbers come from the runtime (``jax.local_devices()[0]
.memory_stats()``); the tree breakdown is computed from the param/optimizer
pytrees, and activation usage is estimated from the model config.
"""

from __future__ import annotations

import json
from typing import Any, Optional

import jax
import numpy as np

from .logger import get_logger

logger = get_logger(__name__)


def _tree_bytes(tree) -> int:
    return sum(int(np.prod(x.shape)) * x.dtype.itemsize for x in jax.tree.leaves(tree))


def _fmt(n: int) -> str:
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if abs(n) < 1024:
            return f"{n:.2f}{unit}"
        n /= 1024
    return f"{n:.2f}PB"


class SimpleMemoryProfiler:
    """Static layout + periodic live snapshots."""

    def __init__(self, params, opt_state=None, log_file: Optional[str] = None,
                 activation_config: Optional[dict] = None):
        self.params = params
        self.opt_state = opt_state
        self.log_file = log_file
        self.activation_config = activation_config or {}
        self._step = 0

    def layout_report(self) -> dict:
        report: dict[str, Any] = {"params": {}}
        for key, sub in self.params.items():
            report["params"][key] = _fmt(_tree_bytes(sub))
        report["params_total"] = _fmt(_tree_bytes(self.params))
        if self.opt_state is not None:
            report["optimizer_total"] = _fmt(_tree_bytes(self.opt_state))
        ac = self.activation_config
        if ac:
            # bf16 activations per token per layer for a pre-norm SwiGLU block
            h, m, layers = ac.get("hidden_size", 0), ac.get("mlp_hidden", 0), ac.get("num_layers", 0)
            tokens = ac.get("tokens_per_device", 0)
            per_token = 2 * (h * 6 + m * 2) * layers
            report["activation_estimate"] = _fmt(per_token * tokens)
        return report

    def device_memory_stats(self) -> dict:
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            return {
                "bytes_in_use": _fmt(stats.get("bytes_in_use", 0)),
                "peak_bytes_in_use": _fmt(stats.get("peak_bytes_in_use", 0)),
                "bytes_limit": _fmt(stats.get("bytes_limit", 0)),
            }
        except Exception:
            return {}

    def step(self) -> None:
        self._step += 1
        if self._step in (1, 5) or self._step % 100 == 0:
            report = {"step": self._step, **self.layout_report(), **self.device_memory_stats()}
            line = json.dumps(report)
            if self.log_file:
                with open(self.log_file, "a") as f:
                    f.write(line + "\n")
            else:
                logger.info("memory: %s", line)
