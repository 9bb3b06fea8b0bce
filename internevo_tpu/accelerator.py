"""Accelerator abstraction shim.

Parity: reference ``internlm/accelerator/`` — ``AcceleratorType`` enum +
``get_accelerator()`` dispatching to CUDA/NPU/DIPU backends
(``abstract_accelerator.py:8-76``).  On JAX there is one runtime; this shim
preserves the query surface (device kind/count, memory stats, backend name,
synchronize) that the rest of the reference codebase consults.
"""

from __future__ import annotations

import enum
from typing import Optional

import jax


class AcceleratorType(enum.Enum):
    TPU = 1
    GPU = 2
    CPU = 3
    OTHER = 4


class TPUAccelerator:
    def get_accelerator_type(self) -> AcceleratorType:
        backend = jax.default_backend()
        if backend == "tpu":
            return AcceleratorType.TPU
        if backend == "gpu":
            return AcceleratorType.GPU
        if backend == "cpu":
            return AcceleratorType.CPU
        return AcceleratorType.TPU if "tpu" in backend or "axon" in backend else AcceleratorType.OTHER

    def device_count(self) -> int:
        return jax.device_count()

    def local_device_count(self) -> int:
        return jax.local_device_count()

    def current_device_name(self) -> str:
        return jax.devices()[0].device_kind

    def communication_backend_name(self) -> str:
        return "ici"

    def synchronize(self) -> None:
        jax.effects_barrier()

    def empty_cache(self) -> None:
        pass  # XLA owns HBM; nothing to flush

    def memory_stats(self) -> dict:
        try:
            return jax.local_devices()[0].memory_stats() or {}
        except Exception:
            return {}

    def max_memory_allocated(self) -> int:
        return int(self.memory_stats().get("peak_bytes_in_use", 0))

    def memory_allocated(self) -> int:
        return int(self.memory_stats().get("bytes_in_use", 0))

    def is_available(self) -> bool:
        return True


_accelerator: Optional[TPUAccelerator] = None


def get_accelerator() -> TPUAccelerator:
    global _accelerator
    if _accelerator is None:
        _accelerator = TPUAccelerator()
    return _accelerator


internlm_accelerator = get_accelerator()
