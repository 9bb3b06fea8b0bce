"""Common utilities: flops accounting, batch skipping, misc helpers.

Parity targets: reference ``internlm/utils/common.py`` (``get_megatron_flops``
:208-239, ``BatchSkipper`` :165, ``parse_args`` :25).
"""

from __future__ import annotations

import argparse
import time
from typing import Any

import jax
import numpy as np


def get_megatron_flops(
    elapsed_time_per_iter: float,
    checkpoint: bool = False,
    seq_len: int = 2048,
    hidden_size: int = 12,
    num_layers: int = 32,
    vocab_size: int = 12,
    global_batch_size: int = 4,
    global_world_size: int = 1,
    mlp_ratio: float = 4,
    use_swiglu: bool = True,
) -> float:
    """Megatron-SC21 model-flops accounting (reference ``utils/common.py:208-239``).

    Returns TFLOPS per device. ``checkpoint`` adds the recompute factor (4 vs 3
    matmul passes).
    """
    checkpoint_activations_factor = 4 if checkpoint else 3
    if use_swiglu:
        mlp_ratio = mlp_ratio * 3 / 2
    flops_per_iteration = (
        checkpoint_activations_factor
        * (
            (8 + mlp_ratio * 4) * global_batch_size * seq_len * hidden_size**2
            + 4 * global_batch_size * seq_len**2 * hidden_size
        )
    ) * num_layers + 6 * global_batch_size * seq_len * hidden_size * vocab_size
    return flops_per_iteration / (elapsed_time_per_iter * global_world_size * 1e12)


# Peak dense bf16 TFLOPS per chip, for MFU reporting.
TPU_PEAK_TFLOPS = {
    "v4": 275.0,
    "v5e": 197.0,
    "v5 lite": 197.0,
    "v5p": 459.0,
    "v6e": 918.0,
    "cpu": 1.0,
}


def device_peak_tflops() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for name, tflops in TPU_PEAK_TFLOPS.items():
        if name in kind:
            return tflops
    return 197.0


class BatchSkipper:
    """Skip specific global steps' batches (resume hygiene), ref ``utils/common.py:165``."""

    def __init__(self, skip_batches: str = ""):
        self.intervals = []
        if skip_batches:
            for chunk in skip_batches.split(","):
                lo, _, hi = chunk.partition("-")
                hi = hi or lo
                self.intervals.append((int(lo), int(hi)))

    def __call__(self, batch_count: int) -> bool:
        return any(lo <= batch_count <= hi for lo, hi in self.intervals)


def parse_args() -> argparse.Namespace:
    """CLI parity with reference ``initialize/launch.py:40-68``."""
    parser = argparse.ArgumentParser(description="InternEvo-TPU training launcher")
    parser.add_argument("--config", type=str, required=True, help="path to the python config file")
    parser.add_argument("--launcher", type=str, default="jax", choices=["jax", "slurm", "torch"])
    parser.add_argument("--port", type=int, default=8888)
    parser.add_argument("--seed", type=int, default=1024)
    parser.add_argument("--profiling", default=False, action="store_true")
    parser.add_argument("--backend", type=str, default="tpu")
    return parser.parse_args()


def get_current_device() -> Any:
    return jax.devices()[0]


def launch_time() -> str:
    return time.strftime("%m-%d-%H:%M:%S")


def moving_average(values, window: int) -> float:
    if not values:
        return 0.0
    tail = list(values)[-window:]
    return float(np.mean(tail))


class SingletonMeta(type):
    _instances: dict = {}

    def __call__(cls, *args, **kwargs):
        if cls not in cls._instances:
            cls._instances[cls] = super().__call__(*args, **kwargs)
        return cls._instances[cls]
