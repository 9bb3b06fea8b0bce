"""In-training hardware/network diagnostics.

Parity: reference ``internlm/utils/gputest.py`` —
``empty_cache_and_diag`` cadence hook (:36), ``timer_diagnosis`` flagging slow
steps vs trimmed-mean history (:117-180), ``bench_net`` 16MB all-reduce over
the NETTEST group (:181-226), ``bench_gpu`` local attention-flops benchmark
(:227+), ``warmup_process_group`` (:279).

TPU adaptation: collectives ride ICI via a psum over the full mesh; "slow rank"
detection in the single-controller model becomes step-time outlier detection
against the trimmed-mean history (per-host variance shows up the same way).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .logger import get_logger
from ..monitor.monitor import send_alert_message

logger = get_logger(__name__)

_step_history: list[float] = []


def empty_cache_and_diag(batch_count: int, interval: int = 50, step_time: Optional[float] = None):
    """Cadence hook from the train loop (reference :36): record step time,
    run net/flops benchmarks every ``interval`` batches."""
    if step_time is not None:
        timer_diagnosis(step_time)
    if interval <= 0 or batch_count == 0 or batch_count % interval != 0:
        return
    try:
        net = bench_net()
        flops = bench_device()
        logger.info("diag@%d: allreduce_16MB=%.2fms (%.1f GB/s), local_matmul=%.1f TFLOPS",
                    batch_count, net * 1e3, 16e-3 / max(net, 1e-9), flops)
    except Exception as e:  # diagnostics must never kill training
        logger.warning("diagnostics failed: %s", e)


def timer_diagnosis(step_time: float, outlier_ratio: float = 1.1, history: int = 50):
    """Flag steps slower than outlier_ratio x trimmed-mean of history (ref :117)."""
    _step_history.append(step_time)
    if len(_step_history) > history:
        _step_history.pop(0)
    if len(_step_history) >= 10:
        hist = np.sort(np.asarray(_step_history[:-1]))
        trimmed = hist[1:-1].mean() if len(hist) > 4 else hist.mean()
        if step_time > outlier_ratio * trimmed * 2:
            send_alert_message(
                message=f"slow step detected: {step_time * 1e3:.1f}ms vs trimmed mean "
                        f"{trimmed * 1e3:.1f}ms")


def bench_net(size_mb: int = 16) -> float:
    """All-reduce a 16MB buffer across all devices; returns seconds
    (reference bench_net over the 32-rank NETTEST group)."""
    n = size_mb * 1024 * 1024 // 4
    mesh_devices = jax.devices()
    if len(mesh_devices) == 1:
        x = jnp.ones((n,), jnp.float32)
        f = jax.jit(lambda a: a * 2)
    else:
        x = jnp.ones((n,), jnp.float32)
        f = jax.jit(lambda a: jax.lax.psum(a, "i"))
        from jax.sharding import Mesh, PartitionSpec as P

        f = jax.jit(jax.shard_map(lambda a: jax.lax.psum(a, "i"),
                                  mesh=Mesh(np.array(mesh_devices), ("i",)),
                                  in_specs=P("i"), out_specs=P(), check_vma=False))
        x = jnp.ones((n,), jnp.float32)
    f(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        out = f(x)
    out.block_until_ready()
    return (time.perf_counter() - t0) / 5


def bench_device(dim: int = 2048) -> float:
    """Local matmul benchmark; returns achieved TFLOPS (reference bench_gpu
    runs an MHA forward; a dense matmul is the equivalent MXU probe)."""
    a = jnp.ones((dim, dim), jnp.bfloat16)
    f = jax.jit(lambda x: x @ x)
    f(a).block_until_ready()
    t0 = time.perf_counter()
    steps = 20
    for _ in range(steps):
        out = f(a)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / steps
    return 2 * dim**3 / dt / 1e12


def warmup_collectives(mesh) -> None:
    """Kick one collective over every mesh axis (reference warmup_process_group)."""
    if mesh is None:
        return
    from jax.sharding import PartitionSpec as P

    for axis in mesh.axis_names:
        if mesh.shape[axis] == 1:
            continue
        try:
            f = jax.jit(jax.shard_map(lambda a: jax.lax.psum(a, axis), mesh=mesh,
                                      in_specs=P(), out_specs=P(), check_vma=False))
            f(jnp.ones((8, 128), jnp.float32)).block_until_ready()
        except Exception as e:
            logger.warning("warmup of axis %s failed: %s", axis, e)
