"""Parallel context: a named-axis device mesh replacing the reference's process groups.

The reference (InternEvo ``internlm/core/context/parallel_context.py:130-673``) keeps a
``gpc`` singleton holding ~15 ``torch.distributed`` process groups (DATA, TENSOR,
PIPELINE, ZERO1, WEIGHT, EXPERT, ...), each enumerated rank-by-rank by an
``Initializer_*`` class (``process_group_initializer.py``).  On TPU all of that
collapses into ONE ``jax.sharding.Mesh`` with named axes; every "process group" is a
mesh axis (or a combination of axes), and collectives over a group become XLA
collectives over the corresponding axis names.

Mesh layout (order matters — outermost axes ride DCN between slices, innermost
ride ICI):

    ("pp", "dp", "zero", "tp")

- ``pp``   pipeline stages                      (reference PIPELINE group)
- ``dp``   pure data-parallel replicas          (DATA group = dp x zero)
- ``zero`` optimizer-state sharding subgroup    (reference ZERO1 group; zero1=-1
           means zero == full dp, dp axis size 1)
- ``tp``   tensor/sequence parallel             (reference TENSOR group; in isp mode
           this axis carries the sequence sharding, and weights are additionally
           sharded over ("zero","tp") — the reference's WEIGHT group)

Derived-size rules preserved from ``parallel_context.py:421-520``:
world == pp * dp_total * tp, dp_total == dp * zero, zero1 divides dp_total.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from enum import Enum
from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh

from .config import Config

logger = logging.getLogger(__name__)

# Mesh axis names.
PP = "pp"
DP = "dp"
EP = "ep"       # expert parallelism: carved out of the zero group (EXPERT ⊂ DP,
                # reference Initializer_Expert_Data, process_group_initializer.py:474)
ZERO = "zero"
TP = "tp"
MESH_AXES = (PP, DP, EP, ZERO, TP)


class ParallelMode(str, Enum):
    """Parity enum with the reference's process-group axes.

    Reference: ``internlm/core/context/process_group_initializer.py:16-64``.
    Each mode maps to a tuple of mesh axes; collectives "over the group" are
    collectives over those axes.
    """

    GLOBAL = "global"
    DATA = "data"          # (dp, zero)
    TENSOR = "tensor"      # (tp,)
    PIPELINE = "pipeline"  # (pp,)
    ZERO1 = "zero1"        # (zero,)
    WEIGHT = "weight"      # isp weight sharding: (zero, tp)
    WEIGHT_DATA = "weight_data"
    SEQUENCE = "sequence"  # alias of tensor axis for isp sequence sharding
    EXPERT = "expert"
    EXPERT_DATA = "expert_data"
    MODEL = "model"        # (pp, tp)
    NETTEST = "nettest"
    DUMMY = "dummy"


MODE_TO_AXES: dict[ParallelMode, tuple[str, ...]] = {
    ParallelMode.GLOBAL: MESH_AXES,
    ParallelMode.DATA: (DP, EP, ZERO),
    ParallelMode.TENSOR: (TP,),
    ParallelMode.SEQUENCE: (TP,),
    ParallelMode.PIPELINE: (PP,),
    ParallelMode.ZERO1: (EP, ZERO),
    ParallelMode.WEIGHT: (ZERO, TP),
    ParallelMode.WEIGHT_DATA: (DP, EP),
    ParallelMode.MODEL: (PP, TP),
    ParallelMode.EXPERT: (EP,),
    ParallelMode.EXPERT_DATA: (DP, ZERO),
    ParallelMode.DUMMY: (),
    ParallelMode.NETTEST: ("pp", "dp", "ep", "zero", "tp"),  # diagnostics run full-mesh
}

# "rsp" (ring sequence parallel) is a TPU-native extension: isp weight/
# activation layout with ring attention instead of the Ulysses all-to-all,
# removing the head-count bound on sequence scaling (SURVEY §2.10).
TP_MODES = ("mtp", "msp", "fsp", "isp", "rsp")


@dataclasses.dataclass
class ParallelSizes:
    world: int
    pp: int
    tp: int
    dp_total: int  # reference "dp" = world / (pp * tp)
    zero: int      # zero1 subgroup size
    dp: int        # dp_total / zero (replica axis outside zero)
    wp: int        # isp weight-parallel ways (we realize it as zero*tp)
    ep: int        # expert parallel ways (subset of dp_total)


def _derive_sizes(world: int, parallel_cfg: Config, num_experts: int = 1) -> ParallelSizes:
    pp = int(_get(parallel_cfg, "pipeline", "size", default=1))
    tensor_cfg = parallel_cfg.get("tensor", 1)
    if isinstance(tensor_cfg, dict):
        tp = int(tensor_cfg.get("size", 1))
    else:
        tp = int(tensor_cfg)
    zero_cfg = parallel_cfg.get("zero1", {})
    if isinstance(zero_cfg, dict):
        zero1 = int(zero_cfg.get("size", -1))
    else:
        zero1 = int(zero_cfg)
    wp = int(_get(parallel_cfg, "weight", "size", default=1))

    if world % (pp * tp) != 0:
        raise ValueError(f"world={world} not divisible by pp*tp={pp}*{tp}")
    dp_total = world // (pp * tp)
    if zero1 == -1:
        zero1 = dp_total
    if zero1 < 1 or dp_total % zero1 != 0:
        raise ValueError(f"zero1={zero1} must divide dp={dp_total} (ref parallel_context.py:499-520)")
    dp = dp_total // zero1
    # EP is carved out of the zero group: the largest ways dividing both the
    # zero1 size and the expert count (reference: EXPERT ⊂ DP of size
    # min(dp, num_experts), Initializer_Expert_Data :474; MoE requires
    # zero1 == dp, launch.py:437-445, so zero is where the room is)
    ep = 1
    if num_experts > 1:
        # the reference FORBIDS zero1 != dp for MoE (launch.py:437-445); with
        # zero1 < dp_total the expert optimizer state would silently replicate
        # over the residual dp axis (expert state shards over (EP, ZERO) only)
        if zero1 != dp_total:
            raise ValueError(
                f"MoE requires zero1 == dp ({dp_total}); got zero1={zero1} "
                "(reference launch.py:437-445 enforces the same)")
        ep = min(zero1, num_experts)
        while ep > 1 and (zero1 % ep or num_experts % ep):
            ep -= 1
    return ParallelSizes(world=world, pp=pp, tp=tp, dp_total=dp_total, zero=zero1, dp=dp, wp=wp, ep=ep)


def _get(cfg, key, subkey=None, default=None):
    val = cfg.get(key, default) if hasattr(cfg, "get") else default
    if subkey is not None:
        if isinstance(val, dict):
            return val.get(subkey, default)
        if val is None:
            return default
        return val
    return val


class ParallelContext:
    """Owns the device mesh, the parallel-size bookkeeping and the RNG seeds.

    Public surface parity with reference ``gpc``:
    ``get_world_size(mode)``, ``get_local_rank(mode)``, ``is_first_rank(mode)``,
    ``is_last_rank(mode)``, ``is_rank_for_log()``, ``config`` attribute.
    """

    def __init__(self):
        self.config: Config = Config()
        self.mesh: Optional[Mesh] = None
        self.sizes: Optional[ParallelSizes] = None
        self._seed: int = 1024
        self.tensor_mode: str = "mtp"
        self.virtual_pipeline_size: int = 1

    # ------------------------------------------------------------------ config

    def load_config(self, config: Config | dict | str | os.PathLike) -> None:
        if isinstance(config, (str, os.PathLike)):
            self.config = Config.from_file(config)
        elif isinstance(config, dict):
            self.config = Config(config)
        else:
            raise TypeError(f"cannot load config from {type(config)}")

    # -------------------------------------------------------------------- mesh

    def init_parallel_groups(self, devices: Optional[Sequence] = None) -> Mesh:
        """Build the mesh from ``config.parallel``. ``devices`` defaults to all jax devices."""
        if devices is None:
            devices = jax.devices()
        devices = list(devices)
        world = len(devices)
        parallel_cfg = self.config.get("parallel", Config())
        num_experts = int(_get(self.config.get("model", Config()), "num_experts", default=1) or 1)
        self.sizes = _derive_sizes(world, parallel_cfg, num_experts)

        tensor_cfg = parallel_cfg.get("tensor", 1)
        if isinstance(tensor_cfg, dict):
            self.tensor_mode = tensor_cfg.get("mode", "mtp")
        else:
            self.tensor_mode = "mtp"
        if self.tensor_mode not in TP_MODES:
            raise ValueError(f"parallel.tensor.mode must be one of {TP_MODES}, got {self.tensor_mode}")
        pipe_cfg = parallel_cfg.get("pipeline", 1)
        if isinstance(pipe_cfg, dict):
            self.virtual_pipeline_size = int(pipe_cfg.get("num_chunks", 1) or 1)

        s = self.sizes
        dev_array = np.asarray(devices).reshape(s.pp, s.dp, s.ep, s.zero // s.ep, s.tp)
        self.mesh = Mesh(dev_array, MESH_AXES)
        return self.mesh

    # --------------------------------------------------------------- rank math

    def _axes(self, mode: ParallelMode) -> tuple[str, ...]:
        return MODE_TO_AXES[mode]

    def get_world_size(self, mode: ParallelMode) -> int:
        if self.sizes is None:
            return 1
        if mode == ParallelMode.GLOBAL:
            return self.sizes.world
        size = 1
        for ax in self._axes(mode):
            size *= self.mesh.shape[ax]
        return size

    def axis_size(self, axis: str) -> int:
        return self.mesh.shape[axis] if self.mesh is not None else 1

    def get_local_rank(self, mode: ParallelMode) -> int:
        """Single-controller SPMD: the host-side rank for any group is 0 (ranks
        only exist inside traced code via ``jax.lax.axis_index``); kept for the
        reference's host-side call sites, where 0 is the logging/lead rank."""
        return 0

    def get_global_rank(self) -> int:
        return jax.process_index()

    def is_initialized(self, mode: ParallelMode) -> bool:
        return self.mesh is not None and self.get_world_size(mode) >= 1

    def is_using_parallel_mode(self, mode: ParallelMode) -> bool:
        return self.get_world_size(mode) > 1

    def is_first_rank(self, mode: ParallelMode) -> bool:
        return self.get_local_rank(mode) == 0

    def is_last_rank(self, mode: ParallelMode) -> bool:
        # single-controller: this process plays EVERY rank, so first/last rank
        # predicates are both True (mirrors is_first_rank/is_pipeline_last_stage;
        # per-stage identity lives in traced code, not host predicates)
        return True

    def is_pipeline_first_stage(self) -> bool:
        return True  # host-side view; stage identity lives in traced code

    def is_pipeline_last_stage(self) -> bool:
        return True

    def process_index(self) -> int:
        return jax.process_index()

    def is_rank_for_log(self) -> bool:
        """Reference ``parallel_context.py:284``: log on one rank only."""
        return jax.process_index() == 0

    # ------------------------------------------------------------------- seeds

    def set_seed(self, seed: int) -> None:
        """Single base seed; per-purpose keys are derived with fold_in.

        The reference keeps distinct CUDA RNG streams per ParallelMode
        (``core/context/random.py``).  In JAX, parameter init uses one global
        deterministic key (arrays are initialized full-size then sharded, so
        every topology sees identical values — this is what makes the
        cross-topology loss-equivalence tests trivial), and per-device
        stochasticity (dropout) uses keys folded with the data step.
        """
        self._seed = int(seed)

    @property
    def seed(self) -> int:
        return self._seed

    def rng(self, name: str) -> jax.Array:
        key = jax.random.PRNGKey(self._seed)
        return jax.random.fold_in(key, _stable_hash(name))

    # ----------------------------------------------------------------- helpers

    def sub_mesh_axes(self, mode: ParallelMode) -> tuple[str, ...]:
        return self._axes(mode)


def _stable_hash(name: str) -> int:
    h = 2166136261
    for ch in name.encode():
        h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
    return h


# The singleton, mirroring reference `gpc`.
global_context = ParallelContext()
gpc = global_context
