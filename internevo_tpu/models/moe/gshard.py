"""GShard top-1/top-2 gating and the expert-parallel MoE layer.

Parity: reference ``internlm/model/moe/gshard_layer.py`` — ``top1gating``
(:138), ``top2gating`` (:224), ``GShardMOELayer`` dispatch/combine einsums +
all-to-all (:445-498), and ``Experts`` (``experts.py:13``).

TPU-native: the EXPERT-group all-to-all (``moe/utils.py:8-62``) is not written
by hand — expert weights are sharded over the expert mesh axis and the
dispatched activations are sharding-constrained from token-sharded to
expert-sharded, so GSPMD inserts (and overlaps) the a2a pair.  Capacity must be
static under jit, so ``drop_tokens=False``'s dynamic max-count capacity becomes
"capacity = tokens" (no drop), which is its semantic meaning.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ...core.context import EP
from ...parallel.sharding import get_rules
from jax.sharding import PartitionSpec as P


def _capacity(num_tokens: int, num_experts: int, capacity_factor: float, min_capacity: int) -> int:
    # reference gshard_layer.py:121-130: ceil((tokens/experts) * factor),
    # floored at min_capacity (ceil AFTER the multiply — order matters)
    cap = math.ceil((num_tokens / num_experts) * capacity_factor)
    return int(max(cap, min_capacity))


def _gumbel(rng, shape):
    return -jnp.log(-jnp.log(jax.random.uniform(rng, shape, jnp.float32, 1e-10, 1.0 - 1e-10) + 1e-10) + 1e-10)


def _uniform(rng, shape, lo=0.0, hi=1.0):
    """Uniform draw seam (RTS priorities, gate-input jitter) — module-level so
    parity tests can inject the SAME noise into us and the torch reference
    (which exposes the equivalent seams as its ``*_map`` device dicts,
    ``gshard_layer.py:29-31``)."""
    return jax.random.uniform(rng, shape, jnp.float32, lo, hi)


def _one_hot(x, n):
    return jax.nn.one_hot(x, n, dtype=jnp.float32)


def top1gating(
    logits: jax.Array,
    capacity_factor: float,
    min_capacity: int,
    rng: Optional[jax.Array] = None,
    noisy_gate_policy: Optional[str] = None,
    drop_tokens: bool = True,
    use_rts: bool = True,
):
    """logits: (tokens, E) fp32. Returns (l_aux, combine_weights (s,e,c),
    dispatch_mask (s,e,c) bool, exp_counts (E,))."""
    S, E = logits.shape
    gates = jax.nn.softmax(logits, axis=1)
    capacity = _capacity(S, E, capacity_factor, min_capacity) if drop_tokens else S

    if noisy_gate_policy == "RSample" and rng is not None:
        noise_rng, rng = jax.random.split(rng)
        indices1_s = jnp.argmax(logits + _gumbel(noise_rng, logits.shape), axis=1)
    else:
        indices1_s = jnp.argmax(gates, axis=1)
    mask1 = _one_hot(indices1_s, E)
    exp_counts = jnp.sum(mask1, axis=0)

    me = jnp.mean(gates, axis=0)
    ce = jnp.mean(mask1, axis=0)
    l_aux = jnp.sum(me * ce) * E

    # Random Token Selection (ref :180-199): prioritize randomly, not by position
    if use_rts and rng is not None:
        rts_rng, rng = jax.random.split(rng)
        mask1_rand = mask1 * _uniform(rts_rng, mask1.shape)
    else:
        mask1_rand = mask1
    # top-capacity tokens per expert keep their slot
    ncap = min(capacity, S)
    _, top_idx = jax.lax.top_k(mask1_rand.T, ncap)  # (E, C) token indices per expert
    keep = jnp.zeros((S, E), jnp.float32)
    keep = keep.at[top_idx.reshape(-1), jnp.repeat(jnp.arange(E), ncap)].set(1.0)
    mask1 = mask1 * keep

    locations1 = jnp.cumsum(mask1, axis=0) - 1
    locations1_s = jnp.sum(locations1 * mask1, axis=1).astype(jnp.int32)
    gates = gates * mask1
    locations1_sc = _one_hot(locations1_s, capacity)
    combine_weights = jnp.einsum("se,sc->sec", gates, locations1_sc)
    dispatch_mask = combine_weights > 0
    return l_aux, combine_weights, dispatch_mask, exp_counts


def top2gating(logits: jax.Array, capacity_factor: float, min_capacity: int,
               rng: Optional[jax.Array] = None):
    """Top-2 gating (ref :224-366)."""
    S, E = logits.shape
    gates = jax.nn.softmax(logits, axis=1)
    capacity = _capacity(S, E, capacity_factor * 2, min_capacity)

    indices1_s = jnp.argmax(gates, axis=1)
    mask1 = _one_hot(indices1_s, E)
    if rng is not None:
        logits_w_noise = logits + _gumbel(rng, logits.shape)
    else:
        logits_w_noise = logits
    logits_except1 = jnp.where(mask1 > 0, jnp.finfo(jnp.float32).min, logits_w_noise)
    indices2_s = jnp.argmax(logits_except1, axis=1)
    mask2 = _one_hot(indices2_s, E)

    locations1 = jnp.cumsum(mask1, axis=0) - 1
    locations2 = jnp.cumsum(mask2, axis=0) - 1 + jnp.sum(mask1, axis=0, keepdims=True)
    exp_counts = jnp.sum(mask1, axis=0)

    me = jnp.mean(gates, axis=0)
    ce = jnp.mean(mask1, axis=0)
    l_aux = jnp.mean(me * ce) * E * E

    mask1 = mask1 * (locations1 < capacity)
    mask2 = mask2 * (locations2 < capacity)
    locations1_s = jnp.sum(locations1 * mask1, axis=1).astype(jnp.int32)
    locations2_s = jnp.sum(locations2 * mask2, axis=1).astype(jnp.int32)

    gates1_s = jnp.einsum("se,se->s", gates, mask1)
    gates2_s = jnp.einsum("se,se->s", gates, mask2)
    denom = jnp.clip(gates1_s + gates2_s, jnp.finfo(jnp.float32).eps, None)
    gates1 = jnp.einsum("s,se->se", gates1_s / denom, mask1)
    gates2 = jnp.einsum("s,se->se", gates2_s / denom, mask2)
    combine = (
        jnp.einsum("se,sc->sec", gates1, _one_hot(locations1_s, capacity))
        + jnp.einsum("se,sc->sec", gates2, _one_hot(locations2_s, capacity))
    )
    dispatch_mask = combine > 0
    return l_aux, combine, dispatch_mask, exp_counts


def moe_layer_apply(
    layer: dict,
    x: jax.Array,
    *,
    top_k: int = 2,
    capacity_factor: float = 1.0,
    min_capacity: int = 4,
    drop_tokens: bool = True,
    use_rts: bool = True,
    noisy_gate_policy: Optional[str] = None,
    rng: Optional[jax.Array] = None,
    train: bool = True,
    manual_ep_axis: Optional[str] = None,
    manual_ep_size: int = 1,
):
    """GShard MoE FFN over (B, S, H) activations.

    layer: {"gate": (H, E), "experts": {"w1": (E, H, M), "w3": (E, H, M),
    "w2": (E, M, H)}}.  Returns (out (B,S,H), l_aux, exp_counts).

    ``manual_ep_axis``: inside a fully-manual shard_map (the 1F1B pipeline)
    GSPMD constraints are unavailable — the expert all-to-all pair is issued
    EXPLICITLY over that mesh axis instead (the hand-written analogue of the
    reference ``moe/utils.py:8-62`` _AllToAll): dispatch (E, C, H) ->
    (E/ep, ep*C, H) before the expert FFN, inverse after.  Expert weights then
    arrive as the LOCAL (E/ep, ...) shard.
    """
    if noisy_gate_policy not in (None, "RSample", "Jitter"):
        # reference gshard_layer.py:403 asserts the same value set
        raise ValueError(f"unsupported noisy_gate_policy {noisy_gate_policy!r}; "
                         "expected None, 'RSample' or 'Jitter'")
    sh = get_rules()
    B, S, H = x.shape
    tokens = x.reshape(B * S, H)
    gate_w = layer["gate"].astype(jnp.float32)
    gate_in = tokens.astype(jnp.float32)
    if noisy_gate_policy == "Jitter" and train and rng is not None:
        # multiplicative input jitter on the GATE input only (reference
        # gshard_layer.py:340-342 multiplicative_jitter, epsilon=1e-2)
        jit_rng, rng = jax.random.split(rng)
        eps = 1e-2
        gate_in = gate_in * _uniform(jit_rng, gate_in.shape, 1.0 - eps, 1.0 + eps)
    logits = gate_in @ gate_w  # (s, E) fp32 (ref: gate in fp32)

    if top_k == 1:
        l_aux, combine, dispatch, exp_counts = top1gating(
            logits, capacity_factor, min_capacity, rng=rng if train else None,
            noisy_gate_policy=noisy_gate_policy if train else None,
            drop_tokens=drop_tokens, use_rts=use_rts and train,
        )
    else:
        l_aux, combine, dispatch, exp_counts = top2gating(
            logits, capacity_factor, min_capacity, rng=rng if train else None,
        )

    # dispatch: (s, E, C) x (s, H) -> (E, C, H); GSPMD turns the E-sharding
    # constraint into the EXPERT all-to-all (ref GShardMOELayer :445-498)
    E = gate_w.shape[1]
    ep_size = sh.mesh.shape.get(EP, 1) if sh.mesh is not None else 1
    shard_experts = manual_ep_axis is None and sh.mesh is not None and ep_size > 1
    manual_ep = manual_ep_axis is not None and manual_ep_size > 1
    dispatched = jnp.einsum("sec,sh->ech", dispatch.astype(x.dtype), tokens)
    if shard_experts:
        dispatched = jax.lax.with_sharding_constraint(
            dispatched, jax.sharding.NamedSharding(sh.mesh, P(EP, None, None))
        )
    elif manual_ep:
        # explicit expert a2a (manual shard_map): each rank sends the capacity
        # rows of remote experts, receives its E/ep experts' rows from all ranks
        dispatched = jax.lax.all_to_all(dispatched, manual_ep_axis,
                                        split_axis=0, concat_axis=1, tiled=True)
    w1, w2, w3 = layer["experts"]["w1"], layer["experts"]["w2"], layer["experts"]["w3"]
    h1 = jnp.einsum("ech,ehm->ecm", dispatched, w1.astype(x.dtype))
    h3 = jnp.einsum("ech,ehm->ecm", dispatched, w3.astype(x.dtype))
    hidden = jax.nn.silu(h1) * h3
    expert_out = jnp.einsum("ecm,emh->ech", hidden, w2.astype(x.dtype))
    if shard_experts:
        expert_out = jax.lax.with_sharding_constraint(
            expert_out, jax.sharding.NamedSharding(sh.mesh, P(EP, None, None))
        )
    elif manual_ep:
        expert_out = jax.lax.all_to_all(expert_out, manual_ep_axis,
                                        split_axis=1, concat_axis=0, tiled=True)
    combined = jnp.einsum("sec,ech->sh", combine.astype(x.dtype), expert_out)
    return combined.reshape(B, S, H), l_aux, exp_counts
