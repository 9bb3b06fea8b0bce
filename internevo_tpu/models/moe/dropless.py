"""Dropless MoE: sort-by-expert + ragged grouped matmul.

Parity: reference MegaBlocks path (``internlm/model/moe/megablock/megablock_dmoe.py``,
``megablock/utils.py`` — external CUDA ``megablocks``/``stk`` sparse matmuls).
TPU-native: tokens are sorted by routed expert and processed with
``jax.lax.ragged_dot`` (XLA's grouped matmul, the Megablox primitive), so no
token is dropped and no capacity padding is computed — the dropless property
without sparse-matrix machinery.

Top-k routing contributes k scaled copies of each token; the inverse
permutation scatter-adds the expert outputs back.

Expert parallelism, two layouts:

- ``dropless_moe_apply`` (GSPMD): expert weight stacks shard over the ``ep``
  mesh axis and GSPMD gathers them just-in-time around the ragged matmuls —
  ZeRO-3-style weight sharding.  Correct, but the traffic direction is wrong
  at scale (weights >> activations for big expert counts).
- ``dropless_moe_apply_ep`` (token all-to-all): the reference MegaBlocks EP
  layout (``model/moe/megablock/megablock_dmoe.py``, ``moe/utils.py:8-62``
  _AllToAll) — tokens are exchanged, experts stay resident.  TPU lowering is
  ``lax.ragged_all_to_all`` (variable rows per peer in one collective);
  XLA:CPU cannot execute that op, so the test mesh runs a jnp emulation with
  identical semantics (``_ragged_a2a_emulated``) behind the same seam.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp

import functools

import numpy as np

from internevo_tpu.ops.pallas.gmm import gmm_supported, grouped_matmul


def _inverse_permutation(order: jax.Array) -> jax.Array:
    """inv[order[s]] = s — a unique-index scatter-set (cheap on TPU, unlike
    the duplicated scatter-adds it helps remove)."""
    return (jnp.zeros_like(order)
            .at[order].set(jnp.arange(order.shape[0], dtype=order.dtype)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _expand_sorted(tokens, src, inv, k):
    """Dispatch: replicate each token to its k sorted routing slots.

    fwd is the natural gather ``tokens[src]`` (src = token id per sorted
    slot); the custom bwd replaces AD's duplicated-index scatter-add (slow
    sort-based lowering on TPU) with a permutation gather + k-way sum:
    dtokens[t] = sum_r dg[slot(t, r)] = dg[inv].reshape(n, k, H).sum(1)."""
    return jnp.take(tokens, src, axis=0)


def _expand_fwd(tokens, src, inv, k):
    return jnp.take(tokens, src, axis=0), inv


def _expand_bwd(k, inv, dg):
    n = inv.shape[0] // k
    dt = jnp.take(dg, inv, axis=0).reshape(n, k, dg.shape[-1])
    # dg.dtype == tokens.dtype (gather preserves dtype)
    dt = jnp.sum(dt.astype(jnp.float32), axis=1).astype(dg.dtype)
    zero_i = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return dt, zero_i(inv), zero_i(inv)


_expand_sorted.defvjp(_expand_fwd, _expand_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _combine_sorted(eo, scale_s, src, inv, k):
    """Combine: weighted sum of each token's k expert outputs.

    fwd gathers the scaled sorted rows back to flat (token, route) order and
    sums the k routes (f32 accumulate); bwd is two gathers by ``src`` —
    no duplicated-index scatter anywhere in the dispatch/combine pair."""
    n = inv.shape[0] // k
    x = jnp.take(eo * scale_s[:, None], inv, axis=0).reshape(n, k, eo.shape[-1])
    return jnp.sum(x.astype(jnp.float32), axis=1).astype(eo.dtype)


def _combine_fwd(eo, scale_s, src, inv, k):
    return _combine_sorted(eo, scale_s, src, inv, k), (eo, scale_s, src, inv)


def _combine_bwd(k, res, dout):
    eo, scale_s, src, inv = res
    d_sorted = jnp.take(dout, src, axis=0).astype(eo.dtype)   # (n*k, H) sorted
    deo = d_sorted * scale_s[:, None].astype(eo.dtype)
    dscale = jnp.sum(d_sorted.astype(jnp.float32)
                     * eo.astype(jnp.float32), axis=-1).astype(scale_s.dtype)
    zero_i = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return deo, dscale, zero_i(src), zero_i(inv)


_combine_sorted.defvjp(_combine_fwd, _combine_bwd)


def _grouped_dot(x: jax.Array, w: jax.Array, group_sizes: jax.Array) -> jax.Array:
    """Grouped matmul seam: the pallas gmm kernel on TPU when the shape fits
    its whole-K/whole-N VMEM design, ``lax.ragged_dot`` otherwise.

    The gmm kernel is the Megablox move done with BIG tiles: measured at the
    moe-bench expert shapes (16k rows, 1024x2816, E=8) it runs 53.8 TF fwd /
    62.9 TF bwd vs ragged_dot's 38.7 / 55.5 (ragged_dot lowers to E masked
    dense matmuls over ALL rows).  Contract difference: rows beyond
    ``sum(group_sizes)`` are computed against the LAST group instead of
    zeroed — every caller here either has sum == rows (top-k routing) or
    zero-valued tail rows (a2a receive pads), which makes the two identical.
    ``IEVO_NO_GMM=1`` forces the ragged_dot path (A/B escape hatch).
    """
    w = w.astype(x.dtype)
    if (not os.environ.get("IEVO_NO_GMM")
            and jax.default_backend() == "tpu"   # pltpu kernel; axon reports "tpu"
            and gmm_supported(x.shape[0], w.shape[1], w.shape[2], w.shape[0])):
        return grouped_matmul(x, w, group_sizes.astype(jnp.int32))
    return jax.lax.ragged_dot(x, w, group_sizes,
                              preferred_element_type=jnp.float32).astype(x.dtype)


def dropless_moe_apply(
    layer: dict,
    x: jax.Array,
    *,
    top_k: int = 2,
    rng: Optional[jax.Array] = None,
    train: bool = True,
    stat_axes: tuple = (),
):
    """layer: {"gate": (H, E), "experts": {"w1","w3": (E, H, M), "w2": (E, M, H)}}.

    Returns (out (B, S, H), l_aux, exp_counts).  l_aux is the same
    load-balancing loss as the GShard path (mean gate prob x mean router mass).

    ``stat_axes``: manual mesh axes (inside a shard_map) whose ranks each hold
    a DIFFERENT token shard of the same logical batch (isp/msp sequence
    chunks inside the pipeline): the aux stats pmean over them so the
    load-balancing statistic equals the unsharded value — routing itself is
    per-token (top-k), so only the statistic needs the reduction.
    """
    B, S, H = x.shape
    E = layer["gate"].shape[1]
    tokens = x.reshape(B * S, H)
    n = tokens.shape[0]

    logits = tokens.astype(jnp.float32) @ layer["gate"].astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    top_probs, top_idx = jax.lax.top_k(probs, top_k)          # (n, k)
    top_probs = top_probs / jnp.sum(top_probs, axis=-1, keepdims=True)

    # load-balancing aux loss (GShard formula on the top-1 assignment)
    me = jnp.mean(probs, axis=0)
    ce = jnp.mean(jax.nn.one_hot(top_idx[:, 0], E, dtype=jnp.float32), axis=0)
    if stat_axes:
        me = jax.lax.pmean(me, stat_axes)
        ce = jax.lax.pmean(ce, stat_axes)
    l_aux = jnp.sum(me * ce) * E

    flat_expert = top_idx.reshape(-1)                          # (n*k,)
    flat_weight = top_probs.reshape(-1)
    # stable sort by expert; order within an expert preserved
    order = jnp.argsort(flat_expert, stable=True)
    inv = _inverse_permutation(order)                          # flat slot -> sorted pos
    inv_token = order // top_k                                 # source token of each sorted slot
    gathered = _expand_sorted(tokens, inv_token, inv, top_k)   # (n*k, H)
    group_sizes = jnp.bincount(flat_expert, length=E)
    exp_counts = jax.lax.psum(group_sizes, stat_axes) if stat_axes else group_sizes

    w1, w2, w3 = layer["experts"]["w1"], layer["experts"]["w2"], layer["experts"]["w3"]
    h1 = _grouped_dot(gathered, w1, group_sizes)
    h3 = _grouped_dot(gathered, w3, group_sizes)
    hidden = jax.nn.silu(h1) * h3
    expert_out = _grouped_dot(hidden, w2, group_sizes)

    # combine: gather each token's k scaled expert rows and sum (no
    # duplicated-index scatter — see _combine_sorted)
    scale = jnp.take(flat_weight, order).astype(expert_out.dtype)
    out = _combine_sorted(expert_out, scale, inv_token, inv, top_k)
    return out.reshape(B, S, H), l_aux, exp_counts


def _ragged_a2a_emulated(operand, output, input_offsets, send_sizes,
                         output_offsets, recv_sizes, axis_name: str):
    """jnp emulation of ``lax.ragged_all_to_all`` (identical semantics) for
    backends without the op (XLA:CPU test meshes): for each peer j, rows
    ``operand[input_offsets[j] : +send_sizes[j]]`` land in rank j's ``output``
    at ``output_offsets[j]``.  Implemented as an all_gather + masked scatter —
    O(ep x rows) memory, test-scale only."""
    n_src = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    ops = jax.lax.all_gather(operand, axis_name)          # (ep, cap_in, ...)
    in_of = jax.lax.all_gather(input_offsets, axis_name)  # (ep, ep)
    sz = jax.lax.all_gather(send_sizes, axis_name)        # (ep, ep)
    out_of = jax.lax.all_gather(output_offsets, axis_name)
    out = output
    rows = jnp.arange(ops.shape[1])
    for s in range(n_src):
        # the slice source s sent to ME, placed at its chosen offset
        start = in_of[s, my]
        size = sz[s, my]
        dst0 = out_of[s, my]
        mask = (rows >= start) & (rows < start + size)
        dst = jnp.where(mask, dst0 + (rows - start), output.shape[0])  # OOB = drop
        out = out.at[dst].set(
            jnp.where(mask.reshape((-1,) + (1,) * (operand.ndim - 1)), ops[s], 0),
            mode="drop")
    return out


def _ragged_a2a_available() -> bool:
    import os

    if os.environ.get("IEVO_FORCE_RAGGED_A2A"):  # HLO-evidence dumps: the op
        return True                              # LOWERS on CPU (exec doesn't)
    return jax.default_backend() not in ("cpu",)


def dropless_moe_apply_ep(
    layer: dict,
    x: jax.Array,
    *,
    top_k: int = 2,
    ep_axis: str,
    ep_size: int,
    rng: Optional[jax.Array] = None,
    train: bool = True,
    a2a: Optional[Callable] = None,
    stat_axes: tuple = (),
):
    """Token-all-to-all dropless MoE INSIDE a manual shard_map over ``ep_axis``
    (reference MegaBlocks EP dispatch, ``moe/utils.py:8-62``):

    - gate the LOCAL token shard (the reference's per-rank gating);
    - sort token copies by routed expert; rows bound for expert e travel to
      rank ``e // (E/ep)`` in ONE ``lax.ragged_all_to_all`` (variable rows per
      peer — no capacity padding, the dropless property on the wire);
    - expert ids ride a second ragged a2a, received rows re-sort into local
      expert groups for ``lax.ragged_dot`` with the RESIDENT (E/ep) weights;
    - the inverse ragged a2a returns expert outputs to their source rank.

    ``layer["experts"]`` leaves are the LOCAL (E/ep, ...) shards;
    ``layer["gate"]`` is full.  The receive buffer is the exact worst case
    (ep x n x k rows) so no token can ever drop.  ``a2a`` overrides the
    collective (tests inject ``_ragged_a2a_emulated`` on CPU meshes).
    """
    B, S, H = x.shape
    E_loc = layer["experts"]["w1"].shape[0]
    E = E_loc * ep_size
    my = jax.lax.axis_index(ep_axis)
    tokens = x.reshape(B * S, H)
    n = tokens.shape[0]
    if a2a is None:
        a2a = (jax.lax.ragged_all_to_all if _ragged_a2a_available()
               else _ragged_a2a_emulated)

    logits = tokens.astype(jnp.float32) @ layer["gate"].astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    top_probs, top_idx = jax.lax.top_k(probs, top_k)
    top_probs = top_probs / jnp.sum(top_probs, axis=-1, keepdims=True)

    # GLOBALLY-reduced aux stats (psum-mean over ep, plus any isp/msp sequence
    # axes in ``stat_axes``): the reference computes l_aux per rank (each
    # rank's local batch), but reducing me/ce over the group makes the
    # statistic identical to the single-device / weight-gather value —
    # layout-invariant, so EP stays a pure layout change for the loss
    red = (ep_axis,) + tuple(stat_axes)
    me = jax.lax.pmean(jnp.mean(probs, axis=0), red)
    ce = jax.lax.pmean(
        jnp.mean(jax.nn.one_hot(top_idx[:, 0], E, dtype=jnp.float32), axis=0),
        red)
    l_aux = jnp.sum(me * ce) * E

    flat_expert = top_idx.reshape(-1)
    flat_weight = top_probs.reshape(-1)
    order = jnp.argsort(flat_expert, stable=True)
    inv = _inverse_permutation(order)
    inv_token = order // top_k
    sorted_expert = jnp.take(flat_expert, order)
    gathered = _expand_sorted(tokens, inv_token, inv, top_k)   # (n*k, H)
    group_sizes = jnp.bincount(flat_expert, length=E)

    # ---- dispatch layout: sorted rows are contiguous per destination rank
    send_sizes = group_sizes.reshape(ep_size, E_loc).sum(-1).astype(jnp.int32)
    input_offsets = (jnp.cumsum(send_sizes) - send_sizes).astype(jnp.int32)
    SM = jax.lax.all_gather(send_sizes, ep_axis)            # (ep, ep) [src, dst]
    recv_sizes = SM[:, my].astype(jnp.int32)                # rows from each src
    # sender view: where MY chunk starts in dst's buffer = rows earlier srcs
    # put there
    col_excl = jnp.cumsum(SM, axis=0) - SM                  # (ep, ep)
    output_offsets = col_excl[my, :].astype(jnp.int32)
    cap = ep_size * n * top_k                               # exact worst case

    recv = a2a(gathered, jnp.zeros((cap, H), gathered.dtype),
               input_offsets, send_sizes, output_offsets, recv_sizes,
               axis_name=ep_axis)
    SENT = jnp.int32(E)                                     # pad sentinel
    recv_ids = a2a(sorted_expert.astype(jnp.int32), jnp.full((cap,), SENT),
                   input_offsets, send_sizes, output_offsets, recv_sizes,
                   axis_name=ep_axis)

    # ---- local expert compute over received rows, re-grouped by expert
    local_ids = jnp.where(recv_ids >= SENT, E_loc, recv_ids - my * E_loc)
    order2 = jnp.argsort(local_ids, stable=True)            # pads sort last
    grouped = jnp.take(recv, order2, axis=0)
    gs_local = jnp.bincount(jnp.take(local_ids, order2), length=E_loc)

    w1, w2, w3 = layer["experts"]["w1"], layer["experts"]["w2"], layer["experts"]["w3"]
    h1 = _grouped_dot(grouped, w1, gs_local)
    h3 = _grouped_dot(grouped, w3, gs_local)
    hidden = jax.nn.silu(h1) * h3
    eout = _grouped_dot(hidden, w2, gs_local)
    # back to arrival order, then the inverse a2a returns rows to their source
    eout = jnp.zeros_like(eout).at[order2].set(eout)

    recv_offsets = (jnp.cumsum(recv_sizes) - recv_sizes).astype(jnp.int32)
    IO = jax.lax.all_gather(input_offsets, ep_axis)         # (ep, ep)
    back_offsets = IO[:, my].astype(jnp.int32)              # my chunk's home
    returned = a2a(eout, jnp.zeros((n * top_k, H), eout.dtype),
                   recv_offsets, recv_sizes, back_offsets, send_sizes,
                   axis_name=ep_axis)

    scale = jnp.take(flat_weight, order).astype(returned.dtype)
    out = _combine_sorted(returned, scale, inv_token, inv, top_k)
    # global per-expert counts (the reference logs exp_counts after its a2a)
    return out.reshape(B, S, H), l_aux, jax.lax.psum(group_sizes, red)


def dropless_moe_apply_gspmd_ep(
    layer: dict,
    x: jax.Array,
    *,
    top_k: int = 2,
    mesh,
    ep_axis: str = "ep",
    train: bool = True,
):
    """Token-all-to-all dropless MoE from INSIDE a GSPMD region: a nested
    partial-manual ``shard_map`` makes only the ``ep`` mesh axis manual (dp/
    zero/tp stay auto-partitioned), runs ``dropless_moe_apply_ep`` on the
    local token shard with the resident (E/ep, ...) expert shards, and
    returns to GSPMD-land.  This replaces the weight-gather layout of
    ``dropless_moe_apply`` with the reference's EP traffic direction
    (``moe/utils.py:8-62``) while keeping the rest of the model untouched.

    ``layer`` leaves are the GLOBAL arrays (GSPMD-sharded: experts over ep,
    gate replicated); the batch dim of ``x`` must divide by ep (it is a
    factor of the (dp, ep, zero) batch sharding).
    """
    from jax.sharding import PartitionSpec as P

    ep_size = mesh.shape[ep_axis]

    def local_fn(gate, experts, h):
        return dropless_moe_apply_ep(
            {"gate": gate, "experts": experts}, h, top_k=top_k,
            ep_axis=ep_axis, ep_size=ep_size, train=train)

    espec = jax.tree.map(lambda _: P(ep_axis), layer["experts"])
    return jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), espec, P(ep_axis)),
        out_specs=(P(ep_axis), P(), P()),
        axis_names={ep_axis}, check_vma=False,
    )(layer["gate"], layer["experts"], x)
