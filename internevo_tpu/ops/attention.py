"""Packed (varlen) causal attention with segment ids.

Parity: the reference runs flash-attn's varlen kernels over packed sequences
described by ``cu_seqlens`` (``internlm/model/modules/multi_head_attention.py:568-582``,
``flash_attn_varlen_kvpacked_func``).  On TPU the idiomatic encoding is
*segment ids*: a per-token integer marking which packed sample the token belongs
to; attention masks out cross-segment pairs.  ``cu_seqlens -> segment_ids`` is a
collater-side transform (see ``data/collaters.py``).

Two implementations behind one signature:
- ``attention_reference``: jnp, O(S^2) mask materialization — used in tests and
  as the numerical oracle.
- Pallas splash attention (``ops/pallas/splash_attention.py``): flattened-grid
  online-softmax kernel, used on TPU for real sequence lengths.

GQA is handled by repeating kv heads; MQA/GQA-aware Pallas kernel avoids the
materialized repeat.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

_USE_PALLAS = None


def use_pallas() -> bool:
    """Pallas kernels on real TPU; jnp fallback on CPU (tests)."""
    global _USE_PALLAS
    if _USE_PALLAS is None:
        env = os.environ.get("IEVO_USE_PALLAS")
        if env is not None:
            _USE_PALLAS = env not in ("0", "false", "False")
        else:
            _USE_PALLAS = jax.default_backend() not in ("cpu",)
    return _USE_PALLAS


def set_use_pallas(flag: Optional[bool]) -> None:
    global _USE_PALLAS
    _USE_PALLAS = flag


def _repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    if n_rep == 1:
        return x
    b, s, h, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, s, h, n_rep, d)).reshape(b, s, h * n_rep, d)


def attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    segment_ids: Optional[jax.Array] = None,
    softmax_scale: Optional[float] = None,
    causal: bool = True,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,
) -> jax.Array:
    """q: (B, S, Hq, D); k/v: (B, S, Hkv, D); segment_ids: (B, S) int32.

    fp32 softmax like flash-attn; returns q.dtype.  ``dropout_rate`` applies
    torch-style dropout to the softmax probabilities using the SAME counter
    hash as the splash kernel (``pallas/splash_attention.dropout_mask_dense``)
    so the dense fallback and the kernel drop the identical model.
    ``dropout_seed``: scalar seed, or the (5,) [seed, row0, col0, head0,
    batch0] global-offset vector for sharded callers."""
    b, s, hq, d = q.shape
    hkv = k.shape[2]
    k = _repeat_kv(k, hq // hkv)
    v = _repeat_kv(v, hq // hkv)
    scale = softmax_scale if softmax_scale is not None else d**-0.5

    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale

    mask = jnp.ones((s, s), dtype=bool)
    if causal:
        mask = jnp.tril(mask)
    mask = mask[None, None, :, :]
    if segment_ids is not None:
        seg_mask = segment_ids[:, None, :, None] == segment_ids[:, None, None, :]
        mask = jnp.logical_and(mask, seg_mask)
    logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0:
        from .pallas.splash_attention import dropout_mask_dense

        probs = probs * dropout_mask_dense(dropout_rate, dropout_seed, b, hq, s, s)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out.astype(q.dtype)


def attention_reference_with_lse(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    softmax_scale: Optional[float] = None,
    causal: bool = True,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,
):
    """jnp oracle for ``splash_attention_with_lse``: (out (B,S,Hq,D), lse
    (B,Hq,S) fp32).  kv may be a DIFFERENT chunk than q (ring attention's
    rotated kv): ``kv_segment_ids`` masks cross-segment pairs against the
    visiting chunk's ids; fully-masked q rows produce out=0, lse=-inf (the
    identity of the log-sum-exp merge).  Dropout masks the normalized probs
    while lse stays over the UNdropped ones (kernel semantics — the lse merge
    then reproduces global dropout exactly); ``dropout_seed`` as in
    ``attention_reference``."""
    b, s, hq, d = q.shape
    hkv, skv = k.shape[2], k.shape[1]
    k = _repeat_kv(k, hq // hkv)
    v = _repeat_kv(v, hq // hkv)
    scale = softmax_scale if softmax_scale is not None else d**-0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale

    mask = jnp.ones((s, skv), dtype=bool)
    if causal:
        mask = jnp.tril(mask)
    mask = mask[None, None, :, :]
    if segment_ids is not None:
        kv_seg = segment_ids if kv_segment_ids is None else kv_segment_ids
        seg_mask = segment_ids[:, None, :, None] == kv_seg[:, None, None, :]
        mask = jnp.logical_and(mask, seg_mask)
    logits = jnp.where(mask, logits, -jnp.inf)
    m = jnp.max(logits, axis=-1)                     # (b, h, q); -inf if empty
    empty = jnp.isneginf(m)
    safe_m = jnp.where(empty, 0.0, m)
    unnorm = jnp.exp(logits - safe_m[..., None])
    unnorm = jnp.where(mask, unnorm, 0.0)
    denom = jnp.sum(unnorm, axis=-1)                 # (b, h, q)
    lse = jnp.where(empty, -jnp.inf, safe_m + jnp.log(jnp.maximum(denom, 1e-37)))
    probs = unnorm / jnp.maximum(denom, 1e-37)[..., None]
    if dropout_rate > 0.0:
        from .pallas.splash_attention import dropout_mask_dense

        probs = probs * dropout_mask_dense(dropout_rate, dropout_seed, b, hq, s, skv)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out.astype(q.dtype), lse


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    segment_ids: Optional[jax.Array] = None,
    softmax_scale: Optional[float] = None,
    causal: bool = True,
    max_segment_len: Optional[int] = None,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,
) -> jax.Array:
    """Dispatch: Pallas splash kernel on TPU, jnp reference elsewhere.

    ``max_segment_len`` (static bound on packed-segment length, i.e.
    ``max_length_per_sample``) lets the splash grid skip out-of-segment kv
    blocks entirely; optional — None still gets causal flattening.
    """
    if use_pallas():
        return _pallas_dispatch(q, k, v, segment_ids, softmax_scale, causal,
                                max_segment_len, dropout_rate, dropout_seed)
    return attention_reference(q, k, v, segment_ids=segment_ids, softmax_scale=softmax_scale,
                               causal=causal, dropout_rate=dropout_rate,
                               dropout_seed=dropout_seed)


def _pallas_dispatch(q, k, v, segment_ids, softmax_scale, causal, max_segment_len,
                     dropout_rate=0.0, dropout_seed=None):
    """Run the splash kernel, shard_map-wrapped when a multi-device mesh is
    active: Mosaic kernels cannot be auto-partitioned by GSPMD, so the GSPMD
    path gets an explicit manual island sharded over (batch x heads); inside
    the manual-TP pipeline (already a shard_map) the kernel runs directly on
    the local arrays."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from .pallas.splash_attention import splash_attention

    kernel = partial(splash_attention, softmax_scale=softmax_scale, causal=causal,
                     max_segment_len=max_segment_len, dropout_rate=dropout_rate)
    if dropout_rate > 0.0:
        from .pallas.splash_attention import _norm_seed

        seed_arr = _norm_seed(dropout_seed)
    else:
        seed_arr = None

    def direct(q, k, v, seg, seed=None):
        return kernel(q, k, v, segment_ids=seg, dropout_seed=seed)

    from ..parallel.sharding import get_rules

    rules = get_rules()
    mesh = rules.mesh
    from jax._src import core as _core

    under_manual = _core.get_axis_env().axis_sizes  # inside shard_map already
    if mesh is None or under_manual or all(s == 1 for s in mesh.shape.values()):
        return direct(q, k, v, segment_ids, seed_arr)

    from ..core.context import DP, EP, TP, ZERO

    B, Hq, Hkv = q.shape[0], q.shape[2], k.shape[2]
    tp = mesh.shape.get(TP, 1)
    batch_axes, ways = [], 1
    for a in (DP, EP, ZERO):
        n = mesh.shape.get(a, 1)
        if n > 1 and B % (ways * n) == 0:
            batch_axes.append(a)
            ways *= n
    batch_axes = tuple(batch_axes)
    # heads shard over tp only when both q and kv head counts divide; otherwise
    # the island gathers over tp (correct, memory-heavier — only the
    # GSPMD isp path with tp > kv_heads lands here)
    tp_ok = tp > 1 and Hq % tp == 0 and Hkv % tp == 0
    head_ax = TP if tp_ok else None
    qkv_spec = P(batch_axes if batch_axes else None, None, head_ax, None)
    seg_spec = P(batch_axes if batch_axes else None, None)
    # Mosaic rejects lowering inside a partially-manual region: the island
    # must claim every mesh axis (size-1 axes included)
    axis_names = set(mesh.axis_names)
    if seed_arr is None:
        seed_arr = jnp.zeros((5,), jnp.int32)  # uniform arity for the island

    def island(q, k, v, seg, seed):
        if dropout_rate > 0.0:
            # fold this shard's GLOBAL (head, batch) window offsets into the
            # seed vector: the counter-hash mask then matches what an
            # unsharded run draws (topology-invariant attention dropout)
            if head_ax is not None:
                seed = seed.at[3].add(jax.lax.axis_index(head_ax) * q.shape[2])
            if batch_axes:
                idx = jnp.int32(0)
                for a in batch_axes:  # first spec axis is outermost in layout
                    idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
                seed = seed.at[4].add(idx * q.shape[0])
        return direct(q, k, v, seg, seed)

    if segment_ids is None:
        sm = jax.shard_map(lambda q, k, v, seed: island(q, k, v, None, seed),
                           mesh=mesh,
                           in_specs=(qkv_spec,) * 3 + (P(),), out_specs=qkv_spec,
                           axis_names=axis_names, check_vma=False)
        return sm(q, k, v, seed_arr)
    sm = jax.shard_map(island, mesh=mesh,
                       in_specs=(qkv_spec, qkv_spec, qkv_spec, seg_spec, P()),
                       out_specs=qkv_spec, axis_names=axis_names, check_vma=False)
    return sm(q, k, v, segment_ids, seed_arr)
