"""Ring attention: context parallelism over the sequence axis.

The reference has NO context-parallel attention — its long-context path is
Ulysses all-to-all (isp), whose sequence scaling is bounded by the head count
(SURVEY §2.10 notes the gap and §7 recommends ring attention as the new axis).
This module adds it TPU-natively:

- q/k/v stay sequence-sharded over the ``tp`` mesh axis (one contiguous chunk
  per device, positions global);
- n ring steps: compute local flash attention of the resident q chunk against
  the visiting kv chunk, then ``ppermute`` the kv block one step around the
  ring (ICI neighbor traffic only, overlapped by XLA with the kernel);
- partial results merge by log-sum-exp using the kernel's differentiable lse
  (``ops/pallas/splash_attention.splash_attention_with_lse``), accumulated in
  fp32 (bf16 re-rounding would compound across ring steps);
- causality across chunks is positional: a visiting chunk strictly before the
  resident chunk attends fully, the resident chunk attends causally to itself,
  later chunks are skipped (lax.cond — no compute, the ppermute still runs);
- packed segment ids travel with the kv chunk, so samples spanning chunk
  boundaries mask correctly; with no segment ids the kernel's no-mask fast
  path is preserved (None propagates, nothing rides the ring).

Known trade: the chunk-order schedule is causally imbalanced (device 0 skips
most steps while device n-1 computes most); a zigzag/striped chunk assignment
would halve the critical path at large n — revisit if rsp becomes the
production long-context mode.

Backward is jax.grad through the scan/ppermute/cond; the lse cotangent folds
into the flash backward's delta.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.attention import attention_reference_with_lse, use_pallas
from ..ops.pallas.splash_attention import splash_attention_with_lse

NEG_INF = -jnp.inf


def _merge(o_acc, lse_acc, o_r, lse_r):
    """Numerically safe log-sum-exp merge of two partial attention results.
    o_acc: (B, S, H, D) fp32; o_r: any float dtype; lse: (B, H, S) fp32."""
    new_lse = jnp.logaddexp(lse_acc, lse_r)
    # rows where both partials are empty stay empty (0 output)
    w_acc = jnp.where(jnp.isneginf(new_lse), 0.0, jnp.exp(lse_acc - new_lse))
    w_r = jnp.where(jnp.isneginf(new_lse), 0.0, jnp.exp(lse_r - new_lse))
    w_acc = jnp.transpose(w_acc, (0, 2, 1))[..., None]  # (B, S, H, 1)
    w_r = jnp.transpose(w_r, (0, 2, 1))[..., None]
    o = o_acc * w_acc + o_r.astype(jnp.float32) * w_r
    return o, new_lse


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    segment_ids: Optional[jax.Array],
    axis_name: str,
    softmax_scale: Optional[float] = None,
    max_segment_len: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Inside shard_map manual over ``axis_name``: all arrays are LOCAL chunks
    (B, S_local, H, D) / (B, S_local); chunks are ordered by device index along
    the ring.  Returns the local chunk of the attention output.

    ``max_segment_len`` (the packed-segment bound) feeds the splash kernel's
    kv-block budget on the resident causal chunk — without it every q block
    scans every kv block."""
    n = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    B, S_loc, Hq, D = q.shape
    scale = softmax_scale if softmax_scale is not None else D**-0.5
    use_segs = segment_ids is not None
    # interpret=None + pallas disabled (CPU tests) runs the jnp oracle: the
    # interpret-mode kernel nested in the pipeline's cond/fori_loop/vjp control
    # flow crashes XLA:CPU, and the O(S_loc^2) dense chunk math is what tests
    # want anyway.  An EXPLICIT interpret flag still forces the kernel (the
    # ring kernel tests exercise interpret mode under plain shard_map).
    pallas = use_pallas() if interpret is None else True

    perm = [(i, (i + 1) % n) for i in range(n)]

    def compute(k_r, v_r, seg_r, src):
        def causal_chunk():
            # the resident chunk (src == my): kv ids ARE the local ids, so pass
            # the same array — the splash segment windows then engage and
            # masked blocks cost zero grid steps
            if not pallas:
                return attention_reference_with_lse(
                    q, k_r, v_r, segment_ids=segment_ids,
                    kv_segment_ids=segment_ids, softmax_scale=scale, causal=True)
            return splash_attention_with_lse(
                q, k_r, v_r, segment_ids=segment_ids,
                kv_segment_ids=segment_ids, softmax_scale=scale, causal=True,
                max_segment_len=max_segment_len, interpret=interpret)

        def full_chunk():
            if not pallas:
                return attention_reference_with_lse(
                    q, k_r, v_r, segment_ids=segment_ids,
                    kv_segment_ids=seg_r if use_segs else None,
                    softmax_scale=scale, causal=False)
            return splash_attention_with_lse(
                q, k_r, v_r, segment_ids=segment_ids,
                kv_segment_ids=seg_r if use_segs else None, softmax_scale=scale,
                causal=False, interpret=interpret)

        def skip_chunk():
            return (jnp.zeros_like(q), jnp.full((B, Hq, S_loc), NEG_INF, jnp.float32))

        return jax.lax.cond(
            src == my, causal_chunk,
            lambda: jax.lax.cond(src < my, full_chunk, skip_chunk),
        )

    def step(carry, _):
        o_acc, lse_acc, k_r, v_r, seg_r, src = carry
        o_r, lse_r = compute(k_r, v_r, seg_r, src)
        o_acc, lse_acc = _merge(o_acc, lse_acc, o_r, lse_r)
        # compute(k_r) and ppermute(k_r) are independent — XLA overlaps them
        k_n = jax.lax.ppermute(k_r, axis_name, perm)
        v_n = jax.lax.ppermute(v_r, axis_name, perm)
        seg_n = jax.lax.ppermute(seg_r, axis_name, perm) if use_segs else seg_r
        src_n = jax.lax.ppermute(src, axis_name, perm)
        return (o_acc, lse_acc, k_n, v_n, seg_n, src_n), None

    init = (
        jnp.zeros(q.shape, jnp.float32),
        jnp.full((B, Hq, S_loc), NEG_INF, jnp.float32),
        k, v, segment_ids if use_segs else jnp.zeros((), jnp.int32), my,
    )
    # n-1 scanned steps (compute + rotate), final visiting chunk computed
    # OUTSIDE the scan — its rotate would be discarded work
    carry, _ = jax.lax.scan(step, init, None, length=n - 1)
    o_acc, lse_acc, k_r, v_r, seg_r, src = carry
    o_r, lse_r = compute(k_r, v_r, seg_r, src)
    o, _ = _merge(o_acc, lse_acc, o_r, lse_r)
    return o.astype(q.dtype)
