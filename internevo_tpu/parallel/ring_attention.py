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

Two schedules:

- ``contiguous``: device d keeps its contiguous chunk. Causally IMBALANCED —
  device 0 skips most ring steps while device n-1 computes against every
  visiting chunk, so wall-clock is ~2x the balanced optimum at large n.
- ``zigzag`` (default): the sequence is viewed as 2n half-chunks and device d
  holds the PAIR {d, 2n-1-d} — one early chunk (attends little) and one late
  chunk (attends much), so every device does the same causal work (the
  blockwise-balanced assignment from striped/zigzag context parallelism).
  The reshard from the model's contiguous layout costs two static ppermutes
  in and two out (each moving half the tokens); each ring step computes up to
  4 quadrant legs (qa/qb x visiting ka/kb), each full, causal, or skipped by
  a positional lax.cond on global half-chunk indices.  In/out layout stays
  contiguous — callers never see the zigzag.

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
    o_acc: (B, S, H, D) fp32; o_r: any float dtype; lse: (B, H, S) fp32.

    NaN-safe in the BACKWARD too: jnp.logaddexp's jvp is exp(x - ans), which
    is nan when both operands are -inf (empty row merged with empty row — the
    zigzag schedule's first qb merge is a cross leg, so segment-empty rows hit
    this).  Build the merge from a gradient-stopped max shift instead: the
    shift's cotangent cancels exactly (classic lse identity), and every exp
    argument is -inf-minus-FINITE at worst, never -inf-minus--inf."""
    m = jnp.maximum(lse_acc, lse_r)
    both_empty = jnp.isneginf(m)
    m_safe = jax.lax.stop_gradient(jnp.where(both_empty, 0.0, m))
    ea = jnp.where(jnp.isneginf(lse_acc), 0.0, jnp.exp(lse_acc - m_safe))
    er = jnp.where(jnp.isneginf(lse_r), 0.0, jnp.exp(lse_r - m_safe))
    s = jnp.maximum(ea + er, 1e-37)
    new_lse = jnp.where(both_empty, -jnp.inf, m_safe + jnp.log(s))
    w_acc = jnp.transpose(ea / s, (0, 2, 1))[..., None]  # (B, S, H, 1)
    w_r = jnp.transpose(er / s, (0, 2, 1))[..., None]
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
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,
    schedule: str = "zigzag",
    active: Optional[jax.Array] = None,
) -> jax.Array:
    """Inside shard_map manual over ``axis_name``: all arrays are LOCAL chunks
    (B, S_local, H, D) / (B, S_local); chunks are ordered by device index along
    the ring.  Returns the local chunk of the attention output (contiguous
    layout in AND out for both schedules).

    ``max_segment_len`` (the packed-segment bound) feeds the splash kernel's
    kv-block budget on the resident causal chunk — without it every q block
    scans every kv block.

    Attention-probability dropout (``dropout_rate``, scalar ``dropout_seed``
    shared by all ring devices) composes exactly with the lse merge: each leg
    masks its pv sums with the counter hash of GLOBAL (q row, kv col)
    coordinates while lse keeps the undropped denominators, so the merged
    result equals dropout(softmax(s_global)) @ v with the SAME mask an
    unsharded kernel draws (ring dropout is topology-invariant).

    ``schedule``: "zigzag" (balanced, default) or "contiguous" (module
    docstring); zigzag needs an even local chunk — odd falls back.

    ``active`` (optional scalar bool): gates the per-leg KERNEL work while the
    kv-rotation ppermutes still run.  The pipeline's rsp ticks pass their
    fwd/bwd-activity flag here: the flag is uniform across each tp ring (every
    ring member shares the pp stage index), the gated regions contain no
    collectives, and the ring's CollectivePermute rendezvous stays
    unconditional — so an idle pipeline tick costs only the rotation
    bandwidth instead of a full dummy forward/backward
    (``doc/pp_bubble_analysis.md``, rsp section)."""
    n = jax.lax.psum(1, axis_name)
    B, S_loc, Hq, D = q.shape
    scale = softmax_scale if softmax_scale is not None else D**-0.5
    if dropout_rate > 0.0:
        assert dropout_seed is not None, "ring attention dropout needs a seed"
        seed0 = jnp.asarray(dropout_seed, jnp.int32).reshape(())
    else:
        seed0 = None
    # interpret=None + pallas disabled (CPU tests) runs the jnp oracle: the
    # interpret-mode kernel nested in the pipeline's cond/fori_loop/vjp control
    # flow crashes XLA:CPU, and the O(S_loc^2) dense chunk math is what tests
    # want anyway.  An EXPLICIT interpret flag still forces the kernel (the
    # ring kernel tests exercise interpret mode under plain shard_map).
    pallas = use_pallas() if interpret is None else True

    if schedule not in ("zigzag", "contiguous"):
        raise ValueError(
            f"ring_schedule must be 'zigzag' or 'contiguous', got {schedule!r}")
    act = None if active is None else jnp.asarray(active, jnp.bool_).reshape(())
    args = (q, k, v, segment_ids, axis_name, scale, max_segment_len, interpret,
            dropout_rate, seed0, pallas, act)
    if schedule == "zigzag" and n > 1 and S_loc % 2 == 0:
        return _ring_zigzag(*args)
    return _ring_contiguous(*args)


def _leg(q_c, k_c, v_c, qseg, kseg, scale, max_segment_len, interpret,
         dropout_rate, seed_leg, pallas, causal: bool):
    """One (q chunk x kv chunk) partial: (out, lse).  ``causal=True`` is the
    resident case — kv ids equal the q ids, so passing ``qseg`` for both
    engages the splash segment windows; ``causal=False`` is a strictly-earlier
    visiting chunk (cross-chunk ids, elementwise masks only)."""
    kv_ids = qseg if causal else kseg
    if not pallas:
        return attention_reference_with_lse(
            q_c, k_c, v_c, segment_ids=qseg, kv_segment_ids=kv_ids,
            softmax_scale=scale, causal=causal,
            dropout_rate=dropout_rate, dropout_seed=seed_leg)
    return splash_attention_with_lse(
        q_c, k_c, v_c, segment_ids=qseg, kv_segment_ids=kv_ids,
        softmax_scale=scale, causal=causal,
        max_segment_len=max_segment_len if causal else None,
        interpret=interpret, dropout_rate=dropout_rate, dropout_seed=seed_leg)


def _ring_contiguous(q, k, v, segment_ids, axis_name, scale, max_segment_len,
                     interpret, dropout_rate, seed0, pallas, active=None):
    n = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    B, S_loc, Hq, D = q.shape
    use_segs = segment_ids is not None
    gate = (lambda p: p) if active is None else (lambda p: jnp.logical_and(active, p))

    perm = [(i, (i + 1) % n) for i in range(n)]

    def compute(k_r, v_r, seg_r, src):
        if dropout_rate > 0.0:
            # global hash coordinates for THIS leg: resident q rows start at
            # my*S_loc, the visiting kv chunk's cols at src*S_loc
            seed_leg = jnp.stack([seed0, my * S_loc, src * S_loc,
                                  jnp.int32(0), jnp.int32(0)]).astype(jnp.int32)
        else:
            seed_leg = None
        kseg = seg_r if use_segs else None
        leg_args = (scale, max_segment_len, interpret, dropout_rate, seed_leg,
                    pallas)

        def skip_chunk():
            return (jnp.zeros_like(q), jnp.full((B, Hq, S_loc), NEG_INF, jnp.float32))

        return jax.lax.cond(
            gate(src == my),
            lambda: _leg(q, k_r, v_r, segment_ids, kseg, *leg_args, causal=True),
            lambda: jax.lax.cond(
                gate(src < my),
                lambda: _leg(q, k_r, v_r, segment_ids, kseg, *leg_args, causal=False),
                skip_chunk),
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


def _ring_zigzag(q, k, v, segment_ids, axis_name, scale, max_segment_len,
                 interpret, dropout_rate, seed0, pallas, active=None):
    """Balanced ring: 2n half-chunks, device d owns the pair {d, 2n-1-d}.

    Reshard happens HERE (two static ppermutes each way), so callers keep the
    model's contiguous layout.  Each ring step merges up to four quadrant legs
    (resident qa/qb against the visiting pair), gated by positional lax.conds
    on global half-chunk indices — per-device causal work is then uniform
    (n-1 full-equivalents + the resident pair) instead of rank-proportional."""
    n = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    B, S_loc, Hq, D = q.shape
    h = S_loc // 2
    use_segs = segment_ids is not None
    gate = (lambda p: p) if active is None else (lambda p: jnp.logical_and(active, p))

    def owner(c):  # zigzag owner device of global half-chunk c
        return c if c < n else 2 * n - 1 - c

    perm_low = [(d, owner(2 * d)) for d in range(n)]        # even half-chunks
    perm_high = [(d, owner(2 * d + 1)) for d in range(n)]   # odd half-chunks
    even = (my % 2) == 0

    def to_zig(x, axis=1):
        """Contiguous local chunk {2d, 2d+1} -> zigzag pair (a=d, b=2n-1-d).
        perm_low delivers one EVEN half-chunk per device, perm_high one ODD;
        a_d = d is even exactly when d is — hence the parity select."""
        lo, hi = jnp.split(x, 2, axis=axis)
        rl = jax.lax.ppermute(lo, axis_name, perm_low)
        rh = jax.lax.ppermute(hi, axis_name, perm_high)
        return jnp.where(even, rl, rh), jnp.where(even, rh, rl)

    qa, qb = to_zig(q)
    ka, kb = to_zig(k)
    va, vb = to_zig(v)
    if use_segs:
        sa, sb = to_zig(segment_ids)
    else:
        sa = sb = jnp.zeros((), jnp.int32)
    ch_a, ch_b = my, 2 * n - 1 - my  # global half-chunk ids of the pair

    def quadrant(q_c, qseg, qch, k_r, v_r, kseg_r, kch):
        """(out, lse) of one q half-chunk against one visiting kv half-chunk,
        full/causal/skip by global chunk order."""
        if dropout_rate > 0.0:
            seed_leg = jnp.stack([seed0, qch * h, kch * h,
                                  jnp.int32(0), jnp.int32(0)]).astype(jnp.int32)
        else:
            seed_leg = None
        kseg = kseg_r if use_segs else None
        leg_args = (scale, max_segment_len, interpret, dropout_rate, seed_leg,
                    pallas)

        def skip():
            return (jnp.zeros_like(q_c), jnp.full((B, Hq, h), NEG_INF, jnp.float32))

        return jax.lax.cond(
            gate(kch == qch),
            lambda: _leg(q_c, k_r, v_r, qseg, kseg, *leg_args, causal=True),
            lambda: jax.lax.cond(
                gate(kch < qch),
                lambda: _leg(q_c, k_r, v_r, qseg, kseg, *leg_args, causal=False),
                skip),
        )

    def compute(acc, kv_r, src):
        (oa, la, ob, lb) = acc
        ka_r, kb_r, va_r, vb_r, sa_r, sb_r = kv_r
        src_a, src_b = src, 2 * n - 1 - src
        for k_r, v_r, kseg_r, kch in ((ka_r, va_r, sa_r, src_a),
                                      (kb_r, vb_r, sb_r, src_b)):
            o_r, l_r = quadrant(qa, sa if use_segs else None,
                                ch_a, k_r, v_r, kseg_r, kch)
            oa, la = _merge(oa, la, o_r, l_r)
            o_r, l_r = quadrant(qb, sb if use_segs else None,
                                ch_b, k_r, v_r, kseg_r, kch)
            ob, lb = _merge(ob, lb, o_r, l_r)
        return (oa, la, ob, lb)

    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, _):
        acc, kv_r, src = carry
        acc = compute(acc, kv_r, src)
        kv_n = tuple(jax.lax.ppermute(x, axis_name, perm)
                     if (use_segs or x.ndim) else x for x in kv_r)
        src_n = jax.lax.ppermute(src, axis_name, perm)
        return (acc, kv_n, src_n), None

    acc0 = (jnp.zeros(qa.shape, jnp.float32),
            jnp.full((B, Hq, h), NEG_INF, jnp.float32),
            jnp.zeros(qb.shape, jnp.float32),
            jnp.full((B, Hq, h), NEG_INF, jnp.float32))
    carry, _ = jax.lax.scan(step, (acc0, (ka, kb, va, vb, sa, sb), my), None,
                            length=n - 1)
    acc, kv_r, src = carry
    oa, _, ob, _ = compute(acc, kv_r, src)

    # zigzag -> contiguous: deliver half-chunks 2d (low) and 2d+1 (high) back
    # to device d; the payload slot alternates with the SENDER's parity (even
    # devices hold an even a-chunk and an odd b-chunk)
    perm_back_low = [(owner(2 * d), d) for d in range(n)]
    perm_back_high = [(owner(2 * d + 1), d) for d in range(n)]
    oa = oa.astype(q.dtype)
    ob = ob.astype(q.dtype)
    lo = jax.lax.ppermute(jnp.where(even, oa, ob), axis_name, perm_back_low)
    hi = jax.lax.ppermute(jnp.where(even, ob, oa), axis_name, perm_back_high)
    return jnp.concatenate([lo, hi], axis=1)
