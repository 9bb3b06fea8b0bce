"""Splash-style flash attention for TPU: flattened grid, zero wasted steps.

The round-1 kernel (``flash_attention.py``) ran a dense (B, H, NQ, NK) grid
and predicated away causally/segment-masked blocks — but a skipped TPU grid
step still costs ~2us of fixed latency, and in-kernel vector->scalar reduces
(min/max over the segment-id block to decide skipping) serialize the scalar
core against the VPU.  At packed 7B shapes (causal + block-diagonal segments
leave ~15% of blocks useful) that dominated the kernel: 13 TFLOPS useful.

Design (the TPU "splash attention" recipe, applied to dynamic packing):

- The (iq, ik) iteration space is FLATTENED into one static grid dimension:
  for each q block, exactly ``min(causal_blocks(iq), KB)`` steps are emitted,
  where ``KB = ceil((block_q + max_segment_len)/block_k) + 1`` statically
  bounds how many kv blocks one q block can see when every packed segment is
  at most ``max_segment_len`` tokens (the data pipeline guarantees this:
  ``PackedDatasetWithCut`` re-splits spans at ``max_length_per_sample``).
  Above-diagonal and out-of-segment blocks never become grid steps at all.
- WHERE those steps land is dynamic: step (b, iq, j) visits kv block
  ``kv_lo[b, iq] + j`` with ``kv_lo`` = block of the segment-run start at the
  q block's first token (two cumulative scans outside the kernel).  This is
  the varlen compute-skipping of the reference's flash-attn cu_seqlens
  kernels (``multi_head_attention.py:568-582``), driven by segment runs.
- ALL control decisions (visit block index, run/skip, needs-mask) are
  precomputed outside as small (B, T) int32 arrays and read from SMEM via
  scalar prefetch — the kernel never reduces vector data to scalars, so the
  scalar core stays ahead of the VPU/MXU.
- Three mask regimes: interior blocks (fully below the diagonal, uniform
  matching segment) skip the iota/compare/select VPU work entirely.
- lse and delta travel as (B, H, S, 8) f32 — sublane-replicated instead of
  the old 128-lane broadcast — 16x less HBM traffic, no in-kernel relayout.

The backward follows flash-attn's two-kernel split with the same flattening:
dq iterates the identical (iq -> kv window) space; dkv flattens (ik -> q
window) using the segment-run END at the kv block's last token, with the
causal lower bound ``(ik*bk)//bq`` static, and walks GQA group members on the
innermost grid dim.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
NEG_INF = -jnp.inf
# softmax runs in the base-2 domain: exp2 is the VPU-native transcendental
# (exp costs an extra multiply per element), and log2(e)·scale folds the
# softmax scale into the one multiply the kernel already pays on s
LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453
_FALLBACK_LOGGED: set = set()  # (S, S_kv) shapes already warned about
LANES = 128
SUBLANES = 8


def _interpret_default() -> bool:
    return jax.default_backend() == "cpu"


def _use_bsd(D: int) -> bool:
    """BSD layout: the kernels read/write (B, S, H*D) arrays directly, slicing
    one head's (block, D) tile off the lane dimension per chain — a free,
    128-aligned lane slice.  Kills EVERY HBM transpose around the kernel: the
    wqkv matmul's natural (B, S, H, D) output feeds the kernel as a bitcast,
    and under full remat the backward's operand recompute shrinks from
    "rotary + (B,S,H,D)->(B,H,S,D) transposes" (21.9 ms/step at 700m, the
    step's top op) to the rotary elementwise alone.  Requires 128-aligned
    head slices; other head dims keep the head-major path."""
    env = os.environ.get("IEVO_FLASH_BSD")
    if env is not None:
        return env not in ("0", "false", "False")
    # default ON (measured round 5 on v5e, back-to-back A/B with golden-band
    # losses: 700m 71.6 -> 72.35% MFU, 7bshape 84.19 -> 84.62, longseq
    # 94.33 -> 95.66; doc/perf_notes.md).  IEVO_FLASH_BSD=0 restores the
    # head-major path.
    return True


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# --------------------------------------------------------------- flattening


def _fwd_layout(S: int, Sk: int, block_q: int, block_k: int, causal: bool,
                max_segment_len: Optional[int], use_segments: bool):
    """Static (iq, j) schedule for the forward/dq grids."""
    nq, nk = _cdiv(S, block_q), _cdiv(Sk, block_k)
    if use_segments and max_segment_len is not None:
        kb = _cdiv(block_q + max_segment_len, block_k) + 1
    else:
        kb = nk
    iq_of, j_of, is_last = [], [], []
    for iq in range(nq):
        causal_blocks = ((iq + 1) * block_q - 1) // block_k + 1 if causal else nk
        budget = min(causal_blocks, kb)
        for j in range(budget):
            iq_of.append(iq)
            j_of.append(j)
            is_last.append(1 if j == budget - 1 else 0)
    return (np.asarray(iq_of, np.int32), np.asarray(j_of, np.int32),
            np.asarray(is_last, np.int32))


def _dkv_layout(S: int, Sk: int, block_q: int, block_k: int, causal: bool,
                max_segment_len: Optional[int], use_segments: bool):
    """Static (ik, j) schedule for the dkv grid: q window per kv block."""
    nq, nk = _cdiv(S, block_q), _cdiv(Sk, block_k)
    if use_segments and max_segment_len is not None:
        kb = _cdiv(block_k + max_segment_len, block_q) + 1
    else:
        kb = nq
    ik_of, j_of, is_last = [], [], []
    for ik in range(nk):
        q_lo = (ik * block_k) // block_q if causal else 0
        budget = min(nq - q_lo, kb)
        for j in range(budget):
            ik_of.append(ik)
            j_of.append(j)
            is_last.append(1 if j == budget - 1 else 0)
    return (np.asarray(ik_of, np.int32), np.asarray(j_of, np.int32),
            np.asarray(is_last, np.int32))


def _block_minmax(seg: jax.Array, block: int):
    """(B, S) ids -> per-block min/max (B, S//block).  Block sizes always
    divide S here (callers shrink blocks to S when S is small)."""
    B, S = seg.shape
    r = seg.reshape(B, S // block, block)
    return r.min(axis=2), r.max(axis=2)


def _segment_windows(seg: jax.Array, kv_seg: jax.Array, block_q: int, block_k: int):
    """Per-(b, q block) first useful kv block and per-(b, kv block) last useful
    q block, from segment RUN boundaries (segments are contiguous runs; ids
    need not be monotonic — eval pads with 0 after real ids)."""
    B, S = seg.shape
    Sk = kv_seg.shape[1]
    idx_q = jnp.arange(S, dtype=jnp.int32)[None]
    idx_k = jnp.arange(Sk, dtype=jnp.int32)[None]
    change = jnp.concatenate(
        [jnp.ones((B, 1), bool), kv_seg[:, 1:] != kv_seg[:, :-1]], axis=1)
    run_start = jax.lax.cummax(jnp.where(change, idx_k, 0), axis=1)
    change_n = jnp.concatenate(
        [seg[:, 1:] != seg[:, :-1], jnp.ones((B, 1), bool)], axis=1)
    run_end = jax.lax.cummin(jnp.where(change_n, idx_q, S - 1), axis=1, reverse=True)
    kv_lo = run_start[:, ::block_q] // block_k                 # (B, NQ)
    q_hi = run_end[:, block_k - 1 :: block_k] // block_q        # (B, NK)
    return kv_lo.astype(jnp.int32), q_hi.astype(jnp.int32)


def _fwd_control(q_seg, kv_seg, kv_lo, iq_of, j_of, block_q, block_k,
                 causal, use_segments, nq, nk):
    """(B, T) control arrays for the fwd/dq grids: visited kv block, run flag,
    needs-mask flag.  Tiny; computed with jnp outside the kernel so the kernel
    makes no vector->scalar reductions."""
    B = kv_lo.shape[0]
    iq = jnp.asarray(iq_of)[None]                     # (1, T)
    j = jnp.asarray(j_of)[None]
    kvblk_raw = kv_lo[:, iq_of] + j                   # (B, T)
    in_window = kvblk_raw <= nk - 1
    if causal:
        causal_hi = ((iq + 1) * block_q - 1) // block_k
        run = jnp.logical_and(in_window, kvblk_raw <= causal_hi)
    else:
        run = in_window
    kvblk = jnp.minimum(kvblk_raw, nk - 1)
    if causal:
        diag = iq * block_q < (kvblk + 1) * block_k - 1
    else:
        diag = jnp.zeros_like(run)
    if use_segments:
        qmin, qmax = _block_minmax(q_seg, block_q)
        kmin, kmax = _block_minmax(kv_seg, block_k)
        uniform = ((jnp.take_along_axis(qmin, jnp.broadcast_to(iq, kvblk.shape), 1)
                    == jnp.take_along_axis(qmax, jnp.broadcast_to(iq, kvblk.shape), 1))
                   & (jnp.take_along_axis(kmin, kvblk, 1)
                      == jnp.take_along_axis(kmax, kvblk, 1))
                   & (jnp.take_along_axis(qmin, jnp.broadcast_to(iq, kvblk.shape), 1)
                      == jnp.take_along_axis(kmin, kvblk, 1)))
        masked = jnp.logical_or(diag, jnp.logical_not(uniform))
    else:
        masked = diag
    kvblk = _hold_on_skip(kvblk, run)
    return (kvblk.astype(jnp.int32), run.astype(jnp.int32), masked.astype(jnp.int32))


def _hold_on_skip(blk, run):
    """On skipped (budget-slack) steps, repeat the previously visited block
    index so the pipeline issues no DMA for them — a skipped step then costs
    only the fixed grid-step latency, not a kv fetch.  Step j=0 always runs,
    so the forward fill never crosses an uninitialized boundary."""
    T = blk.shape[1]
    t_idx = jnp.arange(T, dtype=jnp.int32)[None]
    last_run = jax.lax.cummax(jnp.where(run, t_idx, 0), axis=1)
    return jnp.take_along_axis(blk, last_run, axis=1)


def _dkv_control(q_seg, kv_seg, q_hi, ik_of, j_of, block_q, block_k,
                 causal, use_segments, nq, nk):
    """(B, Tk) control arrays for the dkv grid: visited q block, run, mask."""
    ik = jnp.asarray(ik_of)[None]
    j = jnp.asarray(j_of)[None]
    q_lo = (ik * block_k) // block_q if causal else jnp.zeros_like(ik)
    qblk_raw = q_lo + j                                # (1|B, Tk) -> broadcast
    qblk_raw = jnp.broadcast_to(qblk_raw, (q_hi.shape[0], qblk_raw.shape[1]))
    hi = jnp.take_along_axis(q_hi, jnp.broadcast_to(jnp.minimum(ik, nk - 1),
                                                    qblk_raw.shape), 1) \
        if use_segments else jnp.full_like(qblk_raw, nq - 1)
    run = qblk_raw <= jnp.minimum(hi, nq - 1)
    qblk = jnp.minimum(qblk_raw, nq - 1)
    if causal:
        diag = qblk * block_q < (ik + 1) * block_k - 1
    else:
        diag = jnp.zeros_like(run)
    if use_segments:
        qmin, qmax = _block_minmax(q_seg, block_q)
        kmin, kmax = _block_minmax(kv_seg, block_k)
        ikb = jnp.broadcast_to(jnp.minimum(ik, nk - 1), qblk.shape)
        uniform = ((jnp.take_along_axis(qmin, qblk, 1) == jnp.take_along_axis(qmax, qblk, 1))
                   & (jnp.take_along_axis(kmin, ikb, 1) == jnp.take_along_axis(kmax, ikb, 1))
                   & (jnp.take_along_axis(qmin, qblk, 1) == jnp.take_along_axis(kmin, ikb, 1)))
        masked = jnp.logical_or(diag, jnp.logical_not(uniform))
    else:
        masked = jnp.broadcast_to(diag, qblk.shape)
    qblk = _hold_on_skip(qblk, run)
    return (qblk.astype(jnp.int32), run.astype(jnp.int32), masked.astype(jnp.int32))


def _broadcast_segs(q_seg, kv_seg, B, S, Sk):
    q_seg_b = jax.lax.broadcast_in_dim(q_seg, (B, S, LANES), (0, 1))
    kv_seg_b = jax.lax.broadcast_in_dim(kv_seg, (B, SUBLANES, Sk), (0, 2))
    return q_seg_b, kv_seg_b


def _compiler_params(interpret: bool):
    if interpret:
        return None
    # the head-grouped working set deliberately exceeds the 16MB default
    # scoped-vmem limit; v5e has 128MB of physical VMEM
    return pltpu.CompilerParams(
        vmem_limit_bytes=int(os.environ.get("IEVO_FLASH_VMEM_LIMIT_MB", "100")) * 2**20)


def _pick_kv_group(Hkv: int, q_per_kv: int, block_q: int, block_k: int, D: int) -> int:
    """kv heads processed per grid step.

    Grouping heads into the BLOCK instead of the grid divides the fixed
    per-grid-step cost (measured ~3us on v5e — as much as 60% of a 1024^2
    compute block) by the group size: dead schedule-slack steps and the
    scalar-core work repeat per grid step, and the kv fetch + mask build are
    shared by the whole group.  Bounded by a VMEM budget: the fwd/dq working
    set is ~6 (q/do/dq/out double-buffered bf16 + f32 acc) G-head q-sized
    buffers plus 4 kv-sized ones."""
    if os.environ.get("IEVO_FLASH_GK"):
        want = max(int(os.environ["IEVO_FLASH_GK"]), 1)
        while Hkv % want:
            want -= 1
        return want
    budget = int(os.environ.get("IEVO_FLASH_VMEM_MB", "10")) * 2**20
    for gk in (8, 4, 2, 1):
        if Hkv % gk:
            continue
        G = gk * q_per_kv
        est = (6 * G * block_q * D * 2
               + 4 * gk * block_k * D * 2
               + 2 * block_q * LANES * 4)
        if est <= budget:
            return gk
    return 1


def _pick_bwd_partition(Hkv: int, q_per_kv: int, S: int, block_q: int,
                        block_k: int, D: int) -> tuple:
    """(kv-group size, q-heads-per-kv chunk) for the fused backward.

    Unlike the forward (which measures fastest at the smallest group that
    amortizes the grid-step cost), the backward WANTS a 2-wide kv group:
    per-(b, group) grid steps halve, the dk/dv accumulator init/finalize
    amortizes, and more per-step chains feed the depth-1 MXU/VPU software
    pipeline (gk=2 measured 22% faster than gk=1 at 7B bench shapes).
    Bounded by the VMEM the full-sequence (G, S, D) f32 dq stripe +
    double-buffered q/do blocks consume — when even the full GQA group at
    gk=1 does not fit (long sequence, or q_per_kv > 8), the q heads are
    CHUNKED: dk/dv are additive over q-head subsets, so the caller runs the
    kernel per chunk and sums (kv refetched per chunk — the price of
    fitting)."""

    def est(G, gk):
        return (G * S * D * (4 + 2 * 2)        # dq f32 stripe + dq out buffers
                + 4 * G * block_q * D * 2      # q/do double-buffered
                + 4 * gk * block_k * D * 2     # k/v double-buffered
                + 4 * gk * D * block_k * 4)    # dkT/dvT scratch + out buffers

    if os.environ.get("IEVO_FLASH_GK_BWD"):
        want = max(int(os.environ["IEVO_FLASH_GK_BWD"]), 1)
        while Hkv % want:
            want -= 1
        if want * q_per_kv > 8:
            raise ValueError(
                f"IEVO_FLASH_GK_BWD={want} gives {want * q_per_kv} dq chains "
                f"(> the 8-chain cap at q_per_kv={q_per_kv}); pick a smaller "
                "group or leave the knob unset for the auto choice")
        return want, q_per_kv
    # NB: the estimate undercounts per-chain (bq, bk) f32 intermediates; 56MB
    # keeps the real allocation safely under the 100MB scoped-vmem limit (gk=8
    # at MHA 4096-seq shapes measured 105MB and was rejected by Mosaic).
    # gk=2 measured fastest everywhere (GQA 32q/8kv AND MHA, micro + e2e MFU);
    # wider groups get slower (VMEM pressure serializes double-buffering), and
    # G caps at 8 chains.  IEVO_FLASH_GK_BWD overrides for re-tuning.
    budget = int(os.environ.get("IEVO_FLASH_VMEM_MB_BWD", "56")) * 2**20
    for gk in (2, 1):
        if Hkv % gk or gk * q_per_kv > 8:
            continue
        if est(gk * q_per_kv, gk) <= budget:
            return gk, q_per_kv
    # chunked fallback: largest q-head chunk (dividing q_per_kv, <= 8) whose
    # gk=1 working set fits
    qc = q_per_kv
    while qc > 1 and (qc > 8 or q_per_kv % qc or est(qc, 1) > budget):
        qc -= 1
    while q_per_kv % qc:
        qc -= 1
    # the soft budget above only steers the partition choice; the HARD wall is
    # the Mosaic scoped-vmem limit — if even one dq chain overflows THAT (the
    # f32 (1, S, D) dq stripe at very long seq), fail here with actionable
    # numbers instead of an opaque Mosaic rejection at compile time.  The
    # estimate undercounts ~2x (see NB above), so check est against half.
    limit = int(os.environ.get("IEVO_FLASH_VMEM_LIMIT_MB", "100")) * 2**20
    if est(qc, 1) > limit // 2:
        raise ValueError(
            f"splash backward working set ~{2 * est(qc, 1) / 2**20:.0f}MB "
            f"exceeds the {limit / 2**20:.0f}MB scoped-vmem limit even at one "
            "dq chain (seq so long the f32 dq stripe alone overflows); shrink "
            "block_q/seq or raise IEVO_FLASH_VMEM_LIMIT_MB if the chip allows")
    return 1, qc


# ------------------------------------------------------------------ forward


def _fmix32(x):
    """murmur3 finalizer: u32 -> decorrelated u32, pure VPU ops."""
    x ^= x >> jnp.uint32(16)
    x *= jnp.uint32(0x85EBCA6B)
    x ^= x >> jnp.uint32(13)
    x *= jnp.uint32(0xC2B2AE35)
    x ^= x >> jnp.uint32(16)
    return x


def _hash_rc(row, col, head, base):
    """The dropout hash of GLOBAL (q row, kv col, q head) coordinates (u32)."""
    return _fmix32(row * jnp.uint32(0x9E3779B1)
                   ^ col * jnp.uint32(0x85EBCA77)
                   ^ head * jnp.uint32(0xC2B2AE3D)
                   ^ base)


def _keep_thresh(rate: float):
    return jnp.uint32(min(int(rate * 2.0**32), 2**32 - 1))


def _dropout_scale(n_rows, block_q, block_k, q_start, k_start, head0, base,
                   rate: float, q_per_row_block: int = 1):
    """Deterministic attention-probability dropout mask (x 1/keep scale) for a
    (n_rows, block_k) tile whose rows stack ``q_per_row_block`` heads of
    ``block_q`` q rows each (fwd stacks the GQA group; bwd passes 1).

    Counter-based: a murmur3-fmix32 hash of (global q row, global kv col,
    global q head, seed/batch base) — pure u32 VPU ops, so the SAME mask is
    regenerated in forward and backward (flash-attn's dropout recipe,
    ``multi_head_attention.py`` dropout_p) and the kernel stays testable in
    interpret mode (pltpu.prng_* has no CPU lowering).  Because the hash is
    keyed on GLOBAL coordinates (callers fold in shard offsets from the seed
    vector — see ``_norm_seed``), the mask is invariant to how batch/heads/
    sequence are partitioned — the same property the residual-dropout streams
    get from partitionable threefry."""
    li = jax.lax.broadcasted_iota(jnp.uint32, (n_rows, block_k), 0)
    col = jax.lax.broadcasted_iota(jnp.uint32, (n_rows, block_k), 1)
    col = col + jnp.uint32(k_start)
    if q_per_row_block > 1:
        row = li % jnp.uint32(block_q) + jnp.uint32(q_start)
        head = li // jnp.uint32(block_q) + jnp.uint32(head0)
    else:
        row = li + jnp.uint32(q_start)
        head = jnp.uint32(head0)
    x = _hash_rc(row, col, head, base)
    return jnp.where(x >= _keep_thresh(rate),
                     jnp.float32(1.0 / (1.0 - rate)), jnp.float32(0.0))


def _dropout_base(seed, b):
    """Per-(seed, global batch index) scalar hash base (u32)."""
    return (jnp.uint32(seed.astype(jnp.int32).astype(jnp.uint32))
            + jnp.uint32(b).astype(jnp.uint32) * jnp.uint32(0x632BE59B))


def _norm_seed(dropout_seed):
    """Normalize a dropout seed to the (5,) i32 vector the kernels prefetch:
    ``[seed, row0, col0, head0, batch0]`` — the last four are the GLOBAL
    coordinate offsets of this shard's (q rows, kv cols, q heads, batch)
    window, so sharded callers (GSPMD island, ring legs, manual-pipeline tp)
    regenerate exactly the mask an unsharded run would draw.  A bare scalar
    (or (1,)) seed means offsets 0."""
    if dropout_seed is None:
        return jnp.zeros((5,), jnp.int32)
    arr = jnp.asarray(dropout_seed, jnp.int32).reshape((-1,))
    if arr.shape[0] == 5:
        return arr
    assert arr.shape[0] == 1, f"dropout_seed must be scalar or (5,): {arr.shape}"
    return jnp.concatenate([arr, jnp.zeros((4,), jnp.int32)])


def dropout_mask_dense(rate: float, dropout_seed, B: int, H: int, S: int, Sk: int):
    """(B, H, S, Sk) f32 keep-and-scale mask, BIT-IDENTICAL to the splash
    kernel's in-kernel draw (same ``_hash_rc`` counter hash over global
    coordinates) — the dense jnp paths (``attention_reference``, the
    no-aligned-block fallback, ring-attention oracle legs) use this so kernel
    and fallback produce the same dropped model."""
    assert dropout_seed is not None, "attention dropout needs dropout_seed"
    seed = _norm_seed(dropout_seed)
    row = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, S, 1), 2) + jnp.uint32(seed[1])
    col = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 1, Sk), 3) + jnp.uint32(seed[2])
    head = jax.lax.broadcasted_iota(jnp.uint32, (1, H, 1, 1), 1) + jnp.uint32(seed[3])
    b = jax.lax.broadcasted_iota(jnp.uint32, (B, 1, 1, 1), 0) + jnp.uint32(seed[4])
    base = jnp.uint32(seed[0].astype(jnp.uint32)) + b * jnp.uint32(0x632BE59B)
    x = _hash_rc(row, col, head, base)
    return jnp.where(x >= _keep_thresh(rate),
                     jnp.float32(1.0 / (1.0 - rate)), jnp.float32(0.0))


def _block_mask(q_seg_ref, kv_seg_ref, q_start, k_start, causal, use_segments,
                block_q, block_k):
    """Elementwise (block_q, block_k) mask, built ONCE per grid step and shared
    by every head in the group."""
    mask = None
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) + q_start
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + k_start
        mask = rows >= cols
    if use_segments:
        sm = q_seg_ref[0, :, 0][:, None] == kv_seg_ref[0, 0, :][None, :]
        mask = sm if mask is None else jnp.logical_and(mask, sm)
    return mask


def _fwd_kernel(
    # scalar prefetch: iq_of, j_of, last_of, kvblk, run_f, mask_f
    # [+ dropseed ONLY when dropout_rate > 0 — the rate-0 call must stay
    #  operand-identical to the dropout-free kernel so disabled dropout is
    #  bit-exact and free], then inputs / outputs / scratch
    iq_of, j_of, last_of, kvblk, run_f, mask_f, *rest,
    scale: float, causal: bool, block_q: int, block_k: int,
    use_segments: bool, q_per_kv: int, gk: int, dropout_rate: float = 0.0,
):
    if dropout_rate > 0.0:
        dropseed, *rest = rest
    (q_seg_ref, kv_seg_ref, q_ref, k_ref, v_ref,
     o_ref, lse_ref, acc_sc, m_sc, l_sc) = rest
    t = pl.program_id(2)
    b = pl.program_id(0)
    hg = pl.program_id(1)
    R = q_per_kv * block_q  # q rows sharing one kv head, concatenated

    @pl.when(j_of[t] == 0)
    def _init():
        acc_sc[:] = jnp.zeros_like(acc_sc)
        m_sc[:] = jnp.full_like(m_sc, NEG_INF)
        l_sc[:] = jnp.zeros_like(l_sc)

    q_start = iq_of[t] * block_q
    k_start = kvblk[b, t] * block_k

    def update(g, s, mask, needs_mask):
        if needs_mask:
            s = jnp.where(mask[None], s.reshape(q_per_kv, block_q, block_k),
                          DEFAULT_MASK_VALUE).reshape(R, block_k)
        rows = slice(g * R, (g + 1) * R)
        m_prev = m_sc[rows, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2(s - m_new)
        if needs_mask:
            # rows with no unmasked entry yet: keep l == 0 (zeros, -inf lse)
            p = jnp.where(m_new > 0.5 * DEFAULT_MASK_VALUE, p, 0.0)
        correction = jnp.exp2(m_prev - m_new)
        l_new = l_sc[rows, :1] * correction + jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0, g, :, :]
        p_v = p
        if dropout_rate > 0.0:
            # dropout applies to the normalized probs; since normalization by
            # l happens at finalize and the mask is multiplicative, dropping
            # the unnormalized p in the pv accumulation is equivalent.  l (the
            # softmax denominator) sums the UNdropped p — torch semantics:
            # dropout(softmax(s)) @ v.
            drop = _dropout_scale(R, block_q, block_k,
                                  q_start + dropseed[1], k_start + dropseed[2],
                                  (hg * gk + g) * q_per_kv + dropseed[3],
                                  _dropout_base(dropseed[0], b + dropseed[4]),
                                  dropout_rate, q_per_row_block=q_per_kv)
            p_v = p * drop
        pv = jax.lax.dot_general(p_v.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_sc[rows, :] = acc_sc[rows, :] * correction + pv
        m_sc[rows, :] = jnp.broadcast_to(m_new, (R, m_sc.shape[1]))
        l_sc[rows, :] = jnp.broadcast_to(l_new, (R, l_sc.shape[1]))

    def compute(needs_mask):
        mask = (_block_mask(q_seg_ref, kv_seg_ref, q_start, k_start, causal,
                            use_segments, block_q, block_k)
                if needs_mask else None)
        for g in range(gk):
            q = q_ref[0, g * q_per_kv:(g + 1) * q_per_kv].reshape(R, -1)
            k = k_ref[0, g, :, :]
            # base-2 softmax domain (exp2 is VPU-native; log2e folds into the
            # scale multiply the kernel already pays; l is base-invariant)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * (scale * LOG2E)
            update(g, s, mask, needs_mask)

    @pl.when(run_f[b, t] == 1)
    def _():
        if not (causal or use_segments):  # no mask source: every block is plain
            compute(False)
            return

        @pl.when(mask_f[b, t] == 1)
        def _masked():
            compute(True)

        @pl.when(mask_f[b, t] == 0)
        def _plain():
            compute(False)

    @pl.when(last_of[t] == 1)
    def _finalize():
        G = gk * q_per_kv
        l = l_sc[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_sc[:] / l_safe).reshape(G, block_q, -1).astype(o_ref.dtype)
        m = m_sc[:, :1]
        # m tracks max(s·scale·log2e): convert back to the natural-log domain
        lse = jnp.where(l == 0.0, NEG_INF, m * LN2 + jnp.log(l_safe))
        lse_ref[0] = jnp.broadcast_to(lse, (lse.shape[0], SUBLANES)).reshape(
            G, block_q, SUBLANES)


def _fwd_kernel_bsd(
    # scalar prefetch as _fwd_kernel; BSD refs: q/o (1, block_q, G*D),
    # k/v (1, block_k, gk*D), lse (1, G, block_q, SUBLANES)
    iq_of, j_of, last_of, kvblk, run_f, mask_f, *rest,
    scale: float, causal: bool, block_q: int, block_k: int,
    use_segments: bool, q_per_kv: int, gk: int, head_dim: int,
    dropout_rate: float = 0.0,
):
    """BSD-layout forward: identical math to ``_fwd_kernel`` at per-head
    granularity — each head is a free 128-aligned lane slice of the block, so
    the grid, control arrays, and m/l/acc bookkeeping are unchanged while the
    HBM arrays stay in the model's natural (B, S, H*D) layout."""
    if dropout_rate > 0.0:
        dropseed, *rest = rest
    (q_seg_ref, kv_seg_ref, q_ref, k_ref, v_ref,
     o_ref, lse_ref, acc_sc, m_sc, l_sc) = rest
    t = pl.program_id(2)
    b = pl.program_id(0)
    hg = pl.program_id(1)
    D = head_dim
    G = gk * q_per_kv

    @pl.when(j_of[t] == 0)
    def _init():
        acc_sc[:] = jnp.zeros_like(acc_sc)
        m_sc[:] = jnp.full_like(m_sc, NEG_INF)
        l_sc[:] = jnp.zeros_like(l_sc)

    q_start = iq_of[t] * block_q
    k_start = kvblk[b, t] * block_k

    def update(hq, g, s, mask, needs_mask):
        if needs_mask:
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
        rows = slice(hq * block_q, (hq + 1) * block_q)
        m_prev = m_sc[rows, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2(s - m_new)
        if needs_mask:
            p = jnp.where(m_new > 0.5 * DEFAULT_MASK_VALUE, p, 0.0)
        correction = jnp.exp2(m_prev - m_new)
        l_new = l_sc[rows, :1] * correction + jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0, :, g * D:(g + 1) * D]
        p_v = p
        if dropout_rate > 0.0:
            drop = _dropout_scale(block_q, block_q, block_k,
                                  q_start + dropseed[1], k_start + dropseed[2],
                                  (hg * gk + g) * q_per_kv + (hq % q_per_kv)
                                  + dropseed[3],
                                  _dropout_base(dropseed[0], b + dropseed[4]),
                                  dropout_rate)
            p_v = p * drop
        pv = jax.lax.dot_general(p_v.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_sc[rows, :] = acc_sc[rows, :] * correction + pv
        m_sc[rows, :] = jnp.broadcast_to(m_new, (block_q, m_sc.shape[1]))
        l_sc[rows, :] = jnp.broadcast_to(l_new, (block_q, l_sc.shape[1]))

    def compute(needs_mask):
        mask = (_block_mask(q_seg_ref, kv_seg_ref, q_start, k_start, causal,
                            use_segments, block_q, block_k)
                if needs_mask else None)
        for g in range(gk):
            k = k_ref[0, :, g * D:(g + 1) * D]
            for h in range(q_per_kv):
                hq = g * q_per_kv + h
                q = q_ref[0, :, hq * D:(hq + 1) * D]
                s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32) * (scale * LOG2E)
                update(hq, g, s, mask, needs_mask)

    @pl.when(run_f[b, t] == 1)
    def _():
        if not (causal or use_segments):
            compute(False)
            return

        @pl.when(mask_f[b, t] == 1)
        def _masked():
            compute(True)

        @pl.when(mask_f[b, t] == 0)
        def _plain():
            compute(False)

    @pl.when(last_of[t] == 1)
    def _finalize():
        l = l_sc[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        for hq in range(G):
            rows = slice(hq * block_q, (hq + 1) * block_q)
            o_ref[0, :, hq * D:(hq + 1) * D] = (
                acc_sc[rows, :] / l_safe[rows, :]).astype(o_ref.dtype)
        m = m_sc[:, :1]
        lse = jnp.where(l == 0.0, NEG_INF, m * LN2 + jnp.log(l_safe))
        lse_ref[0] = jnp.broadcast_to(lse, (lse.shape[0], SUBLANES)).reshape(
            G, block_q, SUBLANES)


def _splash_forward(q, k, v, q_seg, kv_seg, scale, causal, block_q, block_k,
                    max_segment_len, interpret, cross_kv=False,
                    dropout_rate=0.0, drop_seed=None):
    """q: (B, S, Hq, D); k/v: (B, Sk, Hkv, D) — the model's natural layout.
    Returns (out (B, S, Hq, D), lse (B, Hq, S, SUBLANES)).

    BSD layout (``_use_bsd``): the kernel reads (B, S, H*D) bitcasts directly,
    no transposes anywhere.  Other head dims transpose to the head-major
    kernel here (and, under remat, in the backward's operand recompute).
    ``cross_kv``: q and kv ids come from DIFFERENT ring chunks — segment
    windows are meaningless (a q segment may continue anywhere in the kv
    chunk), so only the elementwise masks apply."""
    B, S, Hq, D = q.shape
    Hkv, Sk = k.shape[2], k.shape[1]
    bsd = _use_bsd(D)
    if not bsd:
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
    q_per_kv = Hq // Hkv
    nq, nk = _cdiv(S, block_q), _cdiv(Sk, block_k)
    use_segments = q_seg is not None
    iq_of, j_of, last_of = _fwd_layout(S, Sk, block_q, block_k, causal,
                                       None if cross_kv else max_segment_len,
                                       use_segments)
    T = len(iq_of)
    if use_segments and not cross_kv:
        kv_lo, _ = _segment_windows(q_seg, kv_seg, block_q, block_k)
    elif use_segments:
        kv_lo = jnp.zeros((B, nq), jnp.int32)
    else:
        q_seg = jnp.zeros((B, S), jnp.int32)
        kv_seg = jnp.zeros((B, Sk), jnp.int32)
        kv_lo = jnp.zeros((B, nq), jnp.int32)
    kvblk, run_f, mask_f = _fwd_control(q_seg, kv_seg, kv_lo, iq_of, j_of,
                                        block_q, block_k, causal, use_segments, nq, nk)
    q_seg_b, kv_seg_b = _broadcast_segs(q_seg, kv_seg, B, S, Sk)

    gk = _pick_kv_group(Hkv, q_per_kv, block_q, block_k, D)
    G = gk * q_per_kv
    prefetch = [iq_of, j_of, last_of, kvblk, run_f, mask_f]
    if dropout_rate > 0.0:
        assert drop_seed is not None, "attention dropout needs dropout_seed"
        prefetch.append(drop_seed)

    seg_specs = [
        pl.BlockSpec((1, block_q, LANES), lambda b, hg, t, *s: (b, s[0][t], 0)),
        pl.BlockSpec((1, SUBLANES, block_k), lambda b, hg, t, *s: (b, 0, s[3][b, t])),
    ]
    lse_shape = jax.ShapeDtypeStruct((B, Hq, S, SUBLANES), jnp.float32)
    scratch = [
        pltpu.VMEM((G * block_q, D), jnp.float32),
        pltpu.VMEM((G * block_q, SUBLANES), jnp.float32),
        pltpu.VMEM((G * block_q, SUBLANES), jnp.float32),
    ]

    if bsd:
        kernel = functools.partial(
            _fwd_kernel_bsd, scale=scale, causal=causal, block_q=block_q,
            block_k=block_k, use_segments=use_segments, q_per_kv=q_per_kv,
            gk=gk, head_dim=D, dropout_rate=float(dropout_rate))
        qf = q.reshape(B, S, Hq * D)
        kf = k.reshape(B, Sk, Hkv * D)
        vf = v.reshape(B, Sk, Hkv * D)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(prefetch),
            grid=(B, Hq // G, T),
            in_specs=seg_specs + [
                pl.BlockSpec((1, block_q, G * D), lambda b, hg, t, *s: (b, s[0][t], hg)),
                pl.BlockSpec((1, block_k, gk * D), lambda b, hg, t, *s: (b, s[3][b, t], hg)),
                pl.BlockSpec((1, block_k, gk * D), lambda b, hg, t, *s: (b, s[3][b, t], hg)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, G * D), lambda b, hg, t, *s: (b, s[0][t], hg)),
                pl.BlockSpec((1, G, block_q, SUBLANES),
                             lambda b, hg, t, *s: (b, hg, s[0][t], 0)),
            ],
            scratch_shapes=scratch,
        )
        out, lse = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            compiler_params=_compiler_params(interpret),
            out_shape=[jax.ShapeDtypeStruct(qf.shape, q.dtype), lse_shape],
            interpret=interpret,
        )(*prefetch, q_seg_b, kv_seg_b, qf, kf, vf)
        return out.reshape(B, S, Hq, D), lse

    kernel = functools.partial(
        _fwd_kernel, scale=scale, causal=causal, block_q=block_q,
        block_k=block_k, use_segments=use_segments, q_per_kv=q_per_kv, gk=gk,
        dropout_rate=float(dropout_rate))

    def kv_idx(b, hg, t, *s):
        return (b, hg, s[3][b, t], 0)

    def q_idx(b, hg, t, *s):
        return (b, hg, s[0][t], 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(B, Hq // G, T),
        in_specs=seg_specs + [
            pl.BlockSpec((1, G, block_q, D), q_idx),
            pl.BlockSpec((1, gk, block_k, D), kv_idx),
            pl.BlockSpec((1, gk, block_k, D), kv_idx),
        ],
        out_specs=[
            pl.BlockSpec((1, G, block_q, D), q_idx),
            pl.BlockSpec((1, G, block_q, SUBLANES), q_idx),
        ],
        scratch_shapes=scratch,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=_compiler_params(interpret),
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            lse_shape,
        ],
        interpret=interpret,
    )(*prefetch, q_seg_b, kv_seg_b, q, k, v)
    return out.transpose(0, 2, 1, 3), lse


# ----------------------------------------------------------------- backward


def _bwd_kernel(
    # dropseed joins the prefetch ONLY when dropout_rate > 0 (see _fwd_kernel)
    ik_of, j_of, last_of, qblk, run_f, mask_f, *rest,
    scale: float, causal: bool, block_q: int, block_k: int,
    use_segments: bool, q_per_kv: int, gk: int, n_steps: int,
    dropout_rate: float = 0.0, qpk_full: int = 0, head_c0: int = 0,
    stacked: bool = False,
):
    """Fused flash backward: dq, dk and dv in ONE kernel over the kv-major
    (ik -> q window) schedule, so s/p/dp are computed once per visited block
    pair (5 matmuls instead of the 7 a dq/dkv kernel split pays) and the
    exp/mask VPU work runs once.  GPU flash kernels split because dq would
    need cross-block atomics; here the WHOLE per-(b, head group) dq stripe
    (G, S, D) f32 lives in VMEM scratch across the t loop (v5e has 128MB of
    VMEM) and is flushed to the output once, at the stripe's last step —
    no dq-partials HBM traffic (the official splash kernel's fused mode
    materializes (nk, B, H, S, D) partials and reduces them outside)."""
    if dropout_rate > 0.0:
        dropseed, *rest = rest
    (q_seg_ref, kv_seg_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
     dq_ref, dk_ref, dv_ref, dq_sc, dk_sc, dv_sc) = rest
    t = pl.program_id(2)
    b = pl.program_id(0)
    hg = pl.program_id(1)
    R = q_per_kv * block_q  # the whole GQA group's q rows, concatenated

    @pl.when(t == 0)
    def _init_dq():
        dq_sc[:] = jnp.zeros_like(dq_sc)

    @pl.when(j_of[t] == 0)
    def _init_dkv():
        dk_sc[:] = jnp.zeros_like(dk_sc)
        dv_sc[:] = jnp.zeros_like(dv_sc)

    q_start = qblk[b, t] * block_q
    k_start = ik_of[t] * block_k

    def compute_stacked(needs_mask):
        # STACKED variant (IEVO_FLASH_BWD_STACKED=1): the whole GQA group's q
        # rows concatenate into ONE (R, ·) operand per kv member — the
        # forward's layout — so each member costs 5 large matmuls instead of
        # 5·q_per_kv block_q-row ones, and the dk/dv GQA-group reduction
        # falls out of the stacked contraction for free.  Trades the chain
        # pipeline's MXU/VPU interleave for fewer, bigger ops and q_per_kv×
        # larger live f32 intermediates; A/B against the chain path on-chip.
        mask = (_block_mask(q_seg_ref, kv_seg_ref, q_start, k_start, causal,
                            use_segments, block_q, block_k)
                if needs_mask else None)
        D = q_ref.shape[-1]
        for g in range(gk):
            hs = slice(g * q_per_kv, (g + 1) * q_per_kv)
            qg = q_ref[0, hs].reshape(R, D)
            dog = do_ref[0, hs].reshape(R, D)
            s_ = jax.lax.dot_general(qg, k_ref[0, g, :, :], (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32) * (scale * LOG2E)
            dp = jax.lax.dot_general(dog, v_ref[0, g, :, :], (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            lse = lse_ref[0, hs, :, :1].reshape(R, 1)
            delta = delta_ref[0, hs, :, :1].reshape(R, 1)
            p = jnp.exp2(s_ - lse)
            if needs_mask:
                p = jnp.where(mask[None], p.reshape(q_per_kv, block_q, block_k),
                              0.0).reshape(R, block_k)
            if dropout_rate > 0.0:
                head0 = (hg * gk + g) * qpk_full + head_c0 + dropseed[3]
                drop = _dropout_scale(R, block_q, block_k,
                                      q_start + dropseed[1], k_start + dropseed[2],
                                      head0,
                                      _dropout_base(dropseed[0], b + dropseed[4]),
                                      dropout_rate, q_per_row_block=q_per_kv)
                pb = (p * drop).astype(do_ref.dtype)
                ds = (p * (dp * drop - delta)).astype(q_ref.dtype)
            else:
                pb = p.astype(do_ref.dtype)
                ds = (p * (dp - delta)).astype(q_ref.dtype)
            drows = slice(g * D, (g + 1) * D)
            dv_sc[drows, :] += jax.lax.dot_general(
                dog, pb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            dk_sc[drows, :] += jax.lax.dot_general(
                qg, ds, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            dq_blk = jax.lax.dot_general(ds, k_ref[0, g, :, :], (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
            dq_sc[hs, pl.ds(q_start, block_q), :] += dq_blk.reshape(q_per_kv, block_q, D)

    def compute(needs_mask):
        if stacked:
            compute_stacked(needs_mask)
            return
        # Depth-1 software pipeline over per-head chains: each chain's MXU
        # head (s = q k^T and dp = do v^T — dp does not depend on p) is issued
        # BEFORE the previous chain's exp/mask VPU phase, so the in-order
        # issue stream keeps the MXU busy while the VPU works (the units
        # retire asynchronously).  Keeping chains at block_q rows also bounds
        # live f32 intermediates to ~2 chains (VMEM).
        mask = (_block_mask(q_seg_ref, kv_seg_ref, q_start, k_start, causal,
                            use_segments, block_q, block_k)
                if needs_mask else None)
        chains = [(g, h) for g in range(gk) for h in range(q_per_kv)]

        def head_mxu(ci):
            g, h = chains[ci]
            hq = g * q_per_kv + h
            q = q_ref[0, hq, :, :]
            do = do_ref[0, hq, :, :]
            # base-2 domain: one multiply folds BOTH the softmax scale and the
            # exp->exp2 conversion (lse arrives pre-multiplied by log2e)
            s_ = jax.lax.dot_general(q, k_ref[0, g, :, :], (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32) * (scale * LOG2E)
            dp = jax.lax.dot_general(do, v_ref[0, g, :, :], (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            return s_, dp

        def vpu_mid(ci, s_, dp):
            g, h = chains[ci]
            hq = g * q_per_kv + h
            lse = lse_ref[0, hq, :, :1]
            delta = delta_ref[0, hq, :, :1]
            p = jnp.exp2(s_ - lse)
            if needs_mask:
                p = jnp.where(mask, p, 0.0)
            if dropout_rate > 0.0:
                # regenerate the forward's mask (same counter hash of global
                # (row, col, head)).  With D = dropout(P): dv = D^T do and
                # dL/dP = (do v^T) * mask; delta = rowsum(do*out) already
                # equals sum_j dL/dP_j P_j, so ds = p * (dp*mask - delta).
                h_glob = (hg * gk + g) * qpk_full + head_c0 + h + dropseed[3]
                drop = _dropout_scale(block_q, block_q, block_k,
                                      q_start + dropseed[1],
                                      k_start + dropseed[2], h_glob,
                                      _dropout_base(dropseed[0], b + dropseed[4]),
                                      dropout_rate)
                pb = (p * drop).astype(do_ref.dtype)
                ds = (p * (dp * drop - delta)).astype(q_ref.dtype)
                return pb, ds
            # ds stays UNSCALED on the hot (bq, bk) path — the softmax scale
            # is applied once to the accumulated dq/dk stripes at finalize
            ds = (p * (dp - delta)).astype(q_ref.dtype)
            return p.astype(do_ref.dtype), ds

        def tail_mxu(ci, pb, ds):
            # dk/dv are accumulated TRANSPOSED (D-major): dv^T = do^T @ p puts
            # the contraction on dim 0 of the small (block_q, D) operand, so
            # Mosaic relayouts a (bq, 128) tile instead of the (bq, bk) p/ds
            # blocks (8x less transpose work per step); the scratch is flipped
            # to natural (block_k, D) in VMEM once per kv block at finalize.
            g, h = chains[ci]
            hq = g * q_per_kv + h
            D = q_ref.shape[-1]
            drows = slice(g * D, (g + 1) * D)
            dv_sc[drows, :] += jax.lax.dot_general(
                do_ref[0, hq, :, :], pb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dk_sc[drows, :] += jax.lax.dot_general(
                q_ref[0, hq, :, :], ds, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dq_sc[hq, pl.ds(q_start, block_q), :] += jax.lax.dot_general(
                ds, k_ref[0, g, :, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        pending = head_mxu(0)
        for ci in range(len(chains)):
            nxt = head_mxu(ci + 1) if ci + 1 < len(chains) else None
            pb, ds = vpu_mid(ci, *pending)
            tail_mxu(ci, pb, ds)
            pending = nxt

    @pl.when(run_f[b, t] == 1)
    def _():
        if not (causal or use_segments):
            compute(False)
            return

        @pl.when(mask_f[b, t] == 1)
        def _masked():
            compute(True)

        @pl.when(mask_f[b, t] == 0)
        def _plain():
            compute(False)

    @pl.when(last_of[t] == 1)
    def _finalize_dkv():
        D = q_ref.shape[-1]
        # deferred softmax scale: ds was accumulated unscaled (dv uses p, no
        # scale), so dk picks it up here, once per kv block.  The D-major
        # scratch is flipped to the natural (block_k, D) layout HERE, in VMEM,
        # once per kv block — an XLA transpose of the full (B,H,S,D) outputs
        # measured ~5x below copy bandwidth (21.8 ms/step at 700m)
        dk_ref[0] = (dk_sc[:] * scale).reshape(gk, D, block_k).transpose(0, 2, 1).astype(dk_ref.dtype)
        dv_ref[0] = dv_sc[:].reshape(gk, D, block_k).transpose(0, 2, 1).astype(dv_ref.dtype)

    @pl.when(t == n_steps - 1)
    def _finalize_dq():
        dq_ref[0] = (dq_sc[:] * scale).astype(dq_ref.dtype)


def _bwd_kernel_bsd(
    # dropseed joins the prefetch ONLY when dropout_rate > 0
    ik_of, j_of, last_of, qblk, run_f, mask_f, *rest,
    scale: float, causal: bool, block_q: int, block_k: int,
    use_segments: bool, q_per_kv: int, gk: int, n_steps: int, head_dim: int,
    dropout_rate: float = 0.0, qpk_full: int = 0, head_c0: int = 0,
):
    """BSD-layout fused backward: the ``_bwd_kernel`` chain schedule with each
    head a free 128-aligned lane slice of (1, block, G*D) refs — dq/dk/dv are
    written in the model's natural (B, S, H*D) layout, so neither the operand
    recompute nor the grad consumers pay HBM transposes."""
    if dropout_rate > 0.0:
        dropseed, *rest = rest
    (q_seg_ref, kv_seg_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
     dq_ref, dk_ref, dv_ref, dq_sc, dk_sc, dv_sc) = rest
    t = pl.program_id(2)
    b = pl.program_id(0)
    hg = pl.program_id(1)
    D = head_dim

    @pl.when(t == 0)
    def _init_dq():
        dq_sc[:] = jnp.zeros_like(dq_sc)

    @pl.when(j_of[t] == 0)
    def _init_dkv():
        dk_sc[:] = jnp.zeros_like(dk_sc)
        dv_sc[:] = jnp.zeros_like(dv_sc)

    q_start = qblk[b, t] * block_q
    k_start = ik_of[t] * block_k

    def compute(needs_mask):
        # depth-1 software pipeline over per-head chains (see _bwd_kernel)
        mask = (_block_mask(q_seg_ref, kv_seg_ref, q_start, k_start, causal,
                            use_segments, block_q, block_k)
                if needs_mask else None)
        chains = [(g, h) for g in range(gk) for h in range(q_per_kv)]

        def head_mxu(ci):
            g, h = chains[ci]
            hq = g * q_per_kv + h
            q = q_ref[0, :, hq * D:(hq + 1) * D]
            do = do_ref[0, :, hq * D:(hq + 1) * D]
            k = k_ref[0, :, g * D:(g + 1) * D]
            v = v_ref[0, :, g * D:(g + 1) * D]
            s_ = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32) * (scale * LOG2E)
            dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            return s_, dp

        def vpu_mid(ci, s_, dp):
            g, h = chains[ci]
            hq = g * q_per_kv + h
            lse = lse_ref[0, hq, :, :1]
            delta = delta_ref[0, hq, :, :1]
            p = jnp.exp2(s_ - lse)
            if needs_mask:
                p = jnp.where(mask, p, 0.0)
            if dropout_rate > 0.0:
                h_glob = (hg * gk + g) * qpk_full + head_c0 + h + dropseed[3]
                drop = _dropout_scale(block_q, block_q, block_k,
                                      q_start + dropseed[1],
                                      k_start + dropseed[2], h_glob,
                                      _dropout_base(dropseed[0], b + dropseed[4]),
                                      dropout_rate)
                pb = (p * drop).astype(do_ref.dtype)
                ds = (p * (dp * drop - delta)).astype(q_ref.dtype)
                return pb, ds
            ds = (p * (dp - delta)).astype(q_ref.dtype)
            return p.astype(do_ref.dtype), ds

        def tail_mxu(ci, pb, ds):
            g, h = chains[ci]
            hq = g * q_per_kv + h
            drows = slice(g * D, (g + 1) * D)
            dv_sc[drows, :] += jax.lax.dot_general(
                do_ref[0, :, hq * D:(hq + 1) * D], pb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dk_sc[drows, :] += jax.lax.dot_general(
                q_ref[0, :, hq * D:(hq + 1) * D], ds, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dq_sc[hq, pl.ds(q_start, block_q), :] += jax.lax.dot_general(
                ds, k_ref[0, :, g * D:(g + 1) * D], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        pending = head_mxu(0)
        for ci in range(len(chains)):
            nxt = head_mxu(ci + 1) if ci + 1 < len(chains) else None
            pb, ds = vpu_mid(ci, *pending)
            tail_mxu(ci, pb, ds)
            pending = nxt

    @pl.when(run_f[b, t] == 1)
    def _():
        if not (causal or use_segments):
            compute(False)
            return

        @pl.when(mask_f[b, t] == 1)
        def _masked():
            compute(True)

        @pl.when(mask_f[b, t] == 0)
        def _plain():
            compute(False)

    @pl.when(last_of[t] == 1)
    def _finalize_dkv():
        # D-major scratch flipped to natural (block_k, D) lane slices in VMEM,
        # once per kv block (same trade as _bwd_kernel's finalize)
        for g in range(gk):
            drows = slice(g * D, (g + 1) * D)
            dk_ref[0, :, g * D:(g + 1) * D] = (
                dk_sc[drows, :] * scale).T.astype(dk_ref.dtype)
            dv_ref[0, :, g * D:(g + 1) * D] = dv_sc[drows, :].T.astype(dv_ref.dtype)

    @pl.when(t == n_steps - 1)
    def _finalize_dq():
        for hq in range(gk * q_per_kv):
            dq_ref[0, :, hq * D:(hq + 1) * D] = (
                dq_sc[hq] * scale).astype(dq_ref.dtype)


def _splash_backward(res, g, *, scale, causal, block_q, block_k,
                     max_segment_len, interpret, dlse=None, cross_kv=False,
                     dropout_rate=0.0):
    q, k, v, q_seg, kv_seg, drop_seed, out, lse = res
    if dropout_rate > 0.0:
        assert drop_seed is not None, "attention dropout needs dropout_seed"
    do = g
    # residuals arrive in the model's natural (B, S, H, D) layout (BSD path
    # saves them untransposed; head-major kernels transpose here, which under
    # remat is exactly the old operand-recompute cluster)
    B, S, Hq, D = q.shape
    Hkv, Sk = k.shape[2], k.shape[1]
    bsd = _use_bsd(D)
    q_per_kv = Hq // Hkv
    nq, nk = _cdiv(S, block_q), _cdiv(Sk, block_k)
    if cross_kv:
        max_segment_len = None
    use_segments = q_seg is not None
    if use_segments and not cross_kv:
        _, q_hi = _segment_windows(q_seg, kv_seg, block_q, block_k)
    elif use_segments:
        q_hi = jnp.full((B, nk), nq - 1, jnp.int32)
    else:
        q_seg = jnp.zeros((B, S), jnp.int32)
        kv_seg = jnp.zeros((B, Sk), jnp.int32)
        q_hi = jnp.full((B, nk), nq - 1, jnp.int32)

    delta = jnp.einsum("bshd,bshd->bhs", do.astype(jnp.float32), out.astype(jnp.float32))
    if not bsd:
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        do = do.transpose(0, 2, 1, 3)
    if dlse is not None:
        delta = delta - dlse.astype(jnp.float32)
    delta = jax.lax.broadcast_in_dim(delta, (B, Hq, S, SUBLANES), (0, 1, 2))
    # pre-scale lse into the base-2 domain (one fused XLA pass) so the kernel's
    # p = exp2(s·scale·log2e − lse·log2e) == exp(s·scale − lse)
    lse = lse.astype(jnp.float32) * LOG2E
    if lse.ndim == 3:
        # residuals store lse squeezed to (B, Hq, S) (unpadded HBM layout);
        # rebuild the kernel's sublane-replicated operand transiently
        lse = jax.lax.broadcast_in_dim(lse, (B, Hq, S, SUBLANES), (0, 1, 2))

    q_seg_b, kv_seg_b = _broadcast_segs(q_seg, kv_seg, B, S, Sk)

    ik_of, jk_of, lastk_of = _dkv_layout(S, Sk, block_q, block_k, causal,
                                         max_segment_len, use_segments)
    qblk, runk_f, maskk_f = _dkv_control(q_seg, kv_seg, q_hi, ik_of, jk_of,
                                         block_q, block_k, causal, use_segments, nq, nk)
    Tk = len(ik_of)

    def run(q_c, do_c, lse_c, delta_c, qpk_c, gk, head_c0=0):
        """One fused-bwd pallas call over a q-head SUBSET (qpk_c heads per kv
        head).  dk/dv are additive over q-head subsets, so wide GQA groups /
        long sequences whose f32 dq stripe would not fit VMEM are split into
        chunked calls by the caller."""
        G = gk * qpk_c

        prefetch = [ik_of, jk_of, lastk_of, qblk, runk_f, maskk_f]
        if dropout_rate > 0.0:
            prefetch.append(drop_seed)
        if bsd:
            # (B, S, H*D) flat views; each head is a lane slice in-kernel
            HqC = q_c.shape[2]
            qf = q_c.reshape(B, S, HqC * D)
            dof = do_c.reshape(B, S, HqC * D)
            kf = k.reshape(B, Sk, Hkv * D)
            vf = v.reshape(B, Sk, Hkv * D)
            bwd_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=len(prefetch),
                grid=(B, Hkv // gk, Tk),
                in_specs=[
                    pl.BlockSpec((1, block_q, LANES), lambda b, hg, t, *s: (b, s[3][b, t], 0)),
                    pl.BlockSpec((1, SUBLANES, block_k), lambda b, hg, t, *s: (b, 0, s[0][t])),
                    pl.BlockSpec((1, block_q, G * D), lambda b, hg, t, *s: (b, s[3][b, t], hg)),
                    pl.BlockSpec((1, block_k, gk * D), lambda b, hg, t, *s: (b, s[0][t], hg)),
                    pl.BlockSpec((1, block_k, gk * D), lambda b, hg, t, *s: (b, s[0][t], hg)),
                    pl.BlockSpec((1, block_q, G * D), lambda b, hg, t, *s: (b, s[3][b, t], hg)),
                    pl.BlockSpec((1, G, block_q, SUBLANES),
                                 lambda b, hg, t, *s: (b, hg, s[3][b, t], 0)),
                    pl.BlockSpec((1, G, block_q, SUBLANES),
                                 lambda b, hg, t, *s: (b, hg, s[3][b, t], 0)),
                ],
                out_specs=[
                    pl.BlockSpec((1, S, G * D), lambda b, hg, t, *s: (b, 0, hg)),
                    pl.BlockSpec((1, block_k, gk * D), lambda b, hg, t, *s: (b, s[0][t], hg)),
                    pl.BlockSpec((1, block_k, gk * D), lambda b, hg, t, *s: (b, s[0][t], hg)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((G, S, D), jnp.float32),
                    pltpu.VMEM((gk * D, block_k), jnp.float32),
                    pltpu.VMEM((gk * D, block_k), jnp.float32),
                ],
            )
            dqf, dkf, dvf = pl.pallas_call(
                functools.partial(_bwd_kernel_bsd, scale=scale, causal=causal,
                                  block_q=block_q, block_k=block_k,
                                  use_segments=use_segments, q_per_kv=qpk_c,
                                  gk=gk, n_steps=Tk, head_dim=D,
                                  dropout_rate=float(dropout_rate),
                                  qpk_full=q_per_kv, head_c0=head_c0),
                grid_spec=bwd_spec,
                compiler_params=_compiler_params(interpret),
                out_shape=[
                    jax.ShapeDtypeStruct(qf.shape, q_c.dtype),
                    jax.ShapeDtypeStruct(kf.shape, k.dtype),
                    jax.ShapeDtypeStruct(vf.shape, v.dtype),
                ],
                interpret=interpret,
            )(*prefetch, q_seg_b, kv_seg_b, qf, kf, vf, dof, lse_c, delta_c)
            return (dqf.reshape(B, S, HqC, D), dkf.reshape(B, Sk, Hkv, D),
                    dvf.reshape(B, Sk, Hkv, D))

        def kv_idx2(b, hg, t, *s):
            return (b, hg, s[0][t], 0)

        def q_idx2(b, hg, t, *s):
            return (b, hg, s[3][b, t], 0)

        bwd_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(prefetch),
            grid=(B, Hkv // gk, Tk),
            in_specs=[
                pl.BlockSpec((1, block_q, LANES), lambda b, hg, t, *s: (b, s[3][b, t], 0)),
                pl.BlockSpec((1, SUBLANES, block_k), lambda b, hg, t, *s: (b, 0, s[0][t])),
                pl.BlockSpec((1, G, block_q, D), q_idx2),
                pl.BlockSpec((1, gk, block_k, D), kv_idx2),
                pl.BlockSpec((1, gk, block_k, D), kv_idx2),
                pl.BlockSpec((1, G, block_q, D), q_idx2),
                pl.BlockSpec((1, G, block_q, SUBLANES), q_idx2),
                pl.BlockSpec((1, G, block_q, SUBLANES), q_idx2),
            ],
            out_specs=[
                pl.BlockSpec((1, G, S, D), lambda b, hg, t, *s: (b, hg, 0, 0)),
                pl.BlockSpec((1, gk, block_k, D), kv_idx2),
                pl.BlockSpec((1, gk, block_k, D), kv_idx2),
            ],
            scratch_shapes=[
                pltpu.VMEM((G, S, D), jnp.float32),
                pltpu.VMEM((gk * D, block_k), jnp.float32),
                pltpu.VMEM((gk * D, block_k), jnp.float32),
            ],
        )
        return pl.pallas_call(
            functools.partial(_bwd_kernel, scale=scale, causal=causal, block_q=block_q,
                              block_k=block_k, use_segments=use_segments,
                              q_per_kv=qpk_c, gk=gk, n_steps=Tk,
                              dropout_rate=float(dropout_rate),
                              qpk_full=q_per_kv, head_c0=head_c0,
                              stacked=os.environ.get("IEVO_FLASH_BWD_STACKED", "0") == "1"),
            grid_spec=bwd_spec,
            compiler_params=_compiler_params(interpret),
            out_shape=[
                jax.ShapeDtypeStruct(q_c.shape, q_c.dtype),
                jax.ShapeDtypeStruct((B, Hkv, Sk, D), k.dtype),
                jax.ShapeDtypeStruct((B, Hkv, Sk, D), v.dtype),
            ],
            interpret=interpret,
        )(*prefetch, q_seg_b, kv_seg_b, q_c, k, v, do_c, lse_c, delta_c)

    gk, q_chunk = _pick_bwd_partition(Hkv, q_per_kv, S, block_q, block_k, D)
    if q_chunk == q_per_kv:
        dq, dk, dv = run(q, do, lse, delta, q_per_kv, gk)
    else:
        # chunk the GQA group: heads for kv head k occupy q indices
        # [k*q_per_kv, (k+1)*q_per_kv); slice per-kv-head sub-ranges
        def grouped_hm(a):  # head-major (B, Hq, ...) operands (lse/delta)
            return a.reshape(B, Hkv, q_per_kv, *a.shape[2:])

        if bsd:
            qg = q.reshape(B, S, Hkv, q_per_kv, D)
            dog = do.reshape(B, S, Hkv, q_per_kv, D)
            sel_q = lambda a, c0, c1: a[:, :, :, c0:c1].reshape(
                B, S, Hkv * (c1 - c0), D)
        else:
            qg = grouped_hm(q)
            dog = grouped_hm(do)
            sel_q = lambda a, c0, c1: a[:, :, c0:c1].reshape(
                B, Hkv * (c1 - c0), *a.shape[3:])
        lseg, deltag = grouped_hm(lse), grouped_hm(delta)
        sel_hm = lambda a, c0, c1: a[:, :, c0:c1].reshape(
            B, Hkv * (c1 - c0), *a.shape[3:])
        dq_parts, dk, dv = [], None, None
        for c0 in range(0, q_per_kv, q_chunk):
            c1 = c0 + q_chunk
            dq_c, dk_c, dv_c = run(sel_q(qg, c0, c1), sel_q(dog, c0, c1),
                                   sel_hm(lseg, c0, c1), sel_hm(deltag, c0, c1),
                                   q_chunk, 1, head_c0=c0)
            if bsd:
                dq_parts.append(dq_c.reshape(B, S, Hkv, q_chunk, D))
            else:
                dq_parts.append(dq_c.reshape(B, Hkv, q_chunk, S, D))
            dk = dk_c if dk is None else dk + dk_c
            dv = dv_c if dv is None else dv + dv_c
        if bsd:
            dq = jnp.concatenate(dq_parts, axis=3).reshape(B, S, Hq, D)
        else:
            dq = jnp.concatenate(dq_parts, axis=2).reshape(B, Hq, S, D)
    if not bsd:
        # cotangents must match the natural (B, S, H, D) primal layout
        dq = dq.transpose(0, 2, 1, 3)
        dk = dk.transpose(0, 2, 1, 3)
        dv = dv.transpose(0, 2, 1, 3)
    return dq, dk, dv, None, None, None


# --------------------------------------------------------------- public api


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12))
def _splash(q, k, v, q_seg, kv_seg, drop_seed, scale, causal, block_q, block_k,
            max_segment_len, interpret, dropout_rate):
    out, _ = _splash_forward(q, k, v, q_seg, kv_seg, scale, causal, block_q,
                             block_k, max_segment_len, interpret,
                             dropout_rate=dropout_rate, drop_seed=drop_seed)
    return out


def _splash_fwd(q, k, v, q_seg, kv_seg, drop_seed, scale, causal, block_q, block_k,
                max_segment_len, interpret, dropout_rate):
    out, lse = _splash_forward(q, k, v, q_seg, kv_seg, scale, causal, block_q,
                               block_k, max_segment_len, interpret,
                               dropout_rate=dropout_rate, drop_seed=drop_seed)
    # under jax.checkpoint with save_only_these_names(("flash_out","flash_lse")),
    # these two residuals survive remat and the backward never re-runs the
    # forward kernel (q/k/v are rebuilt by the block's cheap matmul recompute)
    from jax.ad_checkpoint import checkpoint_name

    out = checkpoint_name(out, "flash_out")
    # save the lse residual SQUEEZED to (B, Hq, S): the kernel's native
    # (B, Hq, S, 8) sublane-replicated form pads its minor dim 8 -> 128 in HBM
    # (16x memory expansion — 800MB of padding for the 50MB of stacked
    # per-layer saves at 700m shapes); backward re-broadcasts lanes for free
    lse = checkpoint_name(lse[..., 0], "flash_lse")
    return out, (q, k, v, q_seg, kv_seg, drop_seed, out, lse)


def _splash_bwd(scale, causal, block_q, block_k, max_segment_len, interpret,
                dropout_rate, res, g):
    return _splash_backward(res, g, scale=scale, causal=causal, block_q=block_q,
                            block_k=block_k, max_segment_len=max_segment_len,
                            interpret=interpret, dropout_rate=dropout_rate)


_splash.defvjp(_splash_fwd, _splash_bwd)


_DEFAULT_BQ = int(os.environ.get("IEVO_FLASH_BQ", "1024"))  # measured best at packed-7B shapes
_DEFAULT_BK = int(os.environ.get("IEVO_FLASH_BK", "1024"))


def _fit_block(S: int, want: int):
    """Largest block <= want that divides S and is a multiple of 8 (f32
    sublane); None if S has no such divisor."""
    b = min(want, S)
    while b >= 8:
        if S % b == 0 and b % 8 == 0:
            return b
        b -= 8
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12, 13))
def _splash_lse(q, k, v, q_seg, kv_seg, drop_seed, scale, causal, block_q, block_k,
                max_segment_len, interpret, cross_kv, dropout_rate):
    out, lse = _splash_forward(q, k, v, q_seg, kv_seg, scale, causal, block_q,
                               block_k, max_segment_len, interpret, cross_kv,
                               dropout_rate=dropout_rate, drop_seed=drop_seed)
    return out, lse[..., 0]


def _splash_lse_fwd(q, k, v, q_seg, kv_seg, drop_seed, scale, causal, block_q,
                    block_k, max_segment_len, interpret, cross_kv, dropout_rate):
    out, lse = _splash_forward(q, k, v, q_seg, kv_seg, scale, causal, block_q,
                               block_k, max_segment_len, interpret, cross_kv,
                               dropout_rate=dropout_rate, drop_seed=drop_seed)
    # residuals carry the squeezed (B, Hq, S) lse — see _splash_fwd on the 16x
    # HBM padding of the kernel-native (B, Hq, S, 8) layout
    return (out, lse[..., 0]), (q, k, v, q_seg, kv_seg, drop_seed, out, lse[..., 0])


def _splash_lse_bwd(scale, causal, block_q, block_k, max_segment_len, interpret,
                    cross_kv, dropout_rate, res, g):
    do, dlse = g
    return _splash_backward(res, do, scale=scale, causal=causal, block_q=block_q,
                            block_k=block_k, max_segment_len=max_segment_len,
                            interpret=interpret, dlse=dlse, cross_kv=cross_kv,
                            dropout_rate=dropout_rate)


_splash_lse.defvjp(_splash_lse_fwd, _splash_lse_bwd)


def splash_attention_with_lse(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    softmax_scale: Optional[float] = None,
    causal: bool = True,
    block_q: int = None,
    block_k: int = None,
    max_segment_len: Optional[int] = None,
    interpret: Optional[bool] = None,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,
):
    """Like ``splash_attention`` but returns (out (B,S,Hq,D), lse (B,Hq,S))
    with a differentiable lse — the building block for ring attention, where
    partial chunk results merge by log-sum-exp.  ``kv_segment_ids`` may differ
    from ``segment_ids`` (rotated kv chunks); in that case segment windows are
    disabled and only the elementwise masks apply.

    Dropout composes EXACTLY with the lse merge: the kernel masks the pv
    accumulation while the softmax denominator (and lse) sum the UNdropped
    probs, so merged legs reproduce dropout(softmax(s_global)) @ v as long as
    every leg hashes GLOBAL coordinates — pass the (5,) seed vector with this
    leg's row/col offsets (``_norm_seed``)."""
    B, S, Hq, D = q.shape
    scale = softmax_scale if softmax_scale is not None else D**-0.5
    interpret = _interpret_default() if interpret is None else interpret
    block_q = _fit_block(S, block_q or _DEFAULT_BQ)
    block_k = _fit_block(k.shape[1], block_k or _DEFAULT_BK)
    assert block_q is not None and block_k is not None, (S, k.shape[1])
    cross = kv_segment_ids is not None and kv_segment_ids is not segment_ids
    if kv_segment_ids is None:
        kv_segment_ids = segment_ids
    if dropout_rate > 0.0:
        assert dropout_seed is not None, "attention dropout needs dropout_seed"
    # rate 0 must stay operand-identical to a dropout-free kernel (bit-exact
    # and free): no seed rides through the vjp or the scalar prefetch
    seed_arr = _norm_seed(dropout_seed) if dropout_rate > 0.0 else None
    out, lse = _splash_lse(q, k, v, segment_ids, kv_segment_ids, seed_arr,
                           scale, causal, block_q, block_k, max_segment_len,
                           interpret, cross, float(dropout_rate))
    return out, lse


def splash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    segment_ids: Optional[jax.Array] = None,
    softmax_scale: Optional[float] = None,
    causal: bool = True,
    block_q: int = _DEFAULT_BQ,
    block_k: int = _DEFAULT_BK,
    max_segment_len: Optional[int] = None,
    interpret: Optional[bool] = None,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jax.Array] = None,
) -> jax.Array:
    """q: (B, S, Hq, D); k/v: (B, Sk, Hkv, D); segment_ids: (B, S) int32.

    ``max_segment_len``: static upper bound on any packed segment's length
    (``data.seq_len`` / ``max_length_per_sample`` in the training config).
    Required for the zero-step segment skipping; without it the kernel still
    flattens away the causal half.  Passing a bound SMALLER than an actual
    segment silently truncates attention — the data pipeline guarantees the
    bound, and ``tests/test_ops/test_splash_attention.py`` pins the contract.
    """
    B, S, Hq, D = q.shape
    scale = softmax_scale if softmax_scale is not None else D**-0.5
    interpret = _interpret_default() if interpret is None else interpret
    # the flattened grid and segment-window indexing require the blocks to
    # DIVIDE the sequence lengths (the old dense-grid kernel padded with cdiv);
    # shrink to the largest sublane-aligned divisor, or fall back to the jnp
    # reference for pathological lengths (odd eval paddings)
    if dropout_rate > 0.0:
        # BEFORE the dense fallback: a None seed there would silently draw
        # the fixed seed-0 mask every step instead of failing loudly
        assert dropout_seed is not None, "attention dropout needs dropout_seed"
    block_q = _fit_block(S, block_q)
    block_k = _fit_block(k.shape[1], block_k)
    if block_q is None or block_k is None:
        from ..attention import attention_reference

        key = (S, k.shape[1])
        if key not in _FALLBACK_LOGGED:  # log once per shape: the dense
            _FALLBACK_LOGGED.add(key)    # O(S^2) path silently eats evals
            import logging

            logging.getLogger(__name__).warning(
                "splash_attention: no sublane-aligned block divides seq lens "
                "%s — falling back to the dense jnp reference path", key)
        return attention_reference(q, k, v, segment_ids=segment_ids,
                                   softmax_scale=scale, causal=causal,
                                   dropout_rate=dropout_rate,
                                   dropout_seed=dropout_seed)
    seed_arr = _norm_seed(dropout_seed) if dropout_rate > 0.0 else None
    return _splash(q, k, v, segment_ids, segment_ids, seed_arr, scale, causal,
                   block_q, block_k, max_segment_len, interpret,
                   float(dropout_rate))
