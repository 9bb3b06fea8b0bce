"""Flash attention for TPU in Pallas: causal + packed-segment masking + GQA.

This is the TPU-native replacement for the reference's flash-attn CUDA varlen
kernels (``flash_attn_varlen_kvpacked_func`` used at
``internlm/model/modules/multi_head_attention.py:568-582``).  Packed sequences
are described by dense per-token segment ids (1-based; see
``data/collaters.cu_seqlens_to_segment_ids``) instead of cu_seqlens; attention
is masked to (causal AND same-segment).

Design (online-softmax flash attention):
- layout (B, H, S, D): TPU tiling constrains the last two block dims, so the
  head axis sits at -3 with block 1; segment ids are lane/sublane-broadcast
  ((B, S, 128) for q, (B, 8, Sk) for kv) to satisfy the (8, 128) tile rule.
- forward: grid (B, Hq, Sq/bq, Sk/bk); fp32 accumulator and running row-max/
  row-sum in VMEM scratch carried across the innermost kv grid dim; kv blocks
  fully above the causal diagonal are skipped.  Saves logsumexp (B, Hq, S, 128).
- backward: the standard flash-attn two-kernel split:
  dq:  grid (B, Hq, Sq/bq, Sk/bk) accumulating dq over kv blocks;
  dkv: grid (B, Hkv, Sk/bk, q_per_kv, Sq/bq) accumulating dk/dv over the q
       heads of the GQA group and q blocks (kv output blocks are revisited
       consecutively — the TPU output-revisit rule).
  Both recompute p = exp(qk - lse) blockwise; delta = rowsum(do * o) is
  precomputed outside (XLA fuses it).

All matmuls run on the MXU with fp32 ``preferred_element_type``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
NEG_INF = -jnp.inf
LANES = 128
SUBLANES = 8


def _interpret_default() -> bool:
    return jax.default_backend() == "cpu"


def _block_should_run(q_start, k_start, block_q, block_k, causal, use_segments,
                      q_seg_ref, kv_seg_ref):
    """Whole-block skip condition: causal (block fully above the diagonal) and
    segment-range overlap ([q_min, q_max] ∩ [kv_min, kv_max] ≠ ∅) — the
    cu_seqlens compute-skipping of the reference's varlen kernels.  The range
    is computed with min/max over the whole block (NOT first/last element):
    eval batches pad with segment id 0 *after* the real ids, so ids are not
    monotonic within a block and first/last would falsely skip real work."""
    run = jnp.asarray(True)
    if causal:
        run = jnp.logical_and(run, q_start + block_q - 1 >= k_start)
    if use_segments:
        q_col = q_seg_ref[0, :, 0]
        kv_row = kv_seg_ref[0, 0, :]
        q_min, q_max = jnp.min(q_col), jnp.max(q_col)
        kv_min, kv_max = jnp.min(kv_row), jnp.max(kv_row)
        run = jnp.logical_and(run, jnp.logical_and(q_max >= kv_min, q_min <= kv_max))
    return run


def _block_mask(q_start, k_start, block_q, block_k, causal, use_segments,
                q_seg_ref, kv_seg_ref):
    mask = None
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) + q_start
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + k_start
        mask = rows >= cols
    if use_segments:
        q_seg = q_seg_ref[0, :, 0][:, None]      # (bq, 1)
        kv_seg = kv_seg_ref[0, 0, :][None, :]    # (1, bk)
        seg_mask = q_seg == kv_seg
        mask = seg_mask if mask is None else jnp.logical_and(mask, seg_mask)
    return mask


# ------------------------------------------------------------------ forward


def _fwd_kernel(
    q_seg_ref, kv_seg_ref,
    q_ref, k_ref, v_ref,            # (1, 1, bq, D), (1, 1, bk, D)
    o_ref,                          # (1, 1, bq, D)
    lse_ref,                        # (1, 1, bq, LANES)
    acc_sc, m_sc, l_sc,             # scratch: (bq, D), (bq, LANES), (bq, LANES) f32
    *, scale: float, causal: bool, block_q: int, block_k: int, use_segments: bool,
):
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        acc_sc[:] = jnp.zeros_like(acc_sc)
        m_sc[:] = jnp.full_like(m_sc, NEG_INF)
        l_sc[:] = jnp.zeros_like(l_sc)

    q_start = iq * block_q
    k_start = ik * block_k
    should_run = _block_should_run(q_start, k_start, block_q, block_k, causal,
                                   use_segments, q_seg_ref, kv_seg_ref)

    @pl.when(should_run)
    def _compute():
        q = q_ref[0, 0, :, :]
        k = k_ref[0, 0, :, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (bq, bk)

        mask = _block_mask(q_start, k_start, block_q, block_k, causal, use_segments,
                           q_seg_ref, kv_seg_ref)
        if mask is not None:
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_sc[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        # Rows with no unmasked entry so far have m_new == DEFAULT_MASK_VALUE,
        # making p == exp(0) == 1 for every masked entry; zero those rows so l
        # stays 0 and finalize emits zeros/-inf instead of an average of v.
        p = jnp.where(m_new > 0.5 * DEFAULT_MASK_VALUE, p, 0.0)
        correction = jnp.exp(m_prev - m_new)
        l_new = l_sc[:, :1] * correction + jnp.sum(p, axis=1, keepdims=True)

        v = v_ref[0, 0, :, :]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        acc_sc[:] = acc_sc[:] * correction + pv
        m_sc[:] = jnp.broadcast_to(m_new, m_sc.shape)
        l_sc[:] = jnp.broadcast_to(l_new, l_sc.shape)

    @pl.when(ik == nk - 1)
    def _finalize():
        l = l_sc[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)  # fully-masked rows emit zeros, not NaNs
        o_ref[0, 0, :, :] = (acc_sc[:] / l_safe).astype(o_ref.dtype)
        m = m_sc[:, :1]
        lse = jnp.where(l == 0.0, NEG_INF, m + jnp.log(l_safe))
        lse_ref[0, 0, :, :] = jnp.broadcast_to(lse, lse_ref[0, 0].shape)


def _broadcast_segs(q_seg, kv_seg, B, S, Sk):
    q_seg_b = jax.lax.broadcast_in_dim(q_seg, (B, S, LANES), (0, 1))
    kv_seg_b = jax.lax.broadcast_in_dim(kv_seg, (B, SUBLANES, Sk), (0, 2))
    return q_seg_b, kv_seg_b


def _flash_forward(q, k, v, q_seg, kv_seg, scale, causal, block_q, block_k, interpret):
    """q: (B, Hq, S, D); k/v: (B, Hkv, Sk, D); q_seg: (B, S)."""
    B, Hq, S, D = q.shape
    Hkv, Sk = k.shape[1], k.shape[2]
    q_per_kv = Hq // Hkv
    nq, nk = pl.cdiv(S, block_q), pl.cdiv(Sk, block_k)
    use_segments = q_seg is not None
    if q_seg is None:
        q_seg = jnp.zeros((B, S), jnp.int32)
        kv_seg = jnp.zeros((B, Sk), jnp.int32)
    q_seg_b, kv_seg_b = _broadcast_segs(q_seg, kv_seg, B, S, Sk)

    kernel = functools.partial(
        _fwd_kernel, scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        use_segments=use_segments,
    )

    def kv_block_idx(iq, ik):
        """Above-diagonal kv blocks are skipped by the kernel; clamp their block
        index so the pipeline re-fetches nothing (the bundled jax kernel's
        next_kv_index trick).  Measured gain is small (~3% at S=4096) — skipped
        grid steps still pay fixed per-iteration latency; eliminating them
        entirely needs a splash-style flattened grid with scalar-prefetched
        per-row block counts (round-2 item)."""
        if not causal:
            return ik
        last_useful = ((iq + 1) * block_q - 1) // block_k
        return jnp.minimum(ik, last_useful)

    out, lse = pl.pallas_call(
        kernel,
        grid=(B, Hq, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, LANES), lambda b, h, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, SUBLANES, block_k), lambda b, h, iq, ik: (b, 0, kv_block_idx(iq, ik))),
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, iq, ik: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, iq, ik: (b, h // q_per_kv, kv_block_idx(iq, ik), 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, iq, ik: (b, h // q_per_kv, kv_block_idx(iq, ik), 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, iq, ik: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, block_q, LANES), lambda b, h, iq, ik: (b, h, iq, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((B, Hq, S, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(q_seg_b, kv_seg_b, q, k, v)
    return out, lse


# ------------------------------------------------------------------ backward


def _dq_kernel(
    q_seg_ref, kv_seg_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref,
    dq_sc,
    *, scale: float, causal: bool, block_q: int, block_k: int, use_segments: bool,
):
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        dq_sc[:] = jnp.zeros_like(dq_sc)

    q_start = iq * block_q
    k_start = ik * block_k
    should_run = _block_should_run(q_start, k_start, block_q, block_k, causal,
                                   use_segments, q_seg_ref, kv_seg_ref)

    @pl.when(should_run)
    def _compute():
        q = q_ref[0, 0, :, :]
        k = k_ref[0, 0, :, :]
        v = v_ref[0, 0, :, :]
        do = do_ref[0, 0, :, :].astype(jnp.float32)
        lse = lse_ref[0, 0, :, :1]
        delta = delta_ref[0, 0, :, :1]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        mask = _block_mask(q_start, k_start, block_q, block_k, causal, use_segments,
                           q_seg_ref, kv_seg_ref)
        p = jnp.exp(s - lse)
        if mask is not None:
            p = jnp.where(mask, p, 0.0)
        dp = jax.lax.dot_general(do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        dq_sc[:] += jax.lax.dot_general(ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    @pl.when(ik == nk - 1)
    def _finalize():
        dq_ref[0, 0, :, :] = dq_sc[:].astype(dq_ref.dtype)


def _dkv_kernel(
    q_seg_ref, kv_seg_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_sc, dv_sc,
    *, scale: float, causal: bool, block_q: int, block_k: int, use_segments: bool,
    q_per_kv: int,
):
    # grid: (B, Hkv, ik, g, iq); g = q head within the kv group
    ik = pl.program_id(2)
    g = pl.program_id(3)
    iq = pl.program_id(4)
    nq = pl.num_programs(4)

    @pl.when(jnp.logical_and(g == 0, iq == 0))
    def _init():
        dk_sc[:] = jnp.zeros_like(dk_sc)
        dv_sc[:] = jnp.zeros_like(dv_sc)

    q_start = iq * block_q
    k_start = ik * block_k
    should_run = _block_should_run(q_start, k_start, block_q, block_k, causal,
                                   use_segments, q_seg_ref, kv_seg_ref)

    @pl.when(should_run)
    def _compute():
        q = q_ref[0, 0, :, :]
        k = k_ref[0, 0, :, :]
        v = v_ref[0, 0, :, :]
        do = do_ref[0, 0, :, :].astype(jnp.float32)
        lse = lse_ref[0, 0, :, :1]
        delta = delta_ref[0, 0, :, :1]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        mask = _block_mask(q_start, k_start, block_q, block_k, causal, use_segments,
                           q_seg_ref, kv_seg_ref)
        p = jnp.exp(s - lse)
        if mask is not None:
            p = jnp.where(mask, p, 0.0)
        dv_sc[:] += jax.lax.dot_general(p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        dk_sc[:] += jax.lax.dot_general(ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_and(g == q_per_kv - 1, iq == nq - 1))
    def _finalize():
        dk_ref[0, 0, :, :] = dk_sc[:].astype(dk_ref.dtype)
        dv_ref[0, 0, :, :] = dv_sc[:].astype(dv_ref.dtype)


def _flash_backward(res, g, *, scale, causal, block_q, block_k, interpret, dlse=None):
    q, k, v, q_seg, kv_seg, out, lse = res
    do = g
    B, Hq, S, D = q.shape
    Hkv, Sk = k.shape[1], k.shape[2]
    q_per_kv = Hq // Hkv
    nq, nk = pl.cdiv(S, block_q), pl.cdiv(Sk, block_k)
    use_segments = q_seg is not None
    if q_seg is None:
        q_seg = jnp.zeros((B, S), jnp.int32)
        kv_seg = jnp.zeros((B, Sk), jnp.int32)
    q_seg_b, kv_seg_b = _broadcast_segs(q_seg, kv_seg, B, S, Sk)

    # delta = rowsum(do * o): cheap elementwise, XLA fuses; broadcast to lanes.
    # A cotangent on the lse output folds in here: dL/ds_ij has the extra term
    # p_ij * dlse_i, i.e. delta_eff = delta - dlse.
    delta = jnp.einsum("bhsd,bhsd->bhs", do.astype(jnp.float32), out.astype(jnp.float32))
    if dlse is not None:
        delta = delta - dlse.astype(jnp.float32)
    delta = jax.lax.broadcast_in_dim(delta, (B, Hq, S, LANES), (0, 1, 2))

    def qspec(idx_map):
        return pl.BlockSpec((1, 1, block_q, D), idx_map)

    def kv_block_idx(iq, ik):
        # see _flash_forward: don't DMA kv blocks the kernel will skip
        if not causal:
            return ik
        return jnp.minimum(ik, ((iq + 1) * block_q - 1) // block_k)

    def q_block_idx(ik, iq):
        # dkv: q blocks fully above the diagonal are skipped; clamp the fetch
        if not causal:
            return iq
        return jnp.maximum(iq, (ik * block_k) // block_q)

    dq_in_specs = [
        pl.BlockSpec((1, block_q, LANES), lambda b, h, iq, ik: (b, iq, 0)),
        pl.BlockSpec((1, SUBLANES, block_k), lambda b, h, iq, ik: (b, 0, kv_block_idx(iq, ik))),
        qspec(lambda b, h, iq, ik: (b, h, iq, 0)),
        pl.BlockSpec((1, 1, block_k, D), lambda b, h, iq, ik: (b, h // q_per_kv, kv_block_idx(iq, ik), 0)),
        pl.BlockSpec((1, 1, block_k, D), lambda b, h, iq, ik: (b, h // q_per_kv, kv_block_idx(iq, ik), 0)),
        qspec(lambda b, h, iq, ik: (b, h, iq, 0)),
        pl.BlockSpec((1, 1, block_q, LANES), lambda b, h, iq, ik: (b, h, iq, 0)),
        pl.BlockSpec((1, 1, block_q, LANES), lambda b, h, iq, ik: (b, h, iq, 0)),
    ]
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, causal=causal,
                          block_q=block_q, block_k=block_k, use_segments=use_segments),
        grid=(B, Hq, nq, nk),
        in_specs=dq_in_specs,
        out_specs=[pl.BlockSpec((1, 1, block_q, D), lambda b, h, iq, ik: (b, h, iq, 0))],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)],
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        interpret=interpret,
    )(q_seg_b, kv_seg_b, q, k, v, do, lse, delta)[0]

    dkv_in_specs = [
        pl.BlockSpec((1, block_q, LANES), lambda b, hk, ik, gg, iq: (b, q_block_idx(ik, iq), 0)),
        pl.BlockSpec((1, SUBLANES, block_k), lambda b, hk, ik, gg, iq: (b, 0, ik)),
        pl.BlockSpec((1, 1, block_q, D), lambda b, hk, ik, gg, iq: (b, hk * q_per_kv + gg, q_block_idx(ik, iq), 0)),
        pl.BlockSpec((1, 1, block_k, D), lambda b, hk, ik, gg, iq: (b, hk, ik, 0)),
        pl.BlockSpec((1, 1, block_k, D), lambda b, hk, ik, gg, iq: (b, hk, ik, 0)),
        pl.BlockSpec((1, 1, block_q, D), lambda b, hk, ik, gg, iq: (b, hk * q_per_kv + gg, q_block_idx(ik, iq), 0)),
        pl.BlockSpec((1, 1, block_q, LANES), lambda b, hk, ik, gg, iq: (b, hk * q_per_kv + gg, q_block_idx(ik, iq), 0)),
        pl.BlockSpec((1, 1, block_q, LANES), lambda b, hk, ik, gg, iq: (b, hk * q_per_kv + gg, q_block_idx(ik, iq), 0)),
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, causal=causal,
                          block_q=block_q, block_k=block_k, use_segments=use_segments,
                          q_per_kv=q_per_kv),
        grid=(B, Hkv, nk, q_per_kv, nq),
        in_specs=dkv_in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, block_k, D), lambda b, hk, ik, gg, iq: (b, hk, ik, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, hk, ik, gg, iq: (b, hk, ik, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        interpret=interpret,
    )(q_seg_b, kv_seg_b, q, k, v, do, lse, delta)
    return dq, dk, dv, None, None


# ------------------------------------------------------------------ public api


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash_attention(q, k, v, q_seg, kv_seg, scale, causal, block_q, block_k, interpret):
    out, _ = _flash_forward(q, k, v, q_seg, kv_seg, scale, causal, block_q, block_k, interpret)
    return out


def _flash_attention_fwd(q, k, v, q_seg, kv_seg, scale, causal, block_q, block_k, interpret):
    out, lse = _flash_forward(q, k, v, q_seg, kv_seg, scale, causal, block_q, block_k, interpret)
    return out, (q, k, v, q_seg, kv_seg, out, lse)


def _flash_attention_bwd(scale, causal, block_q, block_k, interpret, res, g):
    return _flash_backward(res, g, scale=scale, causal=causal,
                           block_q=block_q, block_k=block_k, interpret=interpret)


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash_attention_lse(q, k, v, q_seg, kv_seg, scale, causal, block_q, block_k, interpret):
    out, lse = _flash_forward(q, k, v, q_seg, kv_seg, scale, causal, block_q, block_k, interpret)
    return out, lse[..., 0]


def _flash_attention_lse_fwd(q, k, v, q_seg, kv_seg, scale, causal, block_q, block_k, interpret):
    out, lse = _flash_forward(q, k, v, q_seg, kv_seg, scale, causal, block_q, block_k, interpret)
    return (out, lse[..., 0]), (q, k, v, q_seg, kv_seg, out, lse)


def _flash_attention_lse_bwd(scale, causal, block_q, block_k, interpret, res, g):
    do, dlse = g
    return _flash_backward(res, do, scale=scale, causal=causal,
                           block_q=block_q, block_k=block_k, interpret=interpret, dlse=dlse)


_flash_attention_lse.defvjp(_flash_attention_lse_fwd, _flash_attention_lse_bwd)


def flash_attention_with_lse(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    softmax_scale: Optional[float] = None,
    causal: bool = True,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: Optional[bool] = None,
):
    """Like ``flash_attention`` but returns (out (B,S,Hq,D), lse (B,Hq,S)) with
    a differentiable lse — the building block for ring attention, where partial
    chunk results are merged by log-sum-exp (``parallel/ring_attention.py``).
    ``kv_segment_ids`` may differ from ``segment_ids`` (rotated kv chunks)."""
    B, S, Hq, D = q.shape
    scale = softmax_scale if softmax_scale is not None else D**-0.5
    interpret = _interpret_default() if interpret is None else interpret
    block_q = min(block_q, S)
    block_k = min(block_k, k.shape[1])
    if kv_segment_ids is None:
        kv_segment_ids = segment_ids
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out, lse = _flash_attention_lse(qt, kt, vt, segment_ids, kv_segment_ids, scale, causal,
                                    block_q, block_k, interpret)
    return out.transpose(0, 2, 1, 3), lse


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    segment_ids: Optional[jax.Array] = None,
    softmax_scale: Optional[float] = None,
    causal: bool = True,
    block_q: int = 512,
    block_k: int = 1024,  # measured best on v5e (60 TFLOPS at B4 S2048 H16 D128)
    interpret: Optional[bool] = None,
) -> jax.Array:
    """q: (B, S, Hq, D); k/v: (B, Sk, Hkv, D); segment_ids: (B, S) int32.

    The model-side layout is (B, S, H, D); the kernel computes in (B, H, S, D)
    (TPU tiling wants S x D as the trailing dims) — XLA fuses the transposes
    into the surrounding projections.  Sequence lengths must divide by the
    block sizes (block sizes auto-shrink to S when S is small).
    """
    B, S, Hq, D = q.shape
    scale = softmax_scale if softmax_scale is not None else D**-0.5
    interpret = _interpret_default() if interpret is None else interpret
    block_q = min(block_q, S)
    block_k = min(block_k, k.shape[1])
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = _flash_attention(qt, kt, vt, segment_ids, segment_ids, scale, causal,
                           block_q, block_k, interpret)
    return out.transpose(0, 2, 1, 3)
