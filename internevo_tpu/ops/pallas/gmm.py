"""Grouped matmul (Megablox/"gmm") pallas kernel for dropless MoE.

The hot op of the dropless MoE path (``models/moe/dropless.py``): rows sorted
by routed expert hit their expert's weight matrix,

    out[i, :] = x[i, :] @ w[g(i), :, :]        (g nondecreasing over rows)

Parity: the reference's MegaBlocks CUDA/stk sparse matmuls
(``internlm/model/moe/megablock/megablock_dmoe.py``).  XLA's own
``lax.ragged_dot`` lowers to E masked DENSE matmuls over ALL rows (41 TF
standalone at the moe-bench fwd shape vs this kernel's 59 TF — 1.4x), and
the stock megablox pallas kernel drowns its small default tiles in the ~3us
fixed grid-step cost (8-30 TF measured).  This kernel takes the opposite
corner of the design space, the same trade the splash kernel makes: BIG tiles
(whole contraction dim, feature blocks as large as VMEM allows, up to
2048-row m-tiles) so each grid step is one large MXU contraction, and a FLAT
logical grid with scalar-prefetched metadata so zero-work (tile, group) pairs
never become grid steps.
(E2E note, `doc/perf_notes.md`: inside the full moe bench step XLA schedules
ragged_dot to a similar effective rate, so the e2e A/B is a wash at the
1024x2816 E=8 bench shapes; the standalone margin grows with E and hidden.)

Logical grid: sorted rows mean an m-tile of ``tm`` rows spans a CONTIGUOUS
run of groups, and a group spilling out of tile i is by construction the
first group of tile i+1.  Enumerating overlapping (tile, group) pairs in
(tile, group) order therefore yields at most ``n/tm + E - 1`` entries, where
entries sharing a tile are consecutive AND entries sharing a group are
consecutive — one enumeration serves all three products:

- ``gmm``   (fwd / dgrad): out tile indexed by tile id; each row belongs to
  exactly one group, so revisits write DISJOINT masked row ranges.
- ``tgmm``  (wgrad): out tile indexed by group id; revisits accumulate the
  group's partial (K, N) products in f32 while the block stays VMEM-resident.

Feature tiling (round 5): at 7B-class expert shapes the whole-K/whole-N
design OOMs VMEM (measured: 155.95M of 128M at K=2048, N=5632 — 44M
double-buffered weight window + 44M output window + ~52M f32 accumulator
spill).  The output-feature dim is therefore tiled into ``fb``-wide blocks
chosen by an explicit VMEM model (double buffering + accumulator + masked-x
scratch); the grid becomes ``(F/fb, T)`` with the feature sweep OUTER so the
flat logical grid's consecutive-revisit accumulation contract is preserved
verbatim inside each sweep.  ``_plan`` picks (tm, fb) by minimizing modeled
HBM traffic among all fitting candidates.

Rows are padded to a tile multiple and assigned to the LAST group (padded x
rows are zero, so they contribute nothing to any product).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _budget_bytes() -> int:
    """Planning budget (headroom below the 128M physical VMEM for model
    error: the compiler's accumulator spill and metadata aren't exact)."""
    return int(os.environ.get("IEVO_GMM_VMEM_LIMIT_MB", "100")) * 2**20


def _compiler_params(interpret: bool):
    if interpret:
        return None
    # let the compiler use physical VMEM; _plan_* keeps the modeled usage
    # under the (smaller) planning budget
    return pltpu.CompilerParams(vmem_limit_bytes=128 * 2**20)


def _metadata(group_sizes: jax.Array, n_pad: int, tm: int):
    """Logical-tile tables (all int32, shape (T,)) for the flat grid.

    T = n_pad//tm + E - 1 is the static upper bound on overlapping
    (tile, group) pairs; unused trailing entries get empty row ranges (their
    masked contribution is exactly zero) and point at the last tile/group so
    every index stays in range."""
    E = group_sizes.shape[0]
    m_tiles = n_pad // tm
    T = m_tiles + E - 1
    gs = group_sizes.astype(jnp.int32)
    # padded rows belong to the last group
    gs = gs.at[E - 1].add(jnp.int32(n_pad) - jnp.sum(gs))
    ends = jnp.cumsum(gs)
    starts = ends - gs
    nonempty = gs > 0
    fg = jnp.where(nonempty, starts // tm, 0)
    lg = jnp.where(nonempty, (ends - 1) // tm, -1)
    cnt = jnp.where(nonempty, lg - fg + 1, 0)
    off = jnp.cumsum(cnt)
    total = off[-1]

    t = jnp.arange(T, dtype=jnp.int32)
    g = jnp.searchsorted(off, t, side="right").astype(jnp.int32)
    g = jnp.minimum(g, E - 1)
    prev = jnp.where(g > 0, off[jnp.maximum(g - 1, 0)], 0)
    tile = fg[g] + (t - prev)
    valid = t < total
    tile = jnp.where(valid, tile, m_tiles - 1).astype(jnp.int32)
    group = jnp.where(valid, g, E - 1).astype(jnp.int32)
    row_start = jnp.where(valid, jnp.maximum(starts[group], tile * tm), 0)
    row_end = jnp.where(valid, jnp.minimum(ends[group], (tile + 1) * tm), 0)

    one = jnp.ones((1,), jnp.int32)
    first_tile = jnp.concatenate([one, (tile[1:] != tile[:-1]).astype(jnp.int32)])
    first_group = jnp.concatenate([one, (group[1:] != group[:-1]).astype(jnp.int32)])
    return (tile, group, row_start.astype(jnp.int32), row_end.astype(jnp.int32),
            first_tile, first_group)


def _row_mask(row_start, row_end, tile, tm):
    rows = jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0) + tile * tm
    return (rows >= row_start) & (rows < row_end)


def _gmm_kernel(tiles, groups, row_starts, row_ends, first_tile, _fg,
                x_ref, w_ref, o_ref, *, tm, transpose_rhs):
    t = pl.program_id(1)

    # padding entries of the T = m_tiles + E - 1 logical grid have empty row
    # ranges: skip their dot entirely (with balanced groups they are ~half
    # the grid — computing them masked would halve throughput).  Every tile
    # has at least one REAL entry (padded rows belong to the last group), so
    # the init store below always runs for each output tile.
    @pl.when(row_ends[t] > row_starts[t])
    def _work():
        mask = _row_mask(row_starts[t], row_ends[t], tiles[t], tm)
        x = jnp.where(mask, x_ref[...], 0)
        w = w_ref[0]
        dims = (((1,), (1,)), ((), ())) if transpose_rhs else (((1,), (0,)), ((), ()))
        acc = jax.lax.dot_general(x, w, dims, preferred_element_type=jnp.float32)
        acc = acc.astype(o_ref.dtype)

        @pl.when(first_tile[t] == 1)
        def _init():
            o_ref[...] = acc

        @pl.when(first_tile[t] == 0)
        def _accum():
            # rows are owned by exactly one group: revisits add DISJOINT
            # masked row ranges (acc is zero elsewhere) — exact in any dtype
            o_ref[...] += acc


def _tgmm_kernel(tiles, groups, row_starts, row_ends, _ft, first_group,
                 x_ref, dy_ref, o_ref, *, tm):
    t = pl.program_id(1)

    @pl.when(row_ends[t] > row_starts[t])
    def _work():
        mask = _row_mask(row_starts[t], row_ends[t], tiles[t], tm)
        x = jnp.where(mask, x_ref[...], 0)
        dy = dy_ref[...]
        acc = jax.lax.dot_general(x, dy, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)

        @pl.when(first_group[t] == 1)
        def _init():
            o_ref[0] = acc

        @pl.when(first_group[t] == 0)
        def _accum():
            o_ref[0] += acc


_TM_CANDIDATES = (2048, 1024, 512, 256, 128)


def _fb_candidates(F: int):
    """Lane-aligned divisors of the feature dim, descending (whole-F first)."""
    return [fb for fb in range(F, _LANES - 1, -_LANES)
            if fb % _LANES == 0 and F % fb == 0]


def _plan_gmm(n: int, Kc: int, F: int, E: int, xb: int, wb: int, ob: int):
    """Pick (tm, fb) for fwd/dgrad: whole-Kc contraction, fb-wide feature
    blocks.  Fit model counts Pallas's 2-level window buffering, the f32
    accumulator (lives in vregs/spill), and the masked-x scratch copy; among
    fitting candidates the modeled HBM traffic is minimized."""
    best = None
    for tm in _TM_CANDIDATES:
        if n < tm and tm != _TM_CANDIDATES[-1]:
            continue
        n_pad = ((n + tm - 1) // tm) * tm
        T = n_pad // tm + E - 1
        for fb in _fb_candidates(F):
            vmem = (2 * tm * Kc * xb + 2 * Kc * fb * wb + 2 * tm * fb * ob
                    + tm * fb * 4 + tm * Kc * xb)
            if vmem >= _budget_bytes():
                continue
            sweeps = F // fb
            traffic = (sweeps * (T * Kc * fb * wb + n_pad * Kc * xb)
                       + n_pad * F * ob)
            if best is None or traffic < best[0]:
                best = (traffic, tm, fb)
    return None if best is None else best[1:]


def _plan_tgmm(n: int, K: int, N: int, E: int, xb: int, yb: int):
    """Pick (tm, nb) for wgrad: whole-K rows-contraction, nb-wide dy/out
    blocks.  The (1, K, nb) f32 output window double-buffers too."""
    best = None
    for tm in _TM_CANDIDATES:
        if n < tm and tm != _TM_CANDIDATES[-1]:
            continue
        n_pad = ((n + tm - 1) // tm) * tm
        for nb in _fb_candidates(N):
            vmem = (2 * tm * K * xb + 2 * tm * nb * yb + 2 * K * nb * 4
                    + K * nb * 4 + tm * K * xb)
            if vmem >= _budget_bytes():
                continue
            sweeps = N // nb
            traffic = sweeps * n_pad * (K * xb + nb * yb) + E * K * N * 4
            if best is None or traffic < best[0]:
                best = (traffic, tm, nb)
    return None if best is None else best[1:]


def _pad_rows(a, n_pad):
    n = a.shape[0]
    return a if n == n_pad else jnp.pad(a, ((0, n_pad - n), (0, 0)))


def gmm_supported(n: int, K: int, N: int, E: int) -> bool:
    """True iff the fwd, dgrad, and wgrad legs all have a (tm, fb) plan
    inside the VMEM budget (bf16 operands assumed — the production dtype).
    Shapes beyond it should fall back to ``lax.ragged_dot``."""
    if K % _LANES or N % _LANES or E < 2:
        return False
    return (_plan_gmm(n, K, N, E, 2, 2, 2) is not None        # fwd
            and _plan_gmm(n, N, K, E, 2, 2, 2) is not None    # dgrad
            and _plan_tgmm(n, K, N, E, 2, 2) is not None)     # wgrad


def _gmm_call(x, w, group_sizes, *, transpose_rhs: bool, out_dtype,
              interpret: bool):
    n, _ = x.shape
    E = w.shape[0]
    # contraction dim / output-feature dim of THIS call (w stays (E, K, N))
    Kc, F = (w.shape[2], w.shape[1]) if transpose_rhs else (w.shape[1], w.shape[2])
    xb = jnp.dtype(x.dtype).itemsize
    plan = _plan_gmm(n, Kc, F, E, xb, jnp.dtype(w.dtype).itemsize,
                     jnp.dtype(out_dtype).itemsize)
    if plan is None:
        raise ValueError(
            f"gmm: no (tm, fb) plan fits VMEM for n={n} Kc={Kc} F={F} E={E}; "
            "guard the call site with gmm_supported() / use lax.ragged_dot")
    tm, fb = plan
    n_pad = ((n + tm - 1) // tm) * tm
    xp = _pad_rows(x, n_pad)
    meta = _metadata(group_sizes, n_pad, tm)
    T = n_pad // tm + E - 1

    if transpose_rhs:
        w_spec = pl.BlockSpec((1, fb, Kc), lambda f, t, *s: (s[1][t], f, 0))
    else:
        w_spec = pl.BlockSpec((1, Kc, fb), lambda f, t, *s: (s[1][t], 0, f))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        # feature sweep OUTER: inside each sweep the flat logical grid keeps
        # its consecutive-revisit accumulation contract
        grid=(F // fb, T),
        in_specs=[
            pl.BlockSpec((tm, Kc), lambda f, t, *s: (s[0][t], 0)),
            w_spec,
        ],
        out_specs=pl.BlockSpec((tm, fb), lambda f, t, *s: (s[0][t], f)),
    )
    out = pl.pallas_call(
        functools.partial(_gmm_kernel, tm=tm, transpose_rhs=transpose_rhs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, F), out_dtype),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(*meta, xp, w)
    return out[:n]


def _tgmm_call(x, dy, group_sizes, E, *, interpret: bool):
    n, K = x.shape
    N = dy.shape[1]
    plan = _plan_tgmm(n, K, N, E, jnp.dtype(x.dtype).itemsize,
                      jnp.dtype(dy.dtype).itemsize)
    if plan is None:
        raise ValueError(
            f"tgmm: no (tm, nb) plan fits VMEM for n={n} K={K} N={N} E={E}; "
            "guard the call site with gmm_supported() / use lax.ragged_dot")
    tm, nb = plan
    n_pad = ((n + tm - 1) // tm) * tm
    xp, dyp = _pad_rows(x, n_pad), _pad_rows(dy, n_pad)
    meta = _metadata(group_sizes, n_pad, tm)
    T = n_pad // tm + E - 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(N // nb, T),
        in_specs=[
            pl.BlockSpec((tm, K), lambda f, t, *s: (s[0][t], 0)),
            pl.BlockSpec((tm, nb), lambda f, t, *s: (s[0][t], f)),
        ],
        out_specs=pl.BlockSpec((1, K, nb), lambda f, t, *s: (s[1][t], 0, f)),
    )
    out = pl.pallas_call(
        functools.partial(_tgmm_kernel, tm=tm),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((E, K, N), jnp.float32),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(*meta, xp, dyp)
    # empty groups get no logical tile: their blocks are uninitialized memory,
    # and their true gradient is zero
    gs_pad = group_sizes.astype(jnp.int32)
    gs_pad = gs_pad.at[E - 1].add(jnp.int32(n_pad) - jnp.sum(gs_pad))
    return jnp.where((gs_pad > 0)[:, None, None], out, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def grouped_matmul(x, w, group_sizes, interpret: bool = False):
    """``out[i] = x[i] @ w[g(i)]`` for rows sorted by group — differentiable.

    x: (n, K) bf16/f32; w: (E, K, N); group_sizes: (E,) int32 summing to n.
    Returns (n, N) in x.dtype (f32 MXU accumulation, one cast on store).
    Backward: dx via the same kernel with the rhs transposed in-contraction,
    dW via the tgmm kernel (f32), both over the identical logical grid.
    """
    return _gmm_call(x, w, group_sizes, transpose_rhs=False, out_dtype=x.dtype,
                     interpret=interpret)


def _gmm_fwd(x, w, group_sizes, interpret):
    out = _gmm_call(x, w, group_sizes, transpose_rhs=False, out_dtype=x.dtype,
                    interpret=interpret)
    return out, (x, w, group_sizes)


def _gmm_bwd(interpret, res, dy):
    x, w, group_sizes = res
    dx = _gmm_call(dy, w, group_sizes, transpose_rhs=True, out_dtype=x.dtype,
                   interpret=interpret)
    dw = _tgmm_call(x, dy, group_sizes, w.shape[0], interpret=interpret)
    return dx, dw.astype(w.dtype), np.zeros(group_sizes.shape, jax.dtypes.float0)


grouped_matmul.defvjp(_gmm_fwd, _gmm_bwd)
