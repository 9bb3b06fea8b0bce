"""Fused AdamW update as a Pallas TPU kernel.

The reference runs torch fused AdamW on fp32 masters
(``/root/reference/internlm/train/pipeline.py:302-307``); its TPU analogue is
a single streaming pass over (grad bf16, m f32, v f32, master f32) that writes
(m, v, master, bf16 working param) — ~28 bytes of HBM traffic per parameter
and nothing else.  XLA's own elementwise fusions for this update measure ~80%
of stream bandwidth at 700m shapes (grad scale/clip, bias correction, and the
bf16 re-cast land in separate fusion roots); this kernel does the whole thing
in one pass at ~95% and aliases m/v/master/param in place so no fresh 11GB of
optimizer buffers is allocated per step.

Semantics are exactly ``solver/optimizer.py:optimizer_step``'s inner ``upd``:
    g      = grad * gs                      (gs = clip_coef / loss_scale)
    m'     = b1*m + (1-b1)*g
    v'     = b2*v + (1-b2)*g^2
    upd    = (m'/bias1) / (sqrt(v'/bias2) + eps)
    w'     = w - lr*(upd + wd*w)
    skip>0 (non-finite global grad norm): every output keeps its input value.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# one row tile: (block_rows, 1024) f32 = 1MB per operand; ~7 operands double-
# buffered plus f32 temporaries stays under the 16MB scoped-vmem stack limit
_COLS = 1024
_BLOCK_ROWS = 128


def _kernel(sc_ref, g_ref, m_ref, v_ref, w_ref, m_out, v_out, w_out, p_out):
    lr = sc_ref[0]
    b1 = sc_ref[1]
    b2 = sc_ref[2]
    inv_bias1 = sc_ref[3]
    inv_bias2 = sc_ref[4]
    eps = sc_ref[5]
    wd = sc_ref[6]
    gs = sc_ref[7]
    skip = sc_ref[8]

    g = g_ref[...].astype(jnp.float32) * gs
    m0 = m_ref[...]
    v0 = v_ref[...]
    w0 = w_ref[...]
    m1 = b1 * m0 + (1.0 - b1) * g
    v1 = b2 * v0 + (1.0 - b2) * (g * g)
    upd = (m1 * inv_bias1) / (jnp.sqrt(v1 * inv_bias2) + eps)
    w1 = w0 - lr * (upd + wd * w0)

    keep = skip > 0.0
    m_out[...] = jnp.where(keep, m0, m1)
    v_out[...] = jnp.where(keep, v0, v1)
    w_out[...] = jnp.where(keep, w0, w1)
    p_out[...] = jnp.where(keep, w0, w1).astype(p_out.dtype)


def fused_adamw_supported(leaf: jax.Array, param_dtype) -> bool:
    """The kernel path handles bf16-param leaves whose flat size tiles into
    (rows, 1024) blocks; everything else keeps the jnp update."""
    return (
        param_dtype == jnp.bfloat16
        and leaf.size % _COLS == 0
        and (leaf.size // _COLS) % 8 == 0
        and leaf.size >= _COLS * 64
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_adamw_update(g, m, v, w, scalars, *, interpret: bool = False):
    """One AdamW step on a single leaf.

    ``scalars``: f32[9] = [lr, beta1, beta2, 1/bias1, 1/bias2, eps,
    weight_decay, grad_scale (clip/loss-scale), skip (>0 keeps inputs)].
    Returns (m', v', master', param_bf16) with m/v/master updated in place
    (buffers aliased — callers must treat the inputs as consumed).
    """
    shape = g.shape
    n = g.size
    rows = n // _COLS
    block_rows = min(_BLOCK_ROWS, rows)
    while rows % block_rows:
        block_rows //= 2
    g2 = g.reshape(rows, _COLS)
    m2 = m.reshape(rows, _COLS)
    v2 = v.reshape(rows, _COLS)
    w2 = w.reshape(rows, _COLS)

    spec = pl.BlockSpec((block_rows, _COLS), lambda i: (i, 0))
    # m/v/master update in place; when the (dead after this) grad buffer is
    # already bf16 it is additionally recycled as the new bf16 working param
    # (out_proj-style grads arrive f32 — they flow into the f32 residual — and
    # cannot alias the bf16 param output)
    aliases = {2: 0, 3: 1, 4: 2}
    if g.dtype == jnp.bfloat16:
        aliases[1] = 3
    out = pl.pallas_call(
        _kernel,
        grid=(rows // block_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec, spec, spec, spec,
        ],
        out_specs=[spec, spec, spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, _COLS), jnp.float32),
            jax.ShapeDtypeStruct((rows, _COLS), jnp.float32),
            jax.ShapeDtypeStruct((rows, _COLS), jnp.float32),
            jax.ShapeDtypeStruct((rows, _COLS), jnp.bfloat16),
        ],
        input_output_aliases=aliases,
        interpret=interpret,
    )(scalars, g2, m2, v2, w2)
    m1, v1, w1, p1 = out
    return (m1.reshape(shape), v1.reshape(shape), w1.reshape(shape),
            p1.reshape(shape))
