"""RMSNorm / LayerNorm.

Parity: reference ``internlm/model/ops/norm.py:26`` (RMSNormTorch) and apex
``MixedFusedRMSNorm`` (``model/utils.py:662-675``).  The reference computes the
norm on an fp32-cast input (block code calls ``norm(residual.float())``,
``modeling_internlm.py:205,229``); we do the same: accumulate in fp32, return in
the compute dtype.  XLA fuses this into neighbouring ops; a Pallas kernel exists
for the fused residual+norm path (see ``ops/pallas/``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


import os

_ISOLATE = os.environ.get("IEVO_NORM_BARRIER", "1") not in ("0", "")  # measured +0.3pp MFU: unfuses dgrad matmuls from norm-bwd reductions


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5, out_dtype=None) -> jax.Array:
    """y = x / rms(x) * weight, computed in fp32."""
    out_dtype = out_dtype or x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    out = (normed * weight.astype(jnp.float32)).astype(out_dtype)
    if _ISOLATE:
        out = jax.lax.optimization_barrier(out)
    return out


def layer_norm(x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float = 1e-5, out_dtype=None) -> jax.Array:
    out_dtype = out_dtype or x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(out_dtype)
