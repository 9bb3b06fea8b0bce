"""Rotary position embeddings (GPT-NeoX half-split layout).

Parity: reference ``internlm/model/modules/embedding.py`` —
``ApplyRotaryEmb`` (:89, NeoX style: rotate 1st half vs 2nd half),
``RotaryEmbedding._update_cos_sin_cache`` (:301, fp32 outer product of
positions x inv_freq), ``LinearRotaryEmbedding`` (:379) and
``DynamicNTKScalingRotaryEmbedding`` (:420).

The reference applies rotary per-token with packed position ids (``indexes``,
restarting at each sample boundary); we take a ``positions`` array of the same
semantics.  The rotation math runs in fp32 like the reference's
``_torch_apply_rotary_func`` and the CUDA kernel.  XLA fuses the whole thing
into the surrounding matmuls, which is why a dedicated Pallas kernel buys
little here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("dim", "base", "scaling_factor"))
def rope_frequencies(positions: jax.Array, dim: int, base: float = 10000.0, scaling_factor: float = 1.0):
    """cos/sin of shape positions.shape + (dim/2,), fp32.

    ``scaling_factor`` implements linear ("LinearRotaryEmbedding") scaling:
    positions are divided by the factor.
    """
    inv_freq = 1.0 / (base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = positions.astype(jnp.float32) / scaling_factor
    freqs = t[..., None] * inv_freq  # (..., dim/2)
    return jnp.cos(freqs), jnp.sin(freqs)


def dynamic_ntk_base(seq_len: int, dim: int, base: float, max_position_embeddings: int, scaling_factor: float = 1.0):
    """NTK-scaled base when the sequence exceeds training length.

    Parity: ``DynamicNTKScalingRotaryEmbedding`` (``embedding.py:420``).
    """
    if seq_len <= max_position_embeddings:
        return base
    alpha = scaling_factor * seq_len / max_position_embeddings - (scaling_factor - 1)
    return base * alpha ** (dim / (dim - 2))


def dynamic_ntk_frequencies(positions, dim: int, base: float,
                            max_position_embeddings: int, seq_len,
                            scaling_factor: float = 1.0):
    """Traced-seqlen variant for jitted decode: NTK-rescale the base once the
    live sequence exceeds the training window, identity below it
    (``DynamicNTKScalingRotaryEmbedding``, ``embedding.py:420``; the reference
    also leaves previously cached k rotated with the older base)."""
    seq_len = jnp.asarray(seq_len, jnp.float32)
    alpha = scaling_factor * seq_len / max_position_embeddings - (scaling_factor - 1)
    scaled = base * jnp.maximum(alpha, 1.0) ** (dim / (dim - 2))
    eff_base = jnp.where(seq_len > max_position_embeddings, scaled, base)
    inv_freq = 1.0 / (eff_base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rotary(x: jax.Array, cos: jax.Array, sin: jax.Array, rotary_dim: int | None = None,
                 compute_dtype=jnp.float32) -> jax.Array:
    """Apply NeoX-style rotary to the first ``rotary_dim`` features of x.

    x: (..., seq, heads, head_dim); cos/sin: (..., seq, rotary_dim/2).

    ``compute_dtype``: precision of the rotation math.  fp32 matches the
    reference CUDA kernel bit-for-bit modulo the final bf16 round; bf16
    (``ModelConfig.rotary_bf16``) halves the HBM traffic of the rotary
    recompute cluster in the remat backward — the output is bf16 either way,
    so the delta is one rounding of the multiply-add (~bf16 eps), covered by
    the torch-oracle parity tolerance (see tests/test_training).
    """
    head_dim = x.shape[-1]
    rotary_dim = rotary_dim if rotary_dim is not None else head_dim
    x_ro = x[..., :rotary_dim]
    x1 = x_ro[..., : rotary_dim // 2].astype(compute_dtype)
    x2 = x_ro[..., rotary_dim // 2 :].astype(compute_dtype)
    # broadcast cos/sin over the heads axis: (..., seq, 1, dim/2)
    c = cos[..., None, :].astype(compute_dtype)
    s = sin[..., None, :].astype(compute_dtype)
    o1 = x1 * c - x2 * s
    o2 = x1 * s + x2 * c
    out = jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)
    if rotary_dim < head_dim:
        out = jnp.concatenate([out, x[..., rotary_dim:]], axis=-1)
    return out
