"""Dropless MoE: sort-by-expert + ragged grouped matmul.

Parity: reference MegaBlocks path (``internlm/model/moe/megablock/megablock_dmoe.py``,
``megablock/utils.py`` — external CUDA ``megablocks``/``stk`` sparse matmuls).
TPU-native: tokens are sorted by routed expert and processed with
``jax.lax.ragged_dot`` (XLA's grouped matmul, the Megablox primitive), so no
token is dropped and no capacity padding is computed — the dropless property
without sparse-matrix machinery.

Top-k routing contributes k scaled copies of each token; the inverse
permutation scatter-adds the expert outputs back.

Expert parallelism: the expert weight stacks shard over the ``ep`` mesh axis
(``modeling_moe.moe_param_specs``) and GSPMD gathers them just-in-time around
the ragged matmuls — ZeRO-3-style weight sharding rather than token
all-to-all.  A dispatch-a2a dropless variant needs ``lax.ragged_all_to_all``,
which XLA:CPU cannot execute (the test mesh is CPU), so the a2a layout is the
GShard path's job (``gshard.py``: capacity-based dispatch with a real EXPERT
all-to-all); this path trades a per-layer weight gather for zero token
drops.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def dropless_moe_apply(
    layer: dict,
    x: jax.Array,
    *,
    top_k: int = 2,
    rng: Optional[jax.Array] = None,
    train: bool = True,
):
    """layer: {"gate": (H, E), "experts": {"w1","w3": (E, H, M), "w2": (E, M, H)}}.

    Returns (out (B, S, H), l_aux, exp_counts).  l_aux is the same
    load-balancing loss as the GShard path (mean gate prob x mean router mass).
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
    l_aux = jnp.sum(me * ce) * E

    flat_expert = top_idx.reshape(-1)                          # (n*k,)
    flat_weight = top_probs.reshape(-1)
    # stable sort by expert; order within an expert preserved
    order = jnp.argsort(flat_expert, stable=True)
    inv_token = order // top_k                                 # source token of each sorted slot
    gathered = jnp.take(tokens, inv_token, axis=0)             # (n*k, H)
    group_sizes = jnp.bincount(flat_expert, length=E)

    w1, w2, w3 = layer["experts"]["w1"], layer["experts"]["w2"], layer["experts"]["w3"]
    h1 = jax.lax.ragged_dot(gathered, w1.astype(gathered.dtype), group_sizes,
                            preferred_element_type=jnp.float32).astype(gathered.dtype)
    h3 = jax.lax.ragged_dot(gathered, w3.astype(gathered.dtype), group_sizes,
                            preferred_element_type=jnp.float32).astype(gathered.dtype)
    hidden = jax.nn.silu(h1) * h3
    expert_out = jax.lax.ragged_dot(hidden, w2.astype(hidden.dtype), group_sizes,
                                    preferred_element_type=jnp.float32).astype(gathered.dtype)

    # combine: scatter-add scaled expert outputs back to their source tokens
    scale = jnp.take(flat_weight, order).astype(expert_out.dtype)[:, None]
    out = jnp.zeros((n, H), expert_out.dtype).at[inv_token].add(expert_out * scale)
    exp_counts = group_sizes
    return out.reshape(B, S, H), l_aux, exp_counts
