"""Pallas flash attention vs the jnp oracle (interpret mode on CPU).

Parity targets: flash-attn varlen numerics in the reference
(``test_forward_output_no_fa.py`` compares flash vs no-flash paths).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from internevo_tpu.ops.attention import attention_reference
from internevo_tpu.ops.pallas.flash_attention import flash_attention


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


def _segments(B, S, n_seg=3, seed=0):
    rng = np.random.RandomState(seed)
    seg = np.zeros((B, S), dtype=np.int32)
    for b in range(B):
        cuts = np.sort(rng.choice(np.arange(1, S), size=n_seg - 1, replace=False))
        bounds = np.concatenate([[0], cuts, [S]])
        for i in range(len(bounds) - 1):
            seg[b, bounds[i] : bounds[i + 1]] = i + 1
    return jnp.asarray(seg)


@pytest.mark.parametrize("causal", [True, False])
def test_forward_matches_reference(causal):
    B, S, H, D = 2, 256, 4, 64
    q, k, v = _rand((B, S, H, D), 0), _rand((B, S, H, D), 1), _rand((B, S, H, D), 2)
    seg = _segments(B, S)
    out_ref = attention_reference(q, k, v, segment_ids=seg, causal=causal)
    out = flash_attention(q, k, v, segment_ids=seg, causal=causal,
                          block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(out, out_ref, rtol=2e-5, atol=2e-5)


def test_forward_no_segments():
    B, S, H, D = 1, 256, 2, 64
    q, k, v = _rand((B, S, H, D), 0), _rand((B, S, H, D), 1), _rand((B, S, H, D), 2)
    out_ref = attention_reference(q, k, v, causal=True)
    out = flash_attention(q, k, v, causal=True, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(out, out_ref, rtol=2e-5, atol=2e-5)


def test_forward_gqa():
    B, S, Hq, Hkv, D = 1, 256, 8, 2, 64
    q = _rand((B, S, Hq, D), 0)
    k, v = _rand((B, S, Hkv, D), 1), _rand((B, S, Hkv, D), 2)
    seg = _segments(B, S)
    out_ref = attention_reference(q, k, v, segment_ids=seg, causal=True)
    out = flash_attention(q, k, v, segment_ids=seg, causal=True,
                          block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(out, out_ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("gqa", [False, True])
def test_backward_matches_reference(gqa):
    B, S, D = 1, 256, 32
    Hq, Hkv = (4, 2) if gqa else (2, 2)
    q = _rand((B, S, Hq, D), 0)
    k, v = _rand((B, S, Hkv, D), 1), _rand((B, S, Hkv, D), 2)
    seg = _segments(B, S)

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, segment_ids=seg, causal=True,
                              block_q=128, block_k=128, interpret=True)
        return jnp.sum(out * jnp.cos(out))  # nontrivial cotangent

    def loss_ref(q, k, v):
        out = attention_reference(q, k, v, segment_ids=seg, causal=True)
        return jnp.sum(out * jnp.cos(out))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(a, b, rtol=5e-5, atol=5e-5, err_msg=f"d{name}")


def test_padding_rows_zero_output():
    """Rows whose segment id matches nothing else and are fully masked (e.g.
    the causal-first-row case) must not produce NaNs."""
    B, S, H, D = 1, 128, 2, 32
    q, k, v = _rand((B, S, H, D), 0), _rand((B, S, H, D), 1), _rand((B, S, H, D), 2)
    seg = jnp.asarray(np.concatenate([np.ones((1, 64)), np.zeros((1, 64))], axis=1).astype(np.int32))
    out = flash_attention(q, k, v, segment_ids=seg, causal=True,
                          block_q=64, block_k=64, interpret=True)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_nonmonotonic_pad_boundary_mid_block():
    """Eval batches pad with segment id 0 AFTER the real ids, so a q block can
    contain [1,1,...,0,0] with the boundary at a non-block-multiple offset.
    The whole-block skip test must use min/max over the block, or every kv
    block gets skipped and real tokens emit garbage (ADVICE r1, high)."""
    B, S, H, D = 1, 256, 2, 32
    n_real = 160  # boundary inside the second 128-block
    q, k, v = _rand((B, S, H, D), 0), _rand((B, S, H, D), 1), _rand((B, S, H, D), 2)
    seg = np.zeros((B, S), dtype=np.int32)
    seg[:, :n_real] = 1
    seg = jnp.asarray(seg)
    out_ref = attention_reference(q, k, v, segment_ids=seg, causal=True)
    out = flash_attention(q, k, v, segment_ids=seg, causal=True,
                          block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(out[:, :n_real], out_ref[:, :n_real], rtol=2e-5, atol=2e-5)
    # pad rows attend only to themselves-or-nothing; they must stay finite
    assert bool(jnp.all(jnp.isfinite(out)))


def test_fully_masked_rows_in_visited_block_emit_zeros():
    """A visited block where some rows are fully masked must not average v into
    those rows (the exp(0)=1 accumulation bug, ADVICE r1 low): pad rows whose
    id (0) matches no kv id anywhere must come out exactly zero."""
    B, S, H, D = 1, 128, 2, 32
    q, k, v = _rand((B, S, H, D), 0), _rand((B, S, H, D), 1), _rand((B, S, H, D), 2)
    seg = np.zeros((B, S), dtype=np.int32)
    seg[:, :96] = 1  # pad rows 96:128 share a block with real rows 64:96
    seg_kv = np.full((B, S), 2, dtype=np.int32)  # kv ids never match pad (0)
    seg_kv[:, :96] = 1
    from internevo_tpu.ops.pallas.flash_attention import flash_attention_with_lse

    out, lse = flash_attention_with_lse(
        q, k, v, segment_ids=jnp.asarray(seg), kv_segment_ids=jnp.asarray(seg_kv),
        causal=False, block_q=64, block_k=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(out[:, 96:]), 0.0)
    assert bool(jnp.all(jnp.isneginf(lse[..., 96:])))
    out_ref = attention_reference(q, k, v, segment_ids=jnp.asarray(seg), causal=False)
    np.testing.assert_allclose(out[:, :96], out_ref[:, :96], rtol=2e-5, atol=2e-5)
