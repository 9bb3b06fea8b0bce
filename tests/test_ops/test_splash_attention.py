"""Splash (flattened-grid) attention vs the jnp oracle (interpret mode).

The max_segment_len contract: every packed segment is at most that long
(PackedDatasetWithCut re-splits at max_length_per_sample), which lets the
kernel statically budget kv visits per q block.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from internevo_tpu.ops.attention import attention_reference
from internevo_tpu.ops.pallas.splash_attention import splash_attention


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


def _packed_segments(B, S, max_len, seed=0):
    """Contiguous runs, none longer than max_len, mimicking cut-packing."""
    rng = np.random.RandomState(seed)
    seg = np.zeros((B, S), dtype=np.int32)
    for b in range(B):
        pos, sid = 0, 1
        while pos < S:
            n = rng.randint(max(1, max_len // 3), max_len + 1)
            seg[b, pos : pos + n] = sid
            pos += n
            sid += 1
    return jnp.asarray(seg)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("max_seg", [None, 128])
def test_forward_matches_reference(causal, max_seg):
    B, S, H, D = 2, 512, 2, 64
    q, k, v = _rand((B, S, H, D), 0), _rand((B, S, H, D), 1), _rand((B, S, H, D), 2)
    seg = _packed_segments(B, S, 128)
    out_ref = attention_reference(q, k, v, segment_ids=seg, causal=causal)
    out = splash_attention(q, k, v, segment_ids=seg, causal=causal,
                           block_q=128, block_k=128, max_segment_len=max_seg,
                           interpret=True)
    np.testing.assert_allclose(out, out_ref, rtol=2e-5, atol=2e-5)


def test_forward_no_segments():
    B, S, H, D = 1, 512, 2, 64
    q, k, v = _rand((B, S, H, D), 0), _rand((B, S, H, D), 1), _rand((B, S, H, D), 2)
    out_ref = attention_reference(q, k, v, causal=True)
    out = splash_attention(q, k, v, causal=True, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(out, out_ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("gqa", [False, True])
@pytest.mark.parametrize("max_seg", [None, 128])
def test_backward_matches_reference(gqa, max_seg):
    B, S, D = 1, 512, 32
    Hq, Hkv = (4, 2) if gqa else (2, 2)
    q = _rand((B, S, Hq, D), 0)
    k, v = _rand((B, S, Hkv, D), 1), _rand((B, S, Hkv, D), 2)
    seg = _packed_segments(B, S, 128)

    def loss_splash(q, k, v):
        out = splash_attention(q, k, v, segment_ids=seg, causal=True,
                               block_q=128, block_k=128, max_segment_len=max_seg,
                               interpret=True)
        return jnp.sum(out * jnp.cos(out))

    def loss_ref(q, k, v):
        out = attention_reference(q, k, v, segment_ids=seg, causal=True)
        return jnp.sum(out * jnp.cos(out))

    g_s = jax.grad(loss_splash, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_s, g_r, "qkv"):
        np.testing.assert_allclose(a, b, rtol=5e-5, atol=5e-5, err_msg=f"d{name}")


def test_nonmonotonic_pad_and_uneven_blocks():
    """Eval-style [real | pad-0] rows with the boundary mid-block."""
    B, S, H, D = 1, 256, 2, 32
    n_real = 160
    q, k, v = _rand((B, S, H, D), 0), _rand((B, S, H, D), 1), _rand((B, S, H, D), 2)
    seg = np.zeros((B, S), dtype=np.int32)
    seg[:, :n_real] = 1
    seg = jnp.asarray(seg)
    out_ref = attention_reference(q, k, v, segment_ids=seg, causal=True)
    out = splash_attention(q, k, v, segment_ids=seg, causal=True,
                           block_q=64, block_k=64, max_segment_len=256, interpret=True)
    np.testing.assert_allclose(out[:, :n_real], out_ref[:, :n_real], rtol=2e-5, atol=2e-5)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_single_long_segment_with_bound():
    """A segment exactly at max_segment_len crossing many blocks."""
    B, S, H, D = 1, 512, 1, 32
    q, k, v = _rand((B, S, H, D), 0), _rand((B, S, H, D), 1), _rand((B, S, H, D), 2)
    seg = np.ones((B, S), dtype=np.int32)
    seg[:, 256:] = 2
    seg = jnp.asarray(seg)
    out_ref = attention_reference(q, k, v, segment_ids=seg, causal=True)
    out = splash_attention(q, k, v, segment_ids=seg, causal=True,
                           block_q=64, block_k=64, max_segment_len=256, interpret=True)
    np.testing.assert_allclose(out, out_ref, rtol=2e-5, atol=2e-5)
