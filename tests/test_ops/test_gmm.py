"""Grouped-matmul (gmm) pallas kernel vs the ``lax.ragged_dot`` oracle.

Interpret mode on CPU (the kernel's TPU grid/masking logic runs unchanged).
Parity: the reference's MegaBlocks sparse matmuls
(``internlm/model/moe/megablock/megablock_dmoe.py``) — here the contract is
checked against XLA's own grouped-matmul primitive.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from internevo_tpu.ops.pallas.gmm import gmm_supported, grouped_matmul


def _mk(n, K, N, E, dtype=jnp.float32, seed=0):
    kx, kw, kd = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(kx, (n, K), dtype)
    w = (jax.random.normal(kw, (E, K, N), jnp.float32) * 0.05).astype(dtype)
    dy = jax.random.normal(kd, (n, N), dtype)
    return x, w, dy


def _ref(x, w, gs):
    return jax.lax.ragged_dot(x, w, gs, preferred_element_type=jnp.float32)


@pytest.mark.parametrize(
    "gs",
    [
        [100, 0, 300, 50, 250, 0, 200, 100],  # empty groups
        [1000, 0, 0, 0, 0, 0, 0, 0],          # one group owns everything
        [125, 125, 125, 125, 125, 125, 125, 125],
    ],
)
def test_gmm_forward_matches_ragged_dot(gs):
    n, K, N, E = 1000, 256, 384, 8
    gs = np.asarray(gs, np.int32)
    assert gs.sum() == n
    x, w, _ = _mk(n, K, N, E)
    out = grouped_matmul(x, w, jnp.asarray(gs), True)
    ref = _ref(x, w, jnp.asarray(gs))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_gmm_grads_match_ragged_dot():
    n, K, N, E = 512, 128, 256, 4
    gs = jnp.asarray([200, 0, 112, 200], jnp.int32)
    x, w, dy = _mk(n, K, N, E)

    _, f_k = jax.vjp(lambda x, w: grouped_matmul(x, w, gs, True), x, w)
    _, f_r = jax.vjp(lambda x, w: _ref(x, w, gs), x, w)
    (dx_k, dw_k), (dx_r, dw_r) = f_k(dy), f_r(dy)
    np.testing.assert_allclose(np.asarray(dx_k), np.asarray(dx_r), atol=2e-4)
    # empty group 1's dW must be exactly zero, not uninitialized memory
    assert float(jnp.max(jnp.abs(dw_k[1]))) == 0.0
    np.testing.assert_allclose(np.asarray(dw_k), np.asarray(dw_r), atol=2e-3)


def test_gmm_bf16_row_padding_and_boundaries():
    # n not a multiple of the 128-row min tile: padded rows must not leak
    n, K, N, E = 300, 128, 128, 4
    gs = jnp.asarray([37, 120, 143, 0], jnp.int32)
    x, w, _ = _mk(n, K, N, E, dtype=jnp.bfloat16)
    out = grouped_matmul(x, w, gs, True)
    ref = _ref(x, w, gs).astype(jnp.bfloat16)
    assert out.shape == (n, N) and out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=0.15)


def test_gmm_supported_budget():
    # moe-bench expert shapes fit; 7B-class expert blocks exceed the
    # whole-K/whole-N VMEM budget and must route to ragged_dot
    assert gmm_supported(16384, 1024, 2816, 8)
    assert gmm_supported(16384, 2816, 1024, 8)
    assert not gmm_supported(16384, 4096, 11008, 8)
    assert not gmm_supported(16384, 1000, 2816, 8)  # lane misalignment
