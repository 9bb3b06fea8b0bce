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
    # moe-bench expert shapes fit whole-feature; realistic 7B-class expert
    # blocks fit via feature tiling (round 5 — the whole-K/whole-N design
    # VMEM-OOM'd at K=2048, N=5632, measured 155.95M of 128M)
    assert gmm_supported(16384, 1024, 2816, 8)
    assert gmm_supported(16384, 2816, 1024, 8)
    assert gmm_supported(16384, 2048, 5632, 8)   # moe_7bshape experts
    assert gmm_supported(16384, 4096, 11008, 8)  # 7B-dim experts
    assert not gmm_supported(16384, 1000, 2816, 8)  # lane misalignment


def test_gmm_feature_tiled_matches_ragged_dot():
    # force multi-sweep plans (fb < F) through a small planning budget so the
    # feature-tiled grid path is exercised in interpret mode; fwd and both
    # grads must still match the ragged_dot oracle
    import internevo_tpu.ops.pallas.gmm as gmm_mod

    n, K, N, E = 640, 256, 512, 4
    gs = jnp.asarray([200, 0, 240, 200], jnp.int32)
    x, w, dy = _mk(n, K, N, E)

    ref_out, f_r = jax.vjp(lambda x, w: _ref(x, w, gs), x, w)
    plans = []
    orig = gmm_mod._plan_gmm

    def spy(*a, **k):
        p = orig(*a, **k)
        plans.append(p)
        return p

    gmm_mod._plan_gmm = spy
    import os as _os
    _os.environ["IEVO_GMM_VMEM_LIMIT_MB"] = "2"  # starve the budget -> tiling
    try:
        out, f_k = jax.vjp(lambda x, w: grouped_matmul(x, w, gs, True), x, w)
        (dx_k, dw_k) = f_k(dy)
    finally:
        del _os.environ["IEVO_GMM_VMEM_LIMIT_MB"]
        gmm_mod._plan_gmm = orig
    # the starved budget must actually have produced a tiled fwd plan
    assert plans[0] is not None and plans[0][1] < N
    (dx_r, dw_r) = f_r(dy)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dx_k), np.asarray(dx_r), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dw_k), np.asarray(dw_r), atol=2e-3)
