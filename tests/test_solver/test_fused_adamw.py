"""Pallas fused-AdamW kernel vs the jnp update path.

Parity model: the reference runs torch fused AdamW on fp32 masters
(``/root/reference/internlm/train/pipeline.py:302-307``); here the kernel must
be bit-compatible (within f32 rounding) with ``solver/optimizer.py``'s jnp
``upd`` under every scalar regime, including the skip-on-overflow path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from internevo_tpu.ops.pallas.fused_adamw import (
    fused_adamw_supported,
    fused_adamw_update,
)


def _jnp_upd(g, m, v, w, lr, b1, b2, inv_b1, inv_b2, eps, wd, gs, skip):
    gf = g.astype(jnp.float32) * gs
    m1 = b1 * m + (1 - b1) * gf
    v1 = b2 * v + (1 - b2) * jnp.square(gf)
    upd = (m1 * inv_b1) / (jnp.sqrt(v1 * inv_b2) + eps)
    w1 = w - lr * (upd + wd * w)
    keep = skip > 0
    sel = lambda a, b: jnp.where(keep, a, b)
    return sel(m, m1), sel(v, v1), sel(w, w1), sel(w, w1).astype(jnp.bfloat16)


@pytest.mark.parametrize("skip", [0.0, 1.0])
@pytest.mark.parametrize("gdtype", [jnp.bfloat16, jnp.float32])
@pytest.mark.parametrize("shape", [(64, 1024), (3, 16, 2048), (64, 1536)])
def test_fused_adamw_matches_jnp(shape, skip, gdtype):
    rng = np.random.RandomState(0)
    n = int(np.prod(shape))
    g = jnp.asarray(rng.randn(*shape), gdtype)
    m = jnp.asarray(rng.randn(*shape) * 0.1, jnp.float32)
    v = jnp.asarray(np.abs(rng.randn(*shape)) * 0.01, jnp.float32)
    w = jnp.asarray(rng.randn(*shape), jnp.float32)
    assert fused_adamw_supported(g, jnp.bfloat16), shape

    lr, b1, b2 = 1e-3, 0.9, 0.95
    inv_b1, inv_b2 = 1 / (1 - b1**3), 1 / (1 - b2**3)
    eps, wd, gs = 1e-8, 0.01, 0.7
    scalars = jnp.asarray([lr, b1, b2, inv_b1, inv_b2, eps, wd, gs, skip], jnp.float32)

    got = fused_adamw_update(g, m, v, w, scalars, interpret=jax.default_backend() == "cpu")
    want = _jnp_upd(g, m, v, w, lr, b1, b2, inv_b1, inv_b2, eps, wd, gs, skip)
    for a, b, name in zip(got, want, ("m", "v", "master", "param")):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                                   rtol=1e-6, atol=1e-7, err_msg=name)


def test_unsupported_shapes_fall_back():
    # odd sizes and fp32 params must route to the jnp path
    assert not fused_adamw_supported(jnp.zeros((7, 100)), jnp.bfloat16)
    assert not fused_adamw_supported(jnp.zeros((8, 1024)), jnp.float32)
    assert not fused_adamw_supported(jnp.zeros((2048,)), jnp.bfloat16)  # < min size


def test_optimizer_step_fused_matches_jnp(monkeypatch):
    """End-to-end optimizer_step parity: fused vs jnp on the same inputs."""
    from internevo_tpu.solver.optimizer import AdamWConfig, init_optimizer_state, optimizer_step

    if jax.default_backend() != "cpu":
        pytest.skip("CPU interpret-mode comparison")
    rng = np.random.RandomState(1)
    params = {
        "blocks": {"w": jnp.asarray(rng.randn(2, 32, 1024), jnp.bfloat16)},
        "norm": jnp.asarray(rng.randn(64), jnp.float32),
    }
    grads = jax.tree.map(lambda p: jnp.asarray(rng.randn(*p.shape), p.dtype), params)
    state = init_optimizer_state(params)
    cfg = AdamWConfig()

    monkeypatch.setenv("IEVO_FUSED_ADAM", "0")
    p_ref, s_ref, st_ref = optimizer_step(params, grads, state, jnp.asarray(1e-4), None, cfg)

    monkeypatch.setenv("IEVO_FUSED_ADAM", "1")
    monkeypatch.setenv("IEVO_PALLAS_INTERPRET", "1")
    import internevo_tpu.ops.pallas.fused_adamw as fa

    orig = fa.fused_adamw_update
    monkeypatch.setattr(fa, "fused_adamw_update",
                        lambda g, m, v, w, s: orig(g, m, v, w, s, interpret=True))
    state2 = init_optimizer_state(params)
    p_new, s_new, st_new = optimizer_step(params, grads, state2, jnp.asarray(1e-4), None, cfg)

    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(p_ref), key=str),
        sorted(jax.tree_util.tree_leaves_with_path(p_new), key=str),
    ):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                                   rtol=1e-6, atol=1e-7, err_msg=str(ka))
    np.testing.assert_allclose(np.asarray(st_ref["grad_norm"]), np.asarray(st_new["grad_norm"]), rtol=1e-6)
    for k in ("m", "v", "master"):
        la = jax.tree.leaves(s_ref[k])
        lb = jax.tree.leaves(s_new[k])
        for a, b in zip(la, lb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7, err_msg=k)
