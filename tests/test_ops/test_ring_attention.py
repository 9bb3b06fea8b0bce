"""Ring attention vs single-device oracle: forward and grads over a 4-way ring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # multi-minute tier; excluded by -m quick
from jax.sharding import Mesh, PartitionSpec as P

from internevo_tpu.ops.attention import attention_reference
from internevo_tpu.parallel.ring_attention import ring_attention


def _mesh(n=4):
    return Mesh(np.array(jax.devices()[:n]), ("sp",))


def _data(B=1, S=256, H=4, D=32, seed=0, segs=True):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, S, H, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, S, H, D), jnp.float32)
    if segs:
        # 3 packed samples with boundaries NOT aligned to chunk edges
        seg = np.ones((B, S), np.int32)
        seg[:, 100:190] = 2
        seg[:, 190:] = 3
        seg = jnp.asarray(seg)
    else:
        seg = jnp.ones((B, S), jnp.int32)
    return q, k, v, seg


def _ring_fn(mesh, interpret=True, schedule="zigzag"):
    def f(q, k, v, seg):
        return ring_attention(q, k, v, seg, axis_name="sp", interpret=interpret,
                              schedule=schedule)

    return jax.jit(jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp"), P(None, "sp")),
        out_specs=P(None, "sp"),
        check_vma=False,
    ))


SCHEDULES = ("contiguous", "zigzag")


@pytest.mark.parametrize("schedule", SCHEDULES)
def test_ring_forward_matches_oracle(schedule):
    mesh = _mesh(4)
    q, k, v, seg = _data()
    out = _ring_fn(mesh, schedule=schedule)(q, k, v, seg)
    ref = attention_reference(q, k, v, segment_ids=seg, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("schedule", SCHEDULES)
def test_ring_grads_match_oracle(schedule):
    mesh = _mesh(4)
    q, k, v, seg = _data()
    ring = _ring_fn(mesh, schedule=schedule)

    def loss_ring(q, k, v):
        o = ring(q, k, v, seg)
        return jnp.sum(o * jnp.sin(o))

    def loss_ref(q, k, v):
        o = attention_reference(q, k, v, segment_ids=seg, causal=True)
        return jnp.sum(o * jnp.sin(o))

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5,
                                   err_msg=f"d{name}")


@pytest.mark.parametrize("schedule", SCHEDULES)
def test_ring_gqa(schedule):
    mesh = _mesh(4)
    B, S, Hq, Hkv, D = 1, 256, 4, 2, 32
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (B, S, Hq, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, S, Hkv, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, S, Hkv, D), jnp.float32)
    seg = jnp.ones((B, S), jnp.int32)
    out = _ring_fn(mesh, schedule=schedule)(q, k, v, seg)
    ref = attention_reference(q, k, v, segment_ids=seg, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------- attention dropout


def _ring_drop_fn(mesh, rate, interpret=True, schedule="zigzag"):
    def f(q, k, v, seg, seed):
        return ring_attention(q, k, v, seg, axis_name="sp", interpret=interpret,
                              dropout_rate=rate, dropout_seed=seed,
                              schedule=schedule)

    return jax.jit(jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp"), P(None, "sp"), P()),
        out_specs=P(None, "sp"),
        check_vma=False,
    ))


@pytest.mark.parametrize("schedule", SCHEDULES)
def test_ring_dropout_matches_unsharded(schedule):
    """Ring attention with dropout reproduces the UNSHARDED kernel's (and the
    dense reference's) dropped output bit-for-mask: every leg hashes global
    (q row, kv col) coordinates, and the lse merge is exact for masks applied
    to pv with undropped denominators."""
    from internevo_tpu.ops.pallas.splash_attention import splash_attention

    mesh = _mesh(4)
    q, k, v, seg = _data(S=256)
    rate, seed = 0.3, jnp.asarray(17, jnp.int32)
    out = _ring_drop_fn(mesh, rate, schedule=schedule)(q, k, v, seg, seed)
    full = splash_attention(q, k, v, segment_ids=seg, causal=True,
                            block_q=64, block_k=64, interpret=True,
                            dropout_rate=rate, dropout_seed=seed)
    dense = attention_reference(q, k, v, segment_ids=seg, causal=True,
                                dropout_rate=rate, dropout_seed=seed)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)
    # actually active: differs from the undropped forward
    base = _ring_fn(mesh)(q, k, v, seg)
    assert not np.allclose(np.asarray(out), np.asarray(base), atol=1e-3)


def test_ring_dropout_grads_match_dense():
    """Backward through the ring (scan + lse merge + kernel bwd regenerating
    the mask) equals grads of the dense reference with the same global mask."""
    mesh = _mesh(4)
    q, k, v, seg = _data(S=256)
    rate, seed = 0.25, jnp.asarray(5, jnp.int32)
    ring = _ring_drop_fn(mesh, rate)

    def loss_ring(q, k, v):
        o = ring(q, k, v, seg, seed)
        return jnp.sum(o * jnp.sin(o))

    def loss_dense(q, k, v):
        o = attention_reference(q, k, v, segment_ids=seg, causal=True,
                                dropout_rate=rate, dropout_seed=seed)
        return jnp.sum(o * jnp.sin(o))

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5,
                                   atol=5e-5, err_msg=f"d{name}")


def test_ring_zigzag_eight_devices():
    """Zigzag pairing/permutes at a deeper ring (n=8, 16 half-chunks)."""
    mesh = _mesh(8)
    q, k, v, seg = _data(S=512, seed=2)
    out = _ring_fn(mesh)(q, k, v, seg)
    ref = attention_reference(q, k, v, segment_ids=seg, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_ring_zigzag_odd_chunk_falls_back():
    """An odd local chunk cannot split into half-chunks: the dispatcher falls
    back to the contiguous schedule (oracle path — odd lengths do not fit the
    kernel's sublane blocks either way)."""
    from internevo_tpu.ops.attention import set_use_pallas

    set_use_pallas(False)
    try:
        mesh = _mesh(4)
        B, S, H, D = 1, 132, 2, 32  # S_loc = 33, odd
        ks = jax.random.split(jax.random.PRNGKey(3), 3)
        q = jax.random.normal(ks[0], (B, S, H, D), jnp.float32)
        k = jax.random.normal(ks[1], (B, S, H, D), jnp.float32)
        v = jax.random.normal(ks[2], (B, S, H, D), jnp.float32)
        seg = jnp.ones((B, S), jnp.int32)

        def f(q, k, v, s):
            return ring_attention(q, k, v, s, axis_name="sp", schedule="zigzag")

        out = jax.jit(jax.shard_map(
            f, mesh=mesh, in_specs=(P(None, "sp"),) * 4,
            out_specs=P(None, "sp"), check_vma=False))(q, k, v, seg)
        ref = attention_reference(q, k, v, segment_ids=seg, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
    finally:
        set_use_pallas(None)


def test_ring_bsd_layout_matches_oracle(monkeypatch):
    """Ring legs through the BSD (B,S,H*D) splash layout: lse/cross_kv path
    fwd AND grads must match the dense oracle (the ring calls
    splash_attention_with_lse per rotated leg)."""
    monkeypatch.setenv("IEVO_FLASH_BSD", "1")
    mesh = _mesh()
    q, k, v, seg = _data(D=64)
    f = _ring_fn(mesh)
    out = f(q, k, v, seg)
    ref = attention_reference(q, k, v, segment_ids=seg, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def loss_ring(q, k, v):
        return jnp.sum(jnp.sin(f(q, k, v, seg)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(attention_reference(q, k, v, segment_ids=seg, causal=True)))

    g_r = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_d = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, c, name in zip(g_r, g_d, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=5e-5,
                                   atol=5e-5, err_msg=f"d{name}")
