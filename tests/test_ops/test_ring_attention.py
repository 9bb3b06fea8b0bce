"""Ring attention vs single-device oracle: forward and grads over a 4-way ring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
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


def _ring_fn(mesh, interpret=True):
    def f(q, k, v, seg):
        return ring_attention(q, k, v, seg, axis_name="sp", interpret=interpret)

    return jax.jit(jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp"), P(None, "sp")),
        out_specs=P(None, "sp"),
        check_vma=False,
    ))


def test_ring_forward_matches_oracle():
    mesh = _mesh(4)
    q, k, v, seg = _data()
    out = _ring_fn(mesh)(q, k, v, seg)
    ref = attention_reference(q, k, v, segment_ids=seg, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_ring_grads_match_oracle():
    mesh = _mesh(4)
    q, k, v, seg = _data()
    ring = _ring_fn(mesh)

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


def test_ring_gqa():
    mesh = _mesh(4)
    B, S, Hq, Hkv, D = 1, 256, 4, 2, 32
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (B, S, Hq, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, S, Hkv, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, S, Hkv, D), jnp.float32)
    seg = jnp.ones((B, S), jnp.int32)
    out = _ring_fn(mesh)(q, k, v, seg)
    ref = attention_reference(q, k, v, segment_ids=seg, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
