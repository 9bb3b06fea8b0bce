"""Model forward tests: shapes, finiteness, init distributions, packed masking.

Parity targets: reference ``tests/test_model/test_model_internlm.py`` (module
numerics) and the init checks in ``tests/test_training/7B_check_init.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from internevo_tpu.models import ModelConfig
from internevo_tpu.models.base import init_params, model_forward, split_qkv
from internevo_tpu.ops.attention import attention_reference, set_use_pallas
from internevo_tpu.ops.cross_entropy import cross_entropy_loss
from internevo_tpu.utils.registry import MODEL_INITIALIZER


@pytest.fixture(autouse=True)
def _no_pallas():
    set_use_pallas(False)
    yield
    set_use_pallas(None)


def tiny_cfg(**kw):
    defaults = dict(
        num_layers=2, hidden_size=64, num_attention_heads=4, vocab_size=128,
        mlp_ratio=2.0, multiple_of=32, dtype=jnp.float32, checkpoint=0.0,
    )
    defaults.update(kw)
    return ModelConfig(**defaults)


def _batch(cfg, b=2, s=32, seed=0):
    rng = np.random.RandomState(seed)
    ids = rng.randint(0, cfg.vocab_size, (b, s)).astype(np.int32)
    # two packed samples per row
    seg = np.concatenate([np.zeros((b, s // 2)), np.ones((b, s // 2))], axis=1).astype(np.int32)
    pos = np.concatenate([np.arange(s // 2), np.arange(s // 2)] , axis=0)[None].repeat(b, 0).astype(np.int32)
    return jnp.asarray(ids), jnp.asarray(pos), jnp.asarray(seg)


def test_forward_shape_and_finite():
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.PRNGKey(0))
    ids, pos, seg = _batch(cfg)
    logits = model_forward(cfg, params, ids, pos, seg, train=False)
    assert logits.shape == (2, 32, cfg.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_gqa_forward():
    cfg = tiny_cfg(num_attention_heads=4, num_kv_attention_heads=2, qkv_bias=False, o_bias=False)
    params = init_params(cfg, jax.random.PRNGKey(0))
    ids, pos, seg = _batch(cfg)
    logits = model_forward(cfg, params, ids, pos, seg, train=False)
    assert logits.shape == (2, 32, cfg.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_split_qkv_gqa_layout():
    """GQA fused wqkv unpack must match per-kv-group packing (modeling_internlm2.py:147-154)."""
    cfg = tiny_cfg(num_attention_heads=4, num_kv_attention_heads=2)
    B, S, D = 1, 3, cfg.head_dim
    q_per_kv = cfg.q_per_kv
    parts = []
    # build a qkv tensor where each head's value equals a distinct constant
    for g in range(cfg.num_kv_attention_heads):
        for i in range(q_per_kv):
            parts.append(jnp.full((B, S, D), 10 * g + i, jnp.float32))  # q heads
        parts.append(jnp.full((B, S, D), 100 + g, jnp.float32))  # k
        parts.append(jnp.full((B, S, D), 200 + g, jnp.float32))  # v
    qkv = jnp.concatenate(parts, axis=-1)
    q, k, v = split_qkv(cfg, qkv)
    assert q[0, 0, 0, 0] == 0 and q[0, 0, 1, 0] == 1 and q[0, 0, 2, 0] == 10
    assert k[0, 0, 0, 0] == 100 and k[0, 0, 1, 0] == 101
    assert v[0, 0, 0, 0] == 200 and v[0, 0, 1, 0] == 201


def test_segment_mask_blocks_cross_sample_attention():
    """Tokens must not attend across pack boundaries: changing sample 1's tokens
    must not change sample 2's logits (the cu_seqlens contract, SURVEY A.4)."""
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.PRNGKey(0))
    ids, pos, seg = _batch(cfg, b=1)
    logits1 = model_forward(cfg, params, ids, pos, seg, train=False)
    ids2 = ids.at[0, :16].set((ids[0, :16] + 1) % cfg.vocab_size)
    logits2 = model_forward(cfg, params, ids2, pos, seg, train=False)
    np.testing.assert_allclose(logits1[0, 16:], logits2[0, 16:], rtol=2e-5, atol=2e-5)
    assert not np.allclose(logits1[0, :16], logits2[0, :16], rtol=1e-3, atol=1e-3)


def test_causal_mask():
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.PRNGKey(0))
    ids, pos, seg = _batch(cfg, b=1)
    logits1 = model_forward(cfg, params, ids, pos, seg, train=False)
    # changing the LAST token cannot affect earlier logits
    ids2 = ids.at[0, -1].set((ids[0, -1] + 1) % cfg.vocab_size)
    logits2 = model_forward(cfg, params, ids2, pos, seg, train=False)
    np.testing.assert_allclose(logits1[0, :-1], logits2[0, :-1], rtol=2e-5, atol=2e-5)


def test_init_distributions():
    """Reference init stds (SURVEY A.7): embed/head 0.0052, wqkv/w1/w3 0.006,
    out_proj/w2 scaled 0.006/sqrt(2*(l+1)), norms ones, biases zero."""
    cfg = tiny_cfg(num_layers=4, hidden_size=256, vocab_size=2048, mlp_ratio=4.0)
    params = init_params(cfg, jax.random.PRNGKey(7))
    assert abs(float(jnp.std(params["embedding"]["weight"].astype(jnp.float32))) - 0.0052) < 5e-4
    assert abs(float(jnp.std(params["head"]["kernel"].astype(jnp.float32))) - 0.0052) < 5e-4
    assert abs(float(jnp.std(params["blocks"]["wqkv"]["kernel"].astype(jnp.float32))) - 0.006) < 5e-4
    for lid in range(4):
        expect = 0.006 / np.sqrt(2 * (lid + 1))
        got = float(jnp.std(params["blocks"]["out_proj"]["kernel"][lid].astype(jnp.float32)))
        assert abs(got - expect) < 3e-4, (lid, got, expect)
    assert bool(jnp.all(params["blocks"]["norm1"] == 1.0))
    assert bool(jnp.all(params["blocks"]["wqkv"]["bias"] == 0.0))


def test_registry_builds_all_families():
    for name in ("INTERNLM", "INTERNLM2", "LLAMA2"):
        build = MODEL_INITIALIZER.get_module(name)
        model = build(num_layers=2, hidden_size=64, num_attention_heads=4, vocab_size=128,
                      mlp_ratio=2.0, multiple_of=32, dtype="float32")
        params = model.init(jax.random.PRNGKey(0))
        ids, pos, seg = _batch(model.config)
        logits = model.apply(params, ids, pos, seg, train=False)
        assert logits.shape == (2, 32, 128)


def test_loss_decreases_on_overfit():
    """Tiny sanity: a few SGD steps reduce CE loss on one batch."""
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.PRNGKey(0))
    ids, pos, seg = _batch(cfg, b=2, s=16)
    labels = jnp.roll(ids, -1, axis=1)

    def loss_fn(p):
        logits = model_forward(cfg, p, ids, pos, seg, train=False)
        loss, _ = cross_entropy_loss(logits.reshape(-1, cfg.vocab_size), labels.reshape(-1))
        return loss

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    l0, g = grad_fn(params)
    p = params
    for _ in range(10):
        l, g = grad_fn(p)
        p = jax.tree.map(lambda a, b: a - 0.5 * b, p, g)
    l1, _ = grad_fn(p)
    assert float(l1) < float(l0) * 0.9, (float(l0), float(l1))


def test_checkpoint_fraction_matches_baseline():
    """Full-remat scan must be numerically identical to no-remat."""
    cfg0 = tiny_cfg(checkpoint=0.0)
    cfg1 = tiny_cfg(checkpoint=1.0)
    params = init_params(cfg0, jax.random.PRNGKey(0))
    ids, pos, seg = _batch(cfg0, b=1)
    labels = jnp.roll(ids, -1, axis=1)

    def loss(cfg):
        def f(p):
            logits = model_forward(cfg, p, ids, pos, seg, train=True)
            return cross_entropy_loss(logits.reshape(-1, cfg.vocab_size), labels.reshape(-1))[0]
        return f

    l0, g0 = jax.value_and_grad(loss(cfg0))(params)
    l1, g1 = jax.value_and_grad(loss(cfg1))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6), g0, g1)


def test_activation_offload_matches_baseline():
    """activation_offload=True (host-offloaded flash context, the reference's
    activation_checkpoint.py CPU-offload mode) is a memory knob only: same
    loss and grads."""
    import dataclasses
    from internevo_tpu.models.base import ModelConfig, init_params, model_forward

    cfg = ModelConfig(num_layers=2, hidden_size=64, num_attention_heads=4,
                      vocab_size=256, dtype="float32", checkpoint=1.0)
    cfg_off = dataclasses.replace(cfg, activation_offload=True)
    params = init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 64), 0, 256)
    pos = jnp.tile(jnp.arange(64), (1, 1))
    seg = jnp.ones((1, 64), jnp.int32)

    def loss(c):
        def f(p):
            lg = model_forward(c, p, ids, pos, seg, train=True)
            return jnp.mean(lg.astype(jnp.float32) ** 2)
        return jax.jit(jax.value_and_grad(f))(params)

    l0, g0 = loss(cfg)
    l1, g1 = loss(cfg_off)
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6), g0, g1)


def test_remat_save_tiers_match_baseline():
    """remat_save_qkv / remat_save_mlp fractions are memory/recompute knobs
    only: every tier combination (both/single/full segment split) must be
    numerically identical to plain full remat."""
    import dataclasses

    cfg = tiny_cfg(checkpoint=1.0)
    params = init_params(cfg, jax.random.PRNGKey(0))
    ids, pos, seg = _batch(cfg, b=1)
    labels = jnp.roll(ids, -1, axis=1)

    def loss(c):
        def f(p):
            logits = model_forward(c, p, ids, pos, seg, train=True)
            return cross_entropy_loss(logits.reshape(-1, c.vocab_size), labels.reshape(-1))[0]
        return jax.value_and_grad(f)(params)

    l0, g0 = loss(cfg)
    for qkv, mlp in ((1.0, 0.0), (0.5, 0.0), (0.0, 1.0), (1.0, 1.0), (0.5, 0.25), (0.25, 0.5)):
        l1, g1 = loss(dataclasses.replace(cfg, remat_save_qkv=qkv, remat_save_mlp=mlp))
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6, err_msg=f"qkv={qkv} mlp={mlp}")
        jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6), g0, g1)
