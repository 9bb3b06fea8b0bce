"""Fused norm+head+CE vs the unfused reference path: loss and grads must match."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # multi-minute tier; excluded by -m quick

from internevo_tpu.models import ModelConfig
from internevo_tpu.models.base import init_params, model_forward
from internevo_tpu.ops.attention import set_use_pallas
from internevo_tpu.ops.cross_entropy import cross_entropy_loss
from internevo_tpu.ops.fused_ce import fused_norm_head_ce


@pytest.fixture(autouse=True)
def _no_pallas():
    set_use_pallas(False)
    yield
    set_use_pallas(None)


def _setup(embed_grad_scale=1.0, norm_head=False):
    cfg = ModelConfig(num_layers=2, hidden_size=64, num_attention_heads=4,
                      vocab_size=160, mlp_ratio=2.0, multiple_of=32, dtype=jnp.float32,
                      embed_grad_scale=embed_grad_scale, norm_head=norm_head)
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (2, 24)), jnp.int32)
    pos = jnp.tile(jnp.arange(24), (2, 1))
    seg = jnp.ones((2, 24), jnp.int32)
    labels = jnp.roll(ids, -1, axis=1).at[:, -1].set(-100)
    labels = labels.at[0, 5].set(-100)  # some ignored labels mid-sequence
    return cfg, params, ids, pos, seg, labels


@pytest.mark.parametrize("egs,norm_head", [(1.0, False), (0.1, False), (1.0, True)])
def test_fused_matches_unfused(egs, norm_head):
    cfg, params, ids, pos, seg, labels = _setup(egs, norm_head)

    def unfused(p):
        logits = model_forward(cfg, p, ids, pos, seg, train=True)
        loss, _ = cross_entropy_loss(logits.reshape(-1, cfg.vocab_size), labels.reshape(-1))
        return loss

    def fused(p):
        hidden = model_forward(cfg, p, ids, pos, seg, train=True, return_hidden=True)
        nll, n_valid, _ = fused_norm_head_ce(
            hidden, p["norm"], p["head"]["kernel"], labels,
            eps=cfg.layer_norm_epsilon, embed_grad_scale=cfg.embed_grad_scale,
            norm_head=cfg.norm_head, chunk_size=16,
        )
        return nll / jnp.maximum(n_valid, 1)

    l1, g1 = jax.value_and_grad(unfused)(params)
    l2, g2 = jax.value_and_grad(fused)(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6), g1, g2)


def test_fused_padding_chunk():
    """Token count not divisible by chunk_size: padded tail must be ignored."""
    cfg, params, ids, pos, seg, labels = _setup()
    hidden = model_forward(cfg, params, ids, pos, seg, train=True, return_hidden=True)
    nll_a, n_a, cor_a = fused_norm_head_ce(hidden, params["norm"], params["head"]["kernel"],
                                           labels, chunk_size=7)
    nll_b, n_b, cor_b = fused_norm_head_ce(hidden, params["norm"], params["head"]["kernel"],
                                           labels, chunk_size=48)
    np.testing.assert_allclose(float(nll_a), float(nll_b), rtol=1e-6)
    assert int(n_a) == int(n_b) and int(cor_a) == int(cor_b)


def test_save_logits_mode_matches_recompute(monkeypatch):
    """loss.save_ce_logits keeps bf16 logits as a remat residual instead of
    recomputing them in backward — loss AND grads must be identical to the
    recompute path (same bf16 logits either way)."""
    cfg, params, ids, pos, seg, labels = _setup()
    hidden = model_forward(cfg, params, ids, pos, seg, train=True, return_hidden=True)

    def loss_fn(p):
        nll, n_valid, _ = fused_norm_head_ce(
            hidden, p["norm"], p["head"]["kernel"], labels, chunk_size=16)
        return nll / jnp.maximum(n_valid, 1)

    monkeypatch.setenv("IEVO_CE_SAVE_LOGITS", "0")
    l_re, g_re = jax.value_and_grad(loss_fn)(params)
    monkeypatch.setenv("IEVO_CE_SAVE_LOGITS", "1")
    l_sv, g_sv = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(l_re), float(l_sv), rtol=1e-7)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7), g_re, g_sv)


def test_remat_save_mlp_grads_match():
    """model.remat_save_mlp only changes WHAT the remat policy saves — the
    training grads must be unchanged."""
    import dataclasses

    cfg, params, ids, pos, seg, labels = _setup()
    cfg = dataclasses.replace(cfg, checkpoint=1.0)  # engage full-remat policy
    cfg_save = dataclasses.replace(cfg, remat_save_mlp=True)

    def loss_with(cfg_):
        def f(p):
            logits = model_forward(cfg_, p, ids, pos, seg, train=True)
            loss, _ = cross_entropy_loss(logits.reshape(-1, cfg.vocab_size), labels.reshape(-1))
            return loss
        return f

    l1, g1 = jax.value_and_grad(loss_with(cfg))(params)
    l2, g2 = jax.value_and_grad(loss_with(cfg_save))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-7)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7), g1, g2)
