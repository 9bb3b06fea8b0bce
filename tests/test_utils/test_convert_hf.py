"""HF converter tests: roundtrip identity + logit parity vs transformers' Llama.

The logit-parity test is the strongest cross-framework check available in this
environment: build a tiny random HF LlamaForCausalLM (torch cpu), import its
weights via from_hf_llama, and compare output logits token-for-token.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from internevo_tpu.checkpoint.convert import (
    from_hf_llama,
    merge_wqkv,
    split_wqkv,
    to_hf_internlm2,
    from_hf_internlm2,
    to_hf_llama,
)
from internevo_tpu.models import ModelConfig
from internevo_tpu.models.base import init_params, model_forward
from internevo_tpu.ops.attention import set_use_pallas


@pytest.fixture(autouse=True)
def _no_pallas():
    set_use_pallas(False)
    yield
    set_use_pallas(None)


def _cfg(**kw):
    d = dict(num_layers=2, hidden_size=64, num_attention_heads=4,
             num_kv_attention_heads=2, vocab_size=128, mlp_ratio=2.0,
             multiple_of=32, dtype=jnp.float32, qkv_bias=False, o_bias=False,
             embed_grad_scale=1)
    d.update(kw)
    return ModelConfig(**d)


def test_wqkv_split_merge_roundtrip():
    cfg = _cfg()
    rng = np.random.RandomState(0)
    wqkv = rng.randn(cfg.hidden_size, (cfg.q_per_kv + 2) * cfg.num_kv_attention_heads * cfg.head_dim)
    q, k, v = split_wqkv(cfg, wqkv)
    back = merge_wqkv(cfg, q, k, v)
    np.testing.assert_array_equal(wqkv, back)


def test_hf_llama_roundtrip():
    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(0))
    sd = to_hf_llama(params, cfg)
    params2 = from_hf_llama(sd, cfg, dtype=jnp.float32)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(np.asarray(a, np.float32),
                                                         np.asarray(b, np.float32), rtol=1e-6),
                 params, params2)


def test_hf_internlm2_roundtrip():
    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(0))
    sd = to_hf_internlm2(params, cfg)
    params2 = from_hf_internlm2(sd, cfg, dtype=jnp.float32)
    for key in ("embedding", "norm", "head"):
        jax.tree.map(lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6),
                     params[key], params2[key])


def test_logit_parity_vs_transformers_llama():
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=64,
        rms_norm_eps=1e-5, rope_theta=10000.0, attention_bias=False, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf_model = LlamaForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}

    cfg = _cfg(mlp_ratio=1.0, multiple_of=32)  # intermediate 64
    assert cfg.mlp_hidden == 64
    params = from_hf_llama(sd, cfg, dtype=jnp.float32)

    ids = np.random.RandomState(1).randint(0, 128, (2, 16)).astype(np.int32)
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids.astype(np.int64))).logits.numpy()

    pos = jnp.tile(jnp.arange(16), (2, 1))
    seg = jnp.ones((2, 16), jnp.int32)
    ours = model_forward(cfg, params, jnp.asarray(ids), pos, seg, train=False)
    np.testing.assert_allclose(np.asarray(ours), hf_logits, rtol=2e-4, atol=2e-4)
