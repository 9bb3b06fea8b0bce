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


def test_meta_llama_roundtrip_and_shard_merge():
    """to_meta_llama -> (split into 2 fake tp shards) -> merge -> from_meta_llama
    reproduces the tree bit-for-bit (ckpt_type='llama' tensor path,
    reference load_funcs.py:16-70)."""
    from internevo_tpu.checkpoint.convert import (
        from_meta_llama, merge_meta_llama_shards, to_meta_llama,
    )

    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(3))
    sd = to_meta_llama(params, cfg)

    # split into 2 tp shards with the reference's column/row conventions
    dim0 = ("attention.wq", "attention.wk", "attention.wv",
            "feed_forward.w1", "feed_forward.w3", "output")
    dim1 = ("attention.wo", "feed_forward.w2", "tok_embeddings")
    shards = [{}, {}]
    for key, w in sd.items():
        if any(m in key for m in dim0):
            h = w.shape[0] // 2
            shards[0][key], shards[1][key] = w[:h], w[h:]
        elif any(m in key for m in dim1):
            h = w.shape[1] // 2
            shards[0][key], shards[1][key] = w[:, :h], w[:, h:]
        else:
            shards[0][key] = shards[1][key] = w
    merged = merge_meta_llama_shards(shards)
    params2 = from_meta_llama(merged, cfg, dtype=jnp.float32)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=1e-6),
        params, params2)


def test_hf_internlm_roundtrip_with_biases():
    """InternLM1-family HF converter (reference convert2hf_internlm.py /
    revert_internlm.py): llama key space + qkv/o biases round-trips."""
    from internevo_tpu.checkpoint.convert import from_hf_internlm, to_hf_internlm

    cfg = _cfg(qkv_bias=True, o_bias=True)
    params = init_params(cfg, jax.random.PRNGKey(4))
    sd = to_hf_internlm(params, cfg)
    assert "model.layers.0.self_attn.q_proj.bias" in sd
    assert "model.layers.0.self_attn.o_proj.bias" in sd
    params2 = from_hf_internlm(sd, cfg, dtype=jnp.float32)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=1e-6),
        params, params2)


def test_meta_llama_ckpt_type_resumes_training(tmp_path):
    """load_ckpt_info=dict(ckpt_type='llama', ...) loads Meta-format torch
    weights through the CheckpointManager registry (the reference's
    LOAD_FUNC_DICT entry that our docstrings promised but round 4 never
    registered): the engine's params equal the exported tree and a forward
    produces the same logits."""
    torch = pytest.importorskip("torch")
    from internevo_tpu.checkpoint.checkpoint_manager import LOAD_FUNC_DICT
    from internevo_tpu.checkpoint.convert import to_meta_llama

    assert "llama" in LOAD_FUNC_DICT

    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(5))
    sd = to_meta_llama(params, cfg)
    folder = tmp_path / "meta_llama"
    folder.mkdir()
    torch.save({k: torch.tensor(v) for k, v in sd.items()},
               str(folder / "consolidated.00.pth"))

    class _Model:
        config = cfg

    class _Engine:
        model = _Model()
        params = None

    eng = _Engine()
    ok = LOAD_FUNC_DICT["llama"](eng, None, str(folder), None)
    assert ok and eng.params is not None

    ids = np.random.RandomState(2).randint(0, cfg.vocab_size, (1, 16)).astype(np.int32)
    pos = jnp.tile(jnp.arange(16), (1, 1))
    seg = jnp.ones((1, 16), jnp.int32)
    ref = model_forward(cfg, params, jnp.asarray(ids), pos, seg, train=False)
    got = model_forward(cfg, eng.params, jnp.asarray(ids), pos, seg, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)
