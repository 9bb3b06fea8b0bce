"""Generation API: kv-cache decode equivalence vs full forward, sampling filters.

Parity targets: reference ``internlm/apis/inference.py`` generation paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from internevo_tpu.apis.inference import (
    SequenceGenerator,
    init_kv_cache,
    model_decode_step,
    top_k_top_p_filtering,
)
from internevo_tpu.models import ModelConfig
from internevo_tpu.models.base import init_params, model_forward
from internevo_tpu.ops.attention import set_use_pallas


@pytest.fixture(autouse=True)
def _no_pallas():
    set_use_pallas(False)
    yield
    set_use_pallas(None)


def _model():
    cfg = ModelConfig(num_layers=2, hidden_size=64, num_attention_heads=4,
                      num_kv_attention_heads=2, vocab_size=128, mlp_ratio=2.0,
                      multiple_of=32, dtype=jnp.float32, qkv_bias=False, o_bias=False)
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_decode_matches_full_forward():
    """Prefill+decode logits must equal the training forward on the same tokens."""
    cfg, params = _model()
    B, S = 2, 16
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, cfg.vocab_size)
    pos = jnp.tile(jnp.arange(S), (B, 1))
    seg = jnp.ones((B, S), jnp.int32)
    full_logits = model_forward(cfg, params, ids, pos, seg, train=False)

    cache = init_kv_cache(cfg, B, S)
    prefill_logits, cache = model_decode_step(cfg, params, ids[:, : S // 2], cache, jnp.int32(0))
    np.testing.assert_allclose(prefill_logits, full_logits[:, : S // 2], rtol=2e-4, atol=2e-4)

    # token-by-token decode for the second half
    for t in range(S // 2, S):
        logits, cache = model_decode_step(cfg, params, ids[:, t : t + 1], cache, jnp.int32(t))
        np.testing.assert_allclose(logits[:, 0], full_logits[:, t], rtol=2e-4, atol=2e-4)


def test_greedy_generation_deterministic():
    cfg, params = _model()

    class _M:
        config = cfg

    from internevo_tpu.models.base import ModelDef

    model = ModelDef(config=cfg, init=lambda r: params, apply=None)
    gen = SequenceGenerator((model, params), eos_token_id=-1)
    prompt = jnp.asarray([[5, 9, 3]], jnp.int32)
    out1 = gen.generate(prompt, max_length=12, do_sample=False)
    out2 = gen.generate(prompt, max_length=12, do_sample=False)
    np.testing.assert_array_equal(out1, out2)
    assert out1.shape == (1, 12)
    np.testing.assert_array_equal(np.asarray(out1[0, :3]), [5, 9, 3])


def test_sampling_respects_top_k():
    logits = jnp.asarray([[1.0, 2.0, 3.0, 4.0, 5.0]])
    filtered = top_k_top_p_filtering(logits, top_k=2)
    assert bool(jnp.isinf(filtered[0, 0])) and filtered[0, 0] < 0
    assert float(filtered[0, 4]) == 5.0 and float(filtered[0, 3]) == 4.0
    assert bool(jnp.isinf(filtered[0, 2]))


def test_top_p_keeps_nucleus():
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.1, 0.05, 0.05]]))
    filtered = top_k_top_p_filtering(logits, top_p=0.7)
    # 0.5 + 0.3 = 0.8 >= 0.7 -> keep first two, drop rest
    assert not bool(jnp.isinf(filtered[0, 0]))
    assert not bool(jnp.isinf(filtered[0, 1]))
    assert bool(jnp.isinf(filtered[0, 2]))


def test_eos_stops_generation():
    cfg, params = _model()
    from internevo_tpu.models.base import ModelDef

    model = ModelDef(config=cfg, init=lambda r: params, apply=None)
    # force eos to be whatever greedy picks at the first step
    gen0 = SequenceGenerator((model, params), eos_token_id=-1)
    prompt = jnp.asarray([[5, 9, 3]], jnp.int32)
    out = gen0.generate(prompt, max_length=8, do_sample=False)
    first_tok = int(out[0, 3])
    gen = SequenceGenerator((model, params), eos_token_id=first_tok)
    out2 = gen.generate(prompt, max_length=8, do_sample=False)
    assert out2.shape[1] == 4  # prompt(3) + eos, then the loop exits


def test_beam_search_generate():
    cfg, params = _model()
    from internevo_tpu.models.base import ModelDef

    model = ModelDef(config=cfg, init=lambda r: params, apply=None)
    gen = SequenceGenerator((model, params), eos_token_id=-1)
    prompt = jnp.asarray([[5, 9, 3]], jnp.int32)
    beam_out = gen.beam_search_generate(prompt, num_beams=3, max_length=10)
    assert beam_out.shape[0] == 1 and beam_out.shape[1] == 10
    np.testing.assert_array_equal(np.asarray(beam_out[0, :3]), [5, 9, 3])
    # beam-1 must equal greedy
    beam1 = gen.beam_search_generate(prompt, num_beams=1, max_length=10)
    greedy = gen.generate(prompt, max_length=10, do_sample=False)
    np.testing.assert_array_equal(np.asarray(beam1), np.asarray(greedy))
