"""OpenAI-compatible API server + streaming interface.

Parity targets: reference ``tools/openai_api.py`` (endpoints, message folding,
SSE framing) and ``tools/interface.py`` (``generate_interactive`` streaming).
"""

import json
import sys
import threading
import urllib.request
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "tools"))

from internevo_tpu.apis.inference import SequenceGenerator
from internevo_tpu.apis.interface import GenerationConfig, generate_interactive
from internevo_tpu.models import ModelConfig
from internevo_tpu.models.base import init_params
from internevo_tpu.ops.attention import set_use_pallas
from openai_api import ByteTokenizer, ChatBackend, make_server, parse_messages


@pytest.fixture(autouse=True)
def _no_pallas():
    set_use_pallas(False)
    yield
    set_use_pallas(None)


def _generator():
    cfg = ModelConfig(num_layers=2, hidden_size=64, num_attention_heads=4,
                      num_kv_attention_heads=2, vocab_size=512, mlp_ratio=2.0,
                      multiple_of=32, dtype=jnp.float32, qkv_bias=False, o_bias=False)
    params = init_params(cfg, jax.random.PRNGKey(0))

    class _M:
        config = cfg

    return SequenceGenerator((_M, params))


@pytest.fixture(scope="module")
def server_url():
    set_use_pallas(False)
    backend = ChatBackend(_generator(), ByteTokenizer(), max_new_tokens=8)
    srv = make_server(backend)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url, payload):
    req = urllib.request.Request(url, data=json.dumps(payload).encode(),
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_models_endpoint(server_url):
    for route in ("/internlm/models", "/v1/models"):
        with urllib.request.urlopen(server_url + route, timeout=30) as r:
            body = json.loads(r.read())
        assert body["object"] == "list" and body["data"][0]["id"] == "internlm"


def test_chat_completion_roundtrip(server_url):
    payload = {
        "model": "internlm",
        "messages": [
            {"role": "system", "content": "Be terse. "},
            {"role": "user", "content": "hi"},
            {"role": "assistant", "content": "hello"},
            {"role": "user", "content": "again?"},
        ],
        "temperature": 0,  # greedy -> deterministic
        "max_length": 6,
    }
    status, body = _post(server_url + "/v1/chat/completions", payload)
    assert status == 200, body
    choice = body["choices"][0]
    assert choice["message"]["role"] == "assistant"
    assert choice["finish_reason"] == "stop"
    assert body["object"] == "chat.completion"
    # deterministic: a second identical request returns the same text
    _, body2 = _post(server_url + "/internlm/chat/completions", payload)
    assert body2["choices"][0]["message"]["content"] == choice["message"]["content"]


def test_chat_completion_stream_matches_nonstream(server_url):
    payload = {"model": "internlm", "temperature": 0, "max_length": 6,
               "messages": [{"role": "user", "content": "hi"}]}
    status, body = _post(server_url + "/v1/chat/completions", payload)
    assert status == 200

    req = urllib.request.Request(
        server_url + "/v1/chat/completions",
        data=json.dumps({**payload, "stream": True}).encode(),
        headers={"Content-Type": "application/json"})
    chunks = []
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        for raw in r:
            line = raw.decode().strip()
            if line.startswith("data: "):
                chunks.append(line[len("data: "):])
    assert chunks[-1] == "[DONE]"
    frames = [json.loads(c) for c in chunks[:-1]]
    # reference framing: role delta first, finish chunk last
    assert frames[0]["choices"][0]["delta"] == {"role": "assistant"}
    assert frames[-1]["choices"][0]["finish_reason"] == "stop"
    text = "".join(f["choices"][0]["delta"].get("content", "") for f in frames)
    assert text == body["choices"][0]["message"]["content"]


def test_invalid_request_rejected(server_url):
    status, body = _post(server_url + "/v1/chat/completions",
                         {"model": "x", "messages": [{"role": "assistant", "content": "?"}]})
    assert status == 400, body


def test_parse_messages_reference_semantics():
    query, history = parse_messages([
        {"role": "system", "content": "S."},
        {"role": "user", "content": "a"},
        {"role": "assistant", "content": "b"},
        {"role": "user", "content": "c"},
    ])
    assert query == "S.c"
    assert history == [["a", "b"]]


def test_generate_interactive_matches_fused_greedy():
    """Streaming per-token decode must emit exactly the fused one-dispatch
    loop's greedy tokens (same decode graph, same argmax)."""
    gen = _generator()
    prompt = [5, 9, 42, 7]
    fused = gen.generate(jnp.asarray(prompt, jnp.int32)[None], max_length=12,
                         do_sample=False)
    fused_new = [int(t) for t in np.asarray(fused)[0][len(prompt):]]
    fused_new = [t for t in fused_new if t not in (gen.eos_token_id, gen.pad_token_id)]

    streamed = None
    gc = GenerationConfig(max_length=12, do_sample=False)
    for streamed in generate_interactive(gen, prompt, gc):
        pass
    assert streamed == fused_new, (streamed, fused_new)


# ------------------------------------------------------------- PAL inference


def test_pal_runtime_and_code_extraction():
    from pal_inference import GenericRuntime, PALInterface, process_generation_to_code

    gen_text = "Sure:\n```python\ndef solution():\n    a = 2\n    b = 3\n    return a * b\n```\ndone"
    code = process_generation_to_code(gen_text)
    rt = GenericRuntime()
    rt.exec_code("\n".join(code))
    assert rt.eval_code("solution()") == 6

    class _StubPAL(PALInterface):
        def _stream(self, prompt):
            yield "partial"
            yield gen_text

    pal = _StubPAL(generator=None, tokenizer=None, generation_config=None)
    assert pal.run("ignored") == 6
    assert pal.history == [gen_text]
    # broken code scores as None (wrong), not a crash
    class _BadPAL(PALInterface):
        def _stream(self, prompt):
            yield "```python\ndef solution():\n    return 1/0\n```"

    assert _BadPAL(None, None, None).run("x") is None
