#!/usr/bin/env python
"""OpenAI-compatible chat-completions server (reference ``tools/openai_api.py``).

Same endpoints and payload shapes as the reference FastAPI app —
``GET /internlm/models`` and ``POST /internlm/chat/completions`` (plus the
standard ``/v1/…`` aliases) with the reference's message folding (leading
system message concatenated onto the query, user/assistant history pairs) and
its SSE streaming framing (first chunk carries the assistant role delta, then
content deltas, a finish chunk, then ``data: [DONE]``).

This environment has no fastapi/uvicorn/sse_starlette and zero egress, so the
server is stdlib ``http.server`` (ThreadingHTTPServer); generation runs the
TPU-native paths — the fused one-dispatch decode loop for non-streaming
requests, per-token jitted steps for streaming (``apis/interface.py``).

Usage:
    python tools/openai_api.py --config configs/demo.py [--ckpt DIR]
        [--tokenizer HF_PATH | bytes] [--host 0.0.0.0] [--port 8000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class ByteTokenizer:
    """Dependency-free fallback tokenizer: UTF-8 bytes as token ids (+offset
    clear of the special ids).  For smoke tests and tokenizer-less configs —
    real serving passes an HF tokenizer path."""

    OFFSET = 3  # keep 0/1/2 free for pad/bos/eos

    def encode(self, text: str):
        return [b + self.OFFSET for b in text.encode("utf-8")]

    def decode(self, ids):
        # ids beyond the byte range (vocab > 259) fold back onto bytes — this
        # tokenizer only has to be total, not meaningful, for untrained models
        data = bytes((i - self.OFFSET) & 0xFF for i in ids if i >= self.OFFSET)
        return data.decode("utf-8", errors="replace")


def build_chat_prompt(query: str, history: list) -> str:
    """InternLM chat template (the HF modeling's ``build_inputs`` the
    reference serves through ``model.chat``)."""
    prompt = ""
    for q, a in history:
        prompt += f"<s><|User|>:{q}<eoh>\n<|Bot|>:{a}<eoa>\n"
    prompt += f"<s><|User|>:{query}<eoh>\n<|Bot|>:"
    return prompt


def parse_messages(messages: list):
    """Reference request handling (``openai_api.py:95-110``): the last message
    must be from the user; a leading system message folds onto the query;
    preceding user/assistant pairs become history."""
    if not messages or messages[-1].get("role") != "user":
        raise ValueError("Invalid request: last message must have role 'user'")
    query = messages[-1]["content"]
    prev = list(messages[:-1])
    if prev and prev[0].get("role") == "system":
        query = prev.pop(0)["content"] + query
    history = []
    if len(prev) % 2 == 0:
        for i in range(0, len(prev), 2):
            if prev[i].get("role") == "user" and prev[i + 1].get("role") == "assistant":
                history.append([prev[i]["content"], prev[i + 1]["content"]])
    return query, history


class ChatBackend:
    """Wraps a SequenceGenerator + tokenizer behind the two generation modes
    the endpoints need.  A lock serializes generations (one device)."""

    def __init__(self, generator, tokenizer, model_id: str = "internlm",
                 max_new_tokens: int = 256):
        self.generator = generator
        self.tokenizer = tokenizer
        self.model_id = model_id
        self.max_new_tokens = max_new_tokens
        self.lock = threading.Lock()

    def _gen_params(self, req: dict, prompt_len: int):
        temperature = req.get("temperature")
        top_p = req.get("top_p")
        max_new = req.get("max_length") or self.max_new_tokens
        return dict(
            max_length=prompt_len + int(max_new),
            do_sample=temperature is None or temperature > 0,
            temperature=temperature if temperature is not None else 0.8,
            top_p=top_p if top_p is not None else 0.8,
        )

    def chat(self, req: dict) -> str:
        query, history = parse_messages(req["messages"])
        ids = self.tokenizer.encode(build_chat_prompt(query, history))
        p = self._gen_params(req, len(ids))
        import jax.numpy as jnp

        with self.lock:
            out = self.generator.generate(
                jnp.asarray(ids, jnp.int32)[None], max_length=p["max_length"],
                do_sample=p["do_sample"], temperature=p["temperature"],
                top_p=p["top_p"])
        row = [int(t) for t in out[0][len(ids):]]
        stop_ids = {self.generator.eos_token_id, self.generator.pad_token_id}
        row = [t for t in row if t not in stop_ids]
        return self.tokenizer.decode(row)

    def stream_chat(self, req: dict):
        """Yields the response text so far (the reference's ``stream_chat``)."""
        from internevo_tpu.apis.interface import GenerationConfig, generate_interactive

        query, history = parse_messages(req["messages"])
        ids = self.tokenizer.encode(build_chat_prompt(query, history))
        p = self._gen_params(req, len(ids))
        gc = GenerationConfig(max_length=p["max_length"], do_sample=p["do_sample"],
                              temperature=p["temperature"], top_p=p["top_p"])
        with self.lock:
            for out_ids in generate_interactive(self.generator, ids, gc):
                yield self.tokenizer.decode(out_ids)


def _chunk(model_id: str, delta: dict, finish_reason=None) -> dict:
    return {
        "model": model_id,
        "object": "chat.completion.chunk",
        "choices": [{"index": 0, "delta": delta, "finish_reason": finish_reason}],
    }


def make_handler(backend: ChatBackend):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default
            if os.environ.get("IEVO_API_VERBOSE"):
                super().log_message(fmt, *args)

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj, ensure_ascii=False).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Access-Control-Allow-Origin", "*")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/internlm/models", "/v1/models"):
                card = {"id": backend.model_id, "object": "model",
                        "created": int(time.time()), "owned_by": "owner",
                        "root": None, "parent": None, "permission": None}
                self._json(200, {"object": "list", "data": [card]})
            else:
                self._json(404, {"detail": "Not Found"})

        def do_POST(self):
            if self.path not in ("/internlm/chat/completions", "/v1/chat/completions"):
                self._json(404, {"detail": "Not Found"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                if req.get("stream"):
                    self._stream(req)
                    return
                text = backend.chat(req)
            except ValueError as e:
                self._json(400, {"detail": str(e)})
                return
            except Exception as e:  # noqa: BLE001 - surface as HTTP 500
                self._json(500, {"detail": f"{type(e).__name__}: {e}"})
                return
            self._json(200, {
                "model": req.get("model", backend.model_id),
                "object": "chat.completion",
                "choices": [{
                    "index": 0,
                    "message": {"role": "assistant", "content": text},
                    "finish_reason": "stop",
                }],
            })

        def _stream(self, req: dict):
            model_id = req.get("model", backend.model_id)
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Access-Control-Allow-Origin", "*")
            # SSE has no fixed length; close the connection to delimit
            self.send_header("Connection", "close")
            self.end_headers()

            def send(obj):
                if isinstance(obj, str):
                    payload = obj
                else:
                    payload = json.dumps(obj, ensure_ascii=False)
                self.wfile.write(f"data: {payload}\r\n\r\n".encode("utf-8"))
                self.wfile.flush()

            # reference framing: role chunk, content deltas, finish, [DONE]
            send(_chunk(model_id, {"role": "assistant"}))
            current = 0
            for so_far in backend.stream_chat(req):
                if len(so_far) == current:
                    continue
                send(_chunk(model_id, {"content": so_far[current:]}))
                current = len(so_far)
            send(_chunk(model_id, {}, finish_reason="stop"))
            send("[DONE]")

    return Handler


def make_server(backend: ChatBackend, host: str = "127.0.0.1", port: int = 0):
    return ThreadingHTTPServer((host, port), make_handler(backend))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/demo.py")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--tokenizer", default="bytes",
                        help="HF tokenizer path, or 'bytes' for the UTF-8 fallback")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--max_new_tokens", type=int, default=256)
    args = parser.parse_args()

    from web_demo import build_generator

    generator = build_generator(args.config, args.ckpt)
    if args.tokenizer == "bytes":
        tokenizer = ByteTokenizer()
    else:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer, trust_remote_code=True)
    backend = ChatBackend(generator, tokenizer, max_new_tokens=args.max_new_tokens)
    server = make_server(backend, args.host, args.port)
    print(f"serving OpenAI-compatible API on http://{args.host}:{server.server_address[1]}")
    server.serve_forever()


if __name__ == "__main__":
    main()
