#!/usr/bin/env python
"""Decode (serving) throughput: tokens/s for the fused on-device decode loop.

Usage: python tools/bench_decode.py [--batch 8] [--gen 128] [--preset 700m]
The floor for small batches is HBM bandwidth (every generated token re-reads
all params): ~2ms/token at 822M bf16 on v5e (1.65GB / 819GB/s).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prompt", type=int, default=32)
    ap.add_argument("--gen", type=int, default=128)
    ap.add_argument("--sample", action="store_true")
    args = ap.parse_args()

    from internevo_tpu.apis.inference import SequenceGenerator
    from internevo_tpu.models import ModelConfig
    from internevo_tpu.models.base import ModelDef, init_params

    cfg = ModelConfig(num_layers=12, hidden_size=2048, num_attention_heads=16,
                      vocab_size=50304, mlp_ratio=8 / 3, dtype=jnp.bfloat16,
                      no_bias=True)
    params = jax.jit(lambda r: init_params(cfg, r))(jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(params))
    print(f"model: {n_params/1e6:.0f}M params bf16")

    model = ModelDef(config=cfg, init=lambda r: params, apply=None)
    gen = SequenceGenerator((model, params), eos_token_id=-1)  # never stops early

    rng = np.random.RandomState(0)
    prompt = jnp.asarray(rng.randint(10, cfg.vocab_size, (args.batch, args.prompt)), jnp.int32)
    max_length = args.prompt + args.gen

    out = gen.generate(prompt, max_length=max_length, do_sample=args.sample)  # compile
    assert out.shape == (args.batch, max_length), out.shape

    n_iter = 5
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = gen.generate(prompt, max_length=max_length, do_sample=args.sample, seed=i)
    np.asarray(out[0, -1])
    dt = (time.perf_counter() - t0) / n_iter

    new_tokens = args.batch * args.gen
    per_tok = dt / args.gen
    hbm_floor = n_params * 2 / 819e9
    print(f"decode: {dt*1e3:8.1f} ms for {args.gen} steps x batch {args.batch}"
          f"  ->  {new_tokens/dt:8.1f} tok/s  ({per_tok*1e3:.2f} ms/step,"
          f" HBM floor {hbm_floor*1e3:.2f} ms/step)")


if __name__ == "__main__":
    main()
