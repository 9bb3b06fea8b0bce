#!/usr/bin/env python
"""Microbenchmark the splash attention kernels (fwd / dq+dkv backward) at
flagship (7B-shaped) dimensions on the real chip.

Usage: python tools/bench_splash.py [--seq 4096] [--bq 1024] [--bk 1024]
Prints per-kernel wall time and useful-TFLOP estimates.
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
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--seg-len", type=int, default=2048)
    ap.add_argument("--bq", type=int, default=None)
    ap.add_argument("--bk", type=int, default=None)
    args = ap.parse_args()

    from internevo_tpu.ops.pallas.splash_attention import splash_attention

    B, S, H, Hkv, D = args.batch, args.seq, args.heads, args.kv_heads, args.head_dim
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, S, H, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, S, Hkv, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, S, Hkv, D), jnp.bfloat16)
    n_seg = S // args.seg_len
    seg = jnp.asarray(np.repeat(np.arange(1, n_seg + 1, dtype=np.int32), args.seg_len)[None].repeat(B, 0))

    kw = dict(segment_ids=seg, causal=True, max_segment_len=args.seg_len, interpret=False)
    if args.bq:
        kw["block_q"] = args.bq
    if args.bk:
        kw["block_k"] = args.bk

    fwd = jax.jit(lambda q, k, v: splash_attention(q, k, v, **kw))

    def loss(q, k, v):
        return jnp.sum(splash_attention(q, k, v, **kw).astype(jnp.float32) ** 2)

    bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    from _timing import timeit

    t_fwd = timeit(fwd, q, k, v)
    t_all = timeit(bwd, q, k, v)

    # useful flops: causal within segments.  pairs per row-block ~ sum over
    # segments of s_len^2/2; fwd = 2 matmuls (s, pv); canonical bwd = 5.
    pairs = B * n_seg * (args.seg_len ** 2 / 2) * H
    f_fwd = 2 * 2 * pairs * D
    f_bwd = 5 * 2 * pairs * D
    print(f"fwd   {t_fwd*1e3:8.3f} ms   {f_fwd/t_fwd/1e12:7.2f} TF/s useful")
    print(f"f+bwd {t_all*1e3:8.3f} ms   (bwd alone ~{(t_all-t_fwd)*1e3:.3f} ms, "
          f"{f_bwd/max(t_all-t_fwd,1e-9)/1e12:7.2f} TF/s useful)")


if __name__ == "__main__":
    main()
