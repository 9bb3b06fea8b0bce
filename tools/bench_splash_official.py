#!/usr/bin/env python
"""Bench the OFFICIAL jax splash-attention kernel at the same shapes as
tools/bench_splash.py — a yardstick for what our kernel should achieve.

Uses a causal+local-ish mask equivalent to the packed-segment workload:
segments of seg_len tokens -> block-diagonal causal. The official kernel takes
static masks (per-batch dynamic segment layouts need its segment-ids path).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas.ops.tpu.splash_attention import splash_attention_kernel as sk
from jax.experimental.pallas.ops.tpu.splash_attention import splash_attention_mask as sm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--seg-len", type=int, default=2048)
    ap.add_argument("--bq", type=int, default=1024)
    ap.add_argument("--bk", type=int, default=1024)
    args = ap.parse_args()

    B, S, H, Hkv, D = args.batch, args.seq, args.heads, args.kv_heads, args.head_dim
    rng = np.random.RandomState(0)
    # official layout: (heads, seq, head_dim), vmapped over batch
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16) * (D ** -0.5)
    k = jnp.asarray(rng.randn(B, Hkv, S, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, Hkv, S, D), jnp.bfloat16)

    n_seg = S // args.seg_len
    seg = np.repeat(np.arange(n_seg), args.seg_len)
    causal = sm.CausalMask((S, S))
    block = sm.NumpyMask(seg[:, None] == seg[None, :])
    mask = sm.MultiHeadMask([sm.LogicalAnd(causal, block) for _ in range(H // Hkv)])
    bs = sk.BlockSizes(
        block_q=args.bq, block_kv=args.bk, block_kv_compute=args.bk,
        block_q_dkv=args.bq, block_kv_dkv=args.bk, block_kv_dkv_compute=args.bk,
        block_q_dq=args.bq, block_kv_dq=args.bk,
    )
    kernel = sk.make_splash_mqa(mask=mask, block_sizes=bs,
                                head_shards=1, q_seq_shards=1)

    # mqa kernel: q (q_per_kv, S, D) vs single-head kv (S, D); vmap over the
    # kv heads (GQA groups), then over batch.
    def one(qb, kb, vb):
        return jax.vmap(kernel)(qb.reshape(Hkv, H // Hkv, S, D), kb, vb)

    fwd = jax.jit(jax.vmap(one))

    def loss(q, k, v):
        return jnp.sum(fwd(q, k, v).astype(jnp.float32) ** 2)

    bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    from _timing import timeit

    t_fwd = timeit(fwd, q, k, v)
    t_all = timeit(bwd, q, k, v)

    pairs = B * n_seg * (args.seg_len ** 2 / 2) * H
    f_fwd = 2 * 2 * pairs * D
    f_bwd = 5 * 2 * pairs * D
    print(f"official fwd   {t_fwd*1e3:8.3f} ms   {f_fwd/t_fwd/1e12:7.2f} TF/s useful")
    print(f"official f+bwd {t_all*1e3:8.3f} ms   (bwd alone ~{(t_all-t_fwd)*1e3:.3f} ms, "
          f"{f_bwd/max(t_all-t_fwd,1e-9)/1e12:7.2f} TF/s useful)")


if __name__ == "__main__":
    main()
