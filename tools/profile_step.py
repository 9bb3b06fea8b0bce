#!/usr/bin/env python
"""Profile the bench step on the real chip and print a per-op time breakdown.

Usage: IEVO_BENCH_PRESET=7bshape python tools/profile_step.py
Aggregates XLA op durations from the jax profiler xplane by fusion-name
family (fusion / custom-call kernel / convert / transpose / ...), so the
"where does the non-MXU 25% go" question gets a concrete answer.
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def build_step():
    from bench import build_bench_config
    from internevo_tpu.core.context import gpc
    from internevo_tpu.initialize.launch import launch
    from internevo_tpu.train.pipeline import initialize_model

    preset = os.environ.get("IEVO_BENCH_PRESET", "7bshape")
    p = build_bench_config(preset)
    config = dict(
        model_type="INTERNLM",
        data=dict(seq_len=p["seq"], micro_num=p["micro_num"], micro_bsz=p["micro_bsz"],
                  total_steps=100, packed_length=p["seq"] * p["micro_bsz"]),
        model=dict(checkpoint=p["ckpt"], num_attention_heads=p["heads"], vocab_size=p["vocab"],
                   embed_grad_scale=1, parallel_output=True, hidden_size=p["hidden"],
                   num_layers=p["layers"], mlp_ratio=8 / 3, dtype="torch.bfloat16",
                   norm_type="rmsnorm", layer_norm_epsilon=1e-5),
        adam=dict(lr=1e-4, adam_beta1=0.9, adam_beta2=0.95, adam_beta2_c=0,
                  adam_eps=1e-8, weight_decay=0.01),
        parallel=dict(zero1=dict(size=-1), tensor=dict(size=1, mode="mtp"),
                      pipeline=dict(size=1), weight=dict(size=1)),
    )
    launch(config, seed=1024)
    model, params = initialize_model()

    from internevo_tpu.core.scheduler.no_pipeline import _micro_loss_and_metrics

    micro_num, micro_bsz, seq = p["micro_num"], p["micro_bsz"], p["seq"]
    P_len = seq * micro_bsz
    dp = gpc.sizes.dp_total
    rng = np.random.RandomState(0)
    seg_row = np.repeat(np.arange(1, micro_bsz + 1, dtype=np.int32), seq)
    batch = {
        "input_ids": jnp.asarray(rng.randint(0, p["vocab"], (micro_num, dp, P_len), dtype=np.int32)),
        "segment_ids": jnp.asarray(np.tile(seg_row, (micro_num, dp, 1))),
        "indexes": jnp.asarray(np.tile(np.arange(seq, dtype=np.int32), (micro_num, dp, micro_bsz))),
        "labels": jnp.asarray(rng.randint(0, p["vocab"], (micro_num, dp, P_len), dtype=np.int32)),
    }

    def fb_step(params, batch):
        micro = {k: v[0] for k, v in batch.items()}

        def loss_fn(p_):
            loss, metrics = _micro_loss_and_metrics(model, p_, micro)
            return loss, metrics

        grads, (loss, *_rest) = jax.grad(loss_fn, has_aux=True)(params)
        gsum = sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree.leaves(grads))
        return loss, gsum

    step = jax.jit(fb_step)
    return step, params, batch


def family(name: str) -> str:
    """Collapse an XLA op name to a readable family."""
    n = name.lower()
    if "splash" in n or ("custom-call" in n and "tpu_custom_call" in n):
        return "pallas-kernel"
    for key in ("fusion", "custom-call", "copy", "convert", "transpose", "dot",
                "all-reduce", "reduce", "dynamic-slice", "dynamic-update",
                "broadcast", "iota", "select", "scatter", "bitcast"):
        if key in n:
            return key
    return n.split(".")[0][:40]


def main():
    step, params, batch = build_step()
    out = step(params, batch)
    _ = float(out[0])  # compile + settle

    tracedir = "/tmp/ievo_profile"
    os.system(f"rm -rf {tracedir}")
    with jax.profiler.trace(tracedir):
        for _ in range(3):
            out = step(params, batch)
        _ = float(out[0])

    planes = glob.glob(f"{tracedir}/**/*.xplane.pb", recursive=True)
    assert planes, f"no xplane under {tracedir}"
    from jax.profiler import ProfileData

    data = ProfileData.from_serialized_xspace(open(planes[-1], "rb").read())
    per_op = defaultdict(float)
    per_name = defaultdict(float)
    total = 0.0
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            lname = line.name.lower()
            # device op timelines: "XLA Ops" / step lines; skip host threads
            if "op" not in lname and "step" not in lname and not lname.startswith("xla"):
                continue
            if "step" in lname:
                continue
            for ev in line.events:
                dur = ev.duration_ns / 1e6
                per_op[family(ev.name)] += dur
                per_name[ev.name] += dur
                total += dur

    print(f"\ntotal device op time over 3 steps: {total:.2f} ms  ({total/3:.2f} ms/step)")
    print("\n== by family ==")
    for k, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {k:28s} {v/3:9.3f} ms/step  {100*v/total:5.1f}%")
    print("\n== top 25 ops ==")
    for k, v in sorted(per_name.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {k[:90]:90s} {v/3:8.3f} ms/step")


if __name__ == "__main__":
    main()
