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
    from bench import build_bench_config, build_full_config
    from internevo_tpu.core.context import gpc
    from internevo_tpu.initialize.launch import launch
    from internevo_tpu.train.pipeline import (
        initialize_model, initialize_optimizer, initialize_trainer,
    )

    preset = os.environ.get("IEVO_BENCH_PRESET", "7bshape")
    p = build_bench_config(preset)
    # the bench's own config assembly: the profiled program IS the benched one
    launch(build_full_config(p), seed=1024)
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

    if not p.get("fwd_bwd_only"):
        # full train step through the real trainer (grad accum + optimizer)
        opt_state, lr_sched, beta2_sched = initialize_optimizer(model, params)
        trainer = initialize_trainer(model, params, opt_state, lr_sched, beta2_sched)

        def execute():
            return trainer.execute_schedule(batch)

        return execute, None, None

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
    if params is None:
        run = step
        sync = lambda out: float(out["loss"])
    else:
        run = lambda: step(params, batch)
        sync = lambda out: float(out[0])
    sync(run())  # compile + settle
    sync(run())

    tracedir = "/tmp/ievo_profile"
    os.system(f"rm -rf {tracedir}")
    with jax.profiler.trace(tracedir):
        for _ in range(3):
            out = run()
        sync(out)

    planes = glob.glob(f"{tracedir}/**/*.xplane.pb", recursive=True)
    assert planes, f"no xplane under {tracedir}"
    from jax.profiler import ProfileData

    data = ProfileData.from_serialized_xspace(open(planes[-1], "rb").read())
    evs = []
    for plane in data.planes:
        if plane.name != "/device:TPU:0":
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                evs.append((ev.start_ns, ev.start_ns + ev.duration_ns, ev.name))
    evs.sort()
    # exclusive time: while/call parents contain their body ops on the same
    # timeline; subtract directly-nested children via a containment stack
    exclusive = defaultdict(float)
    stack = []
    for s, e, name in evs:
        while stack and stack[-1][1] <= s:
            stack.pop()
        if stack:
            exclusive[stack[-1][2]] -= (e - s)
        exclusive[name] += (e - s)
        stack.append((s, e, name))
    total = sum(exclusive.values())
    print(f"\nexclusive device op time: {total/1e6/3:.2f} ms/step")
    print("\n== top 35 ops (exclusive) ==")
    for k, v in sorted(exclusive.items(), key=lambda kv: -kv[1])[:35]:
        print(f"  {v/1e6/3:8.3f} ms/step {100*v/total:5.1f}%  {k[:105]}")


if __name__ == "__main__":
    main()
