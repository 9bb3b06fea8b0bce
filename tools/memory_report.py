#!/usr/bin/env python
"""XLA-exact memory report for a bench preset's train step.

Usage: IEVO_BENCH_PRESET=700m python tools/memory_report.py
Prints argument/output/temp/peak bytes from ``compiled.memory_analysis()``
plus the top-10 largest live buffers in the optimized HLO — the
buffer-assignment-grounded answer to the reference SimpleMemoryProfiler's
per-module timeline (``utils/simple_memory_profiler.py:205+``).
Works on the CPU mesh too (IEVO_PLATFORM=cpu, tiny preset).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("IEVO_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["IEVO_PLATFORM"])


def main():
    from profile_step import build_step

    from internevo_tpu.utils.simple_memory_profiler import SimpleMemoryProfiler

    step, params, batch = build_step()
    prof = SimpleMemoryProfiler(params or {})
    if params is None:
        # full-trainer preset: reach the engine through the closure
        cells = dict(zip(step.__code__.co_freevars, step.__closure__ or ()))
        trainer = cells["trainer"].cell_contents
        batch = cells["batch"].cell_contents
        compiled = trainer.engine.lower_step(batch)
        prof.params = trainer.engine.params
        prof.opt_state = trainer.engine.opt_state
    else:
        compiled = step.lower(params, batch).compile()
    report = prof.compiled_report(compiled, top_n=10)
    report["static_layout"] = prof.layout_report()
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
