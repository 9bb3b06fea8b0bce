#!/usr/bin/env python
"""Dump the TPU-compiled HLO of the bench step and print the definition of
ops whose name matches a substring (plus their operand definitions).

Usage: IEVO_BENCH_PRESET=700m python tools/dump_hlo_op.py dynamic-update-slice_fusion.8
Writes the full compiled module to /tmp/ievo_hlo.txt for follow-up greps.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax


def main():
    pattern = sys.argv[1] if len(sys.argv) > 1 else "dynamic-update-slice_fusion"
    from profile_step import build_step

    step, params, batch = build_step()
    if params is None:
        # full-trainer preset: reach the engine's jitted train step through the
        # closure profile_step builds (execute -> trainer.execute_schedule)
        cells = dict(zip(step.__code__.co_freevars, step.__closure__ or ()))
        trainer = cells["trainer"].cell_contents
        batch = cells["batch"].cell_contents
        eng = trainer.engine
        lowered = eng.train_step_fn.lower(eng.params, eng.opt_state, batch,
                                          eng.lr_scheduler.get_lr(0), 0.95)
    else:
        # step is already jitted; lower via the jitted callable
        lowered = step.lower(params, batch)
    compiled = lowered.compile()
    text = compiled.as_text()
    with open("/tmp/ievo_hlo.txt", "w") as f:
        f.write(text)
    print(f"compiled HLO: {len(text.splitlines())} lines -> /tmp/ievo_hlo.txt")

    lines = text.splitlines()
    for i, ln in enumerate(lines):
        if pattern in ln and "=" in ln and ("fusion(" in ln or "dynamic-update-slice" in ln):
            print("=" * 100)
            print(ln.strip()[:2000])


if __name__ == "__main__":
    main()
