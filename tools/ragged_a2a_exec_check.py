#!/usr/bin/env python
"""EXECUTE `lax.ragged_all_to_all` on real hardware and compare against the
jnp emulation on the same inputs.

The CI mesh is XLA:CPU, which cannot execute the op (`_ragged_a2a_available`
routes CPU to `_ragged_a2a_emulated`), so all dropless-EP equivalence tests
exercise emulation-vs-spec semantics only; the TPU evidence in
`doc/moe_a2a_evidence.md` is AOT-lowering-only.  This tool closes the gap on
whatever TPU topology is reachable: it builds an ep mesh over ALL visible
devices, runs the full `dropless_moe_apply_ep` forward (both collectives live:
the real `lax.ragged_all_to_all` and the emulation) and asserts outputs, aux
loss and counts agree.  At ep=1 the op executes degenerately (rows relocate
within one chip — numerics of the lowering, not the wire); the first
multi-chip window runs the identical command and validates the wire too.

Usage (real chip):  python tools/ragged_a2a_exec_check.py
Mirrored by tests/test_model/test_moe.py::test_ragged_a2a_executes_on_device,
which is skipped-with-reason on the CPU mesh.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def run_check(ep: int | None = None, verbose: bool = True) -> dict:
    from jax.sharding import Mesh, PartitionSpec as P

    from internevo_tpu.models.moe.dropless import (
        _ragged_a2a_emulated, dropless_moe_apply_ep,
    )

    ep = ep or len(jax.devices())
    B, S, H, M, E = 4, 64, 128, 256, 8
    assert E % ep == 0, (E, ep)
    key = jax.random.PRNGKey(11)
    layer = {
        "gate": jax.random.normal(key, (H, E), jnp.float32) * 0.1,
        "experts": {
            "w1": jax.random.normal(jax.random.fold_in(key, 1), (E, H, M)) * 0.05,
            "w3": jax.random.normal(jax.random.fold_in(key, 2), (E, H, M)) * 0.05,
            "w2": jax.random.normal(jax.random.fold_in(key, 3), (E, M, H)) * 0.05,
        },
    }
    x = jax.random.normal(jax.random.fold_in(key, 4), (B, S, H))
    mesh = Mesh(np.array(jax.devices()[:ep]), ("ep",))

    def make_run(a2a):
        def local(gate, experts, xx):
            return dropless_moe_apply_ep(
                {"gate": gate, "experts": experts}, xx, top_k=2,
                ep_axis="ep", ep_size=ep, train=False, a2a=a2a)

        espec = jax.tree.map(lambda _: P("ep"), layer["experts"])
        return jax.jit(jax.shard_map(
            local, mesh=mesh, in_specs=(P(), espec, P("ep")),
            out_specs=(P("ep"), P(), P()), axis_names={"ep"}, check_vma=False))

    # a2a=None -> _ragged_a2a_available() decides; force the REAL op by
    # passing it explicitly so this check cannot silently fall back
    real = make_run(jax.lax.ragged_all_to_all)
    emu = make_run(_ragged_a2a_emulated)

    out_r, aux_r, cnt_r = jax.tree.map(np.asarray, real(layer["gate"], layer["experts"], x))
    out_e, aux_e, cnt_e = jax.tree.map(np.asarray, emu(layer["gate"], layer["experts"], x))

    np.testing.assert_array_equal(cnt_r, cnt_e)
    np.testing.assert_allclose(aux_r, aux_e, rtol=1e-5)
    np.testing.assert_allclose(out_r, out_e, rtol=2e-4, atol=2e-5)
    result = {
        "backend": jax.default_backend(),
        "device": jax.devices()[0].device_kind,
        "ep": ep,
        "tokens": B * S,
        "experts": E,
        "max_abs_diff": float(np.max(np.abs(out_r - out_e))),
        "counts_sum": int(cnt_r.sum()),
    }
    if verbose:
        print("ragged_all_to_all EXECUTED and matches emulation:", result)
    return result


if __name__ == "__main__":
    if jax.default_backend() == "cpu":
        print("refusing to run on XLA:CPU (the op cannot execute there); "
              "run on a TPU host", file=sys.stderr)
        sys.exit(2)
    run_check()
