#!/usr/bin/env python
"""Measured comm/compute overlap evidence for the GSPMD ZeRO/ISP path.

The reference hides its weight all-gathers with the hand-written
``ISPCommunicator`` prefetch machinery (``core/communication/isp.py:143-527``).
The TPU rebuild shards isp weights over (zero, tp) and relies on XLA's
latency-hiding scheduler.  This tool measures that claim on the SCHEDULED
program: it AOT-compiles one FULL train step of a 7B-shaped isp config against
an 8-chip v5e topology with pass dumping enabled, takes the
``after_latency-hiding-scheduler`` HLO (``is_scheduled=true`` — instruction
order IS execution order), and for every async collective start/done pair
counts the compute ops (dot/fusion/custom-call) the scheduler placed INSIDE
the in-flight window.  That is the overlap the hardware executes, not a
compiler-intent marker.

Writes doc/overlap_evidence.md.  Run:  python tools/overlap_evidence.py
"""

from __future__ import annotations

import glob
import os
import re
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

DUMP_DIR = os.environ.get("IEVO_OVERLAP_DUMP", "")

if not DUMP_DIR:
    # XLA flags must be set before the backend initializes — re-exec with the
    # dump enabled (scheduler passes only, to keep the dump small)
    DUMP_DIR = tempfile.mkdtemp(prefix="ievo_overlap_")
    env = dict(os.environ)
    env["IEVO_OVERLAP_DUMP"] = DUMP_DIR
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        f" --xla_dump_to={DUMP_DIR}"
                        " --xla_dump_hlo_pass_re=.*latency-hiding.*")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import jax  # noqa: E402


def _parse_computations(text: str):
    """Split a scheduled HLO module into computations -> list of instruction
    lines (in schedule order)."""
    comps, cur = {}, None
    # a computation header is `[ENTRY ]%name (params...) -> type {` — the
    # param list may contain `=` (tuple element comments like /*index=5*/),
    # so the old `"=" not in ln` check silently DROPPED every computation
    # with a wide tuple parameter (i.e. the while loop bodies where all the
    # async collectives live); match the shape instead
    hdr_re = re.compile(r"^(ENTRY\s+)?%[\w.\-]+\s*\(")
    for ln in text.splitlines():
        stripped = ln.strip()
        if stripped.endswith("{") and not ln.startswith("  ") and hdr_re.match(stripped):
            name = stripped.split()[1 if stripped.startswith("ENTRY") else 0]
            name = name.lstrip("%").split("(")[0]
            cur = []
            comps[name] = cur
            continue
        if stripped == "}":
            cur = None
            continue
        if cur is not None and "=" in ln:
            cur.append(stripped)
    return comps


# NB: op types can be TUPLES with spaces — `%x = (bf16[...], bf16[...])
# all-gather-start(...)` — so the type is matched non-greedily, not as \S+
WORK_RE = re.compile(r"= .*?\b(dot|fusion|convolution|custom-call)\(")
START_RE = re.compile(
    r"%([\w.\-]+) = .*?\b(all-gather-start|all-reduce-start|reduce-scatter-start|"
    r"collective-permute-start|async-start)\(")


def _analyze(comps):
    """For each async start, find its done in the same computation and count
    compute ops scheduled inside the window."""
    windows = []
    for cname, lines in comps.items():
        is_work = [bool(WORK_RE.search(ln)) for ln in lines]
        for i, ln in enumerate(lines):
            m = START_RE.search(ln)
            if not m:
                continue
            name, kind = m.group(1), m.group(2).replace("-start", "")
            pat = "%" + name
            done = None
            for j in range(i + 1, len(lines)):
                if (pat + ")" in lines[j] or pat + "," in lines[j]
                        or pat + " " in lines[j]):
                    done = j
                    break
            if done is None:
                continue
            work = sum(is_work[i + 1 : done])
            windows.append((cname, kind, i, done, work))
    return windows


def main():
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import NamedSharding, PartitionSpec as P

    from internevo_tpu.core.context import gpc
    from internevo_tpu.core.scheduler.no_pipeline import make_train_step
    from internevo_tpu.initialize.launch import launch
    from internevo_tpu.parallel.sharding import get_rules
    from internevo_tpu.solver.optimizer import init_optimizer_state
    from internevo_tpu.train.pipeline import _adam_cfg, _scaler_cfg
    from internevo_tpu.utils.registry import MODEL_INITIALIZER
    import internevo_tpu.models  # noqa: F401

    topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x4")
    devices = list(topo.devices)

    seq, vocab = 2048, 103168  # 7B dims
    config = dict(
        model_type="INTERNLM2",
        data=dict(seq_len=seq, micro_num=1, micro_bsz=1, total_steps=4),
        model=dict(checkpoint=1.0, num_attention_heads=32, num_kv_attention_heads=8,
                   vocab_size=vocab, embed_grad_scale=1, parallel_output=True,
                   hidden_size=4096, num_layers=4, mlp_ratio=8 / 3, no_bias=True,
                   dtype="torch.bfloat16", norm_type="rmsnorm", layer_norm_epsilon=1e-5),
        adam=dict(lr=1e-4, adam_beta1=0.9, adam_beta2=0.95, adam_beta2_c=0,
                  adam_eps=1e-8, weight_decay=0.01),
        parallel=dict(zero1=dict(size=4), tensor=dict(size=2, mode="isp"),
                      pipeline=dict(size=1), weight=dict(size=8)),
    )
    launch(config, seed=1024, devices=devices)
    rules = get_rules()
    model = MODEL_INITIALIZER.get_module("INTERNLM2")(
        **{k: v for k, v in config["model"].items()}, max_segment_len=seq)

    def sds(tree_shapes, tree_specs):
        return jax.tree.map(
            lambda s, spec: jax.ShapeDtypeStruct(
                s.shape, s.dtype, sharding=NamedSharding(rules.mesh, spec)),
            tree_shapes, tree_specs, is_leaf=lambda x: isinstance(x, jax.ShapeDtypeStruct))

    key_sds = jax.ShapeDtypeStruct((2,), jnp.uint32)
    param_shapes = jax.eval_shape(model.init, key_sds)
    param_specs = model.specs()
    params_sds = sds(param_shapes, param_specs)
    scaler_cfg = _scaler_cfg()
    opt_shapes = jax.eval_shape(lambda p: init_optimizer_state(p, scaler_cfg), param_shapes)
    opt_specs = {
        "step": P(), "grad_scale": P(), "growth_tracker": P(),
        "hysteresis_tracker": P(), "num_skipped": P(),
        "master": rules.zero_shard_specs(param_specs, param_shapes),
        "m": rules.zero_shard_specs(param_specs, param_shapes),
        "v": rules.zero_shard_specs(param_specs, param_shapes),
    }
    opt_sds = sds(opt_shapes, opt_specs)
    dp = gpc.sizes.dp_total
    bspec = P(None, ("dp", "ep", "zero"))
    batch_sds = {
        k: jax.ShapeDtypeStruct((1, dp, seq), jnp.int32,
                                sharding=NamedSharding(rules.mesh, bspec))
        for k in ("input_ids", "segment_ids", "indexes", "labels")
    }
    scalar = jax.ShapeDtypeStruct((), jnp.float32)

    train_step = make_train_step(model, _adam_cfg(), scaler_cfg, rules)
    train_step.lower(params_sds, opt_sds, batch_sds, scalar, scalar).compile()

    dumps = sorted(glob.glob(os.path.join(
        DUMP_DIR, "*after_latency-hiding-scheduler*.txt")))
    if not dumps:
        raise SystemExit(f"no latency-hiding-scheduler dump found in {DUMP_DIR}")
    # the train step is the largest dumped module
    path = max(dumps, key=os.path.getsize)
    text = open(path).read()
    assert "is_scheduled=true" in text.splitlines()[0], "dump is not scheduled HLO"

    comps = _parse_computations(text)
    windows = _analyze(comps)
    async_total = len(windows)
    overlapped = [w for w in windows if w[4] > 0]
    sync_colls = len(re.findall(
        r"= \S+ (all-gather|all-reduce|reduce-scatter|collective-permute)\(", text))
    by_kind = {}
    for _, kind, _, _, work in windows:
        agg = by_kind.setdefault(kind, [0, 0, 0])
        agg[0] += 1
        agg[1] += 1 if work > 0 else 0
        agg[2] += work

    out = [
        "# Comm/compute overlap evidence — MEASURED on the scheduled program",
        "",
        "Generated by `tools/overlap_evidence.py`: one full train step of a",
        "7B-shaped InternLM2 slice (hidden 4096, GQA 32q/8kv, vocab 103168,",
        "seq 2048, 4 layers, full remat) AOT-compiled for an 8-chip v5e",
        "topology in isp mode with weight.size=8 — weights ZeRO-3-sharded over",
        "the full (zero, tp) weight group, exactly the reference's",
        "ISPCommunicator regime (`core/communication/isp.py:143-527`).",
        "",
        "Unlike the round-2 version of this document (which counted the",
        "compiler's async-intent markers on PRE-scheduling HLO), these numbers",
        "come from the `after_latency-hiding-scheduler` dump: the module is",
        "`is_scheduled=true`, so instruction order IS the device execution",
        "order, and every compute op between an `X-start` and its `X-done` is",
        "work the chip executes while that transfer is in flight — the overlap",
        "the reference implements by hand with ISPCommunicator prefetch.",
        "",
        f"- async collective start/done pairs in the scheduled module: {async_total}",
        f"- pairs with >= 1 compute op (dot/fusion/custom-call) scheduled inside "
        f"the in-flight window: {len(overlapped)} "
        f"(**{100 * len(overlapped) / max(async_total, 1):.0f}% measured overlap**)",
        f"- total compute ops inside in-flight windows: {sum(w[4] for w in windows)}",
        f"- collectives left synchronous by the scheduler: {sync_colls}",
        "",
        "Per collective kind (pairs / overlapped / compute ops in windows):",
        "",
        "| kind | async pairs | overlapped | compute ops inside |",
        "|---|---|---|---|",
    ]
    for kind, (n, ov, work) in sorted(by_kind.items()):
        out.append(f"| {kind} | {n} | {ov} | {work} |")
    out += [
        "",
        "Top in-flight windows (scheduled order):",
        "",
        "| computation | kind | schedule slots | compute ops inside |",
        "|---|---|---|---|",
    ]
    for cname, kind, si, di, work in sorted(windows, key=lambda w: -w[4])[:15]:
        out.append(f"| {cname} | {kind} | {si}..{di} | {work} |")
    out.append("")
    out.append(f"Scheduled-HLO source: `{os.path.basename(path)}` "
               f"({len(text.splitlines())} lines).")
    text_out = "\n".join(out) + "\n"
    open("doc/overlap_evidence.md", "w").write(text_out)
    print(text_out)
    if not os.environ.get("IEVO_OVERLAP_KEEP"):
        shutil.rmtree(DUMP_DIR, ignore_errors=True)


if __name__ == "__main__":
    main()
