"""Memory accounting and live device-memory reporting.

Parity: reference ``internlm/utils/simple_memory_profiler.py`` — module-tree
parameter/gradient/optimizer-state memory layout + activation estimation with
fwd/bwd timeline (:15-675).  On TPU the ground truth is the COMPILER's buffer
assignment, not module hooks: ``compiled_report`` reads the jitted step's
``memory_analysis()`` (argument/output/temp/peak bytes, XLA-exact) and names
the largest live buffers from the optimized HLO — strictly more accurate than
the reference's per-module estimates, since XLA's remat/fusion decide what is
actually live.  Live runtime numbers come from ``device.memory_stats()``; the
static tree breakdown from the param/optimizer pytrees.
"""

from __future__ import annotations

import json
import re
from typing import Any, Optional

import jax
import numpy as np

from .logger import get_logger

logger = get_logger(__name__)

_DTYPE_BYTES = {"f64": 8, "s64": 8, "u64": 8, "f32": 4, "s32": 4, "u32": 4,
                "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
                "s8": 1, "u8": 1, "pred": 1, "f8e4m3fn": 1, "f8e5m2": 1}

_HLO_DECL = re.compile(r"^\s+(?:ROOT )?%?([\w.\-]+) = ")
# the opcode is the first lowercase word directly followed by '(' — layout
# annotations like {2,1,0:T(8,128)(2,1)} never match (T is uppercase, the
# inner parens follow ')' or digits, not a space-separated lowercase word)
_HLO_OPCODE = re.compile(r" ([a-z][a-z0-9\-_]*)\(")
_HLO_SHAPE = re.compile(r"(f64|f32|bf16|f16|f8e4m3fn|f8e5m2|s64|s32|s16|s8|"
                        r"u64|u32|u16|u8|pred)\[([\d,]*)\]")
_HLO_METADATA = re.compile(r'op_name="([^"]*)"')


def top_hlo_buffers(hlo_text: str, n: int = 5) -> list:
    """The n largest VALUES declared in optimized HLO: (bytes, op, kind,
    jax op_name) — the concrete 'what is the memory' answer the reference's
    per-module layout approximates.  Tuple-valued ops count each element."""
    seen: dict[str, tuple] = {}
    for line in hlo_text.splitlines():
        d = _HLO_DECL.match(line)
        if not d:
            continue
        name = d.group(1)
        opm = _HLO_OPCODE.search(line, d.end() - 1)
        if not opm:
            continue
        opkind = opm.group(1)
        # parameters/constants are argument bytes; tuples/while/gte/bitcast
        # are structural aliases of buffers declared elsewhere
        if opkind in ("parameter", "constant", "tuple", "while", "conditional",
                      "get-tuple-element", "bitcast", "optimization-barrier"):
            continue
        total = 0
        # value type(s) live between '=' and the opcode; operand shapes after
        for dt, dims in _HLO_SHAPE.findall(line[d.end():opm.start()]):
            numel = int(np.prod([int(x) for x in dims.split(",") if x])) if dims else 1
            total += numel * _DTYPE_BYTES[dt]
        if total <= 0:
            continue
        meta = _HLO_METADATA.search(line)
        prev = seen.get(name)
        if prev is None or total > prev[0]:
            seen[name] = (total, name, opkind, meta.group(1) if meta else "")
    top = sorted(seen.values(), key=lambda t: -t[0])[:n]
    return [dict(bytes=b, op=name, kind=kind, op_name=op_name)
            for b, name, kind, op_name in top]


def _tree_bytes(tree) -> int:
    return sum(int(np.prod(x.shape)) * x.dtype.itemsize for x in jax.tree.leaves(tree))


def _fmt(n: int) -> str:
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if abs(n) < 1024:
            return f"{n:.2f}{unit}"
        n /= 1024
    return f"{n:.2f}PB"


class SimpleMemoryProfiler:
    """Static layout + periodic live snapshots."""

    def __init__(self, params, opt_state=None, log_file: Optional[str] = None,
                 activation_config: Optional[dict] = None):
        self.params = params
        self.opt_state = opt_state
        self.log_file = log_file
        self.activation_config = activation_config or {}
        self._step = 0

    def layout_report(self) -> dict:
        report: dict[str, Any] = {"params": {}}
        for key, sub in self.params.items():
            report["params"][key] = _fmt(_tree_bytes(sub))
        report["params_total"] = _fmt(_tree_bytes(self.params))
        if self.opt_state is not None:
            report["optimizer_total"] = _fmt(_tree_bytes(self.opt_state))
        ac = self.activation_config
        if ac:
            # bf16 activations per token per layer for a pre-norm SwiGLU block
            h, m, layers = ac.get("hidden_size", 0), ac.get("mlp_hidden", 0), ac.get("num_layers", 0)
            tokens = ac.get("tokens_per_device", 0)
            per_token = 2 * (h * 6 + m * 2) * layers
            report["activation_estimate"] = _fmt(per_token * tokens)
        return report

    def compiled_report(self, compiled, top_n: int = 5) -> dict:
        """XLA-exact memory report for a compiled step: argument (params +
        optimizer + batch, minus donation aliases), output, temp, and the
        compiler's own peak estimate, plus the top-N largest HLO buffers by
        name (reference SimpleMemoryProfiler's per-module timeline analogue,
        computed from the buffer ground truth instead of hooks)."""
        mem = compiled.memory_analysis()
        report = {
            "argument": _fmt(mem.argument_size_in_bytes),
            "aliased": _fmt(mem.alias_size_in_bytes),
            "output": _fmt(mem.output_size_in_bytes),
            "temp": _fmt(mem.temp_size_in_bytes),
            "peak_compiled": _fmt(getattr(mem, "peak_memory_in_bytes", 0) or 0),
            "resident_estimate": _fmt(
                mem.argument_size_in_bytes - mem.alias_size_in_bytes
                + mem.output_size_in_bytes + mem.temp_size_in_bytes),
        }
        try:
            bufs = top_hlo_buffers(compiled.as_text(), top_n)
            report["top_buffers"] = [
                dict(b, bytes=_fmt(b["bytes"])) for b in bufs]
        except Exception as exc:  # HLO text unavailable on some backends
            report["top_buffers_error"] = str(exc)
        return report

    def note_compiled(self, compiled) -> dict:
        """Emit the compiled-step report once into the JSONL timeline."""
        report = {"step": self._step, "compiled": self.compiled_report(compiled)}
        line = json.dumps(report)
        if self.log_file:
            with open(self.log_file, "a") as f:
                f.write(line + "\n")
        else:
            logger.info("memory(compiled): %s", line)
        return report

    def device_memory_stats(self) -> dict:
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            return {
                "bytes_in_use": _fmt(stats.get("bytes_in_use", 0)),
                "peak_bytes_in_use": _fmt(stats.get("peak_bytes_in_use", 0)),
                "bytes_limit": _fmt(stats.get("bytes_limit", 0)),
            }
        except Exception:
            return {}

    def step(self) -> None:
        self._step += 1
        if self._step in (1, 5) or self._step % 100 == 0:
            report = {"step": self._step, **self.layout_report(), **self.device_memory_stats()}
            line = json.dumps(report)
            if self.log_file:
                with open(self.log_file, "a") as f:
                    f.write(line + "\n")
            else:
                logger.info("memory: %s", line)
