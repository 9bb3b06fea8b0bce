"""HybridZeroOptimizer, TPU-native.

Parity target: reference ``internlm/solver/optimizer/hybrid_zero_optim.py`` —
ZeRO-1/1.5 AdamW with fp32 master weights over bf16 params, bucketed gradient
reduction overlapped with backward, per-group gradient-norm computation with
inf/nan sentinels, dynamic loss scaling with skip-on-overflow, and post-step
parameter broadcast.

TPU-native design: all of the reference's hand-written machinery (param->rank
greedy partition :254-284, flat fp16/fp32 buffers :193-223, backward-hook bucket
reduce :290-367, post-step broadcast :809-837) collapses into *sharding specs*:

- gradients arrive already reduced over (dp, zero) because XLA inserts the
  reduce for replicated params during backward (and overlaps it);
- optimizer state (fp32 master + adam moments) is sharded over the ``zero``
  mesh axis by ``zero_shard_specs`` — GSPMD's equivalent of the flat-shard
  partition, with the all-gather of updated params fused into the next step;
- ``overlap_sync_grad``/``overlap_sync_param`` config knobs become no-ops
  (XLA's latency-hiding scheduler owns the overlap).

Kept with identical semantics: DynamicGradScaler (ref ``optimizer/utils.py:431``),
skip-step on non-finite grads (ref :706-737), global-norm clipping, and the
norm/loss-scale reporting contract (-1 = overflow, -2 = nan).
"""

from __future__ import annotations

import dataclasses
import re
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class AdamWConfig:
    lr: float = 1e-4
    betas: tuple[float, float] = (0.9, 0.95)
    eps: float = 1e-8
    weight_decay: float = 0.01
    clip_grad_norm: float = 1.0


@dataclasses.dataclass
class GradScalerConfig:
    """Reference ``DynamicGradScaler`` (``solver/optimizer/utils.py:431``)."""

    initial_scale: float = 1.0  # 2**16 for fp16; 1 for bf16/fp32
    growth_factor: float = 2.0
    backoff_factor: float = 0.5
    growth_interval: int = 1000
    hysteresis: int = 2
    min_scale: Optional[float] = 1.0
    max_scale: Optional[float] = 2.0**24


def init_optimizer_state(params, scaler_cfg: GradScalerConfig | None = None) -> dict:
    """fp32 master copy + adam moments + step + grad-scaler state."""
    scaler_cfg = scaler_cfg or GradScalerConfig()
    master = jax.tree.map(lambda p: p.astype(jnp.float32), params)
    return {
        "step": jnp.zeros((), jnp.int32),
        "master": master,
        "m": jax.tree.map(jnp.zeros_like, master),
        "v": jax.tree.map(jnp.zeros_like, master),
        "grad_scale": jnp.asarray(scaler_cfg.initial_scale, jnp.float32),
        "growth_tracker": jnp.zeros((), jnp.int32),
        "hysteresis_tracker": jnp.asarray(0, jnp.int32),  # overflow steps so far (ref _hysteresis_step)
        "num_skipped": jnp.zeros((), jnp.int32),
    }


_FP32_KEYS = frozenset({"norm", "norm1", "norm2", "norm1_bias", "norm2_bias"})
_EMBED_HEAD_KEYS = frozenset({"embedding", "head"})
# residual-MoE mixing coefficient is a DENSE-branch param (ref moe/moe.py:66-99
# — not flagged IS_EXPERT_PARAM), so it stays in the default group even though
# it lives under the "moe" subtree
_MOE_DENSE_LEAVES = frozenset({"coefficient", "coefficient_bias"})


def param_group_of(path: str) -> str:
    """Reference optimizer param groups (``train/utils.py:11-84`` /
    ``create_param_groups``): ``embed_head`` (embedding + output head, the
    IS_TENSOR_DATA_PARALLEL group), ``fp32`` (norm weights kept in fp32),
    ``moe`` (expert-parallel params), ``default`` (everything else).

    Classification is by EXACT tree-key segments (the flag-table analogue of
    the reference's explicit param flags) — substring matching would silently
    regroup any future param whose name merely contains "norm"/"moe"/"head"."""
    segs = re.findall(r"\['([^']+)'\]", path) or path.strip("/.").split("/")
    if "moe" in segs:
        return "default" if segs[-1] in _MOE_DENSE_LEAVES else "moe"
    if any(s in _EMBED_HEAD_KEYS for s in segs):
        return "embed_head"
    if any(s in _FP32_KEYS for s in segs):
        return "fp32"
    return "default"


def param_group_norms(tree, pre_scale=1.0) -> dict:
    """Per-group L2 grad norms — the reference's per-step ``grad_norm`` dict
    (``hybrid_zero_optim.py:598-645`` computes one norm per param group and
    ``record_current_batch_training_metrics`` logs the dict).

    ``pre_scale`` is folded into the per-leaf reduction (``sum((g*s)^2)``) so
    loss-scaled fp16 grads are unscaled BEFORE squaring — squaring first can
    overflow f32 under large dynamic scales and fake an inf skip."""
    sums: dict[str, list] = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        group = param_group_of(jax.tree_util.keystr(path))
        sums.setdefault(group, []).append(
            jnp.sum(jnp.square(leaf.astype(jnp.float32) * pre_scale))
        )
    return {g: jnp.sqrt(jnp.sum(jnp.stack(v))) for g, v in sums.items()}


def global_norm(tree, pre_scale=1.0) -> jax.Array:
    """L2 norm over the whole grad tree, fp32 accumulation.

    Reference ``compute_norm`` (``optimizer/utils.py:265``) routes per-group
    partial norms through TP/WP/PIPELINE/ZERO all-reduces guided by the
    IS_*_PARALLEL flags; under GSPMD the grads are unpartitioned values of the
    global tensors, so a plain sum IS the global norm — XLA inserts the psums.
    ``pre_scale`` is applied per-element before squaring (see
    ``param_group_norms``) — still one fused read, no f32 grads tree."""
    leaves = [
        jnp.sum(jnp.square(g.astype(jnp.float32) * pre_scale))
        for g in jax.tree.leaves(tree)
    ]
    return jnp.sqrt(jnp.sum(jnp.stack(leaves)))


def _use_fused_adamw() -> bool:
    """Opt-in (``IEVO_FUSED_ADAM=1``): the Pallas fused-AdamW kernel.

    Measured SLOWER than XLA's own update fusions e2e at 700m (57.5% vs
    70.0% MFU, BENCH r4 A/B): the 16MB scoped-vmem stack cap forces
    (128, 1024) blocks whose ~3us/grid-step overhead exceeds the ~5us of
    HBM traffic each block carries, while XLA's fusions stream the same
    update at ~80-87% of bandwidth with no grid overhead.  Kept as an
    opt-in for hardware/toolchains with a larger scoped-vmem budget."""
    import os

    return os.environ.get("IEVO_FUSED_ADAM") in ("1", "true", "True")


def optimizer_step(
    params,
    grads,
    state: dict,
    lr: jax.Array,
    beta2: jax.Array | float | None = None,
    adam_cfg: AdamWConfig = AdamWConfig(),
    scaler_cfg: GradScalerConfig = GradScalerConfig(),
    param_dtype=jnp.bfloat16,
):
    """One AdamW step on the fp32 masters; returns (new_params, new_state, stats).

    ``grads`` are the raw (possibly loss-scaled) gradients of the bf16 params.
    Overflow semantics (ref ``hybrid_zero_optim.py:695-807``): non-finite grads
    skip the update, bump num_skipped and back off the scale; grad norm is
    computed on unscaled grads and clipped to clip_grad_norm.
    """
    beta1, beta2_default = adam_cfg.betas
    beta2 = beta2_default if beta2 is None else beta2
    scale = state["grad_scale"]

    # norms on unscaled grads, computed from the raw (possibly scaled) grads
    # with 1/scale folded INTO the per-leaf reduction — one bf16 read, no f32
    # grads tree, and the unscale happens before squaring so scale-amplified
    # elements can't overflow f32 inside the square
    inv_scale = 1.0 / scale
    norm = global_norm(grads, inv_scale)
    group_norms = param_group_norms(grads, inv_scale)
    found_inf = ~jnp.isfinite(norm)

    if adam_cfg.clip_grad_norm > 0:
        clip_coef = jnp.minimum(1.0, adam_cfg.clip_grad_norm / (norm + 1e-6))
    else:  # reference convention: clip_grad_norm == 0 disables clipping
        clip_coef = jnp.asarray(1.0, jnp.float32)
    clip_coef = jnp.where(found_inf, 0.0, clip_coef)
    gscale = clip_coef * inv_scale  # folded unscale+clip multiplier

    step = state["step"] + jnp.where(found_inf, 0, 1)
    t = step.astype(jnp.float32)
    bias1 = 1.0 - beta1**t
    bias2 = 1.0 - beta2**t

    def upd(m, v, g, master):
        g = g.astype(jnp.float32) * gscale
        m_new = beta1 * m + (1 - beta1) * g
        v_new = beta2 * v + (1 - beta2) * jnp.square(g)
        update = (m_new / bias1) / (jnp.sqrt(v_new / bias2) + adam_cfg.eps)
        master_new = master - lr * (update + adam_cfg.weight_decay * master)
        keep = found_inf
        return (
            jnp.where(keep, m, m_new),
            jnp.where(keep, v, v_new),
            jnp.where(keep, master, master_new),
        )

    use_fused = _use_fused_adamw()
    if use_fused:
        from ..ops.pallas.fused_adamw import fused_adamw_supported, fused_adamw_update

        scalars = jnp.stack([
            jnp.asarray(lr, jnp.float32),
            jnp.asarray(beta1, jnp.float32),
            jnp.asarray(beta2, jnp.float32),
            1.0 / bias1,
            1.0 / bias2,
            jnp.asarray(adam_cfg.eps, jnp.float32),
            jnp.asarray(adam_cfg.weight_decay, jnp.float32),
            gscale,
            found_inf.astype(jnp.float32),
        ])

    flat_m, tdef = jax.tree.flatten(state["m"])
    flat_v = jax.tree.leaves(state["v"])
    flat_g = jax.tree.leaves(grads)
    flat_master = jax.tree.leaves(state["master"])
    flat_p = jax.tree.leaves(params)
    new_m, new_v, new_master, new_p = [], [], [], []
    for m, v, g, w, p in zip(flat_m, flat_v, flat_g, flat_master, flat_p):
        if use_fused and fused_adamw_supported(g, p.dtype):
            a, b, c, d = fused_adamw_update(g, m, v, w, scalars)
        else:
            a, b, c = upd(m, v, g, w)
            d = c.astype(p.dtype)
        new_m.append(a)
        new_v.append(b)
        new_master.append(c)
        new_p.append(d)
    new_m = jax.tree.unflatten(tdef, new_m)
    new_v = jax.tree.unflatten(tdef, new_v)
    new_master = jax.tree.unflatten(tdef, new_master)
    # bf16 working params re-derived from masters (keep 1-D params fp32 like the
    # reference's fp32 norm group when use_fp32_norm)
    new_params = jax.tree.unflatten(tdef, new_p)

    # ---- dynamic grad scaler update (ref utils.py:484-522, exact semantics:
    # hysteresis_step counts UP on overflow; once it reaches hysteresis every
    # further overflow backs off (NO reset after backoff); a growth event
    # resets it to 0)
    growth = state["growth_tracker"] + 1
    hyst = jnp.where(found_inf, state["hysteresis_tracker"] + 1, state["hysteresis_tracker"])
    do_backoff = found_inf & (hyst >= scaler_cfg.hysteresis)
    do_growth = (~found_inf) & (growth >= scaler_cfg.growth_interval)
    new_scale = jnp.where(do_backoff, jnp.maximum(scale * scaler_cfg.backoff_factor, scaler_cfg.min_scale or 1.0), scale)
    new_scale = jnp.where(do_growth, jnp.minimum(new_scale * scaler_cfg.growth_factor, scaler_cfg.max_scale or new_scale * scaler_cfg.growth_factor), new_scale)
    new_state = {
        "step": step,
        "master": new_master,
        "m": new_m,
        "v": new_v,
        "grad_scale": new_scale,
        "growth_tracker": jnp.where(found_inf | do_growth, 0, growth),
        "hysteresis_tracker": jnp.where(do_growth, 0, hyst),
        "num_skipped": state["num_skipped"] + found_inf.astype(jnp.int32),
    }
    # reference sentinel contract (utils.py:372-376): -1 = inf, -2 = nan
    norm_rep = jnp.where(jnp.isnan(norm), -2.0, jnp.where(jnp.isinf(norm), -1.0, norm))
    stats = {
        "grad_norm": norm_rep,
        "grad_norm_groups": group_norms,
        "found_inf": found_inf,
        "loss_scale": scale,
        "num_skipped": new_state["num_skipped"],
    }
    return new_params, new_state, stats
