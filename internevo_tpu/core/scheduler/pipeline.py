"""Pipeline-parallel train step.

Parity: reference ``PipelineScheduler.forward_backward_step``
(``pipeline_scheduler.py:671``) — here the schedule lives in
``parallel/pipeline.pipeline_loss_fn`` and this module wraps it with the
optimizer step, mirroring ``no_pipeline.make_train_step``'s surface so the
Engine/Trainer are schedule-agnostic (like the reference's scheduler swap in
``initialize_trainer``, ``initialize/initialize_trainer.py:86-122``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ...models.base import ModelDef
from ...parallel.pipeline import pipeline_loss_fn
from ...parallel.sharding import ShardingRules
from ...solver.optimizer import AdamWConfig, GradScalerConfig, optimizer_step


def make_pipeline_train_step(
    model: ModelDef,
    adam_cfg: AdamWConfig,
    scaler_cfg: GradScalerConfig,
    rules: ShardingRules,
    pp: int,
    label_smoothing: float = 0.0,
    num_chunks: int = 1,
    donate: bool = True,
    moe_loss_coeff: float = 0.01,
) -> Callable:
    """The pipeline microbatch loop replaces the grad-accumulation scan: all
    micro_num microbatches flow through the pipeline in one fwd/bwd pass
    (reference behavior: the 1F1B loop consumes every micro batch)."""
    # initialize_model stores interleaved-pp block params in pipeline order
    # permanently (no per-step take/un-take resharding)
    loss_fn = pipeline_loss_fn(model.config, rules.mesh, pp, label_smoothing,
                               num_chunks=num_chunks, tp_mode=rules.tp_mode,
                               moe_loss_coeff=moe_loss_coeff, pre_permuted=True)

    # stochastic layers (residual dropout, MoE gate noise) draw from the SAME
    # stream derivation as the non-pipeline scheduler: (base seed, optimizer
    # step, micro, layer, tag) — at dp_total=1 the pp>1 loss curve is
    # bit-identical to pp=1 under dropout
    cfg = model.config
    moe_stochastic = getattr(cfg, "num_experts", 1) > 1 and (
        getattr(cfg, "moe_use_rts", True)
        or getattr(cfg, "top_k", 1) >= 2
        or getattr(cfg, "moe_noisy_gate_policy", None) is not None)
    stochastic = getattr(cfg, "drop_rate", 0.0) > 0.0 or moe_stochastic
    if stochastic:
        from ..context import gpc

        base_rng = gpc.rng("dropout")

    def train_step(params, opt_state, batch, lr, beta2):
        scale = opt_state["grad_scale"]
        step_rng = (jax.random.fold_in(base_rng, opt_state["step"].astype(jnp.int32))
                    if stochastic else None)

        def scaled_loss(p):
            loss, aux = loss_fn(p, batch, step_rng)
            return loss * scale, aux

        grads, (loss, n_tok, n_cor, moe_loss) = jax.grad(
            scaled_loss, has_aux=True)(params)
        new_params, new_opt_state, stats = optimizer_step(
            params, grads, opt_state, lr, beta2, adam_cfg=adam_cfg, scaler_cfg=scaler_cfg
        )
        metrics = {
            "loss": loss,
            "grad_norm": stats["grad_norm"],
            "grad_norm_groups": stats["grad_norm_groups"],
            "found_inf": stats["found_inf"],
            "loss_scale": stats["loss_scale"],
            "num_skipped": stats["num_skipped"],
            "n_tokens": n_tok,
            "acc": n_cor / jnp.maximum(n_tok, 1),
            "perplexity": jnp.exp(loss),
            "moe_loss": moe_loss,
        }
        return new_params, new_opt_state, metrics

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)
