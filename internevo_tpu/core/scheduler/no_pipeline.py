"""Non-pipeline train step: grad accumulation over micro batches inside one jit.

Parity: reference ``internlm/core/scheduler/no_pipeline_scheduler.py:28-239`` —
the per-micro loop with loss/grad_accum scaling (loss divided by micro_num
before backward, :143-145) and grad sync only at the end (the reference's
``skip_grad_reduce`` dance disappears: XLA reduces once after the scan).

TPU-native: the micro loop is a ``lax.scan`` over a leading micro axis, so the
whole global step (fwd+bwd x micro_num + optimizer) is ONE compiled program;
collectives for dp-grad reduction appear once, after the scan, exactly like the
reference's "only last micro syncs".  Metrics (token accuracy, perplexity — the
reference's ``AccPerplex``, ``model/metrics.py:55``) are folded into the scan.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ...models.base import ModelDef
from ...ops.cross_entropy import cross_entropy_loss
from ...parallel.sharding import ShardingRules
from ...solver.optimizer import AdamWConfig, GradScalerConfig, optimizer_step


def _micro_loss_and_metrics(model: ModelDef, params, micro, label_smoothing: float = 0.0,
                            moe_loss_coeff: float = 0.01, fused_ce: bool = True,
                            dropout_rng=None, is_train: bool = True):
    cfg = model.config
    moe_loss = jnp.zeros((), jnp.float32)
    if fused_ce and cfg.norm_type == "rmsnorm":
        # fused norm+head+CE: never materializes the (tokens, vocab) logits.
        # MoE models return (hidden, {"moe": aux}) here — the moe step's CE was
        # the profile's #3 cost (~15 ms at the moe preset) before this reuse.
        from ...ops.fused_ce import fused_norm_head_ce, gpc_loss_knobs

        out = model.apply(params, micro["input_ids"], micro["indexes"], micro["segment_ids"],
                          dropout_rng=dropout_rng, train=is_train, return_hidden=True)
        if isinstance(out, tuple):
            hidden, aux = out
            moe_loss = aux.get("moe", moe_loss)
        else:
            hidden = out
        nll_sum, n_valid, n_correct = fused_norm_head_ce(
            hidden, params["norm"], params["head"]["kernel"], micro["labels"],
            eps=cfg.layer_norm_epsilon, embed_grad_scale=cfg.embed_grad_scale,
            norm_head=cfg.norm_head, label_smoothing=label_smoothing,
            **gpc_loss_knobs(),
        )
        ce_loss = nll_sum / jnp.maximum(n_valid, 1)
        loss = ce_loss + moe_loss_coeff * moe_loss
        return loss, (ce_loss, n_valid, n_correct, moe_loss)

    out = model.apply(params, micro["input_ids"], micro["indexes"], micro["segment_ids"],
                      dropout_rng=dropout_rng, train=is_train)
    if isinstance(out, tuple):  # MoE models return (logits, {"moe": aux_loss})
        logits, aux = out
        moe_loss = aux.get("moe", moe_loss)
    else:
        logits = out
    V = logits.shape[-1]
    flat_logits = logits.reshape(-1, V)
    labels = micro["labels"].reshape(-1)
    ce_loss, n_valid = cross_entropy_loss(flat_logits, labels, label_smoothing=label_smoothing)
    loss = ce_loss + moe_loss_coeff * moe_loss
    valid = labels != -100
    pred = jnp.argmax(flat_logits, axis=-1)
    n_correct = jnp.sum((pred == labels) & valid)
    return loss, (ce_loss, n_valid, n_correct, moe_loss)


def make_train_step(
    model: ModelDef,
    adam_cfg: AdamWConfig,
    scaler_cfg: GradScalerConfig,
    rules: ShardingRules,
    label_smoothing: float = 0.0,
    moe_loss_coeff: float = 0.01,
    donate: bool = True,
) -> Callable:
    """Returns jitted ``train_step(params, opt_state, batch, lr, beta2)``.

    ``batch`` arrays are shaped (micro_num, dp_batch, packed_length); the scan
    runs over the leading micro axis.
    """

    # stochastic layers (residual dropout, MoE gate jitter/RTS) draw from a
    # stream keyed on (base seed, optimizer step, micro index, layer index) —
    # the stateless analogue of the reference SeedManager's advancing per-mode
    # streams.  jax_threefry_partitionable makes every draw a function of the
    # LOGICAL element index, so masks are identical across tp/sp topologies.
    cfg = model.config
    # MoE training is stochastic whenever the gate needs noise: RTS (top-1),
    # the always-on gumbel for the 2nd expert (top-2, ref gshard_layer.py:278),
    # or an explicit noisy_gate_policy
    moe_stochastic = getattr(cfg, "num_experts", 1) > 1 and (
        getattr(cfg, "moe_use_rts", True)
        or getattr(cfg, "top_k", 1) >= 2
        or getattr(cfg, "moe_noisy_gate_policy", None) is not None)
    stochastic = (getattr(cfg, "drop_rate", 0.0) > 0.0
                  or getattr(cfg, "attn_drop_rate", 0.0) > 0.0 or moe_stochastic)
    if stochastic:
        from ..context import gpc

        base_rng = gpc.rng("dropout")

    def train_step(params, opt_state, batch, lr, beta2):
        micro_num = batch["input_ids"].shape[0]
        scale = opt_state["grad_scale"]
        step_rng = (jax.random.fold_in(base_rng, opt_state["step"].astype(jnp.int32))
                    if stochastic else None)

        def micro_grad(p, micro, rng):
            def scaled_loss_fn(p_):
                loss, metrics = _micro_loss_and_metrics(model, p_, micro, label_smoothing,
                                                        moe_loss_coeff, dropout_rng=rng)
                return loss * scale / micro_num, metrics

            grads, metrics = jax.grad(scaled_loss_fn, has_aux=True)(p)
            return grads, metrics

        def scan_body(carry, xs):
            micro, midx = xs
            grads_acc, loss_acc, tok_acc, correct_acc, moe_acc = carry
            rng = jax.random.fold_in(step_rng, midx) if stochastic else None
            grads, (loss, n_valid, n_correct, moe_loss) = micro_grad(params, micro, rng)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return (grads_acc, loss_acc + loss, tok_acc + n_valid,
                    correct_acc + n_correct, moe_acc + moe_loss), None

        zero_grads = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
        init = (zero_grads, jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32),
                jnp.zeros((), jnp.int32), jnp.zeros((), jnp.float32))
        (grads, loss_sum, n_tokens, n_correct, moe_sum), _ = jax.lax.scan(
            scan_body, init, (batch, jnp.arange(micro_num, dtype=jnp.int32)))

        new_params, new_opt_state, stats = optimizer_step(
            params, grads, opt_state, lr, beta2, adam_cfg=adam_cfg, scaler_cfg=scaler_cfg
        )
        loss = loss_sum / micro_num
        metrics = {
            "loss": loss,
            "grad_norm": stats["grad_norm"],
            "grad_norm_groups": stats["grad_norm_groups"],
            "found_inf": stats["found_inf"],
            "loss_scale": stats["loss_scale"],
            "num_skipped": stats["num_skipped"],
            "n_tokens": n_tokens,
            "acc": n_correct / jnp.maximum(n_tokens, 1),
            # perplexity from summed nll: loss is already the mean over tokens
            "perplexity": jnp.exp(loss),
            "moe_loss": moe_sum / micro_num,
        }
        return new_params, new_opt_state, metrics

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)


def make_eval_step(model: ModelDef, label_smoothing: float = 0.0,
                   per_token: bool = False, layer_perm_inv=None) -> Callable:
    """forward_only schedule (reference ``forward_backward_step(forward_only=True)``).

    ``per_token=True`` additionally returns per-token ``nll`` (B, S) fp32 and
    ``correct`` (B, S) bool so the caller can fill ``AccPerplex`` /
    ``LossWithTypeId`` per-dataset-type validation bins (reference
    ``SchedulerMetricHook`` feeding ``model/metrics.py:55-338``).

    ``layer_perm_inv``: interleaved-pp training stores block params in PIPELINE
    order (``parallel.pipeline.interleaved_layer_layout``); eval runs the plain
    GSPMD forward, so un-permute the stacked layers back to natural order
    first."""
    cfg = model.config

    def eval_step(params, batch):
        if layer_perm_inv is not None:
            from ...parallel.pipeline import permute_layers

            params = {**params, "blocks": permute_layers(params["blocks"], layer_perm_inv)}
        if not per_token:
            loss, (ce_loss, n_valid, n_correct, _moe) = _micro_loss_and_metrics(
                model, params, batch, label_smoothing, is_train=False)
            return {"loss": ce_loss, "n_tokens": n_valid, "n_correct": n_correct}

        if getattr(cfg, "num_experts", 1) <= 1 and cfg.norm_type == "rmsnorm":
            from ...ops.fused_ce import fused_norm_head_nll_tokens, gpc_loss_knobs

            hidden = model.apply(params, batch["input_ids"], batch["indexes"],
                                 batch["segment_ids"], train=False, return_hidden=True)
            nll, cor = fused_norm_head_nll_tokens(
                hidden, params["norm"], params["head"]["kernel"], batch["labels"],
                eps=cfg.layer_norm_epsilon, embed_grad_scale=cfg.embed_grad_scale,
                norm_head=cfg.norm_head, label_smoothing=label_smoothing,
                chunk_size=gpc_loss_knobs()["chunk_size"])
        else:
            out = model.apply(params, batch["input_ids"], batch["indexes"],
                              batch["segment_ids"], train=False)
            logits = (out[0] if isinstance(out, tuple) else out).astype(jnp.float32)
            lab = batch["labels"]
            valid = lab != -100
            safe = jnp.where(valid, lab, 0)
            lse = jax.nn.logsumexp(logits, axis=-1)
            nll = lse - jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
            if label_smoothing > 0.0:
                nll = ((1 - label_smoothing) * nll
                       + label_smoothing * (lse - jnp.mean(logits, axis=-1)))
            nll = jnp.where(valid, nll, 0.0)
            cor = (jnp.argmax(logits, axis=-1) == lab) & valid
        n_valid = jnp.sum(batch["labels"] != -100)
        nll_sum = jnp.sum(nll)
        return {"loss": nll_sum / jnp.maximum(n_valid, 1), "n_tokens": n_valid,
                "n_correct": jnp.sum(cor), "nll": nll, "correct": cor}

    return jax.jit(eval_step)
