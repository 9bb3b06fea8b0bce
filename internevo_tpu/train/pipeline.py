"""Train glue: model/optimizer initialization, batch loading, metrics recording.

Parity: reference ``internlm/train/pipeline.py`` — ``initialize_model`` (:157),
``initialize_optimizer`` (:282), ``load_new_batch`` (:380),
``record_current_batch_training_metrics`` (:462-633).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.context import DP, EP, ZERO, gpc
from ..core.engine import Engine
from ..core.scheduler.no_pipeline import make_eval_step, make_train_step
from ..core.trainer import Trainer, TrainState
from ..models.base import ModelDef
from ..parallel.pipeline import active_layer_layout, permute_layers
from ..parallel.sharding import get_rules
from ..solver.lr_scheduler import Beta2Scheduler, build_lr_scheduler
from ..solver.optimizer import AdamWConfig, GradScalerConfig, init_optimizer_state
from ..utils.common import get_megatron_flops
from ..utils.logger import get_logger
from ..utils.registry import MODEL_INITIALIZER
from ..utils.timers import megatron_timer as timer

logger = get_logger(__name__)


def initialize_model() -> tuple[ModelDef, Any]:
    """Build the ModelDef from config and materialize sharded params.

    Reference ``initialize_model`` stamps IS_*_PARALLEL flags and syncs replica
    params across groups (:98-154); with GSPMD the single deterministic init is
    sharded directly onto the mesh — replicas are consistent by construction.
    """
    import internevo_tpu.models  # noqa: F401  (registry population)

    model_cfg = dict(gpc.config.model)
    # packed segments are never longer than data.seq_len (max_length_per_sample):
    # the bound powers splash attention's static kv-visit budget
    if "max_segment_len" not in model_cfg and "data" in gpc.config:
        model_cfg["max_segment_len"] = gpc.config.data.get("seq_len", None)
    # top-level `moe = dict(...)` block (reference 7B_MoE4_sft.py:204) maps onto
    # the ModelConfig moe_* fields
    moe_cfg = gpc.config.get("moe", None)
    if moe_cfg:
        mapping = {"top_k": "top_k", "capacity_factor": "moe_capacity_factor",
                   "eval_capacity_factor": "moe_eval_capacity_factor",
                   "min_capacity": "moe_min_capacity", "drop_tokens": "moe_drop_tokens",
                   "use_rts": "moe_use_rts", "noisy_gate_policy": "moe_noisy_gate_policy"}
        for src, dst in mapping.items():
            if src in moe_cfg:
                model_cfg[dst] = moe_cfg[src]
    model = MODEL_INITIALIZER.get_module(gpc.config.model_type)(**model_cfg)
    rules = get_rules()
    rng = gpc.rng("model")
    if rules.mesh is not None:
        specs = model.specs()
        if rules.fsdp:
            shapes = jax.eval_shape(model.init, rng)
            specs = rules.fsdp_shard_specs(specs, shapes)
            model.specs = lambda: specs  # downstream consumers see fsdp specs
        shardings = jax.tree.map(lambda s: NamedSharding(rules.mesh, s), specs,
                                 is_leaf=lambda x: isinstance(x, P))
        params = jax.jit(model.init, out_shardings=shardings)(rng)
        layout = active_layer_layout()
        if layout is not None:
            # interleaved pp: store block params in PIPELINE order permanently
            # — the 1F1B shard_map then slices each stage's chunks without any
            # per-step cross-stage resharding (reference chunk-local weights,
            # pipeline_scheduler.py:711+).  Checkpoints canonicalize back to
            # natural order on save/load; eval un-permutes before model.apply.
            perm, _ = layout
            params = jax.jit(
                lambda p: {**p, "blocks": permute_layers(p["blocks"], perm)},
                out_shardings=shardings, donate_argnums=0)(params)
    else:
        params = jax.jit(model.init)(rng)
    if gpc.is_rank_for_log():
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        logger.info("model %s built: %.2fM params", gpc.config.model_type, n_params / 1e6)
    return model, params


def _adam_cfg() -> AdamWConfig:
    adam = gpc.config.adam
    return AdamWConfig(
        lr=adam.lr,
        betas=(adam.adam_beta1, adam.adam_beta2),
        eps=adam.adam_eps,
        weight_decay=adam.weight_decay,
        clip_grad_norm=gpc.config.hybrid_zero_optimizer.get("clip_grad_norm", 1.0),
    )


def _scaler_cfg() -> GradScalerConfig:
    gs = gpc.config.grad_scaler
    dtype = str(gpc.config.model.get("dtype", "torch.bfloat16"))
    fp16 = gs.get("fp16", {})
    initial = fp16.get("initial_scale", 2**16) if "float16" in dtype and "b" not in dtype.split(".")[-1] else 1.0
    return GradScalerConfig(
        initial_scale=initial,
        growth_factor=gs.get("growth_factor", 2.0),
        backoff_factor=gs.get("backoff_factor", 0.5),
        growth_interval=fp16.get("growth_interval", 1000),
        hysteresis=gs.get("hysteresis", 2),
        min_scale=fp16.get("min_scale", 1),
        max_scale=gs.get("max_scale", 2**24),
    )


def initialize_optimizer(model: ModelDef, params) -> tuple[Any, Any, Any]:
    """Sharded optimizer state + schedulers (reference ``initialize_optimizer`` :282).

    ZeRO-1: the state tree is placed with ``zero``-augmented specs so each adam
    shard lives on one zero rank — the HybridZeroOptimizer partition as sharding.
    """
    rules = get_rules()
    scaler_cfg = _scaler_cfg()
    if rules.mesh is not None:
        param_specs = model.specs()
        state_specs = {
            "step": P(),
            "master": rules.zero_shard_specs(param_specs, params),
            "m": rules.zero_shard_specs(param_specs, params),
            "v": rules.zero_shard_specs(param_specs, params),
            "grad_scale": P(),
            "growth_tracker": P(),
            "hysteresis_tracker": P(),
            "num_skipped": P(),
        }
        shardings = jax.tree.map(lambda s: NamedSharding(rules.mesh, s), state_specs,
                                 is_leaf=lambda x: isinstance(x, P))
        opt_state = jax.jit(lambda p: init_optimizer_state(p, scaler_cfg), out_shardings=shardings)(params)
    else:
        opt_state = jax.jit(lambda p: init_optimizer_state(p, scaler_cfg))(params)
    lr_scheduler = build_lr_scheduler(gpc.config.adam, gpc.config.lr_scheduler)
    b2cfg = gpc.config.beta2_scheduler
    beta2_scheduler = Beta2Scheduler(init_beta2=b2cfg.init_beta2, c=b2cfg.c)
    return opt_state, lr_scheduler, beta2_scheduler


def initialize_trainer(model: ModelDef, params, opt_state, lr_scheduler, beta2_scheduler) -> Trainer:
    rules = get_rules()
    pp = gpc.sizes.pp if gpc.sizes else 1
    if pp > 1:
        from ..core.scheduler.pipeline import make_pipeline_train_step

        # num_chunks > 1 selects the interleaved schedule (reference puts it in
        # model cfg, initialize_trainer picks the scheduler accordingly)
        num_chunks = int(gpc.config.model.get("num_chunks", 1) or 1)
        train_step = make_pipeline_train_step(
            model, _adam_cfg(), _scaler_cfg(), rules, pp,
            label_smoothing=gpc.config.loss.get("label_smoothing", 0),
            num_chunks=num_chunks,
            moe_loss_coeff=gpc.config.loss.get("moe_loss_coeff", 0.01),
        )
    else:
        train_step = make_train_step(
            model, _adam_cfg(), _scaler_cfg(), rules,
            label_smoothing=gpc.config.loss.get("label_smoothing", 0),
            moe_loss_coeff=gpc.config.loss.get("moe_loss_coeff", 0.01),
        )
    layout = active_layer_layout()
    eval_step = make_eval_step(model, gpc.config.loss.get("label_smoothing", 0),
                               per_token=True,
                               layer_perm_inv=None if layout is None else layout[1])
    engine = Engine(model, params, opt_state, train_step, lr_scheduler, beta2_scheduler, eval_step)
    return Trainer(engine)


def batch_to_device(batch: tuple, micro_num: int) -> dict:
    """Reshape a host batch into the (micro_num, dp_batch, packed_length) layout
    and place it sharded over the data axes.

    The loader yields ``(data, labels)`` with arrays (micro_num * dp_batch, P)
    where consecutive dp_batch rows belong to one micro step (see
    ``build_dataloader._data_rank_and_size`` for the rank-interleave argument).
    """
    data, labels = batch
    rules = get_rules()
    arrays = {
        "input_ids": data["input_ids"],
        "segment_ids": data["segment_ids"],
        "indexes": data["indexes"],
        "labels": labels,
    }
    total, P_len = arrays["input_ids"].shape
    assert total % micro_num == 0, (total, micro_num)
    dp_batch = total // micro_num
    out = {}
    for k, v in arrays.items():
        v = np.asarray(v).reshape(micro_num, dp_batch, P_len)
        if rules.mesh is not None:
            sharding = NamedSharding(rules.mesh, P(None, (DP, EP, ZERO)))
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = jnp.asarray(v)
    return out


def load_new_batch(train_dl, train_iter, train_state: TrainState):
    """Reference ``load_new_batch`` (:380): pull next batch, roll epochs."""
    timer("batch-gen").start()
    try:
        batch = next(train_iter)
        train_state.num_consumed_samples_in_epoch += len(batch[1])
    except StopIteration:
        train_iter = iter(train_dl)
        batch = next(train_iter)
        train_state.num_consumed_samples_in_epoch = 0
        # epoch rollover: per-epoch consumption resets; batch_count stays
        # cumulative (rampup position carries across epochs, ref sampler :240).
        # CONSUMPTION has now entered the new pool, so refresh the resume
        # snapshot from the live sampler (which reshuffled at generator exit)
        # — otherwise a checkpoint taken mid-epoch-2 would store epoch-1's
        # rng_state/indices and replay trained data on resume
        train_state.sampler_consumed_samples = 0
        if train_state.batch_sampler is not None:
            train_state.batch_sampler_state = train_state.batch_sampler.copy()
    train_state.note_batch_consumed(len(batch[1]))
    timer("batch-gen").stop()
    return batch, train_iter


def record_current_batch_training_metrics(
    get_tflops_func: Callable,
    logger_obj,
    writer,
    success_update: bool,
    batch_count: int,
    batch: dict,
    train_state: TrainState,
    engine: Engine,
    start_time: float,
    loss: float,
    grad_norm: float,
    metrics: dict,
):
    """TGS/TFLOPS/loss accounting (reference :462-633)."""
    if not gpc.is_rank_for_log():
        return
    time_cost = time.time() - start_time
    n_tokens = int(metrics.get("n_tokens", 0))
    tokens_global = batch["input_ids"].size
    s = gpc.sizes
    tgs = tokens_global / time_cost / max(1, s.world)
    tflops = get_tflops_func(time_cost)
    tgs_stat = train_state.tgs_statistic
    tgs_stat["sum_step"] += 1
    tgs_stat["sum_tg"] += tokens_global
    tgs_stat["sum_time"] += time_cost
    tgs_stat["last_tgs_10"].append(tgs)
    tgs_stat["last_tgs_50"].append(tgs)

    # per-param-group norms: the reference logs a grad_norm dict each step
    # (hybrid_zero_optim.py:598-645, record_current_batch_training_metrics)
    group_norms = {k: float(v) for k, v in metrics.get("grad_norm_groups", {}).items()}
    gn_str = " ".join(f"{k}={v:.5f}" for k, v in sorted(group_norms.items()))
    line = (
        f"tflops={tflops:.2f} step={batch_count} loss={loss:.5f} "
        f"tgs(tokens/gpu/second)={tgs:.2f} tgs_avg={np.mean(tgs_stat['last_tgs_10']):.2f} "
        f"lr={engine.current_lr:.4e} loss_scale={float(metrics['loss_scale']):.1f} "
        f"grad_norm={grad_norm:.5f} acc={float(metrics.get('acc', 0)):.4f} "
        f"perplexity={float(metrics.get('perplexity', 0)):.3f} "
        f"real_tokens={n_tokens} "
        + (f"grad_norm_groups=[{gn_str}] " if gn_str else "")
    )
    logger_obj.info(line)
    # light-monitor heartbeat every 50 steps (ref train/pipeline.py:599-600)
    from ..monitor.monitor import send_heartbeat

    send_heartbeat("TRAIN_METRICS", {"loss": loss, "tgs": round(tgs, 1),
                                     "tflops": round(tflops, 1)}, step=batch_count)
    if writer is not None:
        writer.add_scalar("train/loss", loss, batch_count)
        writer.add_scalar("train/tgs", tgs, batch_count)
        writer.add_scalar("train/lr", engine.current_lr, batch_count)
        writer.add_scalar("train/grad_norm", grad_norm, batch_count)
        for k, v in group_norms.items():
            writer.add_scalar(f"train/grad_norm/{k}", v, batch_count)


def get_tflops_func_builder(checkpoint_fraction: float = None):
    cfg = gpc.config
    model = cfg.model
    ckpt = model.get("checkpoint", 0.0) if checkpoint_fraction is None else checkpoint_fraction
    global_batch_tokens = cfg.data.micro_num * cfg.data.micro_bsz * cfg.data.seq_len
    s = gpc.sizes

    def f(elapsed: float) -> float:
        return get_megatron_flops(
            elapsed,
            checkpoint=ckpt > 0,
            seq_len=cfg.data.seq_len,
            hidden_size=model.hidden_size,
            num_layers=model.num_layers,
            vocab_size=model.vocab_size,
            global_batch_size=cfg.data.micro_num * cfg.data.micro_bsz * max(1, s.dp_total),
            global_world_size=s.world,
            mlp_ratio=model.get("mlp_ratio", 4.0),
            use_swiglu=model.get("use_swiglu", True),
        )

    return f
