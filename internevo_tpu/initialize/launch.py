"""Environment initialization + config sanity checking.

Parity: reference ``internlm/initialize/launch.py`` —
``initialize_distributed_env`` (:588), ``args_sanity_check`` (:71-445),
``launch_from_slurm/torch`` (:516-585).  On TPU there are no process groups to
enumerate: ``jax.distributed`` auto-initializes per host (when run multi-host),
and the mesh is built from ``config.parallel``.
"""

from __future__ import annotations

import os

import jax

from ..core.config import Config
from ..core.context import gpc
from ..parallel import sharding
from ..utils.logger import get_logger

logger = get_logger(__name__)


def args_sanity_check() -> None:
    """Default + validate the loaded config (reference ``launch.py:71-445``)."""
    cfg = gpc.config
    cfg.setdefault("model_type", "INTERNLM")

    # ---- data defaults (ref :100-170)
    data = cfg.setdefault("data", Config())
    data.setdefault("seq_len", 2048)
    data.setdefault("micro_num", 1)
    data.setdefault("micro_bsz", 1)
    data.setdefault("rampup_batch_size", None)
    data.setdefault("gradient_accum_size", data.micro_num)
    data.setdefault("use_packed_dataset", True)
    data.setdefault("pack_sample_into_one", False)
    data.setdefault("fixed_random_dataset_seqlen", True)
    data.setdefault("train_folder", None)
    data.setdefault("valid_folder", None)
    data.setdefault("valid_every", 0)
    data.setdefault("valid_micro_num", data.micro_num)
    data.setdefault("min_length", 50)
    data.setdefault("total_steps", 50000)
    data.setdefault("skip_batches", "")
    data.setdefault("diag_outlier_ratio", 1.1)
    # the invariant the whole packed pipeline relies on (ref :125)
    expected = data.seq_len * data.micro_bsz
    if "packed_length" in data:
        assert data.packed_length == expected, (data.packed_length, expected)
    else:
        data.packed_length = expected

    # ---- parallel defaults (ref :346-445)
    parallel = cfg.setdefault("parallel", Config())
    parallel.setdefault("zero1", Config(dict(size=-1, fsdp=False)))
    if not isinstance(parallel.zero1, dict):
        parallel.zero1 = Config(dict(size=parallel.zero1, fsdp=False))
    parallel.setdefault("tensor", Config(dict(size=1, mode="mtp")))
    if not isinstance(parallel.tensor, dict):
        parallel.tensor = Config(dict(size=parallel.tensor, mode="mtp"))
    parallel.tensor.setdefault("mode", "mtp")
    parallel.setdefault("pipeline", Config(dict(size=1, interleaved_overlap=True)))
    if not isinstance(parallel.pipeline, dict):
        parallel.pipeline = Config(dict(size=parallel.pipeline, interleaved_overlap=True))
    parallel.setdefault("weight", Config(dict(size=1, overlap=True, memory_pool=True)))
    parallel.setdefault("sequence_parallel", parallel.tensor.mode in ("msp", "fsp", "isp", "rsp"))
    assert parallel.tensor.mode in ("mtp", "msp", "fsp", "isp", "rsp"), parallel.tensor.mode
    if parallel.weight.get("size", 1) > 1:
        # reference allows wp only with isp (launch.py:383-384); rsp is this
        # rebuild's isp-like extension (weights gathered full at use, sequence
        # sharded end-to-end) and shares the weight-storage machinery
        assert parallel.tensor.mode in ("isp", "rsp"), \
            "weight parallel requires an isp-like mode (isp or rsp)"
    # dropout semantics (reference SeedManager tp-offset streams,
    # core/context/random.py:16): residual dropout is supported on every GSPMD
    # topology — jax_threefry_partitionable makes the mask a function of the
    # LOGICAL element index, so tp/sp shards draw decorrelated bits and the
    # loss is partition-invariant (stronger than the reference's per-rank
    # streams, which only decorrelate).  The manual pipeline threads a
    # (step, micro, layer)-folded rng (parallel/pipeline._pdrop).
    # Attention-probability dropout (reference flash-attn attn_drop) runs on
    # EVERY topology: the splash kernel, the dense fallback, and the ring
    # (rsp) legs all regenerate the same counter-hash mask of global
    # coordinates (ops/pallas/splash_attention._dropout_scale) — no guard.
    model_cfg = cfg.get("model", {})
    # MoE x pipeline composition (reference pipelines MoE with accum_moe_loss,
    # pipeline_scheduler.py:307-320, and defines MoE under isp — WEIGHT-mode
    # experts + per-rank sequence-split gating, modeling_moe.py:92,420-421):
    # the manual 1F1B stage runs the MoE ffn with an explicit expert a2a under
    # every tensor mode.  rsp runs the MoE ffn UNGATED on idle ticks (the
    # expert a2a cannot sit inside the ring's cond-gated sections), trading
    # bubble-tick flops for the composition — see parallel/pipeline.py.

    # ---- model defaults
    model = cfg.setdefault("model", Config())
    model.setdefault("dtype", "torch.bfloat16")
    model.setdefault("checkpoint", 0.0)
    model.setdefault("parallel_output", True)

    # ---- optimizer defaults (ref :269-305)
    cfg.setdefault("adam", Config(dict(lr=1e-4, adam_beta1=0.9, adam_beta2=0.95,
                                       adam_beta2_c=0, adam_eps=1e-8, weight_decay=0.01)))
    cfg.setdefault("grad_scaler", Config(dict(
        fp16=dict(initial_scale=2**16, min_scale=1, growth_interval=1000),
        growth_factor=2, backoff_factor=0.5, max_scale=2**24, hysteresis=2)))
    cfg.setdefault("hybrid_zero_optimizer", Config(dict(
        overlap_sync_grad=True, overlap_sync_param=True,
        reduce_bucket_size=512 * 1024 * 1024, clip_grad_norm=1.0)))
    cfg.setdefault("lr_scheduler", Config(dict(total_steps=data.total_steps, init_steps=0,
                                               warmup_ratio=0.01, eta_min=1e-5)))
    cfg.setdefault("beta2_scheduler", Config(dict(init_beta2=cfg.adam.adam_beta2, c=cfg.adam.adam_beta2_c)))
    cfg.setdefault("loss", Config(dict(label_smoothing=0)))
    cfg.setdefault("ckpt", Config())
    ckpt = cfg.ckpt
    ckpt.setdefault("enable_save_ckpt", False)
    ckpt.setdefault("save_ckpt_folder", None)
    ckpt.setdefault("checkpoint_every", 50)
    ckpt.setdefault("load_ckpt_info", None)
    ckpt.setdefault("auto_resume", True)
    ckpt.setdefault("async_upload", True)
    ckpt.setdefault("async_upload_tmp_folder", "/dev/shm/internevo_tmp_ckpt/")
    ckpt.setdefault("oss_snapshot_freq", 0)
    ckpt.setdefault("stop_file_path", None)
    cfg.setdefault("monitor", Config(dict(alert=dict(enable_feishu_alert=False))))


def launch(
    config: str | dict | Config,
    seed: int = 1024,
    devices=None,
) -> None:
    """Load config, build mesh, install sharding rules (ref ``launch.py:448-513``)."""
    gpc.load_config(config)
    weight_defaulted = "weight" not in gpc.config.get("parallel", {})
    args_sanity_check()
    gpc.init_parallel_groups(devices)
    gpc.set_seed(seed)
    sharding.set_rules(sharding.current_rules_from_context())
    # the default weight.size changed 0 -> 1 between rounds: isp/rsp configs
    # that omit parallel.weight now store weights UNSHARDED (reference default).
    # Configs that relied on the old implicit (zero, tp) sharding may OOM —
    # warn once so the regression is visible (doc/usage.md "Weight parallel").
    if (gpc.tensor_mode in ("isp", "rsp") and weight_defaulted
            and gpc.sizes.zero * gpc.sizes.tp > 1):
        logger.warning(
            "isp/rsp with no parallel.weight config: weights are stored "
            "UNSHARDED (weight.size=1, the reference default). Set "
            "parallel.weight.size=%d to shard storage over the weight group "
            "as earlier builds did implicitly.", gpc.sizes.zero * gpc.sizes.tp)
    if gpc.is_rank_for_log():
        s = gpc.sizes
        logger.info(
            "mesh initialized: pp=%d dp=%d zero=%d tp=%d (mode=%s) over %d devices",
            s.pp, s.dp, s.zero, s.tp, gpc.tensor_mode, s.world,
        )


def initialize_distributed_env(
    config: str,
    launcher: str = "jax",
    master_port: int = 8888,
    seed: int = 1024,
    args_check: bool = True,
    devices=None,
) -> None:
    """Reference entry (``launch.py:588``).  Multi-host TPU pods initialize
    jax.distributed automatically under the TPU runtime; explicit coordinator
    env (slurm/torchrun-style) is honored when present."""
    if launcher in ("slurm", "torch") and "COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()
    launch(config, seed=seed, devices=devices)


def get_config_value(config, key, default):
    return config.get(key, default) if hasattr(config, "get") else default
