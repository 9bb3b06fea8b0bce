#!/usr/bin/env python
"""Benchmark harness: one training-step throughput measurement on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Baseline (BASELINE.md): InternEvo 7B on A100 does 4078 tokens/GPU/s = 193
TFLOPS/GPU = 61.9% MFU (A100 bf16 peak 312).  A single v5e chip cannot hold 7B
(bf16 params alone are 14GB), so the primary cross-hardware metric is MFU on
the largest config that fits; tokens/sec/chip is reported alongside.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("IEVO_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["IEVO_PLATFORM"])

REFERENCE_MFU = 0.619  # A100 193/312, BASELINE.md headline


def build_bench_config(preset: str):
    # ~700M InternLM-style model: fits one v5e-16GB chip with fp32 adam state.
    presets = {
        # act-ckpt on: 822M params' optimizer state takes ~11.5GB of the 16GB
        # v5e HBM, so activations must be rematerialized (the reference's
        # act-ckpt benchmark rows use the same trade, train_performance.md:58)
        # micro_bsz=4 x micro_num=1 measured best (no grad-accum scan; the
        # reference's own perf tables sweep micro shapes the same way,
        # train_performance.md:74-86); correctness of grad accumulation is
        # covered by tests, not the bench
        # ce_chunk = full packed length (one chunk, no scan): measured 70.7%
        # vs 70.0% at 2048 — one (P, V) logits matmul and ONE dW read-modify-
        # write pass instead of four.  The transient bf16 logits (824MB) fit
        # after the lse-residual padding fix freed 1.5GB.
        "700m": dict(rotary_bf16=True, hidden=2048, layers=12, heads=16, vocab=50304, seq=2048, micro_bsz=4, micro_num=1, ckpt=1.0,
                     ce_chunk=8192),
        "700m_m2": dict(rotary_bf16=True, hidden=2048, layers=12, heads=16, vocab=50304, seq=2048, micro_bsz=2, micro_num=2, ckpt=1.0),
        # grad-accumulation variant (the reference's own 7B config runs
        # micro_num=4, configs/7B_sft.py:31): 4 micros per optimizer step
        # amortize the ~26 ms full-param adam HBM floor over 4x the tokens;
        # activation memory is per-micro so the footprint matches 700m
        "700m_mn4": dict(rotary_bf16=True, hidden=2048, layers=12, heads=16, vocab=50304, seq=2048,
                         micro_bsz=4, micro_num=4, ckpt=1.0, ce_chunk=8192),
        # 7B-shaped single-chip slice (hidden 4096, vocab 103168, 4 layers,
        # seq 4096 packed 2x2048): validates the splash kernel + fused CE at
        # flagship dimensions.  Full 7B adam state (14B/param) cannot fit one
        # 16GB v5e chip, so this preset benches fwd+bwd only (fwd_bwd_only).
        # save_mlp: fwd_bwd_only leaves most of HBM free, so the remat
        # policy also keeps the SwiGLU gate activations (700m cannot - the
        # full adam state leaves no headroom and it OOMs)
        "7bshape": dict(rotary_bf16=True, hidden=4096, layers=4, heads=32, vocab=103168, seq=2048,
                        micro_bsz=2, micro_num=1, ckpt=1.0, fwd_bwd_only=True,
                        save_mlp=True),
        # 7B-dims FULL train step (adam included) — the honest companion to
        # the fwd+bwd-only 7bshape row.  The full 103168 vocab cannot join a
        # full step on one 16GB chip (embed+head are 845M params = 11.8GB of
        # fp32 master/m/v alone), so this preset keeps the flagship hidden/
        # head/seq dims and trims vocab+layers until bf16 params + fp32 adam
        # state (~11.4GB at 815M params) fit with activation headroom
        # micro_bsz swept on-chip: 2 -> 59.8%, 4 -> 67.0%, 8 -> 68.4% MFU
        # (bigger micros amortize the ~14ms adam state stream over more tokens)
        "7bshape_full": dict(rotary_bf16=True, hidden=4096, layers=2, heads=32, vocab=50304, seq=2048,
                             micro_bsz=8, micro_num=1, ckpt=1.0),
        "300m": dict(hidden=1024, layers=24, heads=16, vocab=50304, seq=2048, micro_bsz=2, micro_num=2, ckpt=0.0),
        # dropless MoE FULL train step on one chip (ep=1 -> the lax.ragged_dot
        # grouped-matmul path, models/moe/dropless.py): 700m-class total size
        # with 8 experts top-2.  MFU uses ACTIVATED flops: top_k experts of
        # per-expert SwiGLU ratio 8/3 -> effective mlp_ratio 16/3 in the
        # megatron formula (the gate matmul is negligible).
        "moe": dict(rotary_bf16=True, hidden=1024, layers=8, heads=16, vocab=50304, seq=2048,
                    micro_bsz=4, micro_num=1, ckpt=1.0,
                    model_type="INTERNLM_MoE", experts=8, top_k=2,
                    flops_mlp_ratio=16 / 3),
        # MoE at REALISTIC expert shapes: hidden 2048 -> per-expert 2048x5632
        # matmuls with ~4k rows/expert (top-2 of 16k tokens over 8 experts) —
        # the regime where the gmm kernel's margin and MXU saturation can show
        # (the `moe` preset's 1024x2816 experts structurally cannot saturate
        # the MXU; round-4 verdict #1).  Full adam state for 2.1B params does
        # not fit a 16GB chip -> fwd_bwd_only, like 7bshape.
        "moe_7bshape": dict(rotary_bf16=True, hidden=2048, layers=4, heads=16, vocab=50304, seq=2048,
                            micro_bsz=4, micro_num=1, ckpt=1.0, fwd_bwd_only=True,
                            model_type="INTERNLM_MoE", experts=8, top_k=2,
                            flops_mlp_ratio=16 / 3, save_mlp=False),
        # long-context kernel regression guard: flagship 7B dims at seq 8192
        # (one 8192-token segment), fwd+bwd only like 7bshape — catches splash
        # grid/window regressions the 2048-seq presets cannot see
        "longseq": dict(rotary_bf16=True, hidden=4096, layers=4, heads=32, vocab=103168, seq=8192,
                        micro_bsz=1, micro_num=1, ckpt=1.0, fwd_bwd_only=True,
                        save_mlp=True),
        "tiny": dict(hidden=256, layers=4, heads=4, vocab=1024, seq=512, micro_bsz=1, micro_num=2, ckpt=0.0),
    }
    return presets[preset]


def _parse_save_mlp(raw, default: float, env: str = "IEVO_SAVE_MLP") -> float:
    """IEVO_SAVE_MLP / IEVO_SAVE_QKV accept a fraction ("0.5") or the legacy
    truthy strings ("true"/"false"); anything else is a clear error instead
    of a ValueError deep inside config build."""
    if raw is None:
        return default
    lowered = raw.strip().lower()
    if lowered in ("true", "yes", "on"):
        return 1.0
    if lowered in ("false", "no", "off", ""):
        return 0.0
    try:
        return float(lowered)
    except ValueError:
        raise SystemExit(
            f"{env}={raw!r}: expected a fraction in [0,1] or true/false")


def build_full_config(p: dict) -> dict:
    """The exact launch config the bench runs — shared with tools/profile_step.py
    so the profiled program IS the benched program."""
    model = dict(checkpoint=p["ckpt"], scan_unroll=int(os.environ.get("IEVO_SCAN_UNROLL", "1")),
                 remat_save_mlp=_parse_save_mlp(os.environ.get("IEVO_SAVE_MLP"),
                                                default=1.0 if p.get("save_mlp") else 0.0),
                 # save post-rotary q/k/v for this fraction of full-remat
                 # layers: backward skips the wqkv+rotary recompute cluster
                 remat_save_qkv=_parse_save_mlp(os.environ.get("IEVO_SAVE_QKV"),
                                                default=1.0 if p.get("save_qkv") else 0.0,
                                                env="IEVO_SAVE_QKV"),
                 rotary_bf16=os.environ.get("IEVO_ROTARY_BF16",
                                            "1" if p.get("rotary_bf16") else "0")
                             not in ("0", "false", "False"),
                 num_attention_heads=p["heads"], vocab_size=p["vocab"],
                 embed_grad_scale=1, parallel_output=True, hidden_size=p["hidden"],
                 num_layers=p["layers"], mlp_ratio=8 / 3, dtype="torch.bfloat16",
                 norm_type="rmsnorm", layer_norm_epsilon=1e-5)
    if p.get("experts"):
        model.update(num_experts=p["experts"], top_k=p["top_k"], moe_type="dropless",
                     moe_use_residual=False)
    return dict(
        model_type=p.get("model_type", "INTERNLM"),
        data=dict(seq_len=p["seq"], micro_num=p["micro_num"], micro_bsz=p["micro_bsz"],
                  total_steps=100, packed_length=p["seq"] * p["micro_bsz"]),
        model=model,
        adam=dict(lr=1e-4, adam_beta1=0.9, adam_beta2=0.95, adam_beta2_c=0, adam_eps=1e-8, weight_decay=0.01),
        # save-ce-logits: skip the fused-CE logits recompute matmul in backward
        # (+3.6pp MFU at 7B dims); both bench presets have the HBM headroom
        loss=dict(label_smoothing=0, save_ce_logits=True, moe_loss_coeff=0.01,
                  ce_chunk_size=int(os.environ.get("IEVO_CE_CHUNK",
                                                   p.get("ce_chunk", 2048)))),
        parallel=dict(zero1=dict(size=-1), tensor=dict(size=1, mode="mtp"), pipeline=dict(size=1), weight=dict(size=1)),
    )


def main():
    preset = os.environ.get("IEVO_BENCH_PRESET", "700m")
    if jax.default_backend() == "cpu" and "IEVO_BENCH_PRESET" not in os.environ:
        preset = "tiny"
    p = build_bench_config(preset)
    if os.environ.get("IEVO_MICRO_BSZ"):
        p["micro_bsz"] = int(os.environ["IEVO_MICRO_BSZ"])
    if os.environ.get("IEVO_CKPT"):
        p["ckpt"] = float(os.environ["IEVO_CKPT"])

    from internevo_tpu.core.context import gpc
    from internevo_tpu.initialize.launch import launch
    from internevo_tpu.train.pipeline import initialize_model, initialize_optimizer, initialize_trainer
    from internevo_tpu.utils.common import device_peak_tflops

    n_dev = len(jax.devices())
    config = build_full_config(p)
    launch(config, seed=1024)

    model, params = initialize_model()
    fwd_bwd_only = bool(p.get("fwd_bwd_only"))
    if not fwd_bwd_only:
        opt_state, lr_sched, beta2_sched = initialize_optimizer(model, params)
        trainer = initialize_trainer(model, params, opt_state, lr_sched, beta2_sched)

    micro_num, micro_bsz, seq = p["micro_num"], p["micro_bsz"], p["seq"]
    P_len = seq * micro_bsz
    dp = gpc.sizes.dp_total
    rng = np.random.RandomState(0)
    # segments mark the micro_bsz packed samples per row (block-diagonal
    # attention, consistent with the seq_len term of the flops accounting)
    seg_row = np.repeat(np.arange(1, micro_bsz + 1, dtype=np.int32), seq)
    batch = {
        "input_ids": jnp.asarray(rng.randint(0, p["vocab"], (micro_num, dp, P_len), dtype=np.int32)),
        "segment_ids": jnp.asarray(np.tile(seg_row, (micro_num, dp, 1))),
        "indexes": jnp.asarray(np.tile(np.arange(seq, dtype=np.int32), (micro_num, dp, micro_bsz))),
        "labels": jnp.asarray(rng.randint(0, p["vocab"], (micro_num, dp, P_len), dtype=np.int32)),
    }

    if fwd_bwd_only:
        # fwd+bwd-only step: flagship-dimension kernel validation on one chip
        # (the full adam state would not fit; see the 7bshape preset comment)
        import jax.numpy as _jnp

        from internevo_tpu.core.scheduler.no_pipeline import _micro_loss_and_metrics

        def fb_step(params, batch):
            micro = {k: v[0] for k, v in batch.items()}

            def loss_fn(p):
                loss, metrics = _micro_loss_and_metrics(model, p, micro)
                return loss, metrics

            grads, (loss, *_rest) = jax.grad(loss_fn, has_aux=True)(params)
            gsum = sum(_jnp.sum(g.astype(_jnp.float32) ** 2) for g in jax.tree.leaves(grads))
            return loss, gsum

        step = jax.jit(fb_step)
        run = lambda: step(params, batch)
        metrics_holder = {}

        def execute():
            loss, gsum = run()
            metrics_holder["loss"] = loss
            return metrics_holder

        trainer_execute = execute
    else:
        trainer_execute = lambda: trainer.execute_schedule(batch)

    # warmup (compile); sync via host readback (block_until_ready does not
    # drain the axon dispatch tunnel)
    for _ in range(3):
        metrics = trainer_execute()
    float(metrics["loss"])

    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        metrics = trainer_execute()
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / n_steps

    tokens_per_step = micro_num * dp * P_len
    tgs = tokens_per_step / dt / n_dev

    # model flops: 6*N_params*tokens + attention 12*L*h*s^2... use megatron formula
    from internevo_tpu.utils.common import get_megatron_flops

    tflops = get_megatron_flops(
        dt, checkpoint=p["ckpt"] > 0, seq_len=seq, hidden_size=p["hidden"],
        num_layers=p["layers"], vocab_size=p["vocab"],
        global_batch_size=micro_num * micro_bsz * dp, global_world_size=n_dev,
        # MoE presets report ACTIVATED flops: top_k experts of per-expert
        # ratio 8/3 (see the "moe" preset comment)
        mlp_ratio=p.get("flops_mlp_ratio", 8 / 3), use_swiglu=True,
    )
    peak = device_peak_tflops()
    mfu = tflops / peak
    # reference-identical accounting (utils/common.py:208-239): act-ckpt
    # credits the recompute factor 4; remat policies that save residuals
    # (attention out/lse, optionally MLP gates / CE logits) execute fewer
    # flops than credited - tgs is the accounting-free throughput number
    accounting = "megatron+ckpt4" if p["ckpt"] > 0 else "megatron"

    # on-chip bf16 golden loss pin for the default preset: the deterministic
    # seed/batch makes step-13 loss reproducible; drift beyond the bf16 noise
    # band means a numerics regression, not a perf change
    # on-chip bf16 golden pins (deterministic seed/batch); band 0.05 covers
    # bf16 reduction-order noise across remat/chunking policy changes
    GOLDEN_LOSS = {"700m": 8.650, "7bshape": 11.603, "7bshape_full": 2.733,
                   "moe": 9.467, "longseq": 11.596}
    loss = float(metrics["loss"])
    # the pin is only meaningful for the preset's own batch shape
    golden = None if os.environ.get("IEVO_MICRO_BSZ") else GOLDEN_LOSS.get(preset)
    loss_ok = golden is None or abs(loss - golden) < 0.05

    print(json.dumps({
        "metric": f"mfu_internlm_{preset}_seq{seq}",
        "value": round(mfu * 100, 2),
        "unit": "% MFU",
        "vs_baseline": round(mfu / REFERENCE_MFU, 4),
        "tgs_tokens_per_sec_per_chip": round(tgs, 1),
        "tflops_per_chip": round(tflops, 2),
        "peak_tflops": peak,
        "step_time_s": round(dt, 4),
        "device": jax.devices()[0].device_kind,
        "n_devices": n_dev,
        "loss": loss,
        "loss_golden_ok": loss_ok,
        "flops_accounting": accounting,
    }))


if __name__ == "__main__":
    main()
