#!/usr/bin/env python
"""Analytic step-floor decomposition for the MoE bench presets.

Answers round-4 verdict #1's fallback question: is the measured MoE MFU a
kernel problem or a structural floor?  For a preset it prints, per component,
the best-case time on a v5e chip (197 TF bf16 MXU, ~819 GB/s HBM):

- expert matmuls at MXU roofline (activated flops)
- attention kernel at its measured efficiency curve
- gate/dispatch/combine HBM traffic
- fused CE (3 passes over the (tokens, vocab) logits, chunked)
- dense-path matmuls (wqkv/out_proj)
- optimizer update HBM floor (full-param adam state, fwd_bwd presets: none)

and the implied MFU ceiling under the preset's ACTIVATED-flops accounting —
the number an infinitely-good implementation of this preset could reach.

Usage: python tools/moe_floor_analysis.py [preset ...]  (default: moe moe_7bshape)
Pure arithmetic — runs anywhere, no devices needed.
"""

from __future__ import annotations

import json
import sys

MXU_TFLOPS = 197e12
HBM_BPS = 819e9
# measured splash-kernel efficiency by head_dim (doc/perf_notes.md: D=128 runs
# near its structural floor; D=64 halves the MXU contraction depth)
ATTN_EFF = {128: 0.75, 64: 0.40}


def preset_params(name: str) -> dict:
    sys.path.insert(0, "/root/repo")
    from bench import build_bench_config

    return build_bench_config(name)


def analyze(name: str) -> dict:
    p = preset_params(name)
    H, L, heads, V, S = p["hidden"], p["layers"], p["heads"], p["vocab"], p["seq"]
    E, K = p.get("experts", 1), p.get("top_k", 1)
    bsz = p["micro_bsz"] * p["micro_num"]
    T = bsz * S                        # tokens per step
    D = H // heads
    M = int((int(H * 8 / 3) + 255) // 256 * 256)  # per-expert ffn hidden
    ckpt = p["ckpt"] > 0
    full_step = not p.get("fwd_bwd_only")

    fwd_mults = 1
    bwd_mults = 2
    remat = 1 if ckpt else 0           # one extra forward pass of matmuls
    passes = fwd_mults + bwd_mults + remat

    # --- expert matmuls (activated): K routes x 3 matmuls of (T, H, M)
    expert_flops = passes * K * 3 * 2 * T * H * M
    t_experts = expert_flops / MXU_TFLOPS
    # per-expert operand reads per pass: rows ~ K*T/E per expert
    rows_per_exp = K * T / E
    expert_bytes = passes * E * (3 * H * M * 2 + 3 * rows_per_exp * (H + M) * 2)
    t_experts_hbm = expert_bytes / HBM_BPS

    # --- attention: causal within segments of length S
    attn_flops = passes * L * 2 * 2 * bsz * (S * S / 2) * heads * D
    t_attn = attn_flops / (MXU_TFLOPS * ATTN_EFF.get(D, 0.6))

    # --- dense path matmuls: wqkv (H->3H-ish) + out_proj
    qkv_cols = (p.get("kv_heads", heads) * 2 + heads) * D
    dense_flops = passes * L * 2 * T * H * (qkv_cols + H)
    t_dense = dense_flops / MXU_TFLOPS

    # --- gate + dispatch/combine traffic (dropless): routing matmul is tiny;
    # dispatch/combine move T*H activations ~2x each way per pass
    moe_traffic = passes * L * 4 * T * H * 2
    t_route = moe_traffic / HBM_BPS

    # --- CE head: 3 logits passes (fwd, recompute, dW) at MXU roofline
    ce_flops = 3 * 2 * T * H * V
    t_ce = ce_flops / MXU_TFLOPS

    # --- adam update (full step only): ~28 B/param of f32 state traffic
    n_params = (L * (3 * E * H * M + (qkv_cols + H) * H) + 2 * V * H)
    t_adam = (n_params * 28 / HBM_BPS) if full_step else 0.0

    floor = t_experts + t_attn + t_dense + t_route + t_ce + t_adam
    # activated-flops accounting (the bench's): megatron formula with the
    # activated mlp ratio
    acct_flops = passes_acct = None
    ratio = p.get("flops_mlp_ratio", 8 / 3)
    ckpt_factor = 4 if ckpt else 3
    acct_flops = (ckpt_factor * 2 * T * L * H * (qkv_cols + H + 1.5 * ratio * H)
                  + ckpt_factor * 2 * bsz * L * S * S * H / 2
                  + 3 * 2 * T * H * V)
    mfu_ceiling = acct_flops / floor / MXU_TFLOPS

    return dict(
        preset=name, tokens=T, expert_mlp_hidden=M, head_dim=D,
        floors_ms=dict(
            experts_mxu=round(t_experts * 1e3, 2),
            experts_hbm=round(t_experts_hbm * 1e3, 2),
            attention=round(t_attn * 1e3, 2),
            dense_matmuls=round(t_dense * 1e3, 2),
            route_dispatch=round(t_route * 1e3, 2),
            ce_head=round(t_ce * 1e3, 2),
            adam=round(t_adam * 1e3, 2),
            total=round(floor * 1e3, 2),
        ),
        params_m=round(n_params / 1e6, 1),
        mfu_ceiling_pct=round(mfu_ceiling * 100, 1),
        note=("MFU ceiling = activated-flops accounting / (sum of per-"
              "component best cases); a measured MFU near the ceiling means "
              "the preset is structurally bound, not kernel-bound"),
    )


if __name__ == "__main__":
    names = sys.argv[1:] or ["moe", "moe_7bshape"]
    for n in names:
        print(json.dumps(analyze(n), indent=2))
