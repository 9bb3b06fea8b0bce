"""INTERNLM_MoE model family.

Parity: reference ``internlm/model/modeling_moe.py`` — InternLM blocks whose FFN
is a GShard MoE layer (every ``moe_layer_freq``-th layer in spirit; the
reference uses every layer), returning per-layer gate aux losses that the
schedulers accumulate into ``moe_loss`` (``no_pipeline_scheduler.py:141-145``),
plus the optional residual-MoE branch (``moe/moe.py:66-99``).

The apply function returns ``(logits, {"moe": summed_aux_loss})``; the train
step adds ``moe_loss_coeff * moe`` to the CE loss.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..utils.registry import MODEL_INITIALIZER
from .base import (
    ModelConfig,
    ModelDef,
    _dense,
    attention_block,
    block_forward,
    block_param_specs,
    embed_tokens,
    head_logits,
    init_block_params,
    init_params,
    _normal,
)
from .moe.gshard import moe_layer_apply

MODEL_TYPE = "INTERNLM_MoE"


def init_moe_params(cfg: ModelConfig, key: jax.Array) -> dict:
    """Dense init + per-layer expert stacks (experts init like w1/w2/w3,
    ref ``modeling_moe.py`` reuses the block reset_parameters)."""
    params = init_params(cfg, key)
    L, H, M, E = cfg.num_layers, cfg.hidden_size, cfg.mlp_hidden, cfg.num_experts
    keys = jax.random.split(jax.random.fold_in(key, 999), 5)
    layer_ids = jnp.arange(L, dtype=jnp.float32)
    if cfg.use_scaled_init:
        w2_std = (0.006 / jnp.sqrt(2.0 * (layer_ids + 1.0)))[:, None, None, None]
    else:
        w2_std = cfg.ffn_other_init_std
    moe = {
        "gate": _normal(keys[0], (L, H, E), 0.006),
        "experts": {
            "w1": _normal(keys[1], (L, E, H, M), cfg.ffn_uplayer_init_std),
            "w3": _normal(keys[2], (L, E, H, M), cfg.ffn_uplayer_init_std),
            "w2": jax.random.normal(keys[3], (L, E, M, H), jnp.float32) * w2_std,
        },
    }
    if cfg.num_shared_experts > 0:  # residual MoE: dense mlp + 2-way coefficient
        # reference moe/moe.py:73 `torch.nn.Linear(hidden_size, 2)` — WITH bias
        moe["coefficient"] = _normal(keys[4], (L, H, 2), 0.006)
        moe["coefficient_bias"] = jnp.zeros((L, 2), jnp.float32)
    blocks = params["blocks"]
    if cfg.num_shared_experts == 0:
        # pure MoE FFN: dense w1/w2/w3 are replaced by experts
        for k in ("w1", "w2", "w3"):
            blocks.pop(k, None)
    blocks["moe"] = jax.tree.map(lambda a: a.astype(cfg.dtype), moe)
    # gate stays fp32 for routing stability (ref gshard fp32 gating)
    blocks["moe"]["gate"] = moe["gate"].astype(jnp.float32)
    return params


def moe_param_specs(cfg: ModelConfig) -> dict:
    from ..parallel.sharding import get_rules
    from jax.sharding import PartitionSpec as P

    rules = get_rules()
    base = block_param_specs(cfg)
    p = rules.param_spec
    # the expert dim shards over the dedicated ep mesh axis (reference
    # Initializer_Expert_Data :474); ep is derived at launch as the largest
    # ways dividing both zero1 and num_experts, so this always divides E
    expert_axis = "expert"
    moe_specs = {
        "gate": p("layer", "embed", None),
        "experts": {
            "w1": p("layer", expert_axis, "embed", "moe_mlp"),
            "w3": p("layer", expert_axis, "embed", "moe_mlp"),
            "w2": p("layer", expert_axis, "moe_mlp", "embed"),
        },
    }
    if cfg.num_shared_experts > 0:
        moe_specs["coefficient"] = p("layer", "embed", None)
        moe_specs["coefficient_bias"] = p("layer", None)
    else:
        for k in ("w1", "w2", "w3"):
            base.pop(k, None)
    base["moe"] = moe_specs
    return base


def moe_model_forward(cfg: ModelConfig, params: dict, input_ids, positions, segment_ids,
                      dropout_rng: Optional[jax.Array] = None, train: bool = True,
                      return_hidden: bool = False):
    x = embed_tokens(cfg, params, input_ids)
    if cfg.residual_in_fp32:
        x = x.astype(jnp.float32)

    def moe_ffn(layer, h, rng):
        # drop_tokens=False means NO token may be dropped; the dense-dispatch
        # gshard formulation would need capacity = S (an (S, E, S) combine
        # tensor, quadratic memory where the reference uses a dynamic
        # max-count capacity) — the ragged dropless path IS the no-drop
        # semantics at linear memory, so route there
        dropless = (cfg.moe_type.lower() in ("dropless", "megablock-d", "megablock")
                    or not cfg.moe_drop_tokens)
        if dropless:
            import os

            from ..parallel.sharding import get_rules
            from .moe.dropless import dropless_moe_apply, dropless_moe_apply_gspmd_ep

            sh = get_rules()
            ep_size = sh.mesh.shape.get("ep", 1) if sh.mesh is not None else 1
            # ep > 1: exchange TOKENS (ragged a2a, experts resident) — the
            # reference MegaBlocks EP layout; IEVO_MOE_EP_WEIGHT_GATHER=1
            # falls back to the ZeRO-3-style weight-gather layout
            if ep_size > 1 and not os.environ.get("IEVO_MOE_EP_WEIGHT_GATHER"):
                out, l_aux, _counts = dropless_moe_apply_gspmd_ep(
                    layer["moe"], h, top_k=cfg.top_k, mesh=sh.mesh, train=train)
            else:
                out, l_aux, _counts = dropless_moe_apply(
                    layer["moe"], h, top_k=cfg.top_k, rng=rng, train=train)
            return _residual_branch(layer, h, out), l_aux
        out, l_aux, _counts = moe_layer_apply(
            layer["moe"], h,
            top_k=cfg.top_k,
            capacity_factor=cfg.moe_capacity_factor if train else cfg.moe_eval_capacity_factor,
            min_capacity=cfg.moe_min_capacity,
            drop_tokens=True,
            use_rts=cfg.moe_use_rts,
            noisy_gate_policy=cfg.moe_noisy_gate_policy if train else None,
            rng=rng,
            train=train,
        )
        return _residual_branch(layer, h, out), l_aux

    def _residual_branch(layer, h, out):
        if cfg.num_shared_experts > 0:
            dense = _dense(h, layer["w1"]["kernel"])
            w3o = _dense(h, layer["w3"]["kernel"])
            dense_out = _dense(jax.nn.silu(dense) * w3o, layer["w2"]["kernel"])
            coef_logits = _dense(h, layer["moe"]["coefficient"])
            if "coefficient_bias" in layer["moe"]:
                coef_logits = coef_logits + layer["moe"]["coefficient_bias"].astype(coef_logits.dtype)
            coef = jax.nn.softmax(coef_logits.astype(jnp.float32), axis=-1)
            out = out * coef[..., 0:1].astype(out.dtype) + dense_out * coef[..., 1:].astype(out.dtype)
        return out

    def scan_body(carry, xs):
        layer, idx = xs
        h, moe_loss = carry
        # per-layer dropout/gate-jitter stream (same folding as model_forward)
        rng = jax.random.fold_in(dropout_rng, idx) if dropout_rng is not None else None
        h_new, l_aux = block_forward(
            cfg, layer, h, positions, segment_ids, rng, train,
            ffn=lambda hh: moe_ffn(layer, hh, rng),
        )
        return (h_new, moe_loss + l_aux), None

    # honor model.checkpoint like model_forward: the first round(L * f) layers
    # full-remat (flash residuals kept), the rest everything-cheap-saveable.
    # remat_save_mlp / remat_save_qkv are FRACTIONS of the full-remat prefix
    # (same tiering semantics as model_forward / _stage_blocks_apply); the
    # mlp names cover the shared-expert dense branch — expert matmuls go
    # through the grouped path and are always recomputed.
    n_ckpt = int(round(cfg.num_layers * cfg.checkpoint))
    save_names = ["flash_out", "flash_lse"]
    GATE_NAMES = ("mlp_w1o", "mlp_w3o")
    QKV_NAMES = ("attn_q", "attn_k", "attn_v")
    n_gates = int(round(n_ckpt * min(1.0, max(0.0, float(cfg.remat_save_mlp)))))
    n_qkv = int(round(n_ckpt * min(1.0, max(0.0, float(cfg.remat_save_qkv)))))

    def make_body(policy):
        return jax.checkpoint(lambda carry, xs: scan_body(carry, xs),
                              policy=policy, prevent_cse=False)

    both = make_body(jax.checkpoint_policies.save_only_these_names(
        *save_names, *GATE_NAMES, *QKV_NAMES))
    single = make_body(jax.checkpoint_policies.save_only_these_names(
        *save_names, *(GATE_NAMES if n_gates >= n_qkv else QKV_NAMES)))
    full = make_body(jax.checkpoint_policies.save_only_these_names(*save_names))
    light = make_body(jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    xs_all = (params["blocks"], jnp.arange(cfg.num_layers, dtype=jnp.int32))
    carry = (x, jnp.zeros((), jnp.float32))
    n_both = min(n_gates, n_qkv)
    segments = [(both, 0, n_both), (single, n_both, max(n_gates, n_qkv)),
                (full, max(n_gates, n_qkv), n_ckpt),
                (light, n_ckpt, cfg.num_layers)]
    for body_fn, lo, hi in segments:
        if hi <= lo:
            continue
        seg_xs = (xs_all if (lo, hi) == (0, cfg.num_layers)
                  else jax.tree.map(lambda a: a[lo:hi], xs_all))
        carry, _ = jax.lax.scan(body_fn, carry, seg_xs)
    x, moe_loss = carry
    # SUM of per-layer aux losses (reference no_pipeline_scheduler.py:134:
    # sum(moe_losses) * coeff — NOT the mean)
    if return_hidden:
        # fused norm+head+CE path: hand back the pre-final-norm hidden states
        return x, {"moe": moe_loss}
    logits = head_logits(cfg, params, x)
    return logits, {"moe": moe_loss}


@MODEL_INITIALIZER.register_module(MODEL_TYPE)
def build_model_with_cfg(**kwargs) -> ModelDef:
    for k in ("num_chunks", "embed_split_hidden", "apply_post_layer_norm",
              "dropout_selective_checkpoint", "use_flash_attn", "adapt_hf", "use_fp32_norm"):
        kwargs.pop(k, None)
    # reference model-dict knobs: moe_gate_k = routing top-k,
    # moe_use_residual = residual-MoE (dense branch + learned coefficient)
    gate_k = kwargs.pop("moe_gate_k", None)
    if gate_k is not None:
        kwargs.setdefault("top_k", gate_k)
    if kwargs.pop("moe_use_residual", False):
        kwargs.setdefault("num_shared_experts", 1)
    fields = {k: v for k, v in kwargs.items() if k in ModelConfig.__dataclass_fields__}
    cfg = ModelConfig(qkv_bias=True, o_bias=True, mlp_bias=False, **fields)
    assert cfg.num_experts > 1, "INTERNLM_MoE requires model.num_experts > 1"

    def init(rng: jax.Array) -> dict:
        return init_moe_params(cfg, rng)

    model = ModelDef(config=cfg, init=init, apply=partial(moe_model_forward, cfg))
    model.specs = lambda: _moe_specs(cfg)
    return model


def _moe_specs(cfg: ModelConfig) -> dict:
    from .base import param_specs

    specs = param_specs(cfg)
    specs["blocks"] = moe_param_specs(cfg)
    return specs
