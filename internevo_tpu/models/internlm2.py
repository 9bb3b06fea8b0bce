"""INTERNLM2 model family (registry name "INTERNLM2_PUBLIC" / "INTERNLM2").

Parity: reference ``internlm/model/modeling_internlm2.py`` (:1012-1176).
InternLM2 specifics: GQA with per-kv-group fused wqkv packing (:147-154),
no biases (``no_bias=True`` in configs), optional baichuan2-style ``norm_head``,
init knobs init_std/attn_wqkv_init_std/... exposed in the config.
"""

from __future__ import annotations

from functools import partial

import jax

from ..utils.registry import MODEL_INITIALIZER
from .base import ModelConfig, ModelDef, init_params, model_forward


def _build(**kwargs) -> ModelDef:
    for k in (
        "num_chunks", "embed_split_hidden", "apply_post_layer_norm",
        "dropout_selective_checkpoint", "use_flash_attn", "adapt_hf", "use_fp32_norm",
    ):
        kwargs.pop(k, None)
    defaults = dict(qkv_bias=False, o_bias=False, mlp_bias=False)
    defaults.update({k: v for k, v in kwargs.items() if k in ModelConfig.__dataclass_fields__})
    cfg = ModelConfig(**defaults)

    def init(rng: jax.Array) -> dict:
        return init_params(cfg, rng)

    return ModelDef(config=cfg, init=init, apply=partial(model_forward, cfg))


@MODEL_INITIALIZER.register_module("INTERNLM2")
def build_model_with_cfg(**kwargs) -> ModelDef:
    return _build(**kwargs)


@MODEL_INITIALIZER.register_module("INTERNLM2_PUBLIC")
def build_model_with_cfg_public(**kwargs) -> ModelDef:
    return _build(**kwargs)
