"""INTERNLM model family (registry name "INTERNLM").

Parity: reference ``internlm/model/modeling_internlm.py`` —
``PackedFlashInternLm1D`` (:239) built by ``build_model_with_cfg`` (:463-549).
InternLM1 specifics: MHA (no GQA), wqkv/out_proj bias=True, mlp bias=False,
embedding+head init std 0.0052, wqkv std 0.006, scaled init on out_proj/w2.
"""

from __future__ import annotations

from functools import partial

import jax

from ..utils.registry import MODEL_INITIALIZER
from .base import ModelConfig, ModelDef, init_params, model_forward

MODEL_TYPE = "INTERNLM"


@MODEL_INITIALIZER.register_module(MODEL_TYPE)
def build_model_with_cfg(**kwargs) -> ModelDef:
    kwargs.pop("num_chunks", None)
    kwargs.pop("embed_split_hidden", None)
    kwargs.pop("apply_post_layer_norm", None)
    kwargs.pop("dropout_selective_checkpoint", None)
    kwargs.pop("use_flash_attn", None)
    kwargs.pop("adapt_hf", None)
    cfg = ModelConfig(
        qkv_bias=True,
        o_bias=True,
        mlp_bias=False,
        **{k: v for k, v in kwargs.items() if k in ModelConfig.__dataclass_fields__},
    )

    def init(rng: jax.Array) -> dict:
        return init_params(cfg, rng)

    apply = partial(model_forward, cfg)
    return ModelDef(config=cfg, init=init, apply=apply)
