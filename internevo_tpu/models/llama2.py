"""LLAMA2 model family (registry name "LLAMA2").

Parity: reference ``internlm/model/modeling_llama.py`` — HF-llama-compatible
GQA transformer (separate wq/wk/wv in the reference; we keep the fused wqkv
layout internally and convert at checkpoint import/export, see
``checkpoint/load_funcs.py`` parity in ``internevo_tpu/checkpoint/convert.py``).
No biases; rmsnorm; SwiGLU.
"""

from __future__ import annotations

from functools import partial

import jax

from ..utils.registry import MODEL_INITIALIZER
from .base import ModelConfig, ModelDef, init_params, model_forward

MODEL_TYPE = "LLAMA2"


@MODEL_INITIALIZER.register_module(MODEL_TYPE)
def build_model_with_cfg(**kwargs) -> ModelDef:
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
