#!/usr/bin/env python
"""Export an internevo_tpu checkpoint to a HuggingFace model folder.

Parity: reference ``transformers/convert2hf_internlm*.py`` (merge shards ->
HF weights + config).  Orbax checkpoints are topology-free, so there is no
tp/pp merge step; the converter writes a ``pytorch_model.bin`` (torch is the
interchange format available offline) plus ``config.json``.

Usage:
    python tools/convert2hf.py --config configs/7B_sft.py \
        --ckpt llm_ckpts/2000 --out hf_out [--format llama|internlm2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax  # noqa: E402

if os.environ.get("IEVO_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["IEVO_PLATFORM"])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--ckpt", required=True, help="internevo checkpoint dir")
    parser.add_argument("--out", required=True)
    parser.add_argument("--format", default="llama",
                        choices=["llama", "internlm", "internlm2"])
    parser.add_argument("--dtype", default="float16")
    args = parser.parse_args()

    import torch
    from pathlib import Path

    import orbax.checkpoint as ocp

    from internevo_tpu.checkpoint.convert import (
        to_hf_internlm, to_hf_internlm2, to_hf_llama,
    )
    from internevo_tpu.initialize.launch import launch
    from internevo_tpu.train.pipeline import initialize_model

    launch(args.config, seed=1024)
    model, params = initialize_model()
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(Path(args.ckpt).resolve() / "arrays_model", {"params": params})["params"]

    convert = {"llama": to_hf_llama, "internlm": to_hf_internlm,
               "internlm2": to_hf_internlm2}[args.format]
    sd = convert(params, model.config)
    os.makedirs(args.out, exist_ok=True)
    torch_dtype = getattr(torch, args.dtype)
    torch_sd = {k: torch.tensor(v).to(torch_dtype) for k, v in sd.items()}
    torch.save(torch_sd, os.path.join(args.out, "pytorch_model.bin"))

    cfg = model.config
    arch = {"llama": "LlamaForCausalLM", "internlm": "InternLMForCausalLM",
            "internlm2": "InternLM2ForCausalLM"}[args.format]
    hf_config = {
        "architectures": [arch],
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.mlp_hidden,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_attention_heads,
        "num_key_value_heads": cfg.num_kv_attention_heads,
        "vocab_size": cfg.vocab_size,
        "rms_norm_eps": cfg.layer_norm_epsilon,
        "rope_theta": cfg.rope_base,
        "max_position_embeddings": cfg.max_position_embeddings,
        "torch_dtype": args.dtype,
        "model_type": args.format,
        "tie_word_embeddings": False,
    }
    if args.format == "internlm":
        hf_config["bias"] = True  # HF InternLM1 carries qkv/o biases
    if args.format == "llama":
        # InternLM1-family exports carry qkv/o biases; HF llama accepts them
        # behind attention_bias (defaults False otherwise)
        hf_config["attention_bias"] = any(k.endswith("self_attn.q_proj.bias")
                                          for k in sd)
    with open(os.path.join(args.out, "config.json"), "w") as f:
        json.dump(hf_config, f, indent=2)
    print(f"wrote {args.out}/pytorch_model.bin + config.json ({len(torch_sd)} tensors)")


if __name__ == "__main__":
    main()
