#!/usr/bin/env python
"""Load a trained model and generate.

Parity: reference ``tools/load_internlm_model.py`` — build the model from a
training config, load an internevo checkpoint (or HF folder), and run
``SequenceGenerator``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax  # noqa: E402

if os.environ.get("IEVO_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["IEVO_PLATFORM"])

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def initialize_internlm_model(config_path: str, ckpt_path: str | None = None,
                              ckpt_type: str = "internevo"):
    from internevo_tpu.initialize.launch import launch
    from internevo_tpu.train.pipeline import initialize_model

    launch(config_path, seed=1024)
    model, params = initialize_model()
    if ckpt_path:
        if ckpt_type == "internevo":
            from pathlib import Path

            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            params = ckptr.restore(Path(ckpt_path).resolve() / "arrays_model",
                                   {"params": params})["params"]
        elif ckpt_type == "hf_llama":
            from transformers import AutoModelForCausalLM

            from internevo_tpu.checkpoint.convert import from_hf_llama

            hf = AutoModelForCausalLM.from_pretrained(ckpt_path, trust_remote_code=True)
            sd = {k: v.detach().cpu().numpy() for k, v in hf.state_dict().items()}
            params = from_hf_llama(sd, model.config)
        else:
            raise ValueError(f"unknown ckpt_type {ckpt_type}")
    return model, params


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--ckpt_type", default="internevo", choices=["internevo", "hf_llama"])
    parser.add_argument("--prompt_ids", default="1", help="comma-separated token ids")
    parser.add_argument("--max_length", type=int, default=64)
    parser.add_argument("--do_sample", action="store_true")
    args = parser.parse_args()

    from internevo_tpu.apis.inference import SequenceGenerator

    model, params = initialize_internlm_model(args.config, args.ckpt, args.ckpt_type)
    gen = SequenceGenerator((model, params))
    ids = jnp.asarray([np.array([int(t) for t in args.prompt_ids.split(",")], np.int32)])
    out = gen.generate(ids, max_length=args.max_length, do_sample=args.do_sample)
    print("generated token ids:", np.asarray(out)[0].tolist())


if __name__ == "__main__":
    main()
