#!/usr/bin/env python
"""Import a HuggingFace llama/internlm2 model folder into an internevo checkpoint.

Parity: reference ``transformers/revert_internlm*.py`` (HF -> internevo shards).
Here the output is one topology-free orbax checkpoint usable with
``ckpt.load_ckpt_info=dict(path=..., content=("model",), ckpt_type="internevo")``.

Usage:
    python tools/revert_hf.py --config configs/7B_llama2.py \
        --hf_path <hf folder> --out llm_ckpts/imported [--format llama|internlm|internlm2]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax  # noqa: E402

if os.environ.get("IEVO_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["IEVO_PLATFORM"])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--hf_path", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--format", default="llama", choices=["llama", "internlm", "internlm2"])
    args = parser.parse_args()

    from pathlib import Path

    import orbax.checkpoint as ocp

    from internevo_tpu.checkpoint.convert import (
        from_hf_internlm, from_hf_internlm2, from_hf_llama,
    )
    from internevo_tpu.initialize.launch import launch
    from internevo_tpu.train.pipeline import initialize_model

    launch(args.config, seed=1024)
    model, _params = initialize_model()

    sd = {}
    bin_path = os.path.join(args.hf_path, "pytorch_model.bin")
    if os.path.exists(bin_path):
        import torch

        sd = {k: v.float().numpy() for k, v in
              torch.load(bin_path, map_location="cpu", weights_only=True).items()}
    else:
        from transformers import AutoModelForCausalLM

        hf = AutoModelForCausalLM.from_pretrained(args.hf_path, trust_remote_code=True)
        sd = {k: v.detach().cpu().float().numpy() for k, v in hf.state_dict().items()}

    convert = {"llama": from_hf_llama, "internlm": from_hf_internlm,
               "internlm2": from_hf_internlm2}[args.format]
    params = convert(sd, model.config)

    out = Path(args.out).resolve()
    out.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(out / "arrays_model", {"params": params})
    ckptr.wait_until_finished()
    with open(out / "0.step", "w") as f:
        f.write("0")
    print(f"imported {args.hf_path} -> {out} ({args.format})")


if __name__ == "__main__":
    main()
