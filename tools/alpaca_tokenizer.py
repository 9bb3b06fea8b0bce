#!/usr/bin/env python
"""Tokenize alpaca-style SFT data into the .bin/.bin.meta format.

Parity: reference ``tools/alpaca_tokenizer.py`` — builds prompt/response pairs
from an alpaca json list, masks the prompt tokens with NEGATIVE ids (the
collater maps tokens<0 to label -100 and abs() for inputs,
``data/tokenized/collaters.py:38-39``), and splits train/valid.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from tokenizer import ByteTokenizer, load_tokenizer, prepare_meta  # noqa: E402

PROMPT_TEMPLATE = (
    "Below is an instruction that describes a task. "
    "Write a response that appropriately completes the request.\n\n"
    "### Instruction:\n{instruction}\n\n### Response:"
)
PROMPT_TEMPLATE_WITH_INPUT = (
    "Below is an instruction that describes a task, paired with an input that "
    "provides further context. Write a response that appropriately completes "
    "the request.\n\n### Instruction:\n{instruction}\n\n### Input:\n{input}\n\n### Response:"
)


def build_sample(example: dict, tokenizer) -> list[int]:
    if example.get("input"):
        prompt = PROMPT_TEMPLATE_WITH_INPUT.format(instruction=example["instruction"],
                                                   input=example["input"])
    else:
        prompt = PROMPT_TEMPLATE.format(instruction=example["instruction"])
    prompt_toks = tokenizer.encode(prompt)
    full_toks = tokenizer.encode(prompt + example.get("output", ""))
    # prompt tokens negated => label -100 at pack time (loss only on response)
    n_prompt = min(len(prompt_toks), len(full_toks))
    return [-abs(t) if i < n_prompt else t for i, t in enumerate(full_toks)]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("input_path", help="alpaca json file (list of dicts)")
    parser.add_argument("output_dir")
    parser.add_argument("--tokenizer_path", default=None)
    parser.add_argument("--split_ratio", type=float, default=0.1)
    parser.add_argument("--seed", type=int, default=1024)
    args = parser.parse_args()

    tokenizer = load_tokenizer(args.tokenizer_path)
    with open(args.input_path, encoding="utf-8") as f:
        examples = json.load(f)
    random.Random(args.seed).shuffle(examples)
    n_valid = int(len(examples) * args.split_ratio)

    for split, subset in (("train", examples[n_valid:]), ("valid", examples[:n_valid])):
        out_dir = os.path.join(args.output_dir, split, "en")
        os.makedirs(out_dir, exist_ok=True)
        bin_path = os.path.join(out_dir, "dataset.bin")
        with open(bin_path, "wb") as fout:
            for ex in subset:
                tokens = build_sample(ex, tokenizer)
                fout.write(str.encode(json.dumps(dict(tokens=tokens)) + "\n"))
        prepare_meta(bin_path)
        print(f"{split}: {len(subset)} samples -> {bin_path}")


if __name__ == "__main__":
    main()
