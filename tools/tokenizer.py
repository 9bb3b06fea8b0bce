#!/usr/bin/env python
"""Tokenize raw text into the .bin/.bin.meta dataset format.

Parity: reference ``tools/tokenizer.py`` — one JSON object per line
``{"tokens": [...]}`` in the .bin, and a .bin.meta numpy array of
``(byte_offset, token_count)`` rows (the index ``JsonlDataset`` mmaps).

The reference uses a sentencepiece InternLM tokenizer; this environment has no
sentencepiece, so the tokenizer is pluggable: ``--tokenizer_path`` loads any HF
tokenizer (``transformers.AutoTokenizer``/``tokenizers``), and the default is a
byte-level fallback so the pipeline is testable offline.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


class ByteTokenizer:
    """Offline fallback: UTF-8 bytes + bos/eos (ids shifted by 3 specials)."""

    bos_id, eos_id, pad_id = 1, 2, 0

    def encode(self, text: str) -> list[int]:
        return [self.bos_id] + [b + 3 for b in text.encode("utf-8")] + [self.eos_id]


def load_tokenizer(path: str | None):
    if path is None:
        return ByteTokenizer()
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(path, trust_remote_code=True)

    class _Wrap:
        def encode(self, text: str) -> list[int]:
            return tok.encode(text)

    return _Wrap()


def write_bin(context: str, bin_file, tokenizer) -> None:
    tokens = tokenizer.encode(context)
    bin_file.write(str.encode(json.dumps(dict(tokens=tokens)) + "\n"))


def prepare_meta(bin_output_path: str) -> None:
    """Build the (byte_offset, n_tokens) index next to the bin (ref :43-75)."""
    meta = []
    cur = 0
    with open(bin_output_path, "rb") as f:
        while True:
            line = f.readline()
            if line == b"":
                break
            length = len(json.loads(line)["tokens"])
            meta.append((cur, length))
            cur += len(line)
    with open(bin_output_path + ".meta", "wb") as f:
        np.save(f, np.asarray(meta, dtype=np.int64))


def tokenize_file(text_input_path: str, bin_output_path: str, tokenizer, is_json: bool = False,
                  json_key: str = "content") -> None:
    os.makedirs(os.path.dirname(os.path.abspath(bin_output_path)), exist_ok=True)
    with open(text_input_path, encoding="utf-8") as fin, open(bin_output_path, "wb") as fout:
        for line in fin:
            line = line.rstrip("\n")
            if not line:
                continue
            if is_json:
                line = json.loads(line).get(json_key, "")
                if not line:
                    continue
            write_bin(line, fout, tokenizer)
    prepare_meta(bin_output_path)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--text_input_path", required=True, help="raw text file, one sample per line")
    parser.add_argument("--bin_output_path", required=True, help="output .bin path")
    parser.add_argument("--tokenizer_path", default=None, help="HF tokenizer path (default: byte-level)")
    parser.add_argument("--is_json", action="store_true")
    parser.add_argument("--json_key", default="content")
    args = parser.parse_args()
    tokenizer = load_tokenizer(args.tokenizer_path)
    tokenize_file(args.text_input_path, args.bin_output_path, tokenizer,
                  is_json=args.is_json, json_key=args.json_key)
    print(f"written {args.bin_output_path} (+.meta)")


if __name__ == "__main__":
    main()
