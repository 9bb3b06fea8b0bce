"""Native C++ fastpack kernels vs the Python fallbacks."""

import json

import numpy as np
import pytest

from internevo_tpu.native import (
    build_meta_from_bytes,
    native_available,
    parse_tokens_line,
    prepare_meta_fast,
)


def test_parse_tokens_line():
    line = b'{"tokens": [1, 22, -333, 4444, 0]}\n'
    out = parse_tokens_line(line)
    np.testing.assert_array_equal(out, [1, 22, -333, 4444, 0])


def test_parse_matches_json_fallback():
    rng = np.random.RandomState(0)
    toks = rng.randint(-100, 100000, 500).tolist()
    line = json.dumps({"tokens": toks}).encode()
    np.testing.assert_array_equal(parse_tokens_line(line), toks)


def test_build_meta_matches_python(tmp_path):
    lines = []
    for n in (3, 10, 1, 250):
        lines.append(json.dumps({"tokens": list(range(n))}).encode())
    buf = b"\n".join(lines) + b"\n"
    meta = build_meta_from_bytes(buf)
    assert meta.shape == (4, 2)
    np.testing.assert_array_equal(meta[:, 1], [3, 10, 1, 250])
    # offsets point at line starts
    offs = [0]
    for ln in lines[:-1]:
        offs.append(offs[-1] + len(ln) + 1)
    np.testing.assert_array_equal(meta[:, 0], offs)


def test_prepare_meta_fast_readable_by_dataset(tmp_path):
    p = tmp_path / "x.bin"
    with open(p, "wb") as f:
        for n in range(60, 70):
            f.write(json.dumps({"tokens": list(range(n))}).encode() + b"\n")
    prepare_meta_fast(str(p))
    from internevo_tpu.data.single_dataset import JsonlDataset

    ds = JsonlDataset(str(p), min_length=0)
    assert len(ds) == 10
    assert ds[3]["length"] == 63


def test_native_compiled():
    """g++ is in the image; the fast path should actually be native."""
    assert native_available()
