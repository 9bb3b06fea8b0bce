"""Tokenizer tools round-trip, metrics, timeout, memory profiler."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_tokenizer_bin_roundtrip(tmp_path):
    """tools/tokenizer.py output must be readable by JsonlDataset."""
    raw = tmp_path / "raw.txt"
    raw.write_text("hello world this is a longer line of text for testing purposes only\n" * 30
                   + "short\n")
    out = tmp_path / "ds" / "en" / "data.bin"
    r = subprocess.run(
        [sys.executable, "tools/tokenizer.py", "--text_input_path", str(raw),
         "--bin_output_path", str(out)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    assert out.exists() and (str(out) + ".meta", os.path.exists(str(out) + ".meta"))

    from internevo_tpu.data.single_dataset import JsonlDataset

    ds = JsonlDataset(str(out), min_length=10)
    assert len(ds) == 30  # the short line is filtered by min_length
    item = ds[0]
    assert item["tokens"][0] == 1 and item["tokens"][-1] == 2  # bos/eos
    assert item["length"] == len(item["tokens"])


def test_alpaca_tokenizer(tmp_path):
    data = [{"instruction": "Say hi", "input": "", "output": "hi there"} for _ in range(20)]
    src = tmp_path / "alpaca.json"
    src.write_text(json.dumps(data))
    r = subprocess.run(
        [sys.executable, "tools/alpaca_tokenizer.py", str(src), str(tmp_path / "out")],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    from internevo_tpu.data.single_dataset import JsonlDataset

    ds = JsonlDataset(str(tmp_path / "out" / "train" / "en" / "dataset.bin"), min_length=0)
    item = ds[0]
    toks = np.asarray(item["tokens"])
    assert (toks < 0).any() and (toks > 0).any()  # prompt masked, response not


def test_acc_perplex_streaming():
    from internevo_tpu.models.metrics import AccPerplex

    metric = AccPerplex(dataset_types=["en", "cn"])
    logits = jnp.asarray([[[10.0, 0, 0], [0, 10.0, 0]]])  # predicts 0 then 1
    labels = jnp.asarray([[0, 2]])  # first right, second wrong
    type_ids = jnp.asarray([[0, 1]])
    metric.update(logits, labels, type_ids=type_ids)
    res = metric.get_metric()
    assert res["acc"] == 0.5
    assert res["acc/en"] == 1.0 and res["acc/cn"] == 0.0
    assert res["perplexity"] > 1


def test_llm_timeout_fires(monkeypatch):
    import importlib

    monkeypatch.setenv("IEVO_ENABLE_TIMEOUT", "1")
    import internevo_tpu.utils.timeout as to

    importlib.reload(to)

    @to.llm_timeout(seconds=1, func_name="test_phase")
    def slow():
        import time

        time.sleep(3)

    with pytest.raises(to.LlmTimeoutError):
        slow()
    monkeypatch.delenv("IEVO_ENABLE_TIMEOUT")
    importlib.reload(to)


def test_memory_profiler_report():
    from internevo_tpu.utils.simple_memory_profiler import SimpleMemoryProfiler

    params = {"embedding": {"w": jnp.zeros((128, 64))}, "blocks": {"k": jnp.zeros((2, 64, 64))}}
    prof = SimpleMemoryProfiler(params, activation_config=dict(
        hidden_size=64, mlp_hidden=128, num_layers=2, tokens_per_device=512))
    rep = prof.layout_report()
    assert "params_total" in rep and "activation_estimate" in rep


def test_tpudiag_benchmarks():
    from internevo_tpu.utils.tpudiag import bench_device, timer_diagnosis

    tflops = bench_device(dim=256)
    assert tflops > 0
    for _ in range(12):
        timer_diagnosis(0.01)
    timer_diagnosis(1.0)  # outlier: must not raise, just alert-log
