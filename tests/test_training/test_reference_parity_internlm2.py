"""Logit parity for the GQA family: our INTERNLM2 vs the reference's.
import pytest

pytestmark = pytest.mark.heavy  # multi-minute tier; excluded by -m quick

Same harness as test_reference_parity; the reference InternLM2 uses the
per-kv-group fused wqkv layout natively, so conversion is just transposes.
"""

import subprocess
import sys

import numpy as np

VOCAB, HIDDEN, HEADS, KV_HEADS, LAYERS, SEQ = 256, 64, 4, 2, 2, 32

DRIVER = rf"""
import sys
sys.path.insert(0, "tests/test_training")
import numpy as np
import torch

from reference_harness import launch_reference, reference_config

cfg = reference_config(vocab={VOCAB}, hidden={HIDDEN}, heads={HEADS}, layers={LAYERS}, seq={SEQ})
cfg["model_type"] = "INTERNLM2_PUBLIC"
cfg["model"]["num_kv_attention_heads"] = {KV_HEADS}
cfg["model"]["no_bias"] = True
launch_reference(cfg)
from internlm.train.pipeline import initialize_model

model = initialize_model()
sd = {{k.removeprefix("model."): v.detach().float().numpy().copy()
      for k, v in model.state_dict().items()}}
rng = np.random.RandomState(11)
ids = rng.randint(0, {VOCAB}, (1, {SEQ})).astype(np.int64)
with torch.no_grad():
    logits = model(input_ids=torch.tensor(ids)).float().numpy()
np.savez(sys.argv[1], logits=logits, ids=ids, **{{f"sd::{{k}}": v for k, v in sd.items()}})
print("REF_OK")
"""


def test_internlm2_logits_match_reference(tmp_path):
    out_file = str(tmp_path / "ref2.npz")
    proc = subprocess.run([sys.executable, "-c", DRIVER, out_file],
                          capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert "REF_OK" in proc.stdout, proc.stdout[-1500:] + proc.stderr[-3000:]
    data = np.load(out_file)
    sd = {k[4:]: data[k] for k in data.files if k.startswith("sd::")}

    import jax.numpy as jnp

    from internevo_tpu.models import ModelConfig
    from internevo_tpu.models.base import model_forward
    from internevo_tpu.ops.attention import set_use_pallas

    set_use_pallas(False)
    cfg = ModelConfig(num_layers=LAYERS, hidden_size=HIDDEN, num_attention_heads=HEADS,
                      num_kv_attention_heads=KV_HEADS, vocab_size=VOCAB, mlp_ratio=8 / 3,
                      dtype=jnp.float32, embed_grad_scale=1, no_bias=True)
    L = LAYERS
    blocks = {
        "norm1": jnp.asarray(np.stack([sd[f"layers.{l}.attention_norm.weight"] for l in range(L)])),
        "norm2": jnp.asarray(np.stack([sd[f"layers.{l}.ffn_norm.weight"] for l in range(L)])),
        "wqkv": {"kernel": jnp.asarray(np.stack([sd[f"layers.{l}.attention.wqkv.weight"].T for l in range(L)]))},
        "out_proj": {"kernel": jnp.asarray(np.stack([sd[f"layers.{l}.attention.wo.weight"].T for l in range(L)]))},
        "w1": {"kernel": jnp.asarray(np.stack([sd[f"layers.{l}.feed_forward.w1.weight"].T for l in range(L)]))},
        "w3": {"kernel": jnp.asarray(np.stack([sd[f"layers.{l}.feed_forward.w3.weight"].T for l in range(L)]))},
        "w2": {"kernel": jnp.asarray(np.stack([sd[f"layers.{l}.feed_forward.w2.weight"].T for l in range(L)]))},
    }
    params = {
        "embedding": {"weight": jnp.asarray(sd["tok_embeddings.weight"])},
        "blocks": blocks,
        "norm": jnp.asarray(sd["norm.weight"]),
        "head": {"kernel": jnp.asarray(sd["output.weight"].T)},
    }
    ids = jnp.asarray(data["ids"].astype(np.int32))
    pos = jnp.tile(jnp.arange(SEQ), (1, 1))
    seg = jnp.ones((1, SEQ), jnp.int32)
    ours = model_forward(cfg, params, ids, pos, seg, train=False)
    np.testing.assert_allclose(np.asarray(ours), data["logits"], rtol=1e-3, atol=1e-3)
