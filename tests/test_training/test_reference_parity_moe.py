"""MoE torch-oracle parity: our GShard gating + INTERNLM_MoE vs the reference.

Closes the last untested semantic surface of size (round-4 verdict #3): the
reference ``internlm/model/moe/gshard_layer.py`` gating — top1 incl. the
RSample / RTS / Jitter stochastic branches (:138-222), top2 second-expert
logic + capacity truncation order + normalization (:224-366) — and the full
INTERNLM_MoE 3-step training loss (``modeling_moe.py``), all run against the
actual reference implementation on torch-cpu as a black-box oracle.

Stochastic branches are compared EXACTLY by injecting the same noise into
both sides: the reference exposes its draws as module-level device→callable
maps (``gumbel_map``, ``uniform_map``, ``exp_selection_uniform_map``,
``gshard_layer.py:29-31``); ours exposes ``gshard._gumbel`` / ``_uniform``.
"""

import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # multi-minute tier; excluded by -m quick

S, E, H = 64, 8, 32
M = 256  # reference FeedForward rounds int(H*8/3)=85 up to multiple_of=256

# ---------------------------------------------------------------- gating oracle

GATING_DRIVER = r"""
import sys
sys.path.insert(0, "tests/test_training")
import numpy as np
import torch

from reference_harness import launch_reference, reference_config

S, E, H, M = 64, 8, 32, 256
# tiny dense launch just to satisfy gpc imports; gating functions themselves
# only need gpc for drop_tokens=False (not exercised here)
launch_reference(reference_config(vocab=64, hidden=32, heads=2, layers=1, seq=16))
import internlm.model.moe.gshard_layer as gl

rng = np.random.RandomState(3)
logits = rng.randn(S, E).astype(np.float32)
gumbel = rng.gumbel(size=(S, E)).astype(np.float32)
rts = rng.uniform(size=(S, E)).astype(np.float32)
jitter = rng.uniform(1.0 - 1e-2, 1.0 + 1e-2, size=(S, H)).astype(np.float32)
gate_w = (rng.randn(E, H) * 0.05).astype(np.float32)
x = rng.randn(S, H).astype(np.float32)
ew1 = (rng.randn(E, M, H) * 0.05).astype(np.float32)
ew3 = (rng.randn(E, M, H) * 0.05).astype(np.float32)
ew2 = (rng.randn(E, H, M) * 0.05).astype(np.float32)

dev = torch.device("cpu")
gl.gumbel_map[dev] = lambda shape: torch.from_numpy(gumbel)
gl.exp_selection_uniform_map[dev] = lambda shape: torch.from_numpy(rts)
gl.uniform_map[dev] = lambda shape: torch.from_numpy(jitter)

out = {}
t = torch.from_numpy(logits)
# NB: without RTS the capacity truncation picks top-k over a 0/1 mask —
# tie-breaking among the equal 1s is torch-heap-order on CPU (measured:
# topk([0,1,1,0,1,1,1], 3) -> [5,4,1]) and differs again on CUDA, so the
# reference itself is not reproducible across backends there.  Exact-parity
# cases therefore use either (a) no-drop capacity (factor 8 -> cap = S) for
# the non-RTS branches, or (b) RTS priorities (distinct uniforms -> unique
# top-k) for the truncation-order branches.
top1_cases = {
    "t1_plain": (None, False, 8.0),
    "t1_rsample": ("RSample", False, 8.0),
    "t1_rts": (None, True, 1.0),
    "t1_rsample_rts": ("RSample", True, 1.0),
    "t1_rts_cap05": (None, True, 0.5),
}
for name, (policy, use_rts, cap) in top1_cases.items():
    l_aux, cw, dm, counts = gl.top1gating(
        t, capacity_factor=cap, min_capacity=4, used_token=None,
        noisy_gate_policy=policy, drop_tokens=True, use_rts=use_rts)
    out[f"{name}::l_aux"] = np.float32(l_aux)
    out[f"{name}::combine"] = cw.detach().numpy()
    out[f"{name}::counts"] = counts.detach().numpy()
for name, cap in {"t2": 1.0, "t2_cap05": 0.5}.items():
    l_aux, cw, dm, counts = gl.top2gating(t, capacity_factor=cap, min_capacity=4)
    out[f"{name}::l_aux"] = np.float32(l_aux)
    out[f"{name}::combine"] = cw.detach().numpy()
    out[f"{name}::counts"] = counts.detach().numpy()

# full layer with Jitter policy: TopKGate (jitter -> wg -> top1gating) +
# the GShard dispatch/expert/combine einsums (gshard_layer.py:445-498) with
# shared SwiGLU expert weights
gate = gl.TopKGate(H, E, topk=1, capacity_factor=1.0, eval_capacity_factor=1.0,
                   min_capacity=4, noisy_gate_policy="Jitter", drop_tokens=True,
                   use_rts=True)
with torch.no_grad():
    gate.wg.weight.copy_(torch.from_numpy(gate_w))
gate.train()
l_aux, cw, dm, counts = gate(torch.from_numpy(x))
dispatched = torch.einsum("sec,sm->ecm", dm.float(), torch.from_numpy(x))
h1 = torch.einsum("ecm,enm->ecn", dispatched, torch.from_numpy(ew1))
h3 = torch.einsum("ecm,enm->ecn", dispatched, torch.from_numpy(ew3))
eo = torch.einsum("ecn,ehn->ech", torch.nn.functional.silu(h1) * h3,
                  torch.from_numpy(ew2))
combined = torch.einsum("sec,ech->sh", cw, eo)
out["jitter::l_aux"] = np.float32(float(l_aux))
out["jitter::counts"] = counts.detach().numpy()
out["jitter::out"] = combined.detach().numpy()

np.savez(sys.argv[1], logits=logits, gumbel=gumbel, rts=rts, jitter=jitter,
         gate_w=gate_w, x=x, ew1=ew1, ew3=ew3, ew2=ew2, **out)
print("REF_OK")
"""


@pytest.fixture(scope="module")
def gating_oracle(tmp_path_factory):
    out_file = str(tmp_path_factory.mktemp("moe") / "gating.npz")
    proc = subprocess.run([sys.executable, "-c", GATING_DRIVER, out_file],
                          capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert "REF_OK" in proc.stdout, proc.stdout[-2000:] + proc.stderr[-3000:]
    return np.load(out_file)


@pytest.fixture()
def patched_noise(gating_oracle, monkeypatch):
    """Inject the oracle's noise draws into our gshard seams."""
    import jax.numpy as jnp

    from internevo_tpu.models.moe import gshard

    gumbel = jnp.asarray(gating_oracle["gumbel"])
    rts = jnp.asarray(gating_oracle["rts"])
    jitter = jnp.asarray(gating_oracle["jitter"])

    def fake_uniform(rng, shape, lo=0.0, hi=1.0):
        return jitter if tuple(shape) == jitter.shape else rts

    monkeypatch.setattr(gshard, "_gumbel", lambda rng, shape: gumbel)
    monkeypatch.setattr(gshard, "_uniform", fake_uniform)
    return gating_oracle


@pytest.mark.parametrize("case,policy,use_rts,cap", [
    ("t1_plain", None, False, 8.0),
    ("t1_rsample", "RSample", False, 8.0),
    ("t1_rts", None, True, 1.0),
    ("t1_rsample_rts", "RSample", True, 1.0),
    ("t1_rts_cap05", None, True, 0.5),
])
def test_top1_gating_matches_reference(patched_noise, case, policy, use_rts, cap):
    import jax
    import jax.numpy as jnp

    from internevo_tpu.models.moe.gshard import top1gating

    data = patched_noise
    l_aux, combine, dispatch, counts = top1gating(
        jnp.asarray(data["logits"]), capacity_factor=cap, min_capacity=4,
        rng=jax.random.PRNGKey(0), noisy_gate_policy=policy,
        drop_tokens=True, use_rts=use_rts)
    np.testing.assert_allclose(float(l_aux), data[f"{case}::l_aux"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(combine), data[f"{case}::combine"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(counts).astype(np.int64),
                                  data[f"{case}::counts"].astype(np.int64))
    assert bool(jnp.all(dispatch == (combine > 0)))


@pytest.mark.parametrize("case,cap", [("t2", 1.0), ("t2_cap05", 0.5)])
def test_top2_gating_matches_reference(patched_noise, case, cap):
    import jax
    import jax.numpy as jnp

    from internevo_tpu.models.moe.gshard import top2gating

    data = patched_noise
    l_aux, combine, dispatch, counts = top2gating(
        jnp.asarray(data["logits"]), capacity_factor=cap, min_capacity=4,
        rng=jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(l_aux), data[f"{case}::l_aux"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(combine), data[f"{case}::combine"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(counts).astype(np.int64),
                                  data[f"{case}::counts"].astype(np.int64))


def test_jitter_full_layer_matches_reference(patched_noise):
    """Jitter policy through the FULL layer: jittered gate input -> top1 with
    RTS -> dispatch -> SwiGLU experts -> combine (ref TopKGate.forward :466-476
    + GShardMOELayer dispatch/combine einsums)."""
    import jax
    import jax.numpy as jnp

    from internevo_tpu.models.moe.gshard import moe_layer_apply

    data = patched_noise
    layer = {
        "gate": jnp.asarray(data["gate_w"].T),                    # (H, E)
        "experts": {
            "w1": jnp.asarray(np.transpose(data["ew1"], (0, 2, 1))),  # (E, H, M)
            "w3": jnp.asarray(np.transpose(data["ew3"], (0, 2, 1))),
            "w2": jnp.asarray(np.transpose(data["ew2"], (0, 2, 1))),  # (E, M, H)
        },
    }
    x = jnp.asarray(data["x"])[None]  # (1, S, H)
    out, l_aux, counts = moe_layer_apply(
        layer, x, top_k=1, capacity_factor=1.0, min_capacity=4,
        drop_tokens=True, use_rts=True, noisy_gate_policy="Jitter",
        rng=jax.random.PRNGKey(0), train=True)
    np.testing.assert_allclose(float(l_aux), data["jitter::l_aux"], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(counts).astype(np.int64),
                                  data["jitter::counts"].astype(np.int64))
    np.testing.assert_allclose(np.asarray(out[0]), data["jitter::out"],
                               rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------ 3-step e2e oracle

VOCAB, HIDDEN, HEADS, LAYERS, SEQ, EXPERTS = 256, 64, 4, 2, 32, 4
LR, STEPS, MOE_COEFF = 1e-3, 3, 0.1

E2E_DRIVER_TMPL = r"""
import sys
sys.path.insert(0, "tests/test_training")
import numpy as np
import torch

from reference_harness import launch_reference, reference_config

VOCAB, HIDDEN, HEADS, LAYERS, SEQ, EXPERTS = {VOCAB}, {HIDDEN}, {HEADS}, {LAYERS}, {SEQ}, {EXPERTS}
TOP_K, CAP, USE_RTS, RESIDUAL = {TOP_K}, {CAP}, {USE_RTS}, {RESIDUAL}

cfg = reference_config(vocab=VOCAB, hidden=HIDDEN, heads=HEADS, layers=LAYERS, seq=SEQ)
cfg["model_type"] = "INTERNLM_MoE"
cfg["model"].update(num_experts=EXPERTS, moe_use_residual=RESIDUAL, moe_type="GShard")
cfg["moe"] = dict(top_k=TOP_K, capacity_factor=CAP, eval_capacity_factor=CAP,
                  min_capacity=4, noisy_gate_policy=None, drop_tokens=True,
                  use_rts=USE_RTS)
cfg["loss"]["moe_loss_coeff"] = {MOE_COEFF}
launch_reference(cfg)

# deterministic oracle: zero out the gumbel draw (the second-expert pick then
# reduces to argmax of the raw logits minus the top-1) on both sides
import internlm.model.moe.gshard_layer as gl
dev = torch.device("cpu")
gl.gumbel_map[dev] = lambda shape: torch.zeros(shape)

import internlm.train.pipeline as _tp
from internlm.train.pipeline import initialize_model

if RESIDUAL:
    # stock reference bug: set_parallel_attr_for_param_groups never stamps the
    # residual-MoE coefficient Linear (train/pipeline.py:98-154 checks only
    # norm/gate/embed/parallel-linear module types), so initialize_model
    # asserts.  Stamp it replica-zero (it is a dense replicated param) first.
    from internlm.core.context.parallel_context import IS_REPLICA_ZERO_PARALLEL
    _orig_attr = _tp.set_parallel_attr_for_param_groups
    def _patched(model):
        chunks = model if isinstance(model, (list, torch.nn.ModuleList)) else [model]
        for ch in chunks:
            inner = ch.model if hasattr(ch, "model") else ch
            for name, param in inner.named_parameters():
                if ".coefficient." in name:
                    setattr(param, IS_REPLICA_ZERO_PARALLEL, True)
        return _orig_attr(model)
    _tp.set_parallel_attr_for_param_groups = _patched

model = initialize_model()
sd0 = {{k.removeprefix("model."): v.detach().float().numpy().copy()
       for k, v in model.state_dict().items()}}

rng = np.random.RandomState(11)
ids = rng.randint(0, VOCAB, (1, SEQ)).astype(np.int64)
labels = rng.randint(0, VOCAB, (1, SEQ)).astype(np.int64)
x = torch.tensor(ids)

opt = torch.optim.AdamW(model.parameters(), lr={LR}, betas=(0.9, 0.95), eps=1e-8,
                        weight_decay=0.01)
losses, moe_losses, ce_losses = [], [], []
for step in range({STEPS}):
    opt.zero_grad()
    out, layer_moe = model(input_ids=x)
    ce = torch.nn.functional.cross_entropy(out.float().reshape(-1, VOCAB),
                                           torch.tensor(labels).reshape(-1))
    moe = sum(layer_moe) * {MOE_COEFF}
    loss = ce + moe
    loss.backward()
    torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
    opt.step()
    losses.append(float(loss)); moe_losses.append(float(moe)); ce_losses.append(float(ce))

np.savez(sys.argv[1], ids=ids, labels=labels, losses=np.asarray(losses),
         moe_losses=np.asarray(moe_losses), ce_losses=np.asarray(ce_losses),
         **{{f"sd::{{k}}": v for k, v in sd0.items()}})
print("REF_OK")
"""


def _ref_wqkv_to_ours(w: np.ndarray, heads: int, head_dim: int) -> np.ndarray:
    three = w.reshape(3, heads, head_dim, -1)
    return np.transpose(three, (1, 0, 2, 3)).reshape(w.shape)


def _convert_moe(sd: dict, residual: bool) -> dict:
    import jax.numpy as jnp

    D = HIDDEN // HEADS
    blocks: dict = {k: [] for k in ("wqkv_k", "wqkv_b", "out_k", "out_b", "n1", "n2")}
    moe = {"gate": [], "w1": [], "w2": [], "w3": []}
    res = {"w1": [], "w2": [], "w3": [], "coef": [], "coef_b": []}
    for l in range(LAYERS):
        blocks["wqkv_k"].append(_ref_wqkv_to_ours(sd[f"blocks.{l}.mixer.Wqkv.weight"], HEADS, D).T)
        blocks["wqkv_b"].append(_ref_wqkv_to_ours(sd[f"blocks.{l}.mixer.Wqkv.bias"][:, None], HEADS, D)[:, 0])
        blocks["out_k"].append(sd[f"blocks.{l}.mixer.out_proj.weight"].T)
        blocks["out_b"].append(sd[f"blocks.{l}.mixer.out_proj.bias"])
        blocks["n1"].append(sd[f"blocks.{l}.norm1.weight"])
        blocks["n2"].append(sd[f"blocks.{l}.norm2.weight"])
        moe["gate"].append(sd[f"blocks.{l}.mlp.moe_layer.gate.wg.weight"].T)
        for w in ("w1", "w2", "w3"):
            moe[w].append(np.stack([
                sd[f"blocks.{l}.mlp.moe_layer.experts.wrapped_experts.{e}.{w}.weight"].T
                for e in range(EXPERTS)]))
        if residual:
            for w in ("w1", "w2", "w3"):
                res[w].append(sd[f"blocks.{l}.mlp.residual_mlp.{w}.weight"].T)
            res["coef"].append(sd[f"blocks.{l}.mlp.coefficient.weight"].T)
            res["coef_b"].append(sd[f"blocks.{l}.mlp.coefficient.bias"])
    J = lambda v: jnp.asarray(np.stack(v))
    blocks_tree = {
        "norm1": J(blocks["n1"]), "norm2": J(blocks["n2"]),
        "wqkv": {"kernel": J(blocks["wqkv_k"]), "bias": J(blocks["wqkv_b"])},
        "out_proj": {"kernel": J(blocks["out_k"]), "bias": J(blocks["out_b"])},
        "moe": {"gate": J(moe["gate"]),
                "experts": {"w1": J(moe["w1"]), "w2": J(moe["w2"]), "w3": J(moe["w3"])}},
    }
    if residual:
        blocks_tree["w1"] = {"kernel": J(res["w1"])}
        blocks_tree["w2"] = {"kernel": J(res["w2"])}
        blocks_tree["w3"] = {"kernel": J(res["w3"])}
        blocks_tree["moe"]["coefficient"] = J(res["coef"])
        blocks_tree["moe"]["coefficient_bias"] = J(res["coef_b"])
    return {
        "embedding": {"weight": jnp.asarray(sd["embedding.weight"])},
        "blocks": blocks_tree,
        "norm": jnp.asarray(sd["norm.weight"]),
        "head": {"kernel": jnp.asarray(sd["head.weight"].T)},
    }


@pytest.mark.parametrize("top_k,cap,use_rts,residual", [
    (2, 1.0, False, False),   # top2, capacity drops exercised, zero gumbel
    (1, 4.0, True, False),    # top1+RTS at no-drop capacity (RTS stream-free)
    (2, 1.0, False, True),    # residual-MoE branch with learned coefficient
])
def test_moe_model_3step_loss_matches_reference(tmp_path, top_k, cap, use_rts, residual):
    driver = E2E_DRIVER_TMPL.format(VOCAB=VOCAB, HIDDEN=HIDDEN, HEADS=HEADS,
                                    LAYERS=LAYERS, SEQ=SEQ, EXPERTS=EXPERTS,
                                    TOP_K=top_k, CAP=cap, USE_RTS=use_rts,
                                    RESIDUAL=residual, LR=LR, STEPS=STEPS,
                                    MOE_COEFF=MOE_COEFF)
    out_file = str(tmp_path / "ref_moe.npz")
    proc = subprocess.run([sys.executable, "-c", driver, out_file],
                          capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert "REF_OK" in proc.stdout, proc.stdout[-2000:] + proc.stderr[-3000:]
    data = np.load(out_file)

    import jax
    import jax.numpy as jnp

    from internevo_tpu.models import ModelConfig
    from internevo_tpu.models.modeling_moe import moe_model_forward
    from internevo_tpu.ops.attention import set_use_pallas
    from internevo_tpu.ops.cross_entropy import cross_entropy_loss
    from internevo_tpu.solver.optimizer import AdamWConfig, init_optimizer_state, optimizer_step

    set_use_pallas(False)
    cfg = ModelConfig(num_layers=LAYERS, hidden_size=HIDDEN, num_attention_heads=HEADS,
                      vocab_size=VOCAB, mlp_ratio=8 / 3, dtype=jnp.float32,
                      embed_grad_scale=1, qkv_bias=True, o_bias=True, mlp_bias=False,
                      num_experts=EXPERTS, top_k=top_k, moe_type="GShard",
                      moe_capacity_factor=cap, moe_eval_capacity_factor=cap,
                      moe_min_capacity=4, moe_drop_tokens=True, moe_use_rts=use_rts,
                      moe_noisy_gate_policy=None,
                      num_shared_experts=1 if residual else 0)
    params = _convert_moe({k[4:]: data[k] for k in data.files if k.startswith("sd::")},
                          residual)

    ids = jnp.asarray(data["ids"].astype(np.int32))
    labels = jnp.asarray(data["labels"].astype(np.int32))
    pos = jnp.tile(jnp.arange(SEQ), (1, 1))
    seg = jnp.ones((1, SEQ), jnp.int32)

    def loss_fn(p):
        logits, aux = moe_model_forward(cfg, p, ids, pos, seg,
                                        dropout_rng=None, train=True)
        ce, _ = cross_entropy_loss(logits.reshape(-1, VOCAB), labels.reshape(-1))
        return ce + MOE_COEFF * aux["moe"], (ce, aux["moe"])

    adam = AdamWConfig(lr=LR, betas=(0.9, 0.95), eps=1e-8, weight_decay=0.01,
                       clip_grad_norm=1.0)
    state = init_optimizer_state(params)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    our_losses, our_moe, our_ce = [], [], []
    for _ in range(STEPS):
        (loss, (ce, moe)), grads = grad_fn(params)
        our_losses.append(float(loss))
        our_ce.append(float(ce))
        our_moe.append(float(moe) * MOE_COEFF)
        params, state, _ = optimizer_step(params, grads, state, lr=LR, adam_cfg=adam,
                                          param_dtype=jnp.float32)
    np.testing.assert_allclose(our_ce, data["ce_losses"], rtol=5e-5, atol=5e-5)
    np.testing.assert_allclose(our_moe, data["moe_losses"], rtol=5e-5, atol=5e-5)
    np.testing.assert_allclose(our_losses, data["losses"], rtol=5e-5, atol=5e-5)
