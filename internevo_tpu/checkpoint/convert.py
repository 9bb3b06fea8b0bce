"""HuggingFace checkpoint converters.

Parity: reference ``transformers/convert2hf_internlm*.py`` (merge tp/pp shards
-> HF LlamaForCausalLM/InternLM2 weights) and ``revert_internlm*.py`` (inverse),
plus the external-format loaders in ``internlm/checkpoint/load_funcs.py:16-192``
({"llama", "hf_llama"} ckpt_type).

Our arrays are (in, out) (JAX convention) vs torch's (out, in) => transpose;
the fused wqkv uses the per-kv-group packed layout (see ``models/base.split_qkv``)
=> unpack/pack per kv head.  Rotary convention matches HF llama's rotate_half
(NeoX half-split), so no interleave permute is needed.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.base import ModelConfig


def _np(x) -> np.ndarray:
    return np.asarray(jax.device_get(x), dtype=np.float32)


def split_wqkv(cfg: ModelConfig, wqkv_kernel: np.ndarray):
    """(H, (q_per_kv+2)*Hkv*D) grouped kernel -> q (H, Hq*D), k, v (H, Hkv*D)."""
    H = wqkv_kernel.shape[0]
    D = cfg.head_dim
    Hkv, qpk = cfg.num_kv_attention_heads, cfg.q_per_kv
    grouped = wqkv_kernel.reshape(H, Hkv, (qpk + 2) * D)
    q = grouped[:, :, : qpk * D].reshape(H, Hkv * qpk * D)
    k = grouped[:, :, qpk * D : (qpk + 1) * D].reshape(H, Hkv * D)
    v = grouped[:, :, (qpk + 1) * D :].reshape(H, Hkv * D)
    return q, k, v


def merge_wqkv(cfg: ModelConfig, q: np.ndarray, k: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Inverse of split_wqkv; inputs (H, Hq*D), (H, Hkv*D), (H, Hkv*D)."""
    H = q.shape[0]
    D = cfg.head_dim
    Hkv, qpk = cfg.num_kv_attention_heads, cfg.q_per_kv
    qg = q.reshape(H, Hkv, qpk * D)
    kg = k.reshape(H, Hkv, D)
    vg = v.reshape(H, Hkv, D)
    return np.concatenate([qg, kg, vg], axis=2).reshape(H, Hkv * (qpk + 2) * D)


def to_hf_llama(params: dict, cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """Our param tree -> HF LlamaForCausalLM state dict (numpy, torch layout)."""
    sd: Dict[str, np.ndarray] = {}
    sd["model.embed_tokens.weight"] = _np(params["embedding"]["weight"])
    sd["model.norm.weight"] = _np(params["norm"])
    sd["lm_head.weight"] = _np(params["head"]["kernel"]).T
    blocks = params["blocks"]
    for l in range(cfg.num_layers):
        pre = f"model.layers.{l}"
        wqkv = _np(blocks["wqkv"]["kernel"][l])
        q, k, v = split_wqkv(cfg, wqkv)
        sd[f"{pre}.self_attn.q_proj.weight"] = q.T
        sd[f"{pre}.self_attn.k_proj.weight"] = k.T
        sd[f"{pre}.self_attn.v_proj.weight"] = v.T
        sd[f"{pre}.self_attn.o_proj.weight"] = _np(blocks["out_proj"]["kernel"][l]).T
        sd[f"{pre}.mlp.gate_proj.weight"] = _np(blocks["w1"]["kernel"][l]).T
        sd[f"{pre}.mlp.up_proj.weight"] = _np(blocks["w3"]["kernel"][l]).T
        sd[f"{pre}.mlp.down_proj.weight"] = _np(blocks["w2"]["kernel"][l]).T
        sd[f"{pre}.input_layernorm.weight"] = _np(blocks["norm1"][l])
        sd[f"{pre}.post_attention_layernorm.weight"] = _np(blocks["norm2"][l])
        if "bias" in blocks["wqkv"]:
            bq, bk, bv = split_wqkv(cfg, _np(blocks["wqkv"]["bias"][l])[None, :])
            sd[f"{pre}.self_attn.q_proj.bias"] = bq[0]
            sd[f"{pre}.self_attn.k_proj.bias"] = bk[0]
            sd[f"{pre}.self_attn.v_proj.bias"] = bv[0]
        if "bias" in blocks["out_proj"]:
            sd[f"{pre}.self_attn.o_proj.bias"] = _np(blocks["out_proj"]["bias"][l])
    return sd


def from_hf_llama(sd: Dict[str, np.ndarray], cfg: ModelConfig, dtype=None) -> dict:
    """HF LlamaForCausalLM state dict -> our param tree
    (reference ``load_hf_llama_pretrained_weights``, ``load_funcs.py:73``)."""
    dtype = dtype or cfg.dtype
    get = lambda k: np.asarray(sd[k], np.float32)
    L = cfg.num_layers
    wqkv_k, out_k, w1_k, w2_k, w3_k, n1, n2 = [], [], [], [], [], [], []
    wqkv_b, out_b = [], []
    has_qkv_bias = "model.layers.0.self_attn.q_proj.bias" in sd
    has_o_bias = "model.layers.0.self_attn.o_proj.bias" in sd
    for l in range(L):
        pre = f"model.layers.{l}"
        q = get(f"{pre}.self_attn.q_proj.weight").T
        k = get(f"{pre}.self_attn.k_proj.weight").T
        v = get(f"{pre}.self_attn.v_proj.weight").T
        wqkv_k.append(merge_wqkv(cfg, q, k, v))
        out_k.append(get(f"{pre}.self_attn.o_proj.weight").T)
        w1_k.append(get(f"{pre}.mlp.gate_proj.weight").T)
        w3_k.append(get(f"{pre}.mlp.up_proj.weight").T)
        w2_k.append(get(f"{pre}.mlp.down_proj.weight").T)
        n1.append(get(f"{pre}.input_layernorm.weight"))
        n2.append(get(f"{pre}.post_attention_layernorm.weight"))
        if has_qkv_bias:
            bq = get(f"{pre}.self_attn.q_proj.bias")[None, :]
            bk = get(f"{pre}.self_attn.k_proj.bias")[None, :]
            bv = get(f"{pre}.self_attn.v_proj.bias")[None, :]
            wqkv_b.append(merge_wqkv(cfg, bq, bk, bv)[0])
        if has_o_bias:
            out_b.append(get(f"{pre}.self_attn.o_proj.bias"))

    blocks = {
        "norm1": jnp.asarray(np.stack(n1), jnp.float32),
        "norm2": jnp.asarray(np.stack(n2), jnp.float32),
        "wqkv": {"kernel": jnp.asarray(np.stack(wqkv_k), dtype)},
        "out_proj": {"kernel": jnp.asarray(np.stack(out_k), dtype)},
        "w1": {"kernel": jnp.asarray(np.stack(w1_k), dtype)},
        "w3": {"kernel": jnp.asarray(np.stack(w3_k), dtype)},
        "w2": {"kernel": jnp.asarray(np.stack(w2_k), dtype)},
    }
    if has_qkv_bias:
        blocks["wqkv"]["bias"] = jnp.asarray(np.stack(wqkv_b), jnp.float32).astype(dtype)
    if has_o_bias:
        blocks["out_proj"]["bias"] = jnp.asarray(np.stack(out_b), jnp.float32).astype(dtype)
    params = {
        "embedding": {"weight": jnp.asarray(get("model.embed_tokens.weight"), dtype)},
        "blocks": blocks,
        "norm": jnp.asarray(get("model.norm.weight"), jnp.float32),
        "head": {"kernel": jnp.asarray(get("lm_head.weight").T, dtype)},
    }
    return params


def to_hf_internlm2(params: dict, cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """Our tree -> HF InternLM2 naming (fused wqkv kept fused;
    reference ``convert2hf_internlm2.py:218``)."""
    sd: Dict[str, np.ndarray] = {}
    sd["model.tok_embeddings.weight"] = _np(params["embedding"]["weight"])
    sd["model.norm.weight"] = _np(params["norm"])
    sd["output.weight"] = _np(params["head"]["kernel"]).T
    blocks = params["blocks"]
    for l in range(cfg.num_layers):
        pre = f"model.layers.{l}"
        sd[f"{pre}.attention.wqkv.weight"] = _np(blocks["wqkv"]["kernel"][l]).T
        sd[f"{pre}.attention.wo.weight"] = _np(blocks["out_proj"]["kernel"][l]).T
        sd[f"{pre}.feed_forward.w1.weight"] = _np(blocks["w1"]["kernel"][l]).T
        sd[f"{pre}.feed_forward.w3.weight"] = _np(blocks["w3"]["kernel"][l]).T
        sd[f"{pre}.feed_forward.w2.weight"] = _np(blocks["w2"]["kernel"][l]).T
        sd[f"{pre}.attention_norm.weight"] = _np(blocks["norm1"][l])
        sd[f"{pre}.ffn_norm.weight"] = _np(blocks["norm2"][l])
    return sd


def from_hf_internlm2(sd: Dict[str, np.ndarray], cfg: ModelConfig, dtype=None) -> dict:
    dtype = dtype or cfg.dtype
    get = lambda k: np.asarray(sd[k], np.float32)
    L = cfg.num_layers
    blocks = {
        "norm1": jnp.asarray(np.stack([get(f"model.layers.{l}.attention_norm.weight") for l in range(L)]), jnp.float32),
        "norm2": jnp.asarray(np.stack([get(f"model.layers.{l}.ffn_norm.weight") for l in range(L)]), jnp.float32),
        "wqkv": {"kernel": jnp.asarray(np.stack([get(f"model.layers.{l}.attention.wqkv.weight").T for l in range(L)]), dtype)},
        "out_proj": {"kernel": jnp.asarray(np.stack([get(f"model.layers.{l}.attention.wo.weight").T for l in range(L)]), dtype)},
        "w1": {"kernel": jnp.asarray(np.stack([get(f"model.layers.{l}.feed_forward.w1.weight").T for l in range(L)]), dtype)},
        "w3": {"kernel": jnp.asarray(np.stack([get(f"model.layers.{l}.feed_forward.w3.weight").T for l in range(L)]), dtype)},
        "w2": {"kernel": jnp.asarray(np.stack([get(f"model.layers.{l}.feed_forward.w2.weight").T for l in range(L)]), dtype)},
    }
    return {
        "embedding": {"weight": jnp.asarray(get("model.tok_embeddings.weight"), dtype)},
        "blocks": blocks,
        "norm": jnp.asarray(get("model.norm.weight"), jnp.float32),
        "head": {"kernel": jnp.asarray(get("output.weight").T, dtype)},
    }


def to_hf_internlm(params: dict, cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """Our INTERNLM(1) tree -> HF InternLMForCausalLM state dict.

    HF InternLM1 uses llama key names with qkv/o biases (reference
    ``transformers/convert2hf_internlm.py:141-190`` writes
    ``model.layers.N.self_attn.{q,k,v,o}_proj.{weight,bias}``,
    gate/up/down_proj, input/post_attention_layernorm), so the tensor mapping
    is ``to_hf_llama``'s — which already carries the biases.  NB the reference
    converter reads OLD-format InternLM1 checkpoint files where w2/w3 swap
    roles (old w2 = up, w3 = down; current modules/mlp.py:63-66 has w3 = up,
    w2 = down like us) — our in-memory tree always uses the current roles."""
    return to_hf_llama(params, cfg)


def from_hf_internlm(sd: Dict[str, np.ndarray], cfg: ModelConfig, dtype=None) -> dict:
    """HF InternLMForCausalLM -> our tree (same key space as HF llama)."""
    return from_hf_llama(sd, cfg, dtype=dtype)


# -------------------------------------------------------- Meta-llama (pth) IO


# Meta/InternEvo-native llama naming (reference modeling_llama.py /
# load_llama_pretrained_weights, checkpoint/load_funcs.py:16-70):
# tok_embeddings, layers.N.attention.{wq,wk,wv,wo}, feed_forward.{w1,w2,w3},
# attention_norm / ffn_norm, norm, output.  TP shards concatenate column
# weights (wq/wk/wv/w1/w3/output) on dim 0 and row weights (wo/w2) on dim 1;
# tok_embeddings splits the hidden dim (dim 1).
_META_DIM0 = ("attention.wq", "attention.wk", "attention.wv",
              "feed_forward.w1", "feed_forward.w3", "output")
_META_DIM1 = ("attention.wo", "feed_forward.w2", "tok_embeddings")


def merge_meta_llama_shards(shards: list) -> Dict[str, np.ndarray]:
    """Merge tp-sharded Meta-llama state dicts (list ordered by tp rank)."""
    if len(shards) == 1:
        return dict(shards[0])
    merged: Dict[str, np.ndarray] = {}
    for key in shards[0]:
        parts = [np.asarray(s[key]) for s in shards]
        if any(m in key for m in _META_DIM0):
            merged[key] = np.concatenate(parts, axis=0)
        elif any(m in key for m in _META_DIM1):
            merged[key] = np.concatenate(parts, axis=1)
        else:  # norms: replicated
            merged[key] = parts[0]
    return merged


def from_meta_llama(sd: Dict[str, np.ndarray], cfg: ModelConfig, dtype=None) -> dict:
    """Meta/InternEvo-native llama state dict -> our param tree
    (reference ``load_llama_pretrained_weights``, ``load_funcs.py:16-70``)."""
    dtype = dtype or cfg.dtype
    get = lambda k: np.asarray(sd[k], np.float32)
    L = cfg.num_layers
    wqkv_k, out_k, w1_k, w2_k, w3_k, n1, n2 = [], [], [], [], [], [], []
    for l in range(L):
        pre = f"layers.{l}"
        q = get(f"{pre}.attention.wq.weight").T
        k = get(f"{pre}.attention.wk.weight").T
        v = get(f"{pre}.attention.wv.weight").T
        wqkv_k.append(merge_wqkv(cfg, q, k, v))
        out_k.append(get(f"{pre}.attention.wo.weight").T)
        w1_k.append(get(f"{pre}.feed_forward.w1.weight").T)
        w3_k.append(get(f"{pre}.feed_forward.w3.weight").T)
        w2_k.append(get(f"{pre}.feed_forward.w2.weight").T)
        n1.append(get(f"{pre}.attention_norm.weight"))
        n2.append(get(f"{pre}.ffn_norm.weight"))
    blocks = {
        "norm1": jnp.asarray(np.stack(n1), jnp.float32),
        "norm2": jnp.asarray(np.stack(n2), jnp.float32),
        "wqkv": {"kernel": jnp.asarray(np.stack(wqkv_k), dtype)},
        "out_proj": {"kernel": jnp.asarray(np.stack(out_k), dtype)},
        "w1": {"kernel": jnp.asarray(np.stack(w1_k), dtype)},
        "w3": {"kernel": jnp.asarray(np.stack(w3_k), dtype)},
        "w2": {"kernel": jnp.asarray(np.stack(w2_k), dtype)},
    }
    return {
        "embedding": {"weight": jnp.asarray(get("tok_embeddings.weight"), dtype)},
        "blocks": blocks,
        "norm": jnp.asarray(get("norm.weight"), jnp.float32),
        "head": {"kernel": jnp.asarray(get("output.weight").T, dtype)},
    }


def to_meta_llama(params: dict, cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """Our tree -> Meta/InternEvo-native llama state dict (inverse of
    ``from_meta_llama``; the reference has loaders only, the exporter closes
    our round-trip tests)."""
    sd: Dict[str, np.ndarray] = {}
    sd["tok_embeddings.weight"] = _np(params["embedding"]["weight"])
    sd["norm.weight"] = _np(params["norm"])
    sd["output.weight"] = _np(params["head"]["kernel"]).T
    blocks = params["blocks"]
    for l in range(cfg.num_layers):
        pre = f"layers.{l}"
        q, k, v = split_wqkv(cfg, _np(blocks["wqkv"]["kernel"][l]))
        sd[f"{pre}.attention.wq.weight"] = q.T
        sd[f"{pre}.attention.wk.weight"] = k.T
        sd[f"{pre}.attention.wv.weight"] = v.T
        sd[f"{pre}.attention.wo.weight"] = _np(blocks["out_proj"]["kernel"][l]).T
        sd[f"{pre}.feed_forward.w1.weight"] = _np(blocks["w1"]["kernel"][l]).T
        sd[f"{pre}.feed_forward.w3.weight"] = _np(blocks["w3"]["kernel"][l]).T
        sd[f"{pre}.feed_forward.w2.weight"] = _np(blocks["w2"]["kernel"][l]).T
        sd[f"{pre}.attention_norm.weight"] = _np(blocks["norm1"][l])
        sd[f"{pre}.ffn_norm.weight"] = _np(blocks["norm2"][l])
    return sd


# ------------------------------------------------------------- load_funcs glue


def try_load_hf_llama_ckpt(engine, train_state, ckpt_path: str, load_mask):
    """ckpt_type='hf_llama' (reference ``load_funcs.py:73``): load a HF llama
    folder (safetensors/bin via transformers) into the engine."""
    from transformers import AutoModelForCausalLM

    hf_model = AutoModelForCausalLM.from_pretrained(ckpt_path, trust_remote_code=True)
    sd = {k: v.detach().cpu().numpy() for k, v in hf_model.state_dict().items()}
    cfg = engine.model.config
    engine.params = from_hf_llama(sd, cfg)
    from .checkpoint_manager import _active_layout, _relayout

    layout = _active_layout()
    if layout is not None:  # interleaved-pp stores blocks in pipeline order
        engine.params = _relayout(engine.params, layout[0])
    return True


def try_load_meta_llama_ckpt(engine, train_state, ckpt_path: str, load_mask):
    """ckpt_type='llama' (reference ``load_funcs.py:16-70``,
    ``load_llama_pretrained_weights``): a folder of Meta/InternEvo-native
    llama torch weights — either tp-sharded ``model_tp{i}_*.pt`` files (the
    reference requires old_tp == cur_tp; we merge the shards instead, since
    orbax params are topology-free) or plain ``*.pth``/``*.pt`` files
    (Meta ``consolidated.NN.pth`` shards)."""
    import glob as _glob

    import torch

    fns = sorted(f for f in _glob.glob(os.path.join(ckpt_path, "model_t*"))
                 if not f.endswith("md5"))
    if not fns:
        fns = sorted(_glob.glob(os.path.join(ckpt_path, "*.pth"))
                     + _glob.glob(os.path.join(ckpt_path, "*.pt")))
    if not fns:
        raise FileNotFoundError(f"no Meta-llama checkpoint files in {ckpt_path}")
    shards = []
    for fn in fns:
        sd = torch.load(fn, map_location="cpu", weights_only=True)
        shards.append({k: v.float().numpy() for k, v in sd.items()
                       if not k.endswith(".inv_freq")})
    merged = merge_meta_llama_shards(shards)
    cfg = engine.model.config
    engine.params = from_meta_llama(merged, cfg)
    from .checkpoint_manager import _active_layout, _relayout

    layout = _active_layout()
    if layout is not None:
        engine.params = _relayout(engine.params, layout[0])
    return True


def register_external_load_funcs():
    from .checkpoint_manager import register_load_func

    register_load_func("hf_llama", try_load_hf_llama_ckpt)
    register_load_func("llama", try_load_meta_llama_ckpt)


register_external_load_funcs()
