"""Generic functional transformer shared by the model zoo.

Re-implements, TPU-first, the behavior of the reference model stack
(``internlm/model/modeling_internlm.py``, ``modeling_internlm2.py``,
``modeling_llama.py``): a pre-norm SwiGLU transformer over *packed* sequences
(segment ids + restarting position ids), with the reference's exact init
distributions and numerical-stability tricks (embed_grad_scale detach-mix,
head weight_scale, fp32 final norm).

TPU-native design choices (deliberately different from the reference):
- parameters are a plain pytree; layers are *stacked* along a leading ``layer``
  axis and the block is applied with ``jax.lax.scan`` — one trace/compile for
  any depth, and the layer axis shards over ``pp`` for pipeline parallelism.
- activation checkpointing is ``jax.checkpoint`` on the scanned block (the
  reference's per-block ``activation_checkpoint``, ``solver/activation_checkpoint.py``);
  the ``checkpoint`` config fraction selects how many layers use full remat,
  the rest use a dots-saveable policy (reference ``dropout_selective_checkpoint``).
- tensor/sequence parallelism is sharding annotations (see ``parallel/sharding.py``),
  not parallel linear classes.

Block structure parity (``modeling_internlm.py:189-236``)::

    residual = dropout1(x)
    h = norm1(residual.float())
    h = attention(h)                       # MHA: wqkv -> rope -> flash -> out_proj
    residual = dropout2(h) + residual
    h = norm2(residual.float())
    out = mlp(h) + residual                # SwiGLU: w2(silu(w1 x) * w3 x)
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.attention import flash_attention
from ..ops.norm import rms_norm, layer_norm
from ..ops.rotary import apply_rotary, rope_frequencies
from ..parallel.sharding import get_rules


@dataclasses.dataclass
class ModelConfig:
    """Union of the reference model-builder kwargs (``modeling_internlm.py:463-549``,
    ``modeling_internlm2.py:1012-1176``)."""

    num_layers: int = 12
    hidden_size: int = 768
    num_attention_heads: int = 12
    num_kv_attention_heads: Optional[int] = None  # GQA (internlm2/llama2); None = MHA
    vocab_size: int = 50304
    mlp_ratio: float = 4.0
    max_position_embeddings: int = 2048
    dtype: Any = jnp.bfloat16
    checkpoint: float = 0.0          # fraction of layers fully rematerialized
    # offload the saved attention context of checkpointed layers to host
    # memory instead of keeping it in HBM (reference activation_checkpoint.py
    # :40-272 CPU-offload path); trades PCIe/DMA bandwidth for HBM headroom
    activation_offload: bool = False
    # under full remat, additionally save the SwiGLU w1/w3 outputs (skips 2 of
    # 5 matmul recomputes per layer; ~184MB/layer at 700m-8k shapes).
    # Accepts a fraction: 0.5 saves the gates for the first half of the
    # layers only (partial-save tier between "remat everything" and OOM —
    # the HBM cost is linear in the fraction, the recompute saving too).
    # bool True == 1.0 for config compatibility.
    remat_save_mlp: float = 0.0
    # under full remat, additionally save the post-rotary q/k/v kernel
    # operands for this FRACTION of the fully-rematted layers: the backward
    # then feeds the splash bwd kernel directly instead of re-running the
    # wqkv projection + rotary (the top non-matmul remat cluster at 700m,
    # ~22 ms/step).  Costs (2 + Hkv/Hq) * tokens * hidden bf16 bytes per
    # saved layer (~100 MB/layer at 700m-8k-token shapes).
    remat_save_qkv: float = 0.0
    layer_norm_epsilon: float = 1e-5
    embed_grad_scale: float = 0.1
    parallel_output: bool = True
    use_dynamic_ntk_rope: bool = False
    scan_unroll: int = 1             # layer-scan unroll factor; 0 = fully unrolled
    # static bound on packed-segment length (data.seq_len / max_length_per_sample):
    # lets the splash attention grid skip out-of-segment kv blocks entirely
    max_segment_len: Optional[int] = None
    # run the rotary rotation math in bf16 instead of fp32: halves the HBM
    # traffic of the remat backward's rotary-recompute cluster (the top
    # non-matmul op at 700m, ~22 ms/step).  Output is bf16 either way; the
    # delta is one extra bf16 rounding, inside torch-oracle parity tolerance.
    # Changes the loss at the bit level — golden pins carry separate values
    # per setting (doc/perf_notes.md re-pin protocol).
    rotary_bf16: bool = False
    residual_in_fp32: bool = False
    norm_type: str = "rmsnorm"
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    ring_schedule: str = "zigzag"    # rsp: "zigzag" (balanced) | "contiguous"
    use_scaled_init: bool = True
    use_swiglu: bool = True
    rope_base: float = 10000.0
    multiple_of: int = 256           # mlp hidden rounding (``modules/mlp.py:51``)
    qkv_bias: bool = True            # InternLM1: True; InternLM2/Llama2: False
    o_bias: bool = True              # InternLM1: True; others: False
    mlp_bias: bool = False
    norm_head: bool = False          # InternLM2 baichuan2-style normalized head
    is_reward: bool = False          # reward model: scalar head (ref RewardModelLinear)
    init_std: float = 0.0052         # embedding/head init
    attn_wqkv_init_std: float = 0.006
    attn_other_init_std: float = 0.0015
    ffn_uplayer_init_std: float = 0.006
    ffn_other_init_std: float = 0.0015
    out_head_init_std: float = 0.0052
    no_bias: bool = False            # internlm2 config knob: force all bias off
    # MoE knobs (used by modeling_moe)
    num_experts: int = 1
    top_k: int = 2
    num_shared_experts: int = 0
    moe_gate_noise: float = 1.0
    moe_capacity_factor: float = 1.0
    moe_eval_capacity_factor: float = 1.0
    moe_min_capacity: int = 4
    moe_drop_tokens: bool = True
    moe_use_rts: bool = True
    moe_layer_freq: int = 1
    moe_type: str = "GShard"  # GShard (capacity) | Dropless (ragged grouped matmul)
    moe_noisy_gate_policy: Optional[str] = None  # None | "RSample" | "Jitter" (ref gshard top1)

    def __post_init__(self):
        # config files may say checkpoint=True/False (ref 7B_sft.py comment)
        self.checkpoint = float(self.checkpoint)
        if self.num_kv_attention_heads is None:
            self.num_kv_attention_heads = self.num_attention_heads
        if self.no_bias:
            self.qkv_bias = False
            self.o_bias = False
            self.mlp_bias = False
        if isinstance(self.dtype, str):
            self.dtype = {"torch.bfloat16": jnp.bfloat16, "torch.float16": jnp.float16,
                          "torch.float32": jnp.float32, "bfloat16": jnp.bfloat16,
                          "float16": jnp.float16, "float32": jnp.float32}[self.dtype]

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def mlp_hidden(self) -> int:
        h = int(self.hidden_size * self.mlp_ratio)
        return self.multiple_of * ((h + self.multiple_of - 1) // self.multiple_of)

    @property
    def q_per_kv(self) -> int:
        return self.num_attention_heads // self.num_kv_attention_heads


def _normal(key, shape, std, dtype=jnp.float32):
    return std * jax.random.normal(key, shape, dtype)


def scaled_init_std(base_std: float, layer_idx: jax.Array | int) -> jax.Array:
    """Megatron scaled init: sigma / sqrt(2 * num_layers), with the reference's
    quirk num_layers = layer_idx + 1 (``modeling_internlm.py:163``)."""
    return base_std / jnp.sqrt(2.0 * (jnp.asarray(layer_idx, jnp.float32) + 1.0))


# --------------------------------------------------------------------------- init


def init_block_params(cfg: ModelConfig, key: jax.Array) -> dict:
    """Stacked (num_layers-leading) block params with reference init distributions
    (``PackedFlashBaseLayer1D.reset_parameters``, ``modeling_internlm.py:154-180``)."""
    L, H, M = cfg.num_layers, cfg.hidden_size, cfg.mlp_hidden
    D = cfg.head_dim
    kv_dim = cfg.num_kv_attention_heads * D
    qkv_out = H + 2 * kv_dim
    keys = jax.random.split(key, 8)
    layer_ids = jnp.arange(L, dtype=jnp.float32)

    def per_layer_std(base):
        if cfg.use_scaled_init:
            return scaled_init_std(base, layer_ids)[:, None, None]
        return jnp.full((L, 1, 1), cfg.attn_other_init_std)

    params = {
        "norm1": jnp.ones((L, H), jnp.float32),
        "norm2": jnp.ones((L, H), jnp.float32),
        "wqkv": {"kernel": _normal(keys[0], (L, H, qkv_out), cfg.attn_wqkv_init_std)},
        "out_proj": {
            "kernel": jax.random.normal(keys[1], (L, H, H), jnp.float32) * per_layer_std(cfg.attn_wqkv_init_std)
        },
        "w1": {"kernel": _normal(keys[2], (L, H, M), cfg.ffn_uplayer_init_std)},
        "w3": {"kernel": _normal(keys[3], (L, H, M), cfg.ffn_uplayer_init_std)},
        "w2": {
            "kernel": jax.random.normal(keys[4], (L, M, H), jnp.float32) * per_layer_std(cfg.ffn_uplayer_init_std)
        },
    }
    if not cfg.use_scaled_init:
        params["out_proj"]["kernel"] = _normal(keys[1], (L, H, H), cfg.attn_other_init_std)
        params["w2"]["kernel"] = _normal(keys[4], (L, M, H), cfg.ffn_other_init_std)
    if cfg.qkv_bias:
        params["wqkv"]["bias"] = jnp.zeros((L, qkv_out), jnp.float32)
    if cfg.o_bias:
        params["out_proj"]["bias"] = jnp.zeros((L, H), jnp.float32)
    if cfg.mlp_bias:
        params["w1"]["bias"] = jnp.zeros((L, M), jnp.float32)
        params["w3"]["bias"] = jnp.zeros((L, M), jnp.float32)
        params["w2"]["bias"] = jnp.zeros((L, H), jnp.float32)
    if cfg.norm_type == "layernorm":
        params["norm1_bias"] = jnp.zeros((L, H), jnp.float32)
        params["norm2_bias"] = jnp.zeros((L, H), jnp.float32)
    return params


def init_params(cfg: ModelConfig, key: jax.Array) -> dict:
    k_embed, k_blocks, k_head = jax.random.split(key, 3)
    # reward models emit one scalar per token (reference RewardModelLinear,
    # ops/linear.py:156: head out_features collapses to 1 logical output)
    head_out = 1 if cfg.is_reward else cfg.vocab_size
    params = {
        "embedding": {"weight": _normal(k_embed, (cfg.vocab_size, cfg.hidden_size), cfg.init_std)},
        "blocks": init_block_params(cfg, k_blocks),
        "norm": jnp.ones((cfg.hidden_size,), jnp.float32),
        "head": {"kernel": _normal(k_head, (cfg.hidden_size, head_out), cfg.out_head_init_std)},
    }
    if cfg.norm_type == "layernorm":
        params["norm_bias"] = jnp.zeros((cfg.hidden_size,), jnp.float32)
    return jax.tree.map(lambda x: x.astype(cfg.dtype) if x.ndim >= 2 else x.astype(jnp.float32), params)


# ------------------------------------------------------------------- param specs


def block_param_specs(cfg: ModelConfig) -> dict:
    """Logical-axis PartitionSpecs, same tree structure as init_block_params."""
    sh = get_rules()
    p = sh.param_spec
    specs = {
        "norm1": p("layer", "norm"),
        "norm2": p("layer", "norm"),
        "wqkv": {"kernel": p("layer", "embed", "qkv")},
        "out_proj": {"kernel": p("layer", "heads_in", "embed")},
        "w1": {"kernel": p("layer", "embed", "mlp")},
        "w3": {"kernel": p("layer", "embed", "mlp")},
        "w2": {"kernel": p("layer", "mlp", "embed")},
    }
    if cfg.qkv_bias:
        specs["wqkv"]["bias"] = p("layer", "qkv")
    if cfg.o_bias:
        specs["out_proj"]["bias"] = p("layer", "norm")
    if cfg.mlp_bias:
        specs["w1"]["bias"] = p("layer", "mlp")
        specs["w3"]["bias"] = p("layer", "mlp")
        specs["w2"]["bias"] = p("layer", "norm")
    if cfg.norm_type == "layernorm":
        specs["norm1_bias"] = p("layer", "norm")
        specs["norm2_bias"] = p("layer", "norm")
    return specs


def param_specs(cfg: ModelConfig) -> dict:
    sh = get_rules()
    p = sh.param_spec
    specs = {
        # Embedding1D is vocab-full, hidden-split (reference ``modules/embedding.py:17``)
        "embedding": {"weight": p(None, "embed_out")},
        "blocks": block_param_specs(cfg),
        "norm": p("norm"),
        "head": {"kernel": p("embed") if cfg.is_reward else p("embed", "vocab")},
    }
    if cfg.norm_type == "layernorm":
        specs["norm_bias"] = p("norm")
    return specs


# ----------------------------------------------------------------------- forward


def _dense(x, kernel, bias=None):
    y = jnp.dot(x, kernel.astype(x.dtype))
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def _norm(cfg: ModelConfig, x, weight, bias=None):
    if cfg.norm_type == "rmsnorm":
        return rms_norm(x, weight, eps=cfg.layer_norm_epsilon, out_dtype=cfg.dtype)
    return layer_norm(x, weight, bias, eps=cfg.layer_norm_epsilon, out_dtype=cfg.dtype)


def split_qkv(cfg: ModelConfig, qkv: jax.Array):
    """Unpack the fused wqkv output from the per-kv-group packed layout:
    [q * q_per_kv | k | v] x num_kv_heads (``modeling_internlm2.py:147-154``).

    We use this layout for ALL families (the reference's InternLM1 uses a flat
    [q|k|v] concat, ``multi_head_attention.py`` "(three h d)") because the
    grouped layout shards cleanly over the tensor axis at kv-group granularity
    — required by the manual-TP pipeline path; checkpoint converters reorder at
    import/export.  Init distributions are unaffected (i.i.d. normal).
    """
    B, S = qkv.shape[:2]
    D = cfg.head_dim
    Hq, Hkv = cfg.num_attention_heads, cfg.num_kv_attention_heads
    grouped = qkv.reshape(B, S, Hkv, (cfg.q_per_kv + 2) * D)
    q = grouped[..., : cfg.q_per_kv * D].reshape(B, S, Hq, D)
    k = grouped[..., cfg.q_per_kv * D : (cfg.q_per_kv + 1) * D].reshape(B, S, Hkv, D)
    v = grouped[..., (cfg.q_per_kv + 1) * D :].reshape(B, S, Hkv, D)
    return q, k, v


def attention_block(cfg: ModelConfig, layer: dict, x: jax.Array, positions: jax.Array, segment_ids: jax.Array,
                    attn_rng: "Optional[jax.Array]" = None, train: bool = True):
    """MHA: fused wqkv -> rope(positions) -> segment-id flash attention -> out_proj.

    ``attn_rng``: per-layer stream for attention-probability dropout
    (``cfg.attn_drop_rate``, reference ``modules/multi_head_attention.py``
    dropout_p); the kernel derives a deterministic counter hash from it."""
    sh = get_rules()
    B, S, H = x.shape
    qkv = _dense(x, layer["wqkv"]["kernel"], layer["wqkv"].get("bias"))
    q, k, v = split_qkv(cfg, qkv)

    cos, sin = rope_frequencies(positions, cfg.head_dim, base=cfg.rope_base)
    rot_dtype = jnp.bfloat16 if cfg.rotary_bf16 else jnp.float32
    cos = cos.astype(rot_dtype)
    sin = sin.astype(rot_dtype)
    q = apply_rotary(q, cos, sin, compute_dtype=rot_dtype)
    k = apply_rotary(k, cos, sin, compute_dtype=rot_dtype)
    # name the kernel operands so remat_save_qkv layers keep them: the remat
    # backward then skips the wqkv-projection + rotary recompute entirely
    from jax.ad_checkpoint import checkpoint_name as _ckpt_name

    q = _ckpt_name(q, "attn_q")
    k = _ckpt_name(k, "attn_k")
    v = _ckpt_name(v, "attn_v")

    attn_drop = cfg.attn_drop_rate if (train and attn_rng is not None) else 0.0
    drop_seed = (jax.random.bits(attn_rng, dtype=jnp.uint32).astype(jnp.int32)
                 if attn_drop > 0.0 else None)
    if sh.tp_mode == "rsp" and sh.mesh is not None and sh.mesh.shape["tp"] > 1:
        # ring sequence parallel: attention runs on sequence-sharded chunks with
        # kv rotating around the tp ring (parallel/ring_attention.py) — no
        # head-count bound and only neighbor ICI traffic.
        from functools import partial as _partial

        from jax.sharding import PartitionSpec as _P

        from ..parallel.ring_attention import ring_attention

        ring_fn = _partial(ring_attention, axis_name="tp",
                           softmax_scale=1.0 / math.sqrt(cfg.head_dim),
                           max_segment_len=cfg.max_segment_len,
                           dropout_rate=attn_drop, schedule=cfg.ring_schedule)
        chunk_spec = (_P(None, "tp"),) * 4
        if attn_drop > 0.0:
            ring = jax.shard_map(
                lambda q, k, v, seg, seed: ring_fn(q, k, v, seg, dropout_seed=seed),
                mesh=sh.mesh, in_specs=chunk_spec + (_P(),),
                out_specs=_P(None, "tp"), axis_names={"tp"}, check_vma=False)
            ctx = ring(q, k, v, segment_ids, drop_seed)
        else:
            ring = jax.shard_map(
                ring_fn, mesh=sh.mesh, in_specs=chunk_spec,
                out_specs=_P(None, "tp"), axis_names={"tp"}, check_vma=False)
            ctx = ring(q, k, v, segment_ids)
    else:
        # isp/Ulysses: reshard seq-sharded -> head-sharded (GSPMD emits all-to-all,
        # the reference's DistributedAttention `_SeqAllToAll`, multi_head_attention.py:27-135)
        q = sh.constrain(q, "batch", None, "act_heads", None)
        k = sh.constrain(k, "batch", None, "act_heads", None)
        v = sh.constrain(v, "batch", None, "act_heads", None)

        ctx = flash_attention(q, k, v, segment_ids=segment_ids,
                              softmax_scale=1.0 / math.sqrt(cfg.head_dim), causal=True,
                              max_segment_len=cfg.max_segment_len,
                              dropout_rate=attn_drop, dropout_seed=drop_seed)
        ctx = sh.constrain(ctx, "batch", "seq", "act_heads", None)
    # under full-block remat, keep the attention output so the backward does
    # not re-run the forward flash kernel (its own bwd already recomputes p)
    from jax.ad_checkpoint import checkpoint_name

    ctx = checkpoint_name(ctx, "flash_ctx")
    ctx = ctx.reshape(B, S, cfg.num_attention_heads * cfg.head_dim)
    return _dense(ctx, layer["out_proj"]["kernel"], layer["out_proj"].get("bias"))


def mlp_block(cfg: ModelConfig, layer: dict, x: jax.Array):
    """SwiGLU: w2(silu(w1 x) * w3 x)  (``modules/mlp.py:84-88``)."""
    from jax.ad_checkpoint import checkpoint_name

    w1o = checkpoint_name(_dense(x, layer["w1"]["kernel"], layer["w1"].get("bias")), "mlp_w1o")
    w3o = checkpoint_name(_dense(x, layer["w3"]["kernel"], layer["w3"].get("bias")), "mlp_w3o")
    return _dense(jax.nn.silu(w1o) * w3o, layer["w2"]["kernel"], layer["w2"].get("bias"))


def block_forward(cfg: ModelConfig, layer: dict, x: jax.Array, positions: jax.Array, segment_ids: jax.Array,
                  dropout_rng: Optional[jax.Array] = None, train: bool = True,
                  mixer: Optional[Callable] = None, ffn: Optional[Callable] = None):
    """One pre-norm block, reference structure ``modeling_internlm.py:189-236``.

    ``mixer``/``ffn`` overrides support the MoE block variant.
    """
    sh = get_rules()
    attn_rng = (jax.random.fold_in(dropout_rng, 7)
                if dropout_rng is not None and cfg.attn_drop_rate > 0.0 else None)
    mixer = mixer or (lambda h: attention_block(cfg, layer, h, positions, segment_ids,
                                                attn_rng=attn_rng, train=train))
    ffn = ffn or (lambda h: mlp_block(cfg, layer, h))

    def dropout(h, rng_tag):
        if not train or cfg.drop_rate == 0.0 or dropout_rng is None:
            return h
        rng = jax.random.fold_in(dropout_rng, rng_tag)
        keep = jax.random.bernoulli(rng, 1.0 - cfg.drop_rate, h.shape)
        return jnp.where(keep, h / (1.0 - cfg.drop_rate), 0).astype(h.dtype)

    residual = dropout(x, 0)
    if cfg.residual_in_fp32:
        residual = residual.astype(jnp.float32)
    h = _norm(cfg, residual, layer["norm1"], layer.get("norm1_bias"))
    h = mixer(h)
    residual = (dropout(h, 1) + residual).astype(residual.dtype)
    h = _norm(cfg, residual, layer["norm2"], layer.get("norm2_bias"))
    ffn_out = ffn(h)
    aux = None
    if isinstance(ffn_out, tuple):  # MoE ffn returns (out, l_aux)
        ffn_out, aux = ffn_out
    out = ffn_out + residual
    # with residual_in_fp32 the fp32 residual stream persists across the whole
    # stack (reference keeps it fp32 end-to-end); callers upcast the scan carry
    out_dtype = jnp.float32 if cfg.residual_in_fp32 else cfg.dtype
    out = sh.constrain(out.astype(out_dtype), "batch", "seq", "act_embed")
    if aux is not None:
        return out, aux
    return out


def embed_tokens(cfg: ModelConfig, params: dict, input_ids: jax.Array) -> jax.Array:
    """Embedding lookup + GLM-130B embed_grad_scale trick (``modeling_internlm.py:382-385``)."""
    sh = get_rules()
    emb = params["embedding"]["weight"]
    x = jnp.take(emb, input_ids, axis=0).astype(cfg.dtype)
    if cfg.embed_grad_scale != 1:
        x = cfg.embed_grad_scale * x + (1 - cfg.embed_grad_scale) * jax.lax.stop_gradient(x)
    return sh.constrain(x, "batch", "seq", "act_embed")


def head_logits(cfg: ModelConfig, params: dict, h: jax.Array) -> jax.Array:
    """fp32 final norm + scaled head (``modeling_internlm.py:414-417``, ``ops/linear.py:69-78``)."""
    sh = get_rules()
    h = _norm(cfg, h, params["norm"], params.get("norm_bias"))
    w = params["head"]["kernel"]
    if cfg.embed_grad_scale != 1:
        w = cfg.embed_grad_scale * w + (1 - cfg.embed_grad_scale) * jax.lax.stop_gradient(w)
    if cfg.norm_head:
        # baichuan2-style normalized head (``ops/linear.py:85-153``): logits use
        # an L2-normalized weight; normalization itself is out of the grad path.
        norm = jnp.linalg.norm(w.astype(jnp.float32), axis=0, keepdims=True)
        w = (w / jax.lax.stop_gradient(norm + 1e-7)).astype(w.dtype)
    logits = jnp.dot(h, w.astype(h.dtype))
    return sh.constrain(logits, "batch", "seq", "act_vocab")


def model_forward(
    cfg: ModelConfig,
    params: dict,
    input_ids: jax.Array,
    positions: jax.Array,
    segment_ids: jax.Array,
    dropout_rng: Optional[jax.Array] = None,
    train: bool = True,
    block_fn: Optional[Callable] = None,
    return_hidden: bool = False,
) -> jax.Array:
    """Full forward over the scanned layer stack. Returns logits (B, S, V), or
    the pre-final-norm hidden states when ``return_hidden`` (the fused
    norm+head+CE path consumes those, see ``ops/fused_ce.py``).

    ``block_fn(layer_params, x, dropout_rng) -> x`` overrides the block body.
    """
    x = embed_tokens(cfg, params, input_ids)
    if cfg.residual_in_fp32:
        x = x.astype(jnp.float32)  # stable scan-carry dtype for the fp32 stream

    # residual dropout: every layer draws from its own stream (reference
    # SeedManager keeps distinct per-mode streams that ADVANCE per call; here
    # the layer index is folded into the key, same decorrelation stateless)
    drop_active = (train and dropout_rng is not None
                   and (cfg.drop_rate > 0.0 or cfg.attn_drop_rate > 0.0))

    if block_fn is None:
        def block_fn(layer, h, rng=None):  # noqa: F811
            return block_forward(cfg, layer, h, positions, segment_ids, rng, train)

    n_ckpt = int(cfg.num_layers * cfg.checkpoint)

    def make_scan(body, remat_policy):
        wrapped = jax.checkpoint(body, policy=remat_policy, prevent_cse=False)

        if drop_active:
            def scan_body(h, xs):
                layer, idx = xs
                return wrapped(layer, h, jax.random.fold_in(dropout_rng, idx)), None
        else:
            def scan_body(h, layer):
                return wrapped(layer, h, None), None

        return scan_body

    # Full remat for the first n_ckpt layers (reference `checkpoint` fraction,
    # modeling_internlm.py:183-188); everything-saveable-but-cheap for the rest
    # (reference dropout_selective_checkpoint re-materializes only dropout+norm).
    # NB: save_only_these_names("flash_ctx") would avoid re-running the fwd
    # attention kernel in backward, but it inflates XLA compile time >3x on the
    # remote-compile path — measured on v5e; revisit when compiles are local.
    # save the flash kernel's (out, lse) residuals across full remat so the
    # backward never re-runs the forward attention kernel — ~33 MB/layer bf16
    # at 700M shapes for ~1.1 ms/layer of recompute
    save_names = ["flash_out", "flash_lse"]
    # remat_save_mlp is a FRACTION of the fully-rematted layers that also save
    # their two SwiGLU gate activations (skips 2 of the 5 matmul recomputes
    # per such layer for 2*S*mlp_hidden*2 bytes/layer) — a partial-save tier
    # sized to whatever HBM headroom the optimizer state leaves.
    mlp_frac = min(1.0, max(0.0, float(cfg.remat_save_mlp)))
    qkv_frac = min(1.0, max(0.0, float(cfg.remat_save_qkv)))
    n_full = min(n_ckpt, cfg.num_layers)
    n_gates = int(round(n_full * mlp_frac))
    n_qkv = int(round(n_full * qkv_frac))
    GATE_NAMES = ("mlp_w1o", "mlp_w3o")
    QKV_NAMES = ("attn_q", "attn_k", "attn_v")
    full_policy = jax.checkpoint_policies.save_only_these_names(*save_names)
    gates_policy = jax.checkpoint_policies.save_only_these_names(
        *save_names, *GATE_NAMES)
    qkv_policy = jax.checkpoint_policies.save_only_these_names(
        *save_names, *QKV_NAMES)
    both_policy = jax.checkpoint_policies.save_only_these_names(
        *save_names, *GATE_NAMES, *QKV_NAMES)
    if cfg.activation_offload:
        # keep the attention context, but in HOST memory (the reference's
        # activation-offload mode): backward re-runs everything except the
        # flash kernel, whose context streams back over DMA.  The MLP gates
        # can stay on-device alongside if remat_save_mlp is also set.
        full_policy = jax.checkpoint_policies.save_and_offload_only_these_names(
            names_which_can_be_saved=["mlp_w1o", "mlp_w3o"] if mlp_frac > 0 else [],
            names_which_can_be_offloaded=["flash_ctx"],
            offload_src="device", offload_dst="pinned_host")
        n_gates = 0  # the offload policy already covers the gates choice
        n_qkv = 0
    full = make_scan(lambda l, h, r: block_fn(l, h, r), full_policy)
    gates = make_scan(lambda l, h, r: block_fn(l, h, r), gates_policy)
    qkv_seg = make_scan(lambda l, h, r: block_fn(l, h, r), qkv_policy)
    both = make_scan(lambda l, h, r: block_fn(l, h, r), both_policy)
    light = make_scan(
        lambda l, h, r: block_fn(l, h, r),
        jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    )

    blocks = params["blocks"]
    if drop_active:  # pair each layer with its index for per-layer rng folding
        blocks = (blocks, jnp.arange(cfg.num_layers, dtype=jnp.int32))
    # scan_unroll is a tunable knob (0 = fully unrolled).  Measured on v5e at
    # the 700m bench: unroll=1 (rolled) is FASTEST — XLA updates the stacked
    # per-layer grad buffers in place, and partial unroll (2/3) loses ~5pp MFU
    # to extra live buffers while full unroll OOMs.  Keep 1 unless re-measured.
    unroll = cfg.scan_unroll if cfg.scan_unroll != 0 else cfg.num_layers
    # layer order: [saves gates+qkv] [saves the larger single tier] [plain
    # full remat] [light].  Both save fractions count from the front of the
    # fully-rematted layers, so their overlap is the first min() of the two.
    n_both = min(n_gates, n_qkv)
    segments = [
        (n_both, both),
        (n_gates - n_both, gates),
        (n_qkv - n_both, qkv_seg),
        (n_full - max(n_gates, n_qkv), full),
        (cfg.num_layers - n_full, light),
    ]
    lo = 0
    for count, body in segments:
        if count <= 0:
            continue
        if count == cfg.num_layers:
            seg_blocks = blocks
        else:
            seg_blocks = jax.tree.map(lambda a: a[lo:lo + count], blocks)
        x, _ = jax.lax.scan(body, x, seg_blocks, unroll=min(unroll, count))
        lo += count

    if return_hidden:
        return x
    return head_logits(cfg, params, x)


@dataclasses.dataclass
class ModelDef:
    """A built model: config + pure init/apply + sharding specs.

    The TPU-native analogue of the reference's ``build_model_with_cfg`` output.
    """

    config: ModelConfig
    init: Callable[[jax.Array], dict]
    apply: Callable[..., jax.Array]

    def specs(self) -> dict:
        return param_specs(self.config)

    def flops_per_token(self, seq_len: int) -> float:
        """Model flops per token (fwd+bwd = 3x fwd matmul flops handled by caller)."""
        cfg = self.config
        att = 4 * cfg.hidden_size * cfg.head_dim * (cfg.num_attention_heads + cfg.num_kv_attention_heads) / 2
        att_qk = 4 * seq_len * cfg.hidden_size  # scores+context, causal halves it
        mlp = 6 * cfg.hidden_size * cfg.mlp_hidden
        per_layer = 2 * (att + mlp) + att_qk * 0  # matmul-only; see utils.get_megatron_flops for reporting
        return cfg.num_layers * per_layer + 2 * cfg.hidden_size * cfg.vocab_size
