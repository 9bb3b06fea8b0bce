"""Pipeline parallelism: true 1F1B (plain + interleaved) via shard_map+ppermute,
with manual Megatron tensor parallelism inside each stage.

The TPU-native replacement for the reference's 1F1B schedulers
(``internlm/core/scheduler/pipeline_scheduler.py:111-1430``), Megatron p2p ops
(``core/communication/p2p.py``) and the hand-written TP collectives
(``model/utils.py:228-463``), combined in ONE fully-manual shard_map over
(pp, tp, dp, ep, zero):

- TP inside the pipeline is explicit: column-parallel wqkv/w1/w3 shards,
  row-parallel out_proj/w2 with psum (msp/fsp: sequence all-gather /
  psum_scatter), hidden-split embedding, vocab-split head with a
  vocab-parallel cross-entropy via pmax/psum over ``tp`` (the reference's
  flash-attn parallel CE, ``losses/ce_loss.py:10-58``).
- The schedule is one lockstep ``lax.fori_loop`` running at most one
  microbatch forward AND one backward per stage per tick (see
  ``_1f1b_loss_fn``); backward is a manual per-unit ``jax.vjp`` from a
  circular input buffer, so live state is O(num_chunks * pp), the vocab head
  runs only on the last virtual stage, and gradients leave through an
  explicit dp/zero psum + custom_vjp.
- No shape-metadata exchange (static shapes) and no warmup/cooldown special
  cases (decode + predication covers fill and drain).

When tp > num_kv_heads, kv weights replicate within each g = tp/kv_heads rank
group and their grads sum at the shard_map boundary — the reference's
``Initializer_GQA`` patch (``process_group_initializer.py:857-934``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name as _ckpt_name
from jax.sharding import PartitionSpec as P

from ..core.context import EP, PP, TP
from ..models.base import ModelConfig, _dense, _norm, split_qkv
from ..ops.attention import flash_attention
from ..ops.rotary import apply_rotary, rope_frequencies


def _psum_tp(x):
    """Row-parallel output reduction.  ``jax.lax.psum`` transposes to psum,
    which is exactly right here: downstream of the (replicated) block output,
    each tp rank's cotangent is the PARTIAL through its local column shards,
    and the transpose-psum is the fan-in that sums them."""
    return jax.lax.psum(x, TP)


@jax.custom_vjp
def _psum_replicated_tp(x):
    """psum over tp with IDENTITY transpose — for sums whose downstream
    consumption is fully REPLICATED across tp (the vocab-parallel CE head:
    lse/label-logit assembly).  There each rank's incoming cotangent is
    already the full cotangent; ``jax.lax.psum``'s transpose-psum would scale
    every upstream grad by tp.  (Round-1 shipped with that x-tp factor on all
    pipeline grads — invisible in loss tests because Adam is scale-invariant;
    pinned now by test_tp_grads_match_baseline.)"""
    return jax.lax.psum(x, TP)


def _psum_rep_fwd(x):
    return jax.lax.psum(x, TP), None


def _psum_rep_bwd(_, g):
    return (g,)


_psum_replicated_tp.defvjp(_psum_rep_fwd, _psum_rep_bwd)


def _pdrop(cfg: ModelConfig, h, rng, tag: int):
    """Residual dropout inside the manual pipeline (reference SeedManager
    streams, ``core/context/random.py``).  Key derivation mirrors
    ``models.base.block_forward`` exactly — fold_in(layer_rng, tag) — so at
    dp=1/tp=1 the pp>1 masks are BIT-IDENTICAL to the pp=1 path (pinned by
    test_dropout_pp2_matches_pp1)."""
    if rng is None or cfg.drop_rate == 0.0:
        return h
    r = jax.random.fold_in(rng, tag)
    keep = jax.random.bernoulli(r, 1.0 - cfg.drop_rate, h.shape)
    return jnp.where(keep, h / (1.0 - cfg.drop_rate), 0).astype(h.dtype)


def _attn_drop_seed(attn_drop: float, rng, tp: int, local_q_heads: int):
    """(5,) attention-dropout seed vector for the manual-pipeline blocks: the
    scalar stream matches models.base (fold_in(layer_rng, 7)) and the head
    offset folds this tp rank's GLOBAL q-head window, so the counter-hash mask
    never repeats across tp ranks and pp>1×tp matches the unsharded draw."""
    if attn_drop <= 0.0 or rng is None:
        return None
    bits = jax.random.bits(jax.random.fold_in(rng, 7),
                           dtype=jnp.uint32).astype(jnp.int32)
    zero = jnp.int32(0)
    h0 = (jax.lax.axis_index(TP) * local_q_heads) if tp > 1 else zero
    return jnp.stack([bits, zero, zero, jnp.int32(h0), zero])


def _manual_block(cfg: ModelConfig, tp: int, layer: dict, x, positions, segment_ids,
                  seq_parallel: bool = False, rng=None, ep: int = 1):
    """One pre-norm block with explicit TP collectives.  Returns
    ``(out, aux)`` where aux is the MoE gate loss (0 for dense blocks).

    mtp (seq_parallel=False): activations replicated over tp inside the block;
    row-parallel matmuls end in psum (reference ``MegatronFusedDenseFunc``).

    msp/fsp (seq_parallel=True): activations between blocks are sequence-
    sharded over tp — all-gather the sequence before the column matmuls,
    reduce-scatter after the row matmuls (reference ``model/utils.py:258-345``).
    Residual/norm run on the local seq shard; the pipeline ring then carries
    1/tp of the activation bytes.

    MoE blocks (``"moe" in layer``): the FFN is the GShard/dropless layer with
    an explicit expert all-to-all over ``ep`` (reference pipelines MoE through
    both schedulers, ``pipeline_scheduler.py:307-320`` accum_moe_loss).  Under
    msp/fsp the gating runs on this rank's LOCAL sequence chunk — the
    reference's per-rank gating semantics (``modeling_moe.py:420-421``).
    """
    # replicated params (norms, row-linear biases) receive rank-varying
    # cotangents in seq-parallel mode; the shard_map boundary psums cotangents
    # over unmentioned axes (probed; see _boundary_psum), which IS the Megatron
    # sequence-parallel layernorm/bias grad all-reduce — no extra hook needed.
    residual = _pdrop(cfg, x, rng, 0)
    if cfg.residual_in_fp32:
        residual = residual.astype(jnp.float32)
    h = _norm(cfg, residual, layer["norm1"], layer.get("norm1_bias"))
    if seq_parallel:
        h = jax.lax.all_gather(h, TP, axis=1, tiled=True)  # (b, S, H)
    B, S, H = h.shape

    # column-parallel fused wqkv: local kv-groups over the FULL sequence
    if cfg.num_kv_attention_heads % tp == 0:
        qkv = _dense(h, layer["wqkv"]["kernel"], layer["wqkv"].get("bias"))
        local_cfg = _local_head_cfg(cfg, tp)
        q, k, v = split_qkv(local_cfg, qkv)
    else:
        # GQA group (tp > kv_heads): wqkv arrives TP-REPLICATED; each rank
        # slices its q-head range and the kv head its group shares.  The
        # boundary psum of the replicated wqkv cotangent then sums the g
        # overlapping kv slices — the reference's Initializer_GQA kv-grad
        # all-reduce (process_group_initializer.py:857-934) as a transpose.
        q, k, v = _gqa_group_qkv(cfg, tp, layer["wqkv"], h)
    cos, sin = rope_frequencies(positions, cfg.head_dim, base=cfg.rope_base)
    rot_dtype = jnp.bfloat16 if cfg.rotary_bf16 else jnp.float32
    q = apply_rotary(q, cos, sin, compute_dtype=rot_dtype)
    k = apply_rotary(k, cos, sin, compute_dtype=rot_dtype)
    # remat_save_qkv residual names (see models/base.py attention_block)
    q = _ckpt_name(q, "attn_q")
    k = _ckpt_name(k, "attn_k")
    v = _ckpt_name(v, "attn_v")
    attn_drop = cfg.attn_drop_rate if rng is not None else 0.0
    drop_seed = _attn_drop_seed(attn_drop, rng, tp, q.shape[2])
    ctx = flash_attention(q, k, v, segment_ids=segment_ids,
                          softmax_scale=1.0 / math.sqrt(cfg.head_dim), causal=True,
                          max_segment_len=cfg.max_segment_len,
                          dropout_rate=attn_drop, dropout_seed=drop_seed)
    ctx = ctx.reshape(B, S, -1)
    # row-parallel out_proj: partial matmul + psum (mtp) or reduce-scatter over
    # the sequence (msp); bias added once after the reduction
    attn_part = jnp.dot(ctx, layer["out_proj"]["kernel"].astype(ctx.dtype))
    if seq_parallel:
        attn_out = jax.lax.psum_scatter(attn_part, TP, scatter_dimension=1, tiled=True)
    else:
        attn_out = _psum_tp(attn_part)
    if "bias" in layer["out_proj"]:
        attn_out = attn_out + layer["out_proj"]["bias"].astype(attn_out.dtype)

    residual = (_pdrop(cfg, attn_out, rng, 1) + residual).astype(residual.dtype)
    h = _norm(cfg, residual, layer["norm2"], layer.get("norm2_bias"))
    out_dtype = jnp.float32 if cfg.residual_in_fp32 else cfg.dtype
    if "moe" in layer:
        mlp_out, l_aux = _pipeline_moe_ffn(cfg, tp, layer, h, rng, ep,
                                           seq_chunked=seq_parallel)
        return (mlp_out + residual).astype(out_dtype), l_aux
    if seq_parallel:
        h = jax.lax.all_gather(h, TP, axis=1, tiled=True)
    w1o = _dense(h, layer["w1"]["kernel"], layer["w1"].get("bias"))
    w3o = _dense(h, layer["w3"]["kernel"], layer["w3"].get("bias"))
    mlp_part = jnp.dot(jax.nn.silu(w1o) * w3o, layer["w2"]["kernel"].astype(h.dtype))
    if seq_parallel:
        mlp_out = jax.lax.psum_scatter(mlp_part, TP, scatter_dimension=1, tiled=True)
    else:
        mlp_out = _psum_tp(mlp_part)
    if "bias" in layer.get("w2", {}):
        mlp_out = mlp_out + layer["w2"]["bias"].astype(mlp_out.dtype)
    # with residual_in_fp32 the fp32 stream persists across the stage's layers;
    # stage boundaries downcast for the p2p transfer (half the ICI bytes)
    return (mlp_out + residual).astype(out_dtype), jnp.zeros((), jnp.float32)


def _pipeline_moe_ffn(cfg: ModelConfig, tp: int, layer: dict, h, rng, ep: int,
                      seq_chunked: bool = False, full_weights: bool = False):
    """MoE FFN inside the manual pipeline: gating on the LOCAL token shard
    (the reference's per-rank semantics — under isp/msp each tp rank gates
    its own sequence chunk, ``modeling_moe.py:420-421``), experts sharded
    over ``ep`` with an explicit all-to-all pair, optional residual dense
    branch mixed by the learned coefficient (reference ``moe/moe.py:66-99``).

    ``seq_chunked`` (isp/msp/fsp): ``h`` is a per-tp-rank sequence chunk —
    the dropless aux stats additionally pmean over tp so the load-balancing
    statistic stays layout-invariant.  ``full_weights`` (isp): the residual
    dense branch's weights are FULL at use (just-in-time gathered), so its
    matmuls are plain local ops with no tp psum.  Returns (out, l_aux)."""
    from ..models.moe.gshard import moe_layer_apply

    stat_axes = (TP,) if (seq_chunked and tp > 1) else ()
    dropless = (cfg.moe_type.lower() in ("dropless", "megablock-d", "megablock")
                or not cfg.moe_drop_tokens)
    if dropless:
        if ep > 1:
            # token all-to-all over the manual ep axis (experts arrive as the
            # LOCAL (E/ep, ...) shard per _block_pspecs); reference MegaBlocks
            # EP dispatch, ``moe/utils.py:8-62``
            from ..models.moe.dropless import dropless_moe_apply_ep

            out, l_aux, _counts = dropless_moe_apply_ep(
                layer["moe"], h, top_k=cfg.top_k, ep_axis=EP, ep_size=ep,
                rng=rng, train=True, stat_axes=stat_axes)
        else:
            from ..models.moe.dropless import dropless_moe_apply

            out, l_aux, _counts = dropless_moe_apply(
                layer["moe"], h, top_k=cfg.top_k, rng=rng, train=True,
                stat_axes=stat_axes)
    else:
        out, l_aux, _counts = moe_layer_apply(
            layer["moe"], h,
            top_k=cfg.top_k,
            capacity_factor=cfg.moe_capacity_factor,
            min_capacity=cfg.moe_min_capacity,
            drop_tokens=True,
            use_rts=cfg.moe_use_rts,
            noisy_gate_policy=cfg.moe_noisy_gate_policy,
            rng=rng,
            train=True,
            manual_ep_axis=EP,
            manual_ep_size=ep,
        )
        if stat_axes:
            # per-rank gating groups (reference semantics) produce per-rank
            # aux statistics; average them over tp so the accumulated aux is
            # tp-uniform (the schedule's moe_sum leaves with a replicated spec)
            l_aux = jax.lax.pmean(l_aux, stat_axes)
    if cfg.num_shared_experts > 0:  # residual-MoE dense branch
        if seq_chunked and tp > 1 and not full_weights:
            # msp/fsp: the dense weights are tp-sharded; gather the sequence
            # around the column/row matmuls like _manual_block's FFN
            hg = jax.lax.all_gather(h, TP, axis=1, tiled=True)
            w1o = _dense(hg, layer["w1"]["kernel"])
            w3o = _dense(hg, layer["w3"]["kernel"])
            part = jnp.dot(jax.nn.silu(w1o) * w3o, layer["w2"]["kernel"].astype(h.dtype))
            dense_out = jax.lax.psum_scatter(part, TP, scatter_dimension=1, tiled=True)
        else:
            w1o = _dense(h, layer["w1"]["kernel"])
            w3o = _dense(h, layer["w3"]["kernel"])
            part = jnp.dot(jax.nn.silu(w1o) * w3o, layer["w2"]["kernel"].astype(h.dtype))
            dense_out = _psum_tp(part) if (tp > 1 and not full_weights
                                           and not seq_chunked) else part
        coef = jax.nn.softmax(
            _dense(h, layer["moe"]["coefficient"]).astype(jnp.float32), axis=-1)
        out = (out * coef[..., 0:1].astype(out.dtype)
               + dense_out * coef[..., 1:].astype(out.dtype))
    return out, l_aux


def _gqa_group_qkv(cfg: ModelConfig, tp: int, wqkv: dict, h):
    """Per-rank qkv slices from a TP-replicated packed wqkv when tp > kv_heads.

    With g = tp // kv_heads ranks per kv head and nq_loc = Hq // tp local q
    heads, rank r owns q heads [r*nq_loc, (r+1)*nq_loc) (globally contiguous,
    so the row-sharded out_proj layout is unchanged) and kv head r // g
    (replicated within the g-rank GQA group)."""
    Hkv, qpk, D = cfg.num_kv_attention_heads, cfg.q_per_kv, cfg.head_dim
    Hq = cfg.num_attention_heads
    assert tp % Hkv == 0 and Hq % tp == 0, (Hq, Hkv, tp)
    g = tp // Hkv
    nq_loc = Hq // tp
    r = jax.lax.axis_index(TP)
    H = h.shape[-1]
    kern = wqkv["kernel"].reshape(H, Hkv, qpk + 2, D)
    grp = jax.lax.dynamic_index_in_dim(kern, r // g, 1, keepdims=False)  # (H, qpk+2, D)
    wq = jax.lax.dynamic_slice_in_dim(grp, (r % g) * nq_loc, nq_loc, axis=1)
    wk = grp[:, qpk : qpk + 1]
    wv = grp[:, qpk + 1 :]

    def project(w):
        n = w.shape[1]
        y = jnp.dot(h, w.reshape(H, n * D).astype(h.dtype))
        return y.reshape(*h.shape[:-1], n, D)

    q, k, v = project(wq), project(wk), project(wv)
    if "bias" in wqkv:
        bias = wqkv["bias"].reshape(Hkv, qpk + 2, D)
        bgrp = jax.lax.dynamic_index_in_dim(bias, r // g, 0, keepdims=False)
        bq = jax.lax.dynamic_slice_in_dim(bgrp, (r % g) * nq_loc, nq_loc, axis=0)
        q = q + bq.astype(q.dtype)
        k = k + bgrp[qpk : qpk + 1].astype(k.dtype)
        v = v + bgrp[qpk + 1 :].astype(v.dtype)
    return q, k, v


def _local_head_cfg(cfg: ModelConfig, tp: int):
    return cfg if tp == 1 else _LocalCfg(cfg, tp)


class _LocalCfg:
    """View of ModelConfig with per-tp-rank head counts (head_dim unchanged)."""

    def __init__(self, cfg: ModelConfig, tp: int):
        self._cfg = cfg
        self.num_attention_heads = cfg.num_attention_heads // tp
        self.num_kv_attention_heads = cfg.num_kv_attention_heads // tp
        self.head_dim = cfg.head_dim
        self.q_per_kv = self.num_attention_heads // self.num_kv_attention_heads

    def __getattr__(self, name):
        return getattr(self._cfg, name)


def _isp_block(cfg: ModelConfig, tp: int, layer: dict, x, positions_local,
               segment_ids_full, segment_ids_local, ring: bool, rng=None,
               active=None, ep: int = 1):
    """One pre-norm block in isp (Ulysses) / rsp (ring) sequence parallelism
    inside the pipeline: activations are sequence-sharded over ``tp``
    end-to-end, weights are FULL at use (the caller gathers the wp-sharded
    storage per micro — the reference ``ISPCommunicator`` just-in-time
    all-gather, ``core/communication/isp.py:143-527``), and there is no
    tensor-parallel matmul math at all.

    isp: q/k/v are computed on the local seq chunk with full heads, then an
    all-to-all reshards seq->heads before the kernel and heads->seq after
    (reference ``DistributedAttention._SeqAllToAll``,
    ``multi_head_attention.py:27-135``).

    rsp: attention runs directly on the seq chunks with kv rotating around the
    tp ring (``parallel/ring_attention.py``) — no head-count bound.

    ``active`` (rsp only): the pipeline tick's activity flag.  The ring's
    CollectivePermute rendezvous forces this block to EXECUTE on idle ticks
    (a stage-divergent cond around it would deadlock the mesh), but the flag
    is uniform across each tp ring, so the pure-compute sections (qkv/rotary
    before the ring, out_proj/MLP after, and the per-leg kernels inside it)
    are cond-gated on it — an idle tick pays only the rotation ppermutes
    (``doc/pp_bubble_analysis.md``, rsp section quantifies the tax).
    """
    def gated(fn, *operands):
        if active is None:
            return fn(*operands)
        shapes = jax.eval_shape(fn, *operands)
        return jax.lax.cond(
            active, fn,
            lambda *_: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes),
            *operands)

    attn_drop = cfg.attn_drop_rate if rng is not None else 0.0

    def pre_attention(x):
        residual = _pdrop(cfg, x, rng, 0)
        if cfg.residual_in_fp32:
            residual = residual.astype(jnp.float32)
        h = _norm(cfg, residual, layer["norm1"], layer.get("norm1_bias"))
        qkv = _dense(h, layer["wqkv"]["kernel"], layer["wqkv"].get("bias"))
        q, k, v = split_qkv(cfg, qkv)  # full head counts on the LOCAL seq chunk
        cos, sin = rope_frequencies(positions_local, cfg.head_dim, base=cfg.rope_base)
        rot_dtype = jnp.bfloat16 if cfg.rotary_bf16 else jnp.float32
        return (_ckpt_name(apply_rotary(q, cos, sin, compute_dtype=rot_dtype), "attn_q"),
                _ckpt_name(apply_rotary(k, cos, sin, compute_dtype=rot_dtype), "attn_k"),
                _ckpt_name(v, "attn_v"), residual)

    q, k, v, residual = gated(pre_attention, x)
    B, S_loc = q.shape[:2]

    if ring:
        from .ring_attention import ring_attention

        ring_seed = (jax.random.bits(jax.random.fold_in(rng, 7),
                                     dtype=jnp.uint32).astype(jnp.int32)
                     if attn_drop > 0.0 else None)
        ctx = ring_attention(q, k, v, segment_ids_local, axis_name=TP,
                             softmax_scale=1.0 / math.sqrt(cfg.head_dim),
                             max_segment_len=cfg.max_segment_len,
                             dropout_rate=attn_drop, dropout_seed=ring_seed,
                             schedule=cfg.ring_schedule, active=active)
    else:
        # Ulysses all-to-all: (b, S/tp, Hq, D) -> (b, S, Hq/tp, D)
        q = jax.lax.all_to_all(q, TP, split_axis=2, concat_axis=1, tiled=True)
        k = jax.lax.all_to_all(k, TP, split_axis=2, concat_axis=1, tiled=True)
        v = jax.lax.all_to_all(v, TP, split_axis=2, concat_axis=1, tiled=True)
        drop_seed = _attn_drop_seed(attn_drop, rng, tp, q.shape[2])
        ctx = gated(lambda q_, k_, v_: flash_attention(
            q_, k_, v_, segment_ids=segment_ids_full,
            softmax_scale=1.0 / math.sqrt(cfg.head_dim), causal=True,
            max_segment_len=cfg.max_segment_len,
            dropout_rate=attn_drop, dropout_seed=drop_seed), q, k, v)
        ctx = jax.lax.all_to_all(ctx, TP, split_axis=1, concat_axis=2, tiled=True)

    def post_attention(ctx, residual):
        c = ctx.reshape(B, S_loc, -1)
        attn_out = _dense(c, layer["out_proj"]["kernel"], layer["out_proj"].get("bias"))
        res = (_pdrop(cfg, attn_out, rng, 1) + residual).astype(residual.dtype)
        h = _norm(cfg, res, layer["norm2"], layer.get("norm2_bias"))
        out_dtype = jnp.float32 if cfg.residual_in_fp32 else cfg.dtype
        if "moe" in layer:
            # MoE under isp (reference WEIGHT-mode experts + per-rank gating
            # on the sequence shard, ``modeling_moe.py:92,420-421``): gate the
            # LOCAL seq chunk's tokens, experts resident over ep with the
            # token all-to-all, aux stats pmean over tp for layout invariance
            mlp_out, l_aux = _pipeline_moe_ffn(cfg, tp, layer, h, rng, ep,
                                               seq_chunked=True, full_weights=True)
            return (mlp_out + res).astype(out_dtype), l_aux
        w1o = _dense(h, layer["w1"]["kernel"], layer["w1"].get("bias"))
        w3o = _dense(h, layer["w3"]["kernel"], layer["w3"].get("bias"))
        mlp_out = _dense(jax.nn.silu(w1o) * w3o, layer["w2"]["kernel"],
                         layer["w2"].get("bias"))
        return (mlp_out + res).astype(out_dtype), jnp.zeros((), jnp.float32)

    if "moe" in layer and active is not None:
        # rsp x MoE x pp: the expert all-to-all cannot sit inside the
        # stage-divergent cond (collective rendezvous) — run post_attention
        # UNGATED like the ring's ppermutes, on zero-sanitized inputs (zeros
        # flow NaN-free through norm/gate/experts), and mask output + aux by
        # the activity flag.  Idle ticks pay wasted ffn flops on pipeline
        # bubbles only; active ticks compute exactly what gated() would.
        ctx_s = jnp.where(active, ctx, jnp.zeros_like(ctx))
        res_s = jnp.where(active, residual, jnp.zeros_like(residual))
        out, l_aux = post_attention(ctx_s, res_s)
        return (jnp.where(active, out, jnp.zeros_like(out)),
                jnp.where(active, l_aux, jnp.zeros_like(l_aux)))
    return gated(post_attention, ctx, residual)


def _gather_by_specs(tree, specs, w_axes: tuple):
    """All-gather each leaf over the weight-storage mesh axes at the dim its
    in_spec shards — the isp just-in-time weight gather.  Placed INSIDE the
    differentiated micro function so jax.vjp's transpose (psum_scatter) hands
    back WP-SHARDED gradients and the grad accumulators stay shard-sized."""
    if not w_axes:
        return tree

    def one(a, spec):
        for d, part in enumerate(spec):
            names = part if isinstance(part, tuple) else ((part,) if part else ())
            if any(ax in names for ax in w_axes):
                return jax.lax.all_gather(a, w_axes, axis=d, tiled=True)
        return a

    return jax.tree.map(one, tree, specs, is_leaf=lambda s: isinstance(s, P))


def _stage_blocks_apply(cfg: ModelConfig, body, blocks_local, x, rng=None, layer0=0):
    """Apply this stage's layer group with the `checkpoint` FRACTION honored
    per group (mirrors model_forward's split): the first round(L_local * f)
    local layers full-remat (flash residuals saved), the rest use the
    everything-cheap-saveable policy.

    ``body(layer, h, rng_l) -> (h, aux)`` is the per-layer block function
    (aux = MoE gate loss, 0 for dense); ``rng`` (optional) is folded with each
    layer's GLOBAL index ``layer0 + i`` so dropout streams match the pp=1
    path's per-layer folding.  Returns ``(out, aux_sum)``."""
    L_local = jax.tree.leaves(blocks_local)[0].shape[0]
    n_full = int(round(L_local * cfg.checkpoint))
    save_names = ["flash_out", "flash_lse"]
    # remat_save_mlp is a FRACTION of the fully-rematted layers that also save
    # their SwiGLU gates (same semantics as model_forward's n_gates split) —
    # honored per stage so 0.5 under pp>1 saves gates for half the local
    # full-remat layers, not all of them
    mlp_frac = min(1.0, max(0.0, float(cfg.remat_save_mlp)))
    n_gates = int(round(n_full * mlp_frac))
    # remat_save_qkv: same per-stage fraction semantics — those layers also
    # keep the post-rotary q/k/v so the backward skips the wqkv+rotary
    # recompute (names set in models/base.py attention_block)
    qkv_frac = min(1.0, max(0.0, float(cfg.remat_save_qkv)))
    n_qkv = int(round(n_full * qkv_frac))

    def make_body(policy):
        wrapped = jax.checkpoint(body, policy=policy, prevent_cse=False)
        if rng is not None:
            def sb(carry, xs):
                layer, gidx = xs
                h, aux = carry
                h, a = wrapped(layer, h, jax.random.fold_in(rng, gidx))
                return (h, aux + a), None
        else:
            def sb(carry, layer):
                h, aux = carry
                h, a = wrapped(layer, h, None)
                return (h, aux + a), None
        return sb

    GATE_NAMES = ("mlp_w1o", "mlp_w3o")
    QKV_NAMES = ("attn_q", "attn_k", "attn_v")
    both_body = make_body(jax.checkpoint_policies.save_only_these_names(
        *save_names, *GATE_NAMES, *QKV_NAMES))
    gates_body = make_body(jax.checkpoint_policies.save_only_these_names(
        *save_names, *GATE_NAMES))
    qkv_body = make_body(jax.checkpoint_policies.save_only_these_names(
        *save_names, *QKV_NAMES))
    full = make_body(jax.checkpoint_policies.save_only_these_names(*save_names))
    light = make_body(jax.checkpoint_policies.dots_with_no_batch_dims_saveable)

    xs = blocks_local
    if rng is not None:
        xs = (blocks_local, layer0 + jnp.arange(L_local, dtype=jnp.int32))
    if cfg.residual_in_fp32:
        x = x.astype(jnp.float32)
    carry = (x, jnp.zeros((), jnp.float32))
    # contiguous segments from the front of the full-remat prefix:
    # [0, n_both) save gates+qkv, then the larger single-save tier up to
    # max(n_gates, n_qkv), then plain full remat to n_full, then light
    n_both = min(n_gates, n_qkv)
    n_single = max(n_gates, n_qkv)
    single_body = gates_body if n_gates >= n_qkv else qkv_body
    segments = [(both_body, 0, n_both), (single_body, n_both, n_single),
                (full, n_single, n_full), (light, n_full, L_local)]
    for body_fn, lo, hi in segments:
        if hi <= lo:
            continue
        seg = jax.tree.map(lambda a: a[lo:hi], xs)
        carry, _ = jax.lax.scan(body_fn, carry, seg)
    out, aux = carry
    return (out.astype(cfg.dtype) if cfg.residual_in_fp32 else out), aux


def _manual_embed(cfg: ModelConfig, tp: int, embedding_local, input_ids):
    """Hidden-split embedding: local lookup + all-gather of the hidden shards
    (reference Embedding1D gather-forward, ``modules/embedding.py:17``)."""
    x_local = jnp.take(embedding_local, input_ids, axis=0).astype(cfg.dtype)
    if tp > 1:
        x = jax.lax.all_gather(x_local, TP, axis=2, tiled=True)
    else:
        x = x_local
    if cfg.embed_grad_scale != 1:
        x = cfg.embed_grad_scale * x + (1 - cfg.embed_grad_scale) * jax.lax.stop_gradient(x)
    return x


def _manual_head_ce(cfg: ModelConfig, tp: int, other: dict, h, labels,
                    label_smoothing: float):
    """fp32 final norm + vocab-split head + vocab-parallel CE over tp
    (pmax/psum replace the reference's TP-group collectives, ``metrics.py`` A.5)."""
    h = _norm(cfg, h, other["norm"], other.get("norm_bias"))
    w = other["head"]  # (H, V/tp) local
    if cfg.embed_grad_scale != 1:
        w = cfg.embed_grad_scale * w + (1 - cfg.embed_grad_scale) * jax.lax.stop_gradient(w)
    if cfg.norm_head:
        norm = jnp.linalg.norm(w.astype(jnp.float32), axis=0, keepdims=True)
        gnorm = norm  # per-column norms are local to the shard
        w = (w / jax.lax.stop_gradient(gnorm + 1e-7)).astype(w.dtype)
    logits = jnp.dot(h, w.astype(h.dtype)).astype(jnp.float32)  # (b, S, V/tp)
    V_local = logits.shape[-1]
    rank = jax.lax.axis_index(TP)
    offset = rank * V_local

    flat = logits.reshape(-1, V_local)
    lab = labels.reshape(-1)
    valid = lab != -100
    # pmax has no VJP; the row max is a constant in the gradient anyway
    gmax = jax.lax.pmax(jax.lax.stop_gradient(jnp.max(flat, axis=-1)), TP)
    sumexp = _psum_replicated_tp(jnp.sum(jnp.exp(flat - gmax[:, None]), axis=-1))
    lse = jnp.log(sumexp) + gmax

    local_label = lab - offset
    in_shard = (local_label >= 0) & (local_label < V_local)
    safe = jnp.clip(local_label, 0, V_local - 1)
    picked = jnp.take_along_axis(flat, safe[:, None], axis=-1)[:, 0]
    label_logit = _psum_replicated_tp(jnp.where(in_shard, picked, 0.0))
    nll = jnp.where(valid, lse - label_logit, 0.0)
    if label_smoothing > 0.0:
        # mean log-prob over the vocab, assembled from the shards
        sum_lp = _psum_replicated_tp(jnp.sum(flat, axis=-1)) - (V_local * tp) * lse
        smooth = -sum_lp / (V_local * tp)
        nll = jnp.where(valid, (1 - label_smoothing) * nll + label_smoothing * smooth, 0.0)
    n_valid = jnp.sum(valid)
    nll_sum = jnp.sum(nll)

    # vocab-parallel accuracy (reference AccPerplex, metrics.py:129-141)
    local_max = jnp.max(flat, axis=-1)
    local_arg = jnp.argmax(flat, axis=-1) + offset
    is_owner = local_max == gmax
    correct = jax.lax.psum(jnp.where(is_owner & (local_arg == lab) & valid, 1, 0), TP)
    n_correct = jnp.sum(jnp.clip(correct, 0, 1))
    return nll_sum, n_valid, n_correct


def interleaved_layer_layout(num_layers: int, pp: int, num_chunks: int):
    """(perm, inv) mapping the natural layer order to the interleaved-pp
    STORAGE order (stage-major: stage s's C chunks back-to-back), or None when
    the layout is the identity (num_chunks <= 1 or pp <= 1).

    Storing block params in this order at init removes the per-step cross-stage
    weight resharding the ``jnp.take`` in ``run`` used to pay (the reference
    interleaved scheduler holds chunk-local weights permanently,
    ``pipeline_scheduler.py:711+``); checkpoints canonicalize back to natural
    order on save/load (``checkpoint_manager``)."""
    if num_chunks <= 1 or pp <= 1:
        return None
    Lg = num_layers // (num_chunks * pp)
    group_order = [c * pp + s for s in range(pp) for c in range(num_chunks)]
    perm = np.asarray([v * Lg + i for v in group_order for i in range(Lg)])
    return perm, np.argsort(perm)


def permute_layers(blocks, idx):
    """Apply a layer-dim permutation to every leaf of a stacked block tree."""
    return jax.tree.map(lambda a: jnp.take(a, jnp.asarray(idx), axis=0), blocks)


def active_layer_layout():
    """Layout for the CURRENT gpc config; None when storage is natural order."""
    from ..core.context import gpc

    if getattr(gpc, "config", None) is None or gpc.mesh is None:
        return None
    C = int(gpc.config.model.get("num_chunks", 1) or 1)
    return interleaved_layer_layout(int(gpc.config.model.num_layers),
                                    gpc.sizes.pp, C)


def pipeline_loss_fn(cfg: ModelConfig, mesh, pp: int, label_smoothing: float = 0.0,
                     num_chunks: int = 1, tp_mode: str = "mtp",
                     moe_loss_coeff: float = 0.01, pre_permuted: bool = False):
    """Returns ``loss_fn(params, batch, rng) -> (loss, (loss, n_tokens,
    n_correct, moe_loss))``.

    One true-1F1B implementation covers both schedules: ``num_chunks == 1``
    is the reference ``PipelineScheduler`` (``pipeline_scheduler.py:111-708``),
    ``num_chunks > 1`` the interleaved ``InterleavedPipelineScheduler``
    (:711-1430; requires M % pp == 0, :743).  The bubble shrinks from
    (pp-1)/(M+pp-1) to (pp-1)/(M*C+pp-1); live state stays O(C*pp).

    MoE blocks accumulate their gate aux loss through the schedule and into
    the total loss (reference ``accum_moe_loss``,
    ``pipeline_scheduler.py:307-320,471+``).
    """
    return _1f1b_loss_fn(cfg, mesh, pp, label_smoothing, tp_mode, num_chunks,
                         moe_loss_coeff, pre_permuted)


def _block_pspecs(blocks, gqa_replicated: bool = False) -> dict:
    """PartitionSpecs for the per-stage block stack: layer dim over pp;
    column-parallel output dims over tp; row-parallel input dims over tp —
    mirrors the GSPMD param specs (sharding.py).  ``gqa_replicated`` (tp >
    kv_heads) keeps wqkv TP-replicated; ranks slice their q/kv heads in
    ``_gqa_group_qkv``."""
    bs = {}
    bs["norm1"] = P(PP)
    bs["norm2"] = P(PP)
    if "norm1_bias" in blocks:
        bs["norm1_bias"] = P(PP)
        bs["norm2_bias"] = P(PP)
    bs["wqkv"] = {"kernel": P(PP) if gqa_replicated else P(PP, None, TP)}
    if "bias" in blocks["wqkv"]:
        bs["wqkv"]["bias"] = P(PP) if gqa_replicated else P(PP, TP)
    bs["out_proj"] = {"kernel": P(PP, TP, None)}
    if "bias" in blocks["out_proj"]:
        bs["out_proj"]["bias"] = P(PP)
    if "w1" in blocks:  # pure-MoE blocks carry no dense FFN (modeling_moe.py)
        bs["w1"] = {"kernel": P(PP, None, TP)}
        bs["w3"] = {"kernel": P(PP, None, TP)}
        bs["w2"] = {"kernel": P(PP, TP, None)}
        if "bias" in blocks["w1"]:
            bs["w1"]["bias"] = P(PP, TP)
            bs["w3"]["bias"] = P(PP, TP)
            bs["w2"]["bias"] = P(PP)
    if "moe" in blocks:
        # experts shard over the dedicated ep axis (reference
        # Initializer_Expert_Data :474); gate/coefficient replicate
        moe = {"gate": P(PP),
               "experts": {"w1": P(PP, EP), "w3": P(PP, EP), "w2": P(PP, EP)}}
        if "coefficient" in blocks["moe"]:
            moe["coefficient"] = P(PP)
        bs["moe"] = moe
    return bs


def _isp_block_pspecs(blocks, w_axes: tuple) -> dict:
    """Per-stage block specs for isp/rsp: layer dim over pp; weight STORAGE
    sharded over the weight-group axes ``w_axes`` (the largest weight dim,
    mirroring sharding.py's isp PARAM_RULES); no tensor-parallel math dims.

    MoE blocks: experts shard over the dedicated ep axis on the expert dim
    AND over ``w_axes`` on their largest dim (the reference's WEIGHT-mode isp
    experts, ``modeling_moe.py:92``) — gathered just-in-time per micro like
    every other wp param; the gate replicates."""
    W = w_axes if len(w_axes) > 1 else (w_axes[0] if w_axes else None)
    bs = {"norm1": P(PP), "norm2": P(PP)}
    if "norm1_bias" in blocks:
        bs["norm1_bias"] = P(PP)
        bs["norm2_bias"] = P(PP)
    bs["wqkv"] = {"kernel": P(PP, None, W)}
    if "bias" in blocks["wqkv"]:
        bs["wqkv"]["bias"] = P(PP, W)
    bs["out_proj"] = {"kernel": P(PP, W, None)}
    if "bias" in blocks["out_proj"]:
        bs["out_proj"]["bias"] = P(PP)
    if "w1" in blocks:  # pure-MoE blocks carry no dense FFN (modeling_moe.py)
        bs["w1"] = {"kernel": P(PP, None, W)}
        bs["w3"] = {"kernel": P(PP, None, W)}
        bs["w2"] = {"kernel": P(PP, W, None)}
        if "bias" in blocks["w1"]:
            bs["w1"]["bias"] = P(PP, W)
            bs["w3"]["bias"] = P(PP, W)
            bs["w2"]["bias"] = P(PP)
    if "moe" in blocks:
        moe = {"gate": P(PP),
               "experts": {"w1": P(PP, EP, None, W), "w3": P(PP, EP, None, W),
                           "w2": P(PP, EP, W, None)}}
        if "coefficient" in blocks["moe"]:
            moe["coefficient"] = P(PP)
        bs["moe"] = moe
    return bs


def _local_head_ce(cfg: ModelConfig, other: dict, h, labels, label_smoothing: float):
    """Full-vocab CE on a LOCAL sequence chunk (isp/rsp head: the head weight
    is gathered full, the sequence stays sharded — CE is embarrassingly
    parallel over tp; the per-chunk nll sums psum at the stage boundary)."""
    h = _norm(cfg, h, other["norm"], other.get("norm_bias"))
    w = other["head"]
    if cfg.embed_grad_scale != 1:
        w = cfg.embed_grad_scale * w + (1 - cfg.embed_grad_scale) * jax.lax.stop_gradient(w)
    if cfg.norm_head:
        norm = jnp.linalg.norm(w.astype(jnp.float32), axis=0, keepdims=True)
        w = (w / jax.lax.stop_gradient(norm + 1e-7)).astype(w.dtype)
    logits = jnp.dot(h, w.astype(h.dtype)).astype(jnp.float32)
    V = logits.shape[-1]
    flat = logits.reshape(-1, V)
    lab = labels.reshape(-1)
    valid = lab != -100
    gmax = jax.lax.stop_gradient(jnp.max(flat, axis=-1))
    lse = jnp.log(jnp.sum(jnp.exp(flat - gmax[:, None]), axis=-1)) + gmax
    safe = jnp.clip(lab, 0, V - 1)
    picked = jnp.take_along_axis(flat, safe[:, None], axis=-1)[:, 0]
    nll = jnp.where(valid, lse - picked, 0.0)
    if label_smoothing > 0.0:
        smooth = -(jnp.sum(flat, axis=-1) - V * lse) / V
        nll = jnp.where(valid, (1 - label_smoothing) * nll + label_smoothing * smooth, 0.0)
    n_valid = jnp.sum(valid)
    nll_sum = jnp.sum(nll)
    n_correct = jnp.sum((jnp.argmax(flat, axis=-1) == lab) & valid)
    return nll_sum, n_valid, n_correct




def _unmentioned_axes(spec: P, axes: tuple) -> tuple:
    named = set()
    for entry in spec:
        if entry is None:
            continue
        named.update(entry if isinstance(entry, tuple) else (entry,))
    return tuple(ax for ax in axes if ax not in named)


def _boundary_psum(tree, specs, axes: tuple):
    """Sum each cotangent over the mesh axes its in_spec replicates it on —
    the transpose rule jax.grad applies at the shard_map boundary (probed:
    check_vma=False psums replicated-input cotangents over unmentioned axes).
    For the fully-manual 1F1B region this also covers the dp/zero grad
    all-reduce the reference does in its ZeRO bucket reducer."""
    def one(g, spec):
        over = _unmentioned_axes(spec, axes)
        return jax.lax.psum(g, over) if over else g

    return jax.tree.map(one, tree, specs)



def _1f1b_loss_fn(cfg: ModelConfig, mesh, pp: int, label_smoothing: float = 0.0,
                  tp_mode: str = "mtp", num_chunks: int = 1,
                  moe_loss_coeff: float = 0.01, pre_permuted: bool = False):
    """True 1F1B pipeline, plain AND interleaved (reference
    ``PipelineScheduler`` :111-708 / ``InterleavedPipelineScheduler``
    :711-1430), TPU-native formulation:

    - ONE shard_map, fully manual over (pp, tp, dp, ep, zero): ZeRO-sharded
      params are all-gathered once at entry (the reference's param broadcast),
      the batch arrives dp-sharded, grads leave through an explicit dp/zero
      psum (the reference's bucketed grad all-reduce);
    - work units are (micro-group g, chunk c, offset r) with micro
      m = g*pp + r and virtual stage v = c*pp + s; one lockstep fori_loop:
      forward of a unit runs on stage s at tick g*C*pp + c*pp + r + s and its
      backward at T0 + g*C*pp + (C-1-c)*pp + r + (pp-1-s) with T0 = C*pp - 1 —
      both the stage handoff and the chunk handoff (stage pp-1 -> stage 0)
      advance exactly one tick, so a single ppermute ring per direction
      carries the whole schedule and each stage does at most one forward and
      one backward per tick (the 1F1B steady state);
    - on the last VIRTUAL stage (chunk C-1 of stage pp-1) forward and backward
      coincide, so its forward folds into the backward and the vocab head + CE
      run only there;
    - live state is O(C*pp), not O(micro_num): a min(2*C*pp, M*C)-slot input
      buffer plus fp32 grad accumulators (backward re-runs the stage forward
      from the buffered input — stage-granular rematerialization);
    - gradients accumulate inside the loop and leave through a custom_vjp, so
      ``jax.grad(loss_fn)`` in the scheduler keeps working unchanged.
    """
    from ..core.context import DP, EP, ZERO

    tp = mesh.shape.get(TP, 1)
    C = num_chunks
    ALL_AXES = (PP, TP, DP, EP, ZERO)
    BATCH_AXES = (DP, EP, ZERO)
    isp_like = tp_mode in ("isp", "rsp") and tp > 1
    ring = tp_mode == "rsp"
    if isp_like:
        from .sharding import get_rules

        # weight STORAGE axes (parallel.weight.size realized on the mesh);
        # weights are gathered full at use inside each micro's vjp
        w_axes = get_rules().weight_storage_axes()
        if not ring:
            assert (cfg.num_attention_heads % tp == 0
                    and cfg.num_kv_attention_heads % tp == 0), (
                "isp (Ulysses) needs head counts divisible by tp "
                f"({cfg.num_attention_heads}/{cfg.num_kv_attention_heads} vs tp={tp}); "
                "use rsp (ring) for head-count-free sequence scaling")
    else:
        w_axes = ()
    gqa_rep = (not isp_like) and cfg.num_kv_attention_heads % tp != 0
    if gqa_rep:
        assert tp % cfg.num_kv_attention_heads == 0 and cfg.num_attention_heads % tp == 0, \
            (cfg.num_attention_heads, cfg.num_kv_attention_heads, tp)
    assert cfg.num_layers % (pp * C) == 0, (cfg.num_layers, pp, C)
    seq_parallel = tp_mode in ("msp", "fsp") and tp > 1
    seq_sharded = seq_parallel or isp_like  # stage-boundary acts are (b, S/tp, H)
    Lg_all = cfg.num_layers // (C * pp)     # layers per (stage, chunk) unit
    ep_size = mesh.shape.get(EP, 1)
    is_moe = getattr(cfg, "num_experts", 1) > 1
    # every tensor mode composes with MoE, incl. rsp: the ring block runs the
    # MoE ffn (and its expert a2a) ungated on idle ticks — see the
    # active-handling branch in the isp/rsp block function

    def stage_fn(blocks, embedding, norm, head, norm_bias,
                 input_ids, positions, segment_ids, labels, rng):
        pp_idx = jax.lax.axis_index(PP)
        tp_idx = jax.lax.axis_index(TP)
        M, b, S = input_ids.shape  # b = LOCAL batch (dp/zero are manual here)
        H = cfg.hidden_size
        S_loc = S // tp if seq_sharded else S
        consts = {"embedding": embedding, "norm": norm, "head": head}
        if norm_bias is not None:
            consts["norm_bias"] = norm_bias
        if isp_like:
            bspecs = _isp_block_pspecs(blocks, w_axes)

        # per-(dp,ep,zero)-shard + per-seq-chunk dropout decorrelation; at
        # dp=1/tp=1 no folds happen so pp>1 masks == pp=1 masks bit-exactly
        n_shards = mesh.shape.get(DP, 1) * mesh.shape.get(EP, 1) * mesh.shape.get(ZERO, 1)

        def micro_rng(m):
            if rng is None:
                return None
            r = jax.random.fold_in(rng, m)
            if n_shards > 1:
                shard_idx = ((jax.lax.axis_index(DP) * mesh.shape.get(EP, 1)
                              + jax.lax.axis_index(EP)) * mesh.shape.get(ZERO, 1)
                             + jax.lax.axis_index(ZERO))
                r = jax.random.fold_in(r, shard_idx)
            if seq_sharded:
                r = jax.random.fold_in(r, 10_000 + tp_idx)
            return r

        # per-micro GLOBAL valid-token counts: the CE normalizer (precomputed
        # so backward seeds need no collective inside the loop)
        nvg = jax.lax.psum(jnp.sum(labels != -100, axis=(1, 2)), BATCH_AXES)
        nvg_f = jnp.maximum(nvg, 1).astype(jnp.float32)

        if C > 1:
            Lg = blocks["norm1"].shape[0] // C  # local layers per chunk

        def micro_fn(blocks_, consts_, x, m, c, active=None):
            """One (micro m, chunk c) unit on this stage: embed at the first
            virtual stage, the chunk's layer group, head + CE (local nll SUM)
            at the last virtual stage.

            ``active`` (rsp only): the tick's activity flag — the ring stage
            body must execute on idle ticks (CollectivePermute rendezvous),
            but its pure-compute sections cond-gate on this flag so a dummy
            tick pays only the rotation ppermutes (see _isp_block)."""
            pos = jax.lax.dynamic_index_in_dim(positions, m, 0, keepdims=False)
            seg = jax.lax.dynamic_index_in_dim(segment_ids, m, 0, keepdims=False)
            if C > 1:
                bc = jax.tree.map(lambda a: a.reshape(C, Lg, *a.shape[1:]), blocks_)
                local = jax.tree.map(
                    lambda a: jax.lax.dynamic_index_in_dim(a, c, 0, keepdims=False), bc)
            else:
                local = blocks_
            is_entry = jnp.logical_and(pp_idx == 0, c == 0)
            is_head = jnp.logical_and(pp_idx == pp - 1, c == C - 1)
            rng_m = micro_rng(m)
            layer0 = (c * pp + pp_idx) * Lg_all  # global idx of first local layer

            if isp_like:
                # isp just-in-time weight gather: INSIDE the vjp, so grads
                # come back wp-sharded through the all_gather transpose
                local = _gather_by_specs(local, bspecs, w_axes)
                pos_loc = jax.lax.dynamic_slice_in_dim(pos, tp_idx * S_loc, S_loc, axis=1)
                seg_loc = jax.lax.dynamic_slice_in_dim(seg, tp_idx * S_loc, S_loc, axis=1)

                def body(layer, h, rng_l):
                    return _isp_block(cfg, tp, layer, h, pos_loc, seg, seg_loc, ring, rng_l,
                                      active=active if ring else None, ep=ep_size)
            else:
                def body(layer, h, rng_l):
                    return _manual_block(cfg, tp, layer, h, pos, seg, seq_parallel, rng_l,
                                         ep=ep_size)

            def embed():
                ids = jax.lax.dynamic_index_in_dim(input_ids, m, 0, keepdims=False)
                if isp_like:
                    # gather the wp-sharded table first, then look up the LOCAL
                    # seq chunk — the same just-in-time weight gather as every
                    # other wp param.  (Gathering per-token lookups instead
                    # would interleave DIFFERENT ranks' token chunks across
                    # hidden slices: each rank's ids differ under isp.)
                    ids_loc = jax.lax.dynamic_slice_in_dim(ids, tp_idx * S_loc, S_loc, axis=1)
                    emb = consts_["embedding"]
                    if w_axes:
                        emb = jax.lax.all_gather(emb, w_axes, axis=1, tiled=True)
                    e = jnp.take(emb, ids_loc, axis=0).astype(cfg.dtype)
                    if cfg.embed_grad_scale != 1:
                        e = (cfg.embed_grad_scale * e
                             + (1 - cfg.embed_grad_scale) * jax.lax.stop_gradient(e))
                    return e
                e = _manual_embed(cfg, tp, consts_["embedding"], ids)
                if seq_parallel:
                    e = jax.lax.dynamic_slice_in_dim(e, tp_idx * S_loc, S_loc, axis=1)
                return e

            x_eff = jax.lax.cond(is_entry, embed, lambda: x)
            h, moe_aux = _stage_blocks_apply(cfg, body, local, x_eff, rng=rng_m, layer0=layer0)

            def head_branch():
                y = h
                lab = jax.lax.dynamic_index_in_dim(labels, m, 0, keepdims=False)
                if isp_like:
                    # seq stays sharded: each rank runs full-vocab CE on its
                    # chunk with the gathered head; chunk nll sums psum with
                    # the loss at the boundary
                    lab = jax.lax.dynamic_slice_in_dim(lab, tp_idx * S_loc, S_loc, axis=1)
                    head_w = consts_["head"]
                    if w_axes:
                        head_w = jax.lax.all_gather(head_w, w_axes, axis=1, tiled=True)
                    if cfg.norm_type == "rmsnorm":
                        from ..ops.fused_ce import fused_norm_head_ce, gpc_loss_knobs

                        nll_sum, _nv, n_cor = fused_norm_head_ce(
                            y, consts_["norm"], head_w, lab,
                            eps=cfg.layer_norm_epsilon, embed_grad_scale=cfg.embed_grad_scale,
                            norm_head=cfg.norm_head, label_smoothing=label_smoothing,
                            **gpc_loss_knobs(),
                        )
                        return nll_sum, n_cor
                    other = {"norm": consts_["norm"], "head": head_w}
                    if "norm_bias" in consts_:
                        other["norm_bias"] = consts_["norm_bias"]
                    nll_sum, _nv, n_cor = _local_head_ce(cfg, other, y, lab, label_smoothing)
                    return nll_sum, n_cor
                if seq_parallel:
                    y = jax.lax.all_gather(y, TP, axis=1, tiled=True)
                if tp == 1 and cfg.norm_type == "rmsnorm":
                    from ..ops.fused_ce import fused_norm_head_ce, gpc_loss_knobs

                    nll_sum, _n_valid, n_cor = fused_norm_head_ce(
                        y, consts_["norm"], consts_["head"], lab,
                        eps=cfg.layer_norm_epsilon, embed_grad_scale=cfg.embed_grad_scale,
                        norm_head=cfg.norm_head, label_smoothing=label_smoothing,
                        **gpc_loss_knobs(),
                    )
                    return nll_sum, n_cor
                other = {"norm": consts_["norm"], "head": consts_["head"]}
                if "norm_bias" in consts_:
                    other["norm_bias"] = consts_["norm_bias"]
                nll_sum, _n_valid, n_cor = _manual_head_ce(cfg, tp, other, y, lab, label_smoothing)
                return nll_sum, n_cor

            def no_head():
                return jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)

            nll_sum, n_cor = jax.lax.cond(is_head, head_branch, no_head)
            return (h, nll_sum, moe_aux), n_cor

        U = M * C                     # total work units
        T0 = C * pp - 1               # first backward tick
        T = U + T0 + pp - 1           # C=1: M + 2*pp - 2
        B = min(2 * C * pp, U)        # in-flight units per stage < 2*C*pp
        perm_fwd = [(i, (i + 1) % pp) for i in range(pp)]
        perm_bwd = [(i, (i - 1) % pp) for i in range(pp)]

        def decode(u):
            r = u % pp
            c = (u // pp) % C
            g = u // (C * pp)
            return g * pp + r, c          # (micro m, chunk index in fwd order)

        zero_grads = {
            "blocks": jax.tree.map(lambda a: jnp.zeros(a.shape, jnp.float32), blocks),
            "consts": jax.tree.map(lambda a: jnp.zeros(a.shape, jnp.float32), consts),
        }

        # d(total)/d(moe_aux per unit): coeff, averaged over batch shards (the
        # reference all-reduce-AVERAGES dp grads; /M applied outside).  Under
        # isp/msp the tp ranks are ALSO gating-token shards whose aux stats
        # pmean over tp — every tp rank seeds this cotangent and the pmean
        # transpose re-multiplies by tp, so the seed divides by tp exactly
        # like it divides by the ep/dp shards (pinned by
        # test_moe_pp2_isp2_matches_pp1's loss curve)
        n_batch_shards = (mesh.shape.get(DP, 1) * mesh.shape.get(EP, 1)
                         * mesh.shape.get(ZERO, 1))
        n_aux_shards = n_batch_shards * (tp if (is_moe and seq_sharded) else 1)
        ct_moe_const = moe_loss_coeff / n_aux_shards

        def tick(t, carry):
            y_send, dx_send, x_buf, grads, loss_sum, cor_sum, moe_sum = carry
            recv_x = jax.lax.ppermute(y_send, PP, perm_fwd)
            recv_dy = jax.lax.ppermute(dx_send, PP, perm_bwd)

            # ------------------------------------------------ forward substep
            u_f = t - pp_idx
            m_f, c_f = decode(jnp.clip(u_f, 0, U - 1))
            is_last_virtual_f = jnp.logical_and(pp_idx == pp - 1, c_f == C - 1)
            fwd_active = jnp.logical_and(
                jnp.logical_and(u_f >= 0, u_f < U),
                jnp.logical_not(is_last_virtual_f))

            def do_fwd(active=None):
                (h, _nll, _moe), _ = micro_fn(blocks, consts, recv_x, m_f, c_f,
                                              active=active)
                return h

            if ring:
                # rsp: the ring's ppermutes lower to CollectivePermute, whose
                # rendezvous is ALL-device (unlike the grouped all_to_all /
                # psum the isp/msp paths use) — inside a cond whose predicate
                # diverges across pp stages, half the mesh waits at the ring
                # permute and half at the next collective: deadlock (XLA:CPU
                # aborts; TPU would hang).  Execute the stage body every tick
                # and mask the result; the body's PURE-COMPUTE sections are
                # cond-gated on fwd_active internally (uniform across each tp
                # ring), so the dummy tick pays only the rotation ppermutes
                # (doc/pp_bubble_analysis.md quantifies the unconditional-body
                # tax this removes: 4-19pp of schedule efficiency).
                y_new = jnp.where(fwd_active, do_fwd(active=fwd_active),
                                  jnp.zeros_like(y_send))
            else:
                y_new = jax.lax.cond(fwd_active, do_fwd, lambda: jnp.zeros_like(y_send))
            x_buf = jax.lax.cond(
                fwd_active,
                lambda: jax.lax.dynamic_update_index_in_dim(
                    x_buf, recv_x, jnp.clip(u_f, 0, U - 1) % B, 0),
                lambda: x_buf,
            )

            # ----------------------------------------------- backward substep
            u_b = t - T0 - (pp - 1 - pp_idx)
            bwd_active = jnp.logical_and(u_b >= 0, u_b < U)
            ub = jnp.clip(u_b, 0, U - 1)
            r_b = ub % pp
            c_b = C - 1 - ((ub // pp) % C)      # backward walks chunks high->low
            g_b = ub // (C * pp)
            m_b = g_b * pp + r_b
            u_unit = g_b * C * pp + c_b * pp + r_b  # the unit's forward index
            is_last_virtual_b = jnp.logical_and(pp_idx == pp - 1, c_b == C - 1)

            def do_bwd(grads, mask=None):
                x_in = jnp.where(
                    is_last_virtual_b, recv_x,
                    jax.lax.dynamic_index_in_dim(x_buf, u_unit % B, 0, keepdims=False))
                # mask is the tick's bwd_active flag (rsp): threading it as
                # micro_fn's `active` gates the recompute AND (through the
                # cond vjp) the backward kernels on idle ticks
                (_, nll_sum, moe_aux), vjp_fn, n_cor = jax.vjp(
                    lambda bl, co, x: micro_fn(bl, co, x, m_b, c_b, active=mask),
                    blocks, consts, x_in, has_aux=True)
                ct_y = jnp.where(is_last_virtual_b, jnp.zeros_like(dx_send), recv_dy)
                # d(total_loss)/d(nll_sum_m) = 1 / n_valid_global[m] (div by M
                # outside); zero off the head unit
                ct_nll = jnp.where(is_last_virtual_b, 1.0 / nvg_f[m_b], 0.0)
                ct_moe = jnp.asarray(ct_moe_const, moe_aux.dtype)
                if mask is not None:
                    # inactive tick: zero the cotangent seeds — vjp is linear
                    # in the cotangents, so the accumulated grads gain exactly 0
                    ct_y = jnp.where(mask, ct_y, 0)
                    ct_nll = jnp.where(mask, ct_nll, 0.0)
                    ct_moe = jnp.where(mask, ct_moe, 0.0)
                d_blocks, d_consts, dx = vjp_fn(
                    (ct_y, ct_nll.astype(nll_sum.dtype), ct_moe))
                grads = {
                    "blocks": jax.tree.map(lambda a, g: a + g.astype(jnp.float32),
                                           grads["blocks"], d_blocks),
                    "consts": jax.tree.map(lambda a, g: a + g.astype(jnp.float32),
                                           grads["consts"], d_consts),
                }
                return dx, grads, nll_sum / nvg_f[m_b], n_cor, moe_aux

            def skip_bwd(grads):
                return (jnp.zeros_like(dx_send), grads, jnp.zeros((), jnp.float32),
                        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.float32))

            if ring:
                # unconditional vjp for the same reason as the forward substep
                dx_new, grads, loss_i, cor_i, moe_i = do_bwd(grads, mask=bwd_active)
                dx_new = jnp.where(bwd_active, dx_new, 0)
                loss_i = jnp.where(bwd_active, loss_i, 0.0)
                cor_i = jnp.where(bwd_active, cor_i, 0)
                moe_i = jnp.where(bwd_active, moe_i, 0.0)
            else:
                dx_new, grads, loss_i, cor_i, moe_i = jax.lax.cond(
                    bwd_active, do_bwd, skip_bwd, grads)
            return (y_new, dx_new, x_buf, grads, loss_sum + loss_i, cor_sum + cor_i,
                    moe_sum + moe_i)

        act = jnp.zeros((b, S_loc, H), cfg.dtype)
        init = (act, act, jnp.zeros((B, b, S_loc, H), cfg.dtype), zero_grads,
                jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32),
                jnp.zeros((), jnp.float32))
        _, _, _, grads, loss_sum, cor_sum, moe_sum = jax.lax.fori_loop(0, T, tick, init)

        # grads: cast to param dtype (the reference reduces bf16 buffers), then
        # psum over every axis the in_spec replicates on — dp/zero (the data-
        # parallel grad all-reduce) and pp/tp for shared params.  isp grads
        # already arrived wp-sharded through the gather transpose.
        bs = bspecs if isp_like else _block_pspecs(blocks, gqa_rep)
        _w = w_axes if len(w_axes) > 1 else (w_axes[0] if w_axes else None)
        ch = _w if isp_like else TP
        cs = {"embedding": P(None, ch), "norm": P(), "head": P(None, ch)}
        if norm_bias is not None:
            cs["norm_bias"] = P()
        d_blocks = jax.tree.map(lambda g, p: g.astype(p.dtype), grads["blocks"], blocks)
        d_consts = jax.tree.map(lambda g, p: g.astype(p.dtype), grads["consts"], consts)
        if "moe" in d_blocks and not (isp_like or seq_parallel):
            # mtp: the moe subtree is REPLICATED-compute over tp (mtp
            # activations + identical rng): every tp rank already holds the
            # full cotangent — summing over tp would scale by tp (reference:
            # expert/gate grads reduce over dp only, never tp).  Exclude TP
            # from its psum.  (isp/msp gate DIFFERENT tokens per tp rank, so
            # there the moe grads are partial sums and TP joins the normal
            # boundary psum below.)
            moe_g = {k: d_blocks[k] for k in ("moe",)}
            rest = {k: v for k, v in d_blocks.items() if k != "moe"}
            rest = _boundary_psum(rest, {k: v for k, v in bs.items() if k != "moe"},
                                  ALL_AXES)
            moe_axes = tuple(a for a in ALL_AXES if a != TP)
            moe_g = _boundary_psum(moe_g, {"moe": bs["moe"]}, moe_axes)
            d_blocks = {**rest, **moe_g}
        else:
            d_blocks = _boundary_psum(d_blocks, bs, ALL_AXES)
        d_consts = _boundary_psum(d_consts, cs, ALL_AXES)

        # loss/acc: only the last stage holds nonzero sums; reduce over pp and
        # the batch axes (nll and n_cor are local batch-shard sums); isp/rsp
        # chunks the sequence over tp, so tp joins the reduction
        loss_axes = (PP,) + BATCH_AXES + ((TP,) if isp_like else ())
        is_last = pp_idx == pp - 1
        loss_sum = jax.lax.psum(jnp.where(is_last, loss_sum, 0.0), loss_axes)
        cor_sum = jax.lax.psum(jnp.where(is_last, cor_sum, 0), loss_axes)
        # moe aux accrues on EVERY stage; mean over batch shards (ref dp-avg)
        moe_total = (jax.lax.psum(moe_sum, (PP,) + BATCH_AXES) / n_batch_shards
                     if is_moe else jnp.zeros((), jnp.float32))
        tok_sum = jnp.sum(nvg)
        dnb = d_consts.get("norm_bias", jnp.zeros((), jnp.float32))
        return (loss_sum, tok_sum, cor_sum, moe_total, d_blocks, d_consts["embedding"],
                d_consts["norm"], d_consts["head"], dnb)

    # natural layer order assigns virtual group v = c*pp + s; shard_map slices
    # the layer dim contiguously per stage, so the params must arrive in
    # (stage, chunk) order: stage s's shard holds its C chunks back-to-back
    # (reference interleaved chunk mapping :925-944).  The production path
    # (initialize_model) stores params in this order permanently and passes
    # ``pre_permuted=True`` — no per-step cross-stage weight resharding
    # (reference holds chunk-local weights, ``pipeline_scheduler.py:711+``);
    # checkpoints canonicalize on save/load.  ``pre_permuted=False`` keeps the
    # per-call take/un-take for callers holding natural-order params.
    _permute_here = C > 1 and not pre_permuted
    if _permute_here:
        _layer_perm, _layer_perm_inv = interleaved_layer_layout(cfg.num_layers, pp, C)

    def run(params, batch, rng):
        blocks = params["blocks"]
        if _permute_here:
            blocks = permute_layers(blocks, _layer_perm)
        if isp_like:
            bs = _isp_block_pspecs(blocks, w_axes)
            _w = w_axes if len(w_axes) > 1 else (w_axes[0] if w_axes else None)
            emb_spec = P(None, _w)
        else:
            bs = _block_pspecs(blocks, gqa_rep)
            emb_spec = P(None, TP)
        norm_bias = params.get("norm_bias")
        nb_spec = P()
        batch_spec = P(None, BATCH_AXES)
        M = batch["input_ids"].shape[0]
        if C > 1:
            assert M % pp == 0, (M, pp, "interleaved schedule needs M % pp == 0 (ref :743)")
        args = [blocks, params["embedding"]["weight"], params["norm"],
                params["head"]["kernel"], norm_bias,
                batch["input_ids"], batch["indexes"], batch["segment_ids"], batch["labels"]]
        in_specs = [bs, emb_spec, P(), emb_spec, nb_spec,
                    batch_spec, batch_spec, batch_spec, batch_spec]
        if rng is not None:
            fn = stage_fn
            args.append(rng)
            in_specs.append(P())
        else:
            fn = lambda *a: stage_fn(*a, None)  # noqa: E731
        sm = jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=(P(), P(), P(), P(), bs, emb_spec, P(), emb_spec, nb_spec),
            axis_names=set(ALL_AXES),
            check_vma=False,
        )
        from .sharding import constraints_disabled

        with constraints_disabled():
            (loss_sum, n_tok, n_cor, moe_total, d_blocks,
             d_emb, d_norm, d_head, d_nb) = sm(*args)
        if _permute_here:
            # un-permute block grads back to the natural layer order
            d_blocks = permute_layers(d_blocks, _layer_perm_inv)
        moe_loss = moe_total / M
        loss = loss_sum / M + moe_loss_coeff * moe_loss
        grads = {
            "blocks": jax.tree.map(lambda g: g / M, d_blocks),
            "embedding": {"weight": d_emb / M},
            "norm": d_norm / M,
            "head": {"kernel": d_head / M},
        }
        if norm_bias is not None:
            grads["norm_bias"] = d_nb / M
        return loss, (loss_sum / M, n_tok, n_cor, moe_loss), grads

    @jax.custom_vjp
    def _loss3(params, batch, rng):
        loss, aux, _ = run(params, batch, rng)
        return loss, aux

    def loss_fwd(params, batch, rng):
        loss, aux, grads = run(params, batch, rng)
        return (loss, aux), (grads, batch, rng)

    def loss_bwd(res, ct):
        grads, batch, rng = res
        ct_loss = ct[0] + ct[1][0]  # ce loss is returned twice (primary + aux)
        d_params = jax.tree.map(lambda g: g * ct_loss.astype(g.dtype), grads)

        def zero_ct(x):
            return (np.zeros(x.shape, jax.dtypes.float0)
                    if jnp.issubdtype(x.dtype, jnp.integer) else jnp.zeros_like(x))

        d_batch = jax.tree.map(zero_ct, batch)
        d_rng = jax.tree.map(zero_ct, rng)
        return d_params, d_batch, d_rng

    _loss3.defvjp(loss_fwd, loss_bwd)

    def loss_fn(params, batch, rng=None):
        return _loss3(params, batch, rng)

    return loss_fn
