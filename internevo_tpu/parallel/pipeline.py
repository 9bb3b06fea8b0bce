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
from jax.sharding import PartitionSpec as P

from ..core.context import PP, TP
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




def _manual_block(cfg: ModelConfig, tp: int, layer: dict, x, positions, segment_ids,
                  seq_parallel: bool = False):
    """One pre-norm block with explicit TP collectives.

    mtp (seq_parallel=False): activations replicated over tp inside the block;
    row-parallel matmuls end in psum (reference ``MegatronFusedDenseFunc``).

    msp/fsp (seq_parallel=True): activations between blocks are sequence-
    sharded over tp — all-gather the sequence before the column matmuls,
    reduce-scatter after the row matmuls (reference ``model/utils.py:258-345``).
    Residual/norm run on the local seq shard; the pipeline ring then carries
    1/tp of the activation bytes.
    """
    # replicated params (norms, row-linear biases) receive rank-varying
    # cotangents in seq-parallel mode; the shard_map boundary psums cotangents
    # over unmentioned axes (probed; see _boundary_psum), which IS the Megatron
    # sequence-parallel layernorm/bias grad all-reduce — no extra hook needed.
    residual = x
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
    q = apply_rotary(q, cos, sin)
    k = apply_rotary(k, cos, sin)
    ctx = flash_attention(q, k, v, segment_ids=segment_ids,
                          softmax_scale=1.0 / math.sqrt(cfg.head_dim), causal=True,
                          max_segment_len=cfg.max_segment_len)
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

    residual = (attn_out + residual).astype(residual.dtype)
    h = _norm(cfg, residual, layer["norm2"], layer.get("norm2_bias"))
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
    return (mlp_out + residual).astype(jnp.float32 if cfg.residual_in_fp32 else cfg.dtype)


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


def _stage_blocks_apply(cfg: ModelConfig, tp: int, blocks_local, x, positions, segment_ids,
                        seq_parallel: bool = False):
    """Apply this stage's layer group with the `checkpoint` FRACTION honored
    per group (mirrors model_forward's split): the first round(L_local * f)
    local layers full-remat (flash residuals saved), the rest use the
    everything-cheap-saveable policy."""
    L_local = jax.tree.leaves(blocks_local)[0].shape[0]
    n_full = int(round(L_local * cfg.checkpoint))
    save_names = ["flash_out", "flash_lse"]
    if cfg.remat_save_mlp:
        save_names += ["mlp_w1o", "mlp_w3o"]

    def make_body(policy):
        body = jax.checkpoint(
            lambda layer, h: _manual_block(cfg, tp, layer, h, positions, segment_ids, seq_parallel),
            policy=policy, prevent_cse=False,
        )
        return lambda h, layer: (body(layer, h), None)

    full = make_body(jax.checkpoint_policies.save_only_these_names(*save_names))
    light = make_body(jax.checkpoint_policies.dots_with_no_batch_dims_saveable)

    if cfg.residual_in_fp32:
        x = x.astype(jnp.float32)
    if n_full >= L_local:
        out, _ = jax.lax.scan(full, x, blocks_local)
    elif n_full == 0:
        out, _ = jax.lax.scan(light, x, blocks_local)
    else:
        head = jax.tree.map(lambda a: a[:n_full], blocks_local)
        tail = jax.tree.map(lambda a: a[n_full:], blocks_local)
        x, _ = jax.lax.scan(full, x, head)
        out, _ = jax.lax.scan(light, x, tail)
    return out.astype(cfg.dtype) if cfg.residual_in_fp32 else out


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


def pipeline_loss_fn(cfg: ModelConfig, mesh, pp: int, label_smoothing: float = 0.0,
                     num_chunks: int = 1, tp_mode: str = "mtp"):
    """Returns ``loss_fn(params, batch) -> (loss, (loss, n_tokens, n_correct))``.

    One true-1F1B implementation covers both schedules: ``num_chunks == 1``
    is the reference ``PipelineScheduler`` (``pipeline_scheduler.py:111-708``),
    ``num_chunks > 1`` the interleaved ``InterleavedPipelineScheduler``
    (:711-1430; requires M % pp == 0, :743).  The bubble shrinks from
    (pp-1)/(M+pp-1) to (pp-1)/(M*C+pp-1); live state stays O(C*pp).
    """
    return _1f1b_loss_fn(cfg, mesh, pp, label_smoothing, tp_mode, num_chunks)


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
    bs["w1"] = {"kernel": P(PP, None, TP)}
    bs["w3"] = {"kernel": P(PP, None, TP)}
    bs["w2"] = {"kernel": P(PP, TP, None)}
    if "bias" in blocks["w1"]:
        bs["w1"]["bias"] = P(PP, TP)
        bs["w3"]["bias"] = P(PP, TP)
        bs["w2"]["bias"] = P(PP)
    return bs




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
                  tp_mode: str = "mtp", num_chunks: int = 1):
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
    gqa_rep = cfg.num_kv_attention_heads % tp != 0
    if gqa_rep:
        assert tp % cfg.num_kv_attention_heads == 0 and cfg.num_attention_heads % tp == 0, \
            (cfg.num_attention_heads, cfg.num_kv_attention_heads, tp)
    assert cfg.num_layers % (pp * C) == 0, (cfg.num_layers, pp, C)
    seq_parallel = tp_mode in ("msp", "fsp") and tp > 1

    def stage_fn(blocks, embedding, norm, head, norm_bias,
                 input_ids, positions, segment_ids, labels):
        pp_idx = jax.lax.axis_index(PP)
        tp_idx = jax.lax.axis_index(TP)
        M, b, S = input_ids.shape  # b = LOCAL batch (dp/zero are manual here)
        H = cfg.hidden_size
        S_loc = S // tp if seq_parallel else S
        consts = {"embedding": embedding, "norm": norm, "head": head}
        if norm_bias is not None:
            consts["norm_bias"] = norm_bias

        # per-micro GLOBAL valid-token counts: the CE normalizer (precomputed
        # so backward seeds need no collective inside the loop)
        nvg = jax.lax.psum(jnp.sum(labels != -100, axis=(1, 2)), BATCH_AXES)
        nvg_f = jnp.maximum(nvg, 1).astype(jnp.float32)

        if C > 1:
            Lg = blocks["norm1"].shape[0] // C  # local layers per chunk

        def micro_fn(blocks_, consts_, x, m, c):
            """One (micro m, chunk c) unit on this stage: embed at the first
            virtual stage, the chunk's layer group, head + CE (local nll SUM)
            at the last virtual stage."""
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

            def embed():
                ids = jax.lax.dynamic_index_in_dim(input_ids, m, 0, keepdims=False)
                e = _manual_embed(cfg, tp, consts_["embedding"], ids)
                if seq_parallel:
                    e = jax.lax.dynamic_slice_in_dim(e, tp_idx * S_loc, S_loc, axis=1)
                return e

            x_eff = jax.lax.cond(is_entry, embed, lambda: x)
            h = _stage_blocks_apply(cfg, tp, local, x_eff, pos, seg, seq_parallel)

            def head_branch():
                y = h
                lab = jax.lax.dynamic_index_in_dim(labels, m, 0, keepdims=False)
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
            return (h, nll_sum), n_cor

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

        def tick(t, carry):
            y_send, dx_send, x_buf, grads, loss_sum, cor_sum = carry
            recv_x = jax.lax.ppermute(y_send, PP, perm_fwd)
            recv_dy = jax.lax.ppermute(dx_send, PP, perm_bwd)

            # ------------------------------------------------ forward substep
            u_f = t - pp_idx
            m_f, c_f = decode(jnp.clip(u_f, 0, U - 1))
            is_last_virtual_f = jnp.logical_and(pp_idx == pp - 1, c_f == C - 1)
            fwd_active = jnp.logical_and(
                jnp.logical_and(u_f >= 0, u_f < U),
                jnp.logical_not(is_last_virtual_f))

            def do_fwd():
                (h, _nll), _ = micro_fn(blocks, consts, recv_x, m_f, c_f)
                return h

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

            def do_bwd(grads):
                x_in = jnp.where(
                    is_last_virtual_b, recv_x,
                    jax.lax.dynamic_index_in_dim(x_buf, u_unit % B, 0, keepdims=False))
                (_, nll_sum), vjp_fn, n_cor = jax.vjp(
                    lambda bl, co, x: micro_fn(bl, co, x, m_b, c_b),
                    blocks, consts, x_in, has_aux=True)
                ct_y = jnp.where(is_last_virtual_b, jnp.zeros_like(dx_send), recv_dy)
                # d(total_loss)/d(nll_sum_m) = 1 / n_valid_global[m] (div by M
                # outside); zero off the head unit
                ct_nll = jnp.where(is_last_virtual_b, 1.0 / nvg_f[m_b], 0.0)
                d_blocks, d_consts, dx = vjp_fn((ct_y, ct_nll.astype(nll_sum.dtype)))
                grads = {
                    "blocks": jax.tree.map(lambda a, g: a + g.astype(jnp.float32),
                                           grads["blocks"], d_blocks),
                    "consts": jax.tree.map(lambda a, g: a + g.astype(jnp.float32),
                                           grads["consts"], d_consts),
                }
                return dx, grads, nll_sum / nvg_f[m_b], n_cor

            def skip_bwd(grads):
                return (jnp.zeros_like(dx_send), grads, jnp.zeros((), jnp.float32),
                        jnp.zeros((), jnp.int32))

            dx_new, grads, loss_i, cor_i = jax.lax.cond(bwd_active, do_bwd, skip_bwd, grads)
            return (y_new, dx_new, x_buf, grads, loss_sum + loss_i, cor_sum + cor_i)

        act = jnp.zeros((b, S_loc, H), cfg.dtype)
        init = (act, act, jnp.zeros((B, b, S_loc, H), cfg.dtype), zero_grads,
                jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32))
        _, _, _, grads, loss_sum, cor_sum = jax.lax.fori_loop(0, T, tick, init)

        # grads: cast to param dtype (the reference reduces bf16 buffers), then
        # psum over every axis the in_spec replicates on — dp/zero (the data-
        # parallel grad all-reduce) and pp/tp for shared params
        bs = _block_pspecs(blocks, gqa_rep)
        cs = {"embedding": P(None, TP), "norm": P(), "head": P(None, TP)}
        if norm_bias is not None:
            cs["norm_bias"] = P()
        d_blocks = jax.tree.map(lambda g, p: g.astype(p.dtype), grads["blocks"], blocks)
        d_consts = jax.tree.map(lambda g, p: g.astype(p.dtype), grads["consts"], consts)
        d_blocks = _boundary_psum(d_blocks, bs, ALL_AXES)
        d_consts = _boundary_psum(d_consts, cs, ALL_AXES)

        # loss/acc: only the last stage holds nonzero sums; reduce over pp and
        # the batch axes (nll and n_cor are local batch-shard sums)
        is_last = pp_idx == pp - 1
        loss_sum = jax.lax.psum(jnp.where(is_last, loss_sum, 0.0), (PP,) + BATCH_AXES)
        cor_sum = jax.lax.psum(jnp.where(is_last, cor_sum, 0), (PP,) + BATCH_AXES)
        tok_sum = jnp.sum(nvg)
        dnb = d_consts.get("norm_bias", jnp.zeros((), jnp.float32))
        return (loss_sum, tok_sum, cor_sum, d_blocks, d_consts["embedding"],
                d_consts["norm"], d_consts["head"], dnb)

    # natural layer order assigns virtual group v = c*pp + s; shard_map slices
    # the layer dim contiguously per stage, so permute groups into (stage,
    # chunk) order: stage s's shard holds its C chunks back-to-back (reference
    # interleaved chunk mapping :925-944).  The permutation and its inverse
    # come from the SAME index array (computed once here).
    # NB: the take/un-take pair runs inside every train step and reshards
    # (C-1)/C of the block weights across stages; storing the params in
    # pipeline order at init would save that traffic, at the cost of a
    # checkpoint-layout canonicalization on save/load — revisit if interleaved
    # pp becomes the production topology.
    if C > 1:
        _Lg_all = cfg.num_layers // (C * pp)
        _group_order = [c * pp + s for s in range(pp) for c in range(C)]
        _layer_perm = np.asarray(
            [v * _Lg_all + i for v in _group_order for i in range(_Lg_all)])
        _layer_perm_inv = np.argsort(_layer_perm)

    def run(params, batch):
        blocks = params["blocks"]
        if C > 1:
            blocks = jax.tree.map(
                lambda a: jnp.take(a, jnp.asarray(_layer_perm), axis=0), blocks)
        bs = _block_pspecs(blocks, gqa_rep)
        norm_bias = params.get("norm_bias")
        nb_spec = P()
        batch_spec = P(None, BATCH_AXES)
        M = batch["input_ids"].shape[0]
        if C > 1:
            assert M % pp == 0, (M, pp, "interleaved schedule needs M % pp == 0 (ref :743)")
        sm = jax.shard_map(
            stage_fn,
            mesh=mesh,
            in_specs=(bs, P(None, TP), P(), P(None, TP), nb_spec,
                      batch_spec, batch_spec, batch_spec, batch_spec),
            out_specs=(P(), P(), P(), bs, P(None, TP), P(), P(None, TP), nb_spec),
            axis_names=set(ALL_AXES),
            check_vma=False,
        )
        from .sharding import constraints_disabled

        with constraints_disabled():
            (loss_sum, n_tok, n_cor, d_blocks, d_emb, d_norm, d_head, d_nb) = sm(
                blocks, params["embedding"]["weight"], params["norm"],
                params["head"]["kernel"], norm_bias,
                batch["input_ids"], batch["indexes"], batch["segment_ids"], batch["labels"],
            )
        if C > 1:
            # un-permute block grads back to the natural layer order
            d_blocks = jax.tree.map(
                lambda g: jnp.take(g, jnp.asarray(_layer_perm_inv), axis=0), d_blocks)
        loss = loss_sum / M
        grads = {
            "blocks": jax.tree.map(lambda g: g / M, d_blocks),
            "embedding": {"weight": d_emb / M},
            "norm": d_norm / M,
            "head": {"kernel": d_head / M},
        }
        if norm_bias is not None:
            grads["norm_bias"] = d_nb / M
        return loss, (n_tok, n_cor), grads

    @jax.custom_vjp
    def loss_fn(params, batch):
        loss, (n_tok, n_cor), _ = run(params, batch)
        return loss, (loss, n_tok, n_cor)

    def loss_fwd(params, batch):
        loss, (n_tok, n_cor), grads = run(params, batch)
        return (loss, (loss, n_tok, n_cor)), (grads, batch)

    def loss_bwd(res, ct):
        grads, batch = res
        ct_loss = ct[0] + ct[1][0]  # loss is returned twice (primary + aux)
        d_params = jax.tree.map(lambda g: g * ct_loss.astype(g.dtype), grads)
        d_batch = jax.tree.map(
            lambda x: np.zeros(x.shape, jax.dtypes.float0)
            if jnp.issubdtype(x.dtype, jnp.integer) else jnp.zeros_like(x),
            batch)
        return d_params, d_batch

    loss_fn.defvjp(loss_fwd, loss_bwd)
    return loss_fn
