"""Sequence generation with kv-cache.

Parity: reference ``internlm/apis/inference.py`` — ``SequenceGenerator`` (:66)
with greedy / sampling / beam search (:188,:257,:477), ``InferenceParams``
kv-cache (:13) updated inside attention (``multi_head_attention.py:240-294``),
and top-k/top-p filtering (:925).

TPU-native: prefill is one forward over the prompt; the WHOLE decode loop then
runs on-device as a single jitted ``lax.while_loop`` (sampling, repetition
penalty, eos tracking and the kv-cache update all inside) — one dispatch per
generate() call instead of one per token, which matters when launch latency
rivals the per-token compute (small models, remote dispatch).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.base import ModelConfig, _dense, _norm, split_qkv
from ..ops.rotary import apply_rotary, dynamic_ntk_frequencies, rope_frequencies


@dataclasses.dataclass
class InferenceParams:
    """kv-cache container (reference ``inference.py:13``)."""

    max_sequence_len: int
    max_batch_size: int
    sequence_len_offset: int = 0
    key_value_memory_dict: dict = dataclasses.field(default_factory=dict)

    def reorder_state(self, indices):
        self.key_value_memory_dict = jax.tree.map(
            lambda c: jnp.take(c, indices, axis=1), self.key_value_memory_dict
        )


def init_kv_cache(cfg: ModelConfig, batch_size: int, max_len: int) -> dict:
    L, Hkv, D = cfg.num_layers, cfg.num_kv_attention_heads, cfg.head_dim
    return {
        "k": jnp.zeros((L, batch_size, max_len, Hkv, D), cfg.dtype),
        "v": jnp.zeros((L, batch_size, max_len, Hkv, D), cfg.dtype),
    }


def _cached_attention(cfg: ModelConfig, q, k_cache, v_cache, cache_len):
    """q: (B, T, Hq, D); caches: (B, maxS, Hkv, D); positions < cache_len valid."""
    B, T, Hq, D = q.shape
    Hkv = k_cache.shape[2]
    n_rep = Hq // Hkv
    maxS = k_cache.shape[1]
    k = jnp.broadcast_to(k_cache[:, :, :, None, :], (B, maxS, Hkv, n_rep, D)).reshape(B, maxS, Hq, D)
    v = jnp.broadcast_to(v_cache[:, :, :, None, :], (B, maxS, Hkv, n_rep, D)).reshape(B, maxS, Hq, D)
    scale = 1.0 / math.sqrt(D)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    kv_pos = jnp.arange(maxS)[None, None, None, :]
    q_pos = (cache_len - T) + jnp.arange(T)[None, None, :, None]
    mask = kv_pos <= q_pos
    logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out.astype(q.dtype)


def model_decode_step(cfg: ModelConfig, params: dict, input_ids: jax.Array,
                      kv_cache: dict, cache_index: jax.Array):
    """Forward T tokens appending to the cache at ``cache_index``.

    Returns (logits (B, T, V), new_kv_cache).  Used both for prefill (T =
    prompt length) and decode (T = 1).
    """
    B, T = input_ids.shape
    positions = cache_index + jnp.arange(T)[None, :]
    emb = params["embedding"]["weight"]
    x = jnp.take(emb, input_ids, axis=0).astype(cfg.dtype)

    if cfg.use_dynamic_ntk_rope:
        # decode past the training window rescales the rope base (reference
        # DynamicNTKScalingRotaryEmbedding, wired when seq > max_position_embeddings)
        cos, sin = dynamic_ntk_frequencies(
            positions, cfg.head_dim, cfg.rope_base,
            cfg.max_position_embeddings, seq_len=cache_index + T)
    else:
        cos, sin = rope_frequencies(positions, cfg.head_dim, base=cfg.rope_base)

    def layer_step(h, inputs):
        layer, k_cache_l, v_cache_l = inputs
        residual = h
        hn = _norm(cfg, residual, layer["norm1"], layer.get("norm1_bias"))
        qkv = _dense(hn, layer["wqkv"]["kernel"], layer["wqkv"].get("bias"))
        q, k, v = split_qkv(cfg, qkv)
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)
        k_cache_l = jax.lax.dynamic_update_slice(k_cache_l, k, (0, cache_index, 0, 0))
        v_cache_l = jax.lax.dynamic_update_slice(v_cache_l, v, (0, cache_index, 0, 0))
        ctx = _cached_attention(cfg, q, k_cache_l, v_cache_l, cache_index + T)
        ctx = ctx.reshape(B, T, -1)
        attn_out = _dense(ctx, layer["out_proj"]["kernel"], layer["out_proj"].get("bias"))
        residual = attn_out + residual
        hn = _norm(cfg, residual, layer["norm2"], layer.get("norm2_bias"))
        w1o = _dense(hn, layer["w1"]["kernel"], layer["w1"].get("bias"))
        w3o = _dense(hn, layer["w3"]["kernel"], layer["w3"].get("bias"))
        mlp_out = _dense(jax.nn.silu(w1o) * w3o, layer["w2"]["kernel"], layer["w2"].get("bias"))
        return (mlp_out + residual).astype(cfg.dtype), (k_cache_l, v_cache_l)

    h = x
    # python loop over layers: decode graphs are small; scan would also work.
    # each layer's cache slice updates in place (dynamic_update_index_in_dim
    # on the donated stacked buffer) — re-stacking copied the whole cache
    # every decode step
    for lidx in range(cfg.num_layers):
        layer = jax.tree.map(lambda a: a[lidx], params["blocks"])
        h, (k_l, v_l) = layer_step(h, (layer, kv_cache["k"][lidx], kv_cache["v"][lidx]))
        kv_cache = {
            "k": jax.lax.dynamic_update_index_in_dim(kv_cache["k"], k_l, lidx, 0),
            "v": jax.lax.dynamic_update_index_in_dim(kv_cache["v"], v_l, lidx, 0),
        }

    other = {"norm": params["norm"], "head": params["head"]}
    if "norm_bias" in params:
        other["norm_bias"] = params["norm_bias"]
    h = _norm(cfg, h, other["norm"], other.get("norm_bias"))
    w = other["head"]["kernel"]
    if cfg.norm_head:
        norm = jnp.linalg.norm(w.astype(jnp.float32), axis=0, keepdims=True)
        w = (w / (norm + 1e-7)).astype(w.dtype)
    logits = jnp.dot(h, w.astype(h.dtype)).astype(jnp.float32)
    return logits, kv_cache


def top_k_top_p_filtering(logits: jax.Array, top_k: int = 0, top_p: float = 1.0,
                          filter_value: float = -float("inf")) -> jax.Array:
    """Reference ``inference.py:925`` semantics."""
    if top_k > 0:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, filter_value, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_mask = cum - probs > top_p  # keep tokens until cum prob exceeds top_p
        sorted_filtered = jnp.where(cutoff_mask, filter_value, sorted_logits)
        threshold = jnp.min(jnp.where(cutoff_mask, jnp.inf, sorted_logits), axis=-1, keepdims=True)
        logits = jnp.where(logits < threshold, filter_value, logits)
    return logits


def _decode_loop(cfg: ModelConfig, params: dict, out: jax.Array, kv_cache: dict,
                 next_logits: jax.Array, prompt_len: jax.Array, rng: jax.Array,
                 seen_mask: jax.Array, *, max_length: int, do_sample: bool,
                 temperature: float, top_k: int, top_p: float,
                 repetition_penalty: float, pad_id: int, eos_ids: tuple):
    """Whole-generation decode as ONE on-device ``lax.while_loop``.

    Carry: (cur, out (B, max_length), kv_cache, last-step logits, rng,
    seen-token mask, finished).  Exits early once every row has emitted an
    eos.  Returns (cur, out) — the host slices ``out[:, :cur]``.
    """
    B = next_logits.shape[0]
    eos_arr = jnp.asarray(eos_ids, jnp.int32)

    def cond(c):
        cur, _out, _kv, _lg, _rng, _seen, finished = c
        return jnp.logical_and(cur < max_length, jnp.logical_not(jnp.all(finished)))

    def body(c):
        cur, out, kv, lg, rng, seen, finished = c
        step_logits = lg / max(temperature, 1e-6)
        if repetition_penalty != 1.0:
            step_logits = jnp.where(
                seen,
                jnp.where(step_logits > 0, step_logits / repetition_penalty,
                          step_logits * repetition_penalty),
                step_logits)
        if do_sample:
            step_logits = top_k_top_p_filtering(step_logits, top_k=top_k, top_p=top_p)
            rng, sub = jax.random.split(rng)
            tok = jax.random.categorical(sub, step_logits, axis=-1).astype(jnp.int32)
        else:
            tok = jnp.argmax(step_logits, axis=-1).astype(jnp.int32)
        tok = jnp.where(finished, pad_id, tok)
        out = jax.lax.dynamic_update_slice(out, tok[:, None], (0, cur))
        if repetition_penalty != 1.0:  # the (B, V) scatter is dead work otherwise
            seen = seen.at[jnp.arange(B), tok].set(True)
        finished = jnp.logical_or(finished, jnp.any(tok[:, None] == eos_arr[None, :], axis=1))

        # skip the model forward when no further token will be sampled (the
        # last loop iteration would otherwise pay a full decode step for
        # logits nobody reads)
        more = jnp.logical_and(cur + 1 < max_length, jnp.logical_not(jnp.all(finished)))
        lg_new, kv = jax.lax.cond(
            more,
            lambda kv_: model_decode_step(cfg, params, tok[:, None], kv_, cur),
            lambda kv_: (jnp.zeros((B, 1) + lg.shape[1:], lg.dtype), kv_),
            kv)
        return (cur + 1, out, kv, lg_new[:, -1, :], rng, seen, finished)

    init = (prompt_len, out, kv_cache, next_logits, rng, seen_mask,
            jnp.zeros((B,), bool))
    cur, out, _kv, _lg, _rng, _seen, _fin = jax.lax.while_loop(cond, body, init)
    return cur, out


def _beam_loop(cfg: ModelConfig, params: dict, out: jax.Array, kv: dict,
               last_tok: jax.Array, scores: jax.Array, finished: jax.Array,
               cur0: jax.Array, *, B: int, nb: int, max_length: int,
               temperature: float, pad_id: int, eos_ids: tuple):
    """Whole beam search as ONE on-device ``lax.while_loop``: decode the last
    beam tokens, expand to (nb * V) candidates per group, keep the per-group
    top nb (frozen beams persist via a single pad candidate carrying their
    score), reorder the rows of ``out`` and the kv caches with the beam
    backpointers.  Mirrors the reference's batched beam
    (``inference.py:560+``) with the host loop collapsed to one dispatch."""
    eos_arr = jnp.asarray(eos_ids, jnp.int32)

    def cond(c):
        cur, _out, _kv, _last, _scores, finished = c
        return jnp.logical_and(cur < max_length, jnp.logical_not(jnp.all(finished)))

    def body(c):
        cur, out, kv, last, scores, finished = c
        lg, kv = model_decode_step(cfg, params, last[:, None], kv, cur - 1)
        logp = jax.nn.log_softmax(
            lg[:, -1, :] / max(temperature, 1e-6), axis=-1).reshape(B, nb, -1)
        V = logp.shape[-1]
        pad_onehot = jnp.arange(V)[None, None, :] == pad_id
        cand = jnp.where(
            finished[:, :, None],
            jnp.where(pad_onehot, scores[:, :, None], -1e9),
            scores[:, :, None] + logp)
        top_s, best = jax.lax.top_k(cand.reshape(B, nb * V), nb)  # (B, nb)
        beam_loc, tok = best // V, best % V
        beam_idx = (jnp.arange(B)[:, None] * nb + beam_loc).reshape(-1)
        out = jnp.take(out, beam_idx, axis=0)
        fin_flat = jnp.take(finished.reshape(-1), beam_idx)
        tok_flat = tok.reshape(-1).astype(jnp.int32)
        new_tok = jnp.where(fin_flat, pad_id, tok_flat)
        out = jax.lax.dynamic_update_slice(out, new_tok[:, None], (0, cur))
        is_eos = jnp.any(tok_flat[:, None] == eos_arr[None, :], axis=1)
        finished = jnp.logical_or(fin_flat, is_eos).reshape(B, nb)
        kv = jax.tree.map(lambda a: jnp.take(a, beam_idx, axis=1), kv)
        return (cur + 1, out, kv, new_tok, top_s, finished)

    init = (cur0, out, kv, last_tok, scores, finished)
    cur, out, _kv, _last, scores, finished = jax.lax.while_loop(cond, body, init)
    return cur, out, scores, finished


class SequenceGenerator:
    """Greedy / sampling / beam generation (reference ``inference.py:66``)."""

    def __init__(self, decoder, tokenizer=None, bos_token_id: int = 1,
                 pad_token_id: int = 0, eos_token_id: int = 2,
                 additional_eos_token_list=None):
        """``decoder``: (model ModelDef, params) pair or object with .config/.params."""
        if isinstance(decoder, tuple):
            self.model, self.params = decoder
        else:
            self.model, self.params = decoder.model, decoder.params
        self.cfg: ModelConfig = self.model.config
        self.bos_token_id = bos_token_id
        self.pad_token_id = pad_token_id
        self.eos_token_id = eos_token_id
        self.additional_eos = set(additional_eos_token_list or [])
        self._decode_jit = jax.jit(partial(model_decode_step, self.cfg), donate_argnums=(2,))
        self._loop_cache = {}  # (B, max_length, sampling knobs) -> jitted fused loop

    def generate(self, tokens: Optional[jax.Array] = None, num_return_sequences: int = 1,
                 max_length: int = 64, do_sample: bool = False,
                 temperature: float = 1.0, top_k: int = 50, top_p: float = 1.0,
                 repetition_penalty: float = 1.0, length_penalty: float = 1.0,
                 seed: int = 0) -> jax.Array:
        if tokens is None:
            tokens = jnp.full((1, 1), self.bos_token_id, jnp.int32)
        tokens = jnp.asarray(tokens, jnp.int32)
        B, prompt_len = tokens.shape
        if num_return_sequences > 1:
            tokens = jnp.repeat(tokens, num_return_sequences, axis=0)
            B = B * num_return_sequences

        kv_cache = init_kv_cache(self.cfg, B, max_length)
        logits, kv_cache = self._decode_jit(self.params, tokens, kv_cache, jnp.zeros((), jnp.int32))
        next_logits = logits[:, -1, :]

        V = next_logits.shape[-1]
        out0 = jnp.full((B, max_length), self.pad_token_id, jnp.int32)
        out0 = jax.lax.dynamic_update_slice(out0, tokens, (0, 0))
        # streaming (B, V) seen-token mask: the repetition penalty runs on
        # device as one gather-free select (reference loops tokens in python,
        # inference.py:925 repetition_penalty region)
        seen0 = jnp.zeros((B, V), bool).at[jnp.arange(B)[:, None], tokens].set(True)
        eos_ids = tuple(sorted({self.eos_token_id} | self.additional_eos))

        key = (B, max_length, bool(do_sample), float(temperature), int(top_k),
               float(top_p), float(repetition_penalty), eos_ids)
        loop = self._loop_cache.get(key)
        if loop is None:
            loop = jax.jit(partial(
                _decode_loop, self.cfg, max_length=max_length, do_sample=do_sample,
                temperature=temperature, top_k=top_k, top_p=top_p,
                repetition_penalty=repetition_penalty, pad_id=self.pad_token_id,
                eos_ids=eos_ids), donate_argnums=(2, 3))
            self._loop_cache[key] = loop
        cur, out = loop(self.params, out0, kv_cache, next_logits,
                        jnp.asarray(prompt_len, jnp.int32), jax.random.PRNGKey(seed), seen0)
        return out[:, : int(cur)]

    # parity aliases (reference greedy_generate/sample_generate :188,:257)
    def greedy_generate(self, tokens, **kw):
        kw.pop("do_sample", None)
        return self.generate(tokens, do_sample=False, **kw)

    def sample_generate(self, tokens, **kw):
        kw.pop("do_sample", None)
        return self.generate(tokens, do_sample=True, **kw)

    def beam_search_generate(self, tokens, num_beams: int = 4, max_length: int = 64,
                             length_penalty: float = 1.0, temperature: float = 1.0) -> jax.Array:
        """Beam search (reference ``_beam_search_generate``, inference.py:560+):
        expand the batch to num_beams, keep per-step top beams by cumulative
        log-prob, reorder kv caches with the beam backpointers, apply length
        penalty at finalization."""
        tokens = jnp.asarray(tokens, jnp.int32)
        B, prompt_len = tokens.shape
        nb = num_beams
        # beams live flattened as (B * nb) rows; beam group b occupies rows
        # [b*nb, (b+1)*nb) (reference batched beam, inference.py:560+)
        beams = jnp.repeat(tokens, nb, axis=0)

        kv_cache = init_kv_cache(self.cfg, B * nb, max_length)
        logits, kv_cache = self._decode_jit(self.params, beams, kv_cache, jnp.zeros((), jnp.int32))
        logp = jax.nn.log_softmax(logits[:, -1, :] / max(temperature, 1e-6), axis=-1)

        V = logp.shape[-1]
        # first expansion: beams within a group share the prompt; take each
        # group's top nb tokens from its first beam
        top_lp, top_tok = jax.lax.top_k(logp[::nb], nb)      # (B, nb)
        out = np.full((B * nb, max_length), self.pad_token_id, np.int32)
        out[:, :prompt_len] = np.asarray(beams)
        out[:, prompt_len] = np.asarray(top_tok).reshape(-1)
        scores = np.asarray(top_lp, np.float64).reshape(B, nb)
        finished = np.zeros((B, nb), bool)
        eos_set = {self.eos_token_id} | self.additional_eos

        eos_ids = tuple(sorted(eos_set))
        key = ("beam", B, nb, max_length, float(temperature), eos_ids)
        loop = self._loop_cache.get(key)
        if loop is None:
            loop = jax.jit(partial(
                _beam_loop, self.cfg, B=B, nb=nb, max_length=max_length,
                temperature=temperature, pad_id=self.pad_token_id,
                eos_ids=eos_ids), donate_argnums=(1, 2))
            self._loop_cache[key] = loop
        out0 = jnp.asarray(out)
        last0 = out0[:, prompt_len]
        cur, out_d, scores_d, fin_d = loop(
            self.params, out0, kv_cache, last0,
            jnp.asarray(scores, jnp.float32),
            jnp.asarray(finished),
            jnp.asarray(prompt_len + 1, jnp.int32))
        cur = int(cur)
        out = np.asarray(out_d)
        scores = np.asarray(scores_d, np.float64)

        lengths = (out != self.pad_token_id).sum(axis=1).reshape(B, nb)
        final = scores / (lengths.astype(np.float64) ** length_penalty)
        best_beam = np.argmax(final, axis=1)                           # (B,)
        rows = np.arange(B) * nb + best_beam
        return jnp.asarray(out[rows, :cur])
