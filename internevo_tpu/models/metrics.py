"""Streaming training/validation metrics.

Parity: reference ``internlm/model/metrics.py`` — ``AccPerplex`` (:55) streams
token accuracy + perplexity across batches with vocab-shard-aware reductions
(A.5), optional per-dataset-type bins via type_ids scatter; ``LossWithTypeId``
(:246).  Under GSPMD the logits arriving here are global values, so the
TP-group max/gather collectives are implicit; the class keeps the streaming
accumulation + per-type binning behavior.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _batch_stats(logits: jax.Array, labels: jax.Array):
    """Returns (n_correct, n_tokens, nll_sum, per-token nll) for one batch."""
    V = logits.shape[-1]
    flat = logits.reshape(-1, V).astype(jnp.float32)
    lab = labels.reshape(-1)
    valid = lab != -100
    safe = jnp.where(valid, lab, 0)
    pred = jnp.argmax(flat, axis=-1)
    n_correct = jnp.sum((pred == lab) & valid)
    lse = jax.nn.logsumexp(flat, axis=-1)
    picked = jnp.take_along_axis(flat, safe[:, None], axis=-1)[:, 0]
    nll = jnp.where(valid, lse - picked, 0.0)
    return n_correct, jnp.sum(valid), jnp.sum(nll), nll


class AccPerplex:
    """Streaming accuracy/perplexity with optional per-type bins."""

    def __init__(self, device=None, tp_pg=None, dp_pg=None, tokenizer=None,
                 dataset_types: Optional[list] = None):
        self.tokenizer = tokenizer
        self._token_bytes = None  # lazy id -> utf-8 byte-count table for BPB
        self.dataset_types = dataset_types or []
        self.loss_with_type_id = LossWithTypeId(dataset_types=dataset_types)
        self.reset()

    def reset(self):
        self.right = 0
        self.total = 0
        self.total_log_probs = 0.0
        self.total_bytes = 0
        self.type_right = {t: 0 for t in self.dataset_types}
        self.type_total = {t: 0 for t in self.dataset_types}
        self.loss_with_type_id.reset()

    def _bytes_of(self, token_ids: np.ndarray) -> int:
        """utf-8 byte count of the label tokens (reference :125-127 decodes
        sequences; a per-id byte table is equivalent for sentencepiece-style
        vocabularies and O(1) per batch).  NB: for byte-level-BPE vocabularies
        (GPT-2 style) the HF surface form over-counts multi-byte pieces; pass
        a tokenizer exposing only ``decode`` to fall back to exact decoding."""
        tok = self.tokenizer
        if self._token_bytes is None:
            if hasattr(tok, "id_to_piece"):  # sentencepiece
                pieces = [tok.id_to_piece(i) for i in range(tok.vocab_size())]
            elif hasattr(tok, "convert_ids_to_tokens"):  # HF
                pieces = tok.convert_ids_to_tokens(list(range(len(tok))))
            else:
                return sum(len(tok.decode([int(t)]).encode("utf-8")) for t in token_ids)
            self._token_bytes = np.asarray(
                [len(p.replace("\u2581", " ").encode("utf-8")) for p in pieces], np.int64)
        return int(self._token_bytes[np.clip(token_ids, 0, len(self._token_bytes) - 1)].sum())

    def update(self, logits, labels, type_ids=None):
        n_correct, n_tokens, nll, nll_all = _batch_stats(jnp.asarray(logits), jnp.asarray(labels))
        self.right += int(n_correct)
        self.total += int(n_tokens)
        self.total_log_probs += float(nll)
        lab = np.asarray(labels).reshape(-1)
        valid = lab != -100
        if self.tokenizer is not None:
            self.total_bytes += self._bytes_of(lab[valid])
        self.loss_with_type_id.update_from_nll(np.asarray(nll_all), lab, type_ids)
        if type_ids is not None and self.dataset_types:
            pred = np.asarray(jnp.argmax(jnp.asarray(logits).reshape(-1, logits.shape[-1]), axis=-1))
            tid = np.asarray(type_ids).reshape(-1)
            for i, t in enumerate(self.dataset_types):
                m = valid & (tid == i)
                self.type_total[t] += int(m.sum())
                self.type_right[t] += int(((pred == lab) & m).sum())

    def update_from_token_stats(self, nll, correct, labels, type_ids=None):
        """Accumulate from precomputed per-token (nll, correct) arrays — the
        logits-free eval path (``make_eval_step(per_token=True)`` never
        materializes the (tokens, vocab) logits)."""
        nll = np.asarray(nll).reshape(-1)
        cor = np.asarray(correct).reshape(-1)
        lab = np.asarray(labels).reshape(-1)
        valid = lab != -100
        self.right += int(cor.sum())
        self.total += int(valid.sum())
        self.total_log_probs += float(nll.sum())
        if self.tokenizer is not None:
            self.total_bytes += self._bytes_of(lab[valid])
        self.loss_with_type_id.update_from_nll(nll, lab, type_ids)
        if type_ids is not None and self.dataset_types:
            tid = np.asarray(type_ids).reshape(-1)
            n_types = len(self.dataset_types)
            totals = np.bincount(tid[valid], minlength=n_types)
            rights = np.bincount(tid[valid], weights=cor[valid], minlength=n_types)
            for i, t in enumerate(self.dataset_types):
                self.type_total[t] += int(totals[i])
                self.type_right[t] += int(rights[i])

    def __call__(self, logits, labels, type_ids=None):
        self.update(logits, labels, type_ids=type_ids)

    def get_metric(self, reset: bool = True) -> dict:
        total = max(self.total, 1)
        res = {
            "acc": round(self.right / total, 5),
            "perplexity": round(float(np.exp(min(self.total_log_probs / total, 80))), 5),
        }
        if self.tokenizer is not None:
            # reference metrics.py:214: nll-sum over utf-8 bytes
            res["BPB"] = round(self.total_log_probs / max(self.total_bytes, 1), 4)
        for t in self.dataset_types:
            if self.type_total[t] > 0:
                res[f"acc/{t}"] = round(self.type_right[t] / self.type_total[t], 5)
        res.update(self.loss_with_type_id.get_metric(reset=False))
        if reset:
            self.reset()
        return res


class LossWithTypeId:
    """Streaming loss with per-dataset-type bins (reference :246-338: per-token
    CE scattered by type_ids into ds_loss/ds_token_num, reported as
    ``loss/{type}`` — exp of which is the per-type perplexity)."""

    def __init__(self, device=None, dp_pg=None, dataset_types: Optional[list] = None):
        self.dataset_types = dataset_types or []
        self.reset()

    def reset(self):
        self.loss = 0.0
        self.token_num = 0
        self.type_loss = {t: 0.0 for t in self.dataset_types}
        self.type_tokens = {t: 0 for t in self.dataset_types}

    def update(self, logits, labels, type_ids=None):
        _, _, _, nll_all = _batch_stats(jnp.asarray(logits), jnp.asarray(labels))
        self.update_from_nll(np.asarray(nll_all), np.asarray(labels).reshape(-1), type_ids)

    def update_from_nll(self, nll: np.ndarray, labels: np.ndarray, type_ids=None):
        """Accumulate from precomputed per-token nll (shared with AccPerplex)."""
        valid = labels != -100
        self.loss += float(nll[valid].sum())
        self.token_num += int(valid.sum())
        if type_ids is not None and self.dataset_types:
            tid = np.asarray(type_ids).reshape(-1)
            n_types = len(self.dataset_types)
            sums = np.bincount(tid[valid], weights=nll[valid], minlength=n_types)
            counts = np.bincount(tid[valid], minlength=n_types)
            for i, t in enumerate(self.dataset_types):
                self.type_loss[t] += float(sums[i])
                self.type_tokens[t] += int(counts[i])

    def get_metric(self, reset: bool = True) -> dict:
        res = {"loss_from_metric": round(self.loss / max(self.token_num, 1), 4)}
        for t in self.dataset_types:
            if self.type_tokens[t] > 0:
                mean = self.type_loss[t] / self.type_tokens[t]
                res[f"loss/{t}"] = round(mean, 4)
                res[f"perplexity/{t}"] = round(float(np.exp(min(mean, 80))), 4)
        if reset:
            self.reset()
        return res
