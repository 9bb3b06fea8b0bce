"""Fused final-norm + head matmul + cross-entropy, chunked over tokens.

The TPU-native equivalent of flash-attn's inplace-backward parallel
cross-entropy (reference ``losses/ce_loss.py:27``): the reference avoids
materializing softmax over the full vocab; here we additionally avoid
materializing the LOGITS — for InternLM-7B (vocab 103168) full fp32 logits are
~1.7GB per micro batch, the single largest activation.

Mechanism: scan over token chunks; each chunk computes logits -> nll/argmax and
is wrapped in ``jax.checkpoint``, so backward recomputes the chunk's logits and
forms dH and dW incrementally (the scan transpose accumulates dW).  Everything
downstream of the final norm lives at chunk granularity.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from .norm import rms_norm


def gpc_loss_knobs() -> dict:
    """Resolve ``loss.save_ce_logits`` / ``loss.ce_chunk_size`` from the
    launched config.  Called by the TRAINER call sites and passed down
    explicitly — the op itself takes parameters, not global state."""
    try:
        from ..core.context import gpc

        lc = dict(gpc.config.get("loss", {})) if getattr(gpc, "config", None) is not None else {}
    except Exception:
        lc = {}
    save = lc.get("save_ce_logits")
    return {
        "save_logits": None if save is None else bool(save),
        "chunk_size": int(lc.get("ce_chunk_size", 0)) or None,
    }


def fused_norm_head_ce(
    hidden: jax.Array,            # (B, S, H) pre-final-norm activations
    norm_weight: jax.Array,       # (H,)
    head_kernel: jax.Array,       # (H, V)
    labels: jax.Array,            # (B, S) int, -100 ignored
    *,
    eps: float = 1e-5,
    embed_grad_scale: float = 1.0,
    norm_head: bool = False,
    label_smoothing: float = 0.0,
    chunk_size: int = None,
    compute_acc: bool = True,
    save_logits: bool = None,
):
    """Returns (nll_sum fp32, n_valid, n_correct)."""
    B, S, H = hidden.shape
    V = head_kernel.shape[1]
    tokens = B * S
    flat_h = hidden.reshape(tokens, H)
    flat_lab = labels.reshape(tokens)

    import os

    chunk_size = chunk_size or int(os.environ.get("IEVO_CE_CHUNK", "0")) or 512
    chunk_size = min(chunk_size, tokens)
    # pad to a multiple of chunk_size with ignored labels
    rem = (-tokens) % chunk_size
    if rem:
        flat_h = jnp.concatenate([flat_h, jnp.zeros((rem, H), flat_h.dtype)])
        flat_lab = jnp.concatenate([flat_lab, jnp.full((rem,), -100, flat_lab.dtype)])
    nc = flat_h.shape[0] // chunk_size
    h_chunks = flat_h.reshape(nc, chunk_size, H)
    lab_chunks = flat_lab.reshape(nc, chunk_size)

    w = head_kernel
    if embed_grad_scale != 1:
        w = embed_grad_scale * w + (1 - embed_grad_scale) * jax.lax.stop_gradient(w)
    if norm_head:
        norm = jnp.linalg.norm(w.astype(jnp.float32), axis=0, keepdims=True)
        w = (w / jax.lax.stop_gradient(norm + 1e-7)).astype(w.dtype)

    # save-logits mode: keep each chunk's bf16 logits as a remat residual so
    # the backward skips the logits recompute matmul (one full head matmul,
    # ~18ms/step = +3.6pp MFU at 7B dims).  Costs tokens*V*2 bytes of HBM
    # (845MB at 7B micro shapes) — opt in (config ``loss.save_ce_logits``,
    # threaded by the trainer call sites, or env IEVO_CE_SAVE_LOGITS=1)
    # where memory allows; default recomputes.
    env_sl = os.environ.get("IEVO_CE_SAVE_LOGITS")
    if env_sl is not None:
        save_logits = env_sl == "1"
    elif save_logits is None:
        save_logits = False

    def chunk_body(h_c, lab_c, w):
        from jax.ad_checkpoint import checkpoint_name

        hn = rms_norm(h_c, norm_weight, eps=eps, out_dtype=h_c.dtype)
        logits = jnp.dot(hn, w.astype(hn.dtype))  # (c, V) bf16
        # NB: keep the dot bf16 and upcast after — preferred_element_type=f32
        # here makes the recompute-mode backward drastically slower to compile
        # at 7B dims (and the convert fuses into consumers anyway)
        if save_logits:
            logits = checkpoint_name(logits, "ce_logits")
        # Every reduction below reads the BF16 logits and upcasts inside its
        # own pass: a shared `logits.astype(f32)` has several consumers, which
        # makes XLA materialize a second, full-f32 copy of the logits next to
        # the bf16 one (412MB/chunk of extra HBM writes+reads at 700m shapes,
        # measured ~3ms/step).  max over bf16 is exact (monotone), and the
        # f32 exp pass subtracts it before converting.
        valid = lab_c != -100
        safe = jnp.where(valid, lab_c, 0)
        # stop_gradient like jax.nn.logsumexp: the max-shift's cotangent
        # cancels analytically; without it AD emits a max-scatter pass
        m = jax.lax.stop_gradient(jnp.max(logits, axis=-1))  # bf16, exact
        sumexp = jnp.sum(jnp.exp(logits.astype(jnp.float32) - m.astype(jnp.float32)[:, None]), axis=-1)
        lse = m.astype(jnp.float32) + jnp.log(sumexp)
        picked = jnp.take_along_axis(logits, safe[:, None], axis=-1)[:, 0].astype(jnp.float32)
        nll = lse - picked
        if label_smoothing > 0.0:
            # mean over vocab of -log p = lse - mean(logits)
            smooth = lse - jnp.mean(logits.astype(jnp.float32), axis=-1)
            nll = (1 - label_smoothing) * nll + label_smoothing * smooth
        nll_sum = jnp.sum(jnp.where(valid, nll, 0.0))
        n_valid = jnp.sum(valid)
        if compute_acc:
            pred = jnp.argmax(logits, axis=-1)
            n_cor = jnp.sum((pred == lab_c) & valid)
        else:
            n_cor = jnp.zeros((), jnp.int32)
        return nll_sum, n_valid, n_cor

    if save_logits:
        body = jax.checkpoint(
            chunk_body, prevent_cse=False,
            policy=jax.checkpoint_policies.save_only_these_names("ce_logits"))
    else:
        body = jax.checkpoint(chunk_body, prevent_cse=False)

    def scan_body(carry, xs):
        nll_acc, tok_acc, cor_acc = carry
        h_c, lab_c = xs
        nll, n_valid, n_cor = body(h_c, lab_c, w)
        return (nll_acc + nll, tok_acc + n_valid, cor_acc + n_cor), None

    init = (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    (nll_sum, n_valid, n_correct), _ = jax.lax.scan(scan_body, init, (h_chunks, lab_chunks))
    return nll_sum, n_valid, n_correct


def fused_norm_head_nll_tokens(
    hidden: jax.Array,            # (B, S, H) pre-final-norm activations
    norm_weight: jax.Array,       # (H,)
    head_kernel: jax.Array,       # (H, V)
    labels: jax.Array,            # (B, S) int, -100 ignored
    *,
    eps: float = 1e-5,
    embed_grad_scale: float = 1.0,
    norm_head: bool = False,
    label_smoothing: float = 0.0,
    chunk_size: int = None,
):
    """Eval-only per-token variant: returns (nll (B,S) fp32, correct (B,S)
    bool) without ever materializing the full (tokens, V) logits.  Feeds
    ``AccPerplex``/``LossWithTypeId`` per-type validation bins (reference
    ``SchedulerMetricHook`` -> ``metrics.py:55-338``)."""
    B, S, H = hidden.shape
    tokens = B * S
    flat_h = hidden.reshape(tokens, H)
    flat_lab = labels.reshape(tokens)
    chunk_size = min(chunk_size or 512, tokens)
    rem = (-tokens) % chunk_size
    if rem:
        flat_h = jnp.concatenate([flat_h, jnp.zeros((rem, H), flat_h.dtype)])
        flat_lab = jnp.concatenate([flat_lab, jnp.full((rem,), -100, flat_lab.dtype)])
    nc = flat_h.shape[0] // chunk_size

    w = head_kernel
    if norm_head:
        norm = jnp.linalg.norm(w.astype(jnp.float32), axis=0, keepdims=True)
        w = (w / (norm + 1e-7)).astype(w.dtype)

    def chunk_body(_, xs):
        h_c, lab_c = xs
        hn = rms_norm(h_c, norm_weight, eps=eps, out_dtype=h_c.dtype)
        logits = jnp.dot(hn, w.astype(hn.dtype)).astype(jnp.float32)
        valid = lab_c != -100
        safe = jnp.where(valid, lab_c, 0)
        lse = jax.nn.logsumexp(logits, axis=-1)
        nll = lse - jnp.take_along_axis(logits, safe[:, None], axis=-1)[:, 0]
        if label_smoothing > 0.0:
            nll = (1 - label_smoothing) * nll + label_smoothing * (lse - jnp.mean(logits, axis=-1))
        cor = (jnp.argmax(logits, axis=-1) == lab_c) & valid
        return None, (jnp.where(valid, nll, 0.0), cor)

    _, (nll, cor) = jax.lax.scan(
        chunk_body, None,
        (flat_h.reshape(nc, chunk_size, H), flat_lab.reshape(nc, chunk_size)))
    return (nll.reshape(-1)[:tokens].reshape(B, S),
            cor.reshape(-1)[:tokens].reshape(B, S))
