"""Validation loop.

Parity: reference ``internlm/eval/evaluation.py:45-143`` — ``evaluate_on_val_dls``
runs a forward-only schedule over every validation loader, aggregates loss /
accuracy / perplexity and logs + writes them.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..core.context import gpc
from ..utils.logger import get_logger

logger = get_logger(__name__)


def _default_dataset_types() -> list:
    from ..data.utils import get_dataset_type_ids_map

    folder = gpc.config.data.get("train_folder") if getattr(gpc, "config", None) else None
    return list(get_dataset_type_ids_map(folder).keys())


def evaluate_on_val_dls(trainer, val_dls: dict, writer=None, step_count: int = 0,
                        streaming: bool = False, dataset_types: list = None,
                        tokenizer=None):
    """Per-loader loss/acc/ppl plus — when the eval step emits per-token stats
    (``make_eval_step(per_token=True)``) — per-dataset-type ``acc/{type}`` /
    ``loss/{type}`` / ``perplexity/{type}`` bins via ``AccPerplex`` (reference
    ``eval/evaluation.py:45-143`` hooking ``AccPerplex`` through
    ``SchedulerMetricHook``; ``model/metrics.py:340``)."""
    from ..models.metrics import AccPerplex

    trainer.eval()
    engine = trainer.engine
    if dataset_types is None:
        dataset_types = _default_dataset_types()
    for val_name, val_dl in val_dls.items():
        if not streaming and len(val_dl) == 0 and gpc.is_rank_for_log():
            logger.info("no samples in %s, skip validation", val_name)
            continue
        total_loss, total_tokens, total_correct, n_batches = 0.0, 0, 0, 0
        acc_perplex = AccPerplex(tokenizer=tokenizer, dataset_types=dataset_types)
        has_types = False
        for data, labels in val_dl:
            batch = {
                "input_ids": jnp.asarray(data["input_ids"]),
                "indexes": jnp.asarray(data["indexes"]),
                "segment_ids": jnp.asarray(data["segment_ids"]),
                "labels": jnp.asarray(labels),
            }
            out = engine.run_eval_step(batch)
            n_tok = int(out["n_tokens"])
            total_loss += float(out["loss"]) * n_tok
            total_tokens += n_tok
            total_correct += int(out["n_correct"])
            n_batches += 1
            if "nll" in out:
                type_ids = data.get("type_ids")
                has_types = has_types or type_ids is not None
                acc_perplex.update_from_token_stats(
                    np.asarray(out["nll"]), np.asarray(out["correct"]), labels,
                    type_ids=type_ids)
        if total_tokens == 0:
            continue
        avg_loss = total_loss / total_tokens
        acc = total_correct / total_tokens
        ppl = math.exp(min(avg_loss, 80))
        typed = acc_perplex.get_metric() if has_types else {}
        typed = {k: v for k, v in typed.items()
                 if "/" in k or k == "BPB"}  # per-type bins + BPB only
        if gpc.is_rank_for_log():
            extra = "".join(f" {k}={v}" for k, v in sorted(typed.items()))
            logger.info(
                "validation on %s: step=%d loss=%.5f acc=%.4f perplexity=%.3f (%d batches)%s",
                val_name, step_count, avg_loss, acc, ppl, n_batches, extra,
            )
        if writer is not None:
            writer.add_scalar(f"val/{val_name}/loss", avg_loss, step_count)
            writer.add_scalar(f"val/{val_name}/acc", acc, step_count)
            writer.add_scalar(f"val/{val_name}/perplexity", ppl, step_count)
            for k, v in typed.items():
                writer.add_scalar(f"val/{val_name}/{k}", v, step_count)
    trainer.train()
