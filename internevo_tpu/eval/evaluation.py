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


def evaluate_on_val_dls(trainer, val_dls: dict, writer=None, step_count: int = 0,
                        streaming: bool = False):
    trainer.eval()
    engine = trainer.engine
    for val_name, val_dl in val_dls.items():
        if not streaming and len(val_dl) == 0 and gpc.is_rank_for_log():
            logger.info("no samples in %s, skip validation", val_name)
            continue
        total_loss, total_tokens, total_correct, n_batches = 0.0, 0, 0, 0
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
        if total_tokens == 0:
            continue
        avg_loss = total_loss / total_tokens
        acc = total_correct / total_tokens
        ppl = math.exp(min(avg_loss, 80))
        if gpc.is_rank_for_log():
            logger.info(
                "validation on %s: step=%d loss=%.5f acc=%.4f perplexity=%.3f (%d batches)",
                val_name, step_count, avg_loss, acc, ppl, n_batches,
            )
        if writer is not None:
            writer.add_scalar(f"val/{val_name}/loss", avg_loss, step_count)
            writer.add_scalar(f"val/{val_name}/acc", acc, step_count)
            writer.add_scalar(f"val/{val_name}/perplexity", ppl, step_count)
    trainer.train()
