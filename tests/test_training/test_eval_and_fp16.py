"""Validation loop + fp16 grad-scaler path, end to end."""

import jax
import numpy as np
import pytest

from internevo_tpu.ops.attention import set_use_pallas


@pytest.fixture(autouse=True)
def _no_pallas():
    set_use_pallas(False)
    yield
    set_use_pallas(None)


def test_evaluate_on_val_dls():
    from internevo_tpu.core.context import gpc
    from internevo_tpu.data.build_dataloader import build_valid_loader_with_data_type
    from internevo_tpu.eval.evaluation import evaluate_on_val_dls
    from internevo_tpu.initialize.launch import launch
    from internevo_tpu.train.pipeline import initialize_model, initialize_optimizer, initialize_trainer
    from tests.test_training.test_loss import demo_config

    launch(demo_config(), seed=1024)
    gpc.config.data["valid_micro_num"] = 1
    model, params = initialize_model()
    opt_state, lrs, b2 = initialize_optimizer(model, params)
    trainer = initialize_trainer(model, params, opt_state, lrs, b2)
    val_dls, names = build_valid_loader_with_data_type()
    assert "val" in val_dls

    class _W:
        scalars = {}

        def add_scalar(self, k, v, s):
            self.scalars[k] = v

    w = _W()
    # limit to a couple of batches for speed
    val_dls = {"val": _limit(val_dls["val"], 2)}
    evaluate_on_val_dls(trainer, val_dls, writer=w, step_count=1)
    assert "val/val/loss" in w.scalars and np.isfinite(w.scalars["val/val/loss"])


def _limit(dl, n):
    class _L:
        def __iter__(self):
            for i, item in enumerate(dl):
                if i >= n:
                    break
                yield item

        def __len__(self):
            return n

    return _L()


def test_fp16_training_with_scaler():
    """dtype float16: loss scale starts at 2^16 and the curve still trains."""
    from tests.test_training.test_loss import demo_config, run_training

    cfg = demo_config(model=dict(dtype="torch.float16"),
                      grad_scaler=dict(fp16=dict(initial_scale=2**16, min_scale=1,
                                                 growth_interval=1000),
                                       growth_factor=2, backoff_factor=0.5,
                                       max_scale=2**24, hysteresis=2))
    losses, grad_norms = run_training(cfg, steps=3)
    assert all(np.isfinite(losses)), losses
    assert all(np.isfinite(grad_norms))
