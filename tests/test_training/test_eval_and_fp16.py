"""Validation loop + fp16 grad-scaler path, end to end."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # multi-minute tier; excluded by -m quick

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


def test_fp16_overflow_skip_backoff_and_recovery():
    """fp16 overflow-then-recover e2e (reference ``hybrid_zero_optim.py:706-737``):
    an absurd initial loss scale (2^26 on fp16 grads, max ~65504) forces real
    inf grads — the step must SKIP (num_skipped up, grad-norm sentinel -1),
    the scale must back off per hysteresis (2 overflows, then halve on each
    further overflow, NO reset after backoff), and once the scale re-enters
    range training resumes and the loss decreases."""
    import jax.numpy as jnp

    from internevo_tpu.core.context import gpc
    from internevo_tpu.data.build_dataloader import build_train_loader_with_data_type
    from internevo_tpu.initialize.launch import launch
    from internevo_tpu.train.pipeline import (
        batch_to_device, initialize_model, initialize_optimizer, initialize_trainer,
    )
    from tests.test_training.test_loss import demo_config

    hysteresis = 2
    cfg = demo_config(
        model=dict(dtype="torch.float16"),
        grad_scaler=dict(fp16=dict(initial_scale=2.0**26, min_scale=1,
                                   growth_interval=1000),
                         growth_factor=2, backoff_factor=0.5,
                         max_scale=2**30, hysteresis=hysteresis),
    )
    launch(cfg, seed=1024)
    model, params = initialize_model()
    opt_state, lrs, b2 = initialize_optimizer(model, params)
    trainer = initialize_trainer(model, params, opt_state, lrs, b2)
    train_dl, _ = build_train_loader_with_data_type()
    micro_num = gpc.config.data.micro_num

    records = []
    it = iter(train_dl)
    for _ in range(18):
        batch = next(it)
        rows = batch[0]["input_ids"].shape[0]
        device_batch = batch_to_device(batch, micro_num=rows // gpc.sizes.dp_total)
        m = trainer.execute_schedule(device_batch)
        records.append(dict(loss=float(m["loss"]),
                            found_inf=bool(m["found_inf"]),
                            scale=float(m["loss_scale"]),
                            skipped=int(m["num_skipped"]),
                            gnorm=float(m["grad_norm"])))

    skipped_steps = [r for r in records if r["found_inf"]]
    clean_steps = [r for r in records if not r["found_inf"]]
    # (a) overflows actually happened and the step was skipped
    assert skipped_steps, records
    assert records[-1]["skipped"] == len(skipped_steps)
    # (b) sentinel norms on skipped steps (-1 inf / -2 nan), finite otherwise
    for r in skipped_steps:
        assert r["gnorm"] in (-1.0, -2.0), r
    for r in clean_steps:
        assert np.isfinite(r["gnorm"]) and r["gnorm"] >= 0, r
    # (c) hysteresis semantics: the first (hysteresis-1) overflows keep the
    # scale, every later overflow halves it
    scales = [r["scale"] for r in records]
    assert scales[0] == 2.0**26
    n_backoffs = sum(1 for a, b in zip(scales, scales[1:]) if b < a)
    assert n_backoffs == max(0, len(skipped_steps) - (hysteresis - 1)), (
        scales, len(skipped_steps))
    # (d) training RESUMED: clean steps exist after the skip run and the loss
    # went down over them
    assert clean_steps, records
    first_clean = records.index(clean_steps[0])
    assert all(not r["found_inf"] for r in records[first_clean:]), records
    assert clean_steps[-1]["loss"] < clean_steps[0]["loss"], clean_steps
