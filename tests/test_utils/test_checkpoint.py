"""Checkpoint manager: save/load roundtrip, auto-resume scan, stop-file.

Parity: reference ``tests/test_utils/test_model_checkpoint.py`` and
``test_storage_manager.py``.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from internevo_tpu.checkpoint.checkpoint_manager import CheckpointLoadMask, CheckpointManager
from internevo_tpu.core.config import Config
from internevo_tpu.solver.lr_scheduler import CosineAnnealingWarmupLR


class _FakeEngine:
    def __init__(self):
        self.params = {"w": jnp.arange(8, dtype=jnp.float32)}
        self.opt_state = {"m": jnp.ones((8,)), "step": jnp.asarray(3)}
        self.lr_scheduler = CosineAnnealingWarmupLR(lr=1e-3, total_steps=100, warmup_steps=10)


class _FakeTrainState:
    def __init__(self):
        self.step_count = 7
        self.batch_count = 7

    def state_dict(self):
        return {"batch_count": self.batch_count, "num_consumed_samples_in_epoch": 0,
                "num_consumed_tokens": 0, "inf_nan_skip_batches": 0, "step_count": self.step_count}

    def load_state_dict(self, d, train_dl=None):
        self.batch_count = d["batch_count"] + 1
        self.step_count = d["step_count"]


def _manager(tmp_path, engine, ts, **kw):
    cfg = Config(dict(enable_save_ckpt=True, save_ckpt_folder=str(tmp_path / "ckpts"),
                      checkpoint_every=5, auto_resume=True, async_upload=False,
                      oss_snapshot_freq=0, load_ckpt_info=None, **kw))
    return CheckpointManager(cfg, engine=engine, train_state=ts, model_config={"x": 1})


def test_save_load_roundtrip(tmp_path):
    engine, ts = _FakeEngine(), _FakeTrainState()
    mgr = _manager(tmp_path, engine, ts)
    path = str(tmp_path / "ckpts" / "7")
    mgr.save_checkpoint(path, ts)
    assert os.path.exists(os.path.join(path, "7.step"))

    engine2, ts2 = _FakeEngine(), _FakeTrainState()
    engine2.params = {"w": jnp.zeros(8)}
    engine2.opt_state = {"m": jnp.zeros(8), "step": jnp.asarray(0)}
    mgr2 = _manager(tmp_path, engine2, ts2)
    mgr2.try_resume_training(ts2)
    np.testing.assert_array_equal(engine2.params["w"], np.arange(8))
    np.testing.assert_array_equal(engine2.opt_state["m"], np.ones(8))
    assert int(engine2.opt_state["step"]) == 3


def test_auto_resume_picks_latest(tmp_path):
    engine, ts = _FakeEngine(), _FakeTrainState()
    mgr = _manager(tmp_path, engine, ts)
    for step in (5, 10, 15):
        ts.step_count = step
        mgr.save_checkpoint(str(tmp_path / "ckpts" / str(step)), ts)
    latest = mgr.query_latest_snapshot_step_local()
    assert latest.endswith("15")


def test_stop_file_protocol(tmp_path):
    """Reference quit_signal_handler convention: -N = save at step N, +N =
    save at step N AND quit; fires only at step == abs(N)."""
    engine, ts = _FakeEngine(), _FakeTrainState()
    stop_file = tmp_path / "stop.txt"
    mgr = _manager(tmp_path, engine, ts, stop_file_path=str(stop_file))
    ts.step_count = 3
    assert mgr.try_save_checkpoint(ts) is False  # no trigger
    stop_file.write_text("-3")
    assert mgr.try_save_checkpoint(ts) is False  # save WITHOUT quit
    assert os.path.exists(str(tmp_path / "ckpts" / "3"))
    ts.step_count = 4
    assert mgr.try_save_checkpoint(ts) is False  # past target: no repeat save
    assert not os.path.exists(str(tmp_path / "ckpts" / "4"))
    stop_file.write_text("4")
    assert mgr.try_save_checkpoint(ts) is True   # positive: save AND quit
    assert os.path.exists(str(tmp_path / "ckpts" / "4"))


def test_load_mask():
    m = CheckpointLoadMask(("model",))
    assert m.need_load("model") and not m.need_load("optimizer")
    m_all = CheckpointLoadMask(("all",))
    assert all(m_all.need_load(c) for c in ("model", "optimizer", "sampler", "scheduler"))
