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


# -------------------------------------------- object-store checkpoint trees


def _store(tmp_path, monkeypatch):
    root = tmp_path / "objstore"
    monkeypatch.setenv("IEVO_OBJECT_STORE_ROOT", str(root))
    return root


def test_object_store_save_resume_roundtrip(tmp_path, monkeypatch):
    """save_ckpt_folder="boto3:s3://…": the orbax tree stages locally, uploads
    through the StorageManager (md5 sidecars), the remote .step stamp lands
    LAST, and auto-resume scans the STORE and downloads the tree back
    (reference boto3 save/load path, storage_manager.py:984-1135)."""
    root = _store(tmp_path, monkeypatch)
    engine, ts = _FakeEngine(), _FakeTrainState()
    uri = "boto3:s3://bucket/ckpts"
    cfg = Config(dict(enable_save_ckpt=True, save_ckpt_folder=uri,
                      checkpoint_every=5, auto_resume=True, async_upload=False,
                      oss_snapshot_freq=0, load_ckpt_info=None,
                      async_upload_tmp_folder=str(tmp_path / "stage")))
    mgr = CheckpointManager(cfg, engine=engine, train_state=ts, model_config={"x": 1})
    mgr.save_checkpoint(f"{uri}/7", ts)
    obj_dir = root / "boto3" / "bucket" / "ckpts" / "7"
    assert (obj_dir / "7.step").exists(), list(obj_dir.rglob("*"))
    assert (obj_dir / "context.pkl.md5").exists()  # md5 sidecars ride along
    # staging dir is disposed after upload
    assert not list((tmp_path / "stage").glob("orbax_stage/*"))

    engine2, ts2 = _FakeEngine(), _FakeTrainState()
    engine2.params = {"w": jnp.zeros(8)}
    engine2.opt_state = {"m": jnp.zeros(8), "step": jnp.asarray(0)}
    mgr2 = CheckpointManager(cfg, engine=engine2, train_state=ts2, model_config={"x": 1})
    latest = mgr2.query_latest_snapshot_step_local()
    assert latest == f"{uri}/7", latest
    mgr2.try_resume_training(ts2)
    np.testing.assert_array_equal(engine2.params["w"], np.arange(8))
    np.testing.assert_array_equal(engine2.opt_state["m"], np.ones(8))
    assert int(engine2.opt_state["step"]) == 3


def test_object_store_scan_picks_latest_and_md5_guard(tmp_path, monkeypatch):
    root = _store(tmp_path, monkeypatch)
    engine, ts = _FakeEngine(), _FakeTrainState()
    uri = "volc:vc://bucket/run1"
    cfg = Config(dict(enable_save_ckpt=True, save_ckpt_folder=uri,
                      checkpoint_every=5, auto_resume=True, async_upload=False,
                      oss_snapshot_freq=0, load_ckpt_info=None,
                      async_upload_tmp_folder=str(tmp_path / "stage")))
    mgr = CheckpointManager(cfg, engine=engine, train_state=ts, model_config=None)
    for step in (5, 15, 10):
        ts.step_count = step
        mgr.save_checkpoint(f"{uri}/{step}", ts)
    assert mgr.query_latest_snapshot_step_local() == f"{uri}/15"
    # integrity: corrupt an object -> download raises the md5 mismatch
    victim = next((root / "volc" / "bucket" / "run1" / "15").glob("context.pkl"))
    victim.write_bytes(b"corrupted")
    from internevo_tpu.checkpoint.checkpoint_manager import (
        CheckpointLoadMask, try_load_internevo_ckpt)

    with pytest.raises(IOError, match="md5 mismatch"):
        try_load_internevo_ckpt(engine, ts, f"{uri}/15", CheckpointLoadMask(("all",)))
