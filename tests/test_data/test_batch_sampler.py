"""StaticBatchSampler rampup + exact-resume semantics.

Parity: reference ``tests/test_data/test_batch_sampler.py`` — rampup schedule
and resume-from-state_dict equality.
"""

import numpy as np

from internevo_tpu.data.batch_sampler import StaticBatchSampler


class _FakeDs:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n


def _collect(sampler, n):
    out = []
    it = iter(sampler)
    for _ in range(n):
        out.append(next(it).tolist())
    return out


def test_rampup_schedule():
    """rampup '4 2 3': batch sizes 4,4,4,6,6,6,8,8,8,... capped at batch_size."""
    s = StaticBatchSampler([_FakeDs(4000)], batch_size=8, rampup_batch_size="4 2 3",
                           micro_bsz=1, seed=7)
    sizes = [len(b) for b in _collect(s, 12)]
    assert sizes == [4, 4, 4, 6, 6, 6, 8, 8, 8, 8, 8, 8]


def test_no_rampup_full_batch():
    s = StaticBatchSampler([_FakeDs(100)], batch_size=4, rampup_batch_size=None,
                           micro_bsz=1, seed=7)
    sizes = [len(b) for b in _collect(s, 5)]
    assert sizes == [4] * 5


def test_dp_rank_slicing_disjoint():
    batches = {}
    for rank in range(2):
        s = StaticBatchSampler([_FakeDs(1000)], batch_size=4, rampup_batch_size=None,
                               micro_bsz=1, seed=7, data_rank=rank, data_world_size=2)
        batches[rank] = np.concatenate(_collect(s, 10))
    assert set(batches[0]).isdisjoint(set(batches[1]))


def test_resume_reproduces_stream():
    s1 = StaticBatchSampler([_FakeDs(4000)], batch_size=8, rampup_batch_size="4 2 3",
                            micro_bsz=1, seed=7)
    consumed = _collect(s1, 5)
    state = s1.state_dict()

    s2 = StaticBatchSampler([_FakeDs(4000)], batch_size=8, rampup_batch_size="4 2 3",
                            micro_bsz=1, seed=7)
    s2.load_state_dict(state)
    rest1 = _collect(s1, 5)
    rest2 = _collect(s2, 5)
    assert rest1 == rest2


def test_copy_is_equivalent():
    s1 = StaticBatchSampler([_FakeDs(4000)], batch_size=8, rampup_batch_size=None,
                            micro_bsz=1, seed=3)
    _collect(s1, 3)
    s2 = s1.copy()
    assert _collect(s1, 4) == _collect(s2, 4)


def test_resume_after_rampup_in_later_epoch():
    """Resume must re-derive the SAME pool the live sampler was consuming even
    when the pool was rebuilt post-rampup in a later epoch (the pool size
    depends on batch_count at pool-BUILD time; review finding r2)."""
    a = StaticBatchSampler([_FakeDs(300)], batch_size=8, rampup_batch_size="4 2 2",
                           micro_bsz=1, seed=7)
    consumed = []
    it = iter(a)
    # drain epoch 0 entirely (rampup happens here), roll into epoch 1
    for batch in it:
        consumed.append(list(batch))
    it = iter(a)  # epoch-1 pool built with post-rampup batch_count
    for _ in range(3):
        consumed.append(list(next(it)))
    state = a.state_dict()

    b = StaticBatchSampler([_FakeDs(300)], batch_size=8, rampup_batch_size="4 2 2",
                           micro_bsz=1, seed=7)
    b.load_state_dict(state)
    # continue both: streams must be identical
    for _ in range(5):
        np.testing.assert_array_equal(next(it), next(iter_once(b)))


def iter_once(sampler):
    """Resume-aware single-step iterator (mirrors the training loop's reuse)."""
    if not hasattr(sampler, "_it") or sampler._it is None:
        sampler._it = iter(sampler)
    return sampler._it


def test_trainstate_snapshot_refreshes_on_epoch_rollover():
    """A checkpoint taken mid-epoch-2 must restore epoch-2's pool, not replay
    epoch-1 data: load_new_batch refreshes the TrainState sampler snapshot at
    the rollover (review finding r2)."""
    from types import SimpleNamespace

    from internevo_tpu.core.trainer import TrainState
    from internevo_tpu.train.pipeline import load_new_batch

    class _DL:
        def __init__(self, sampler):
            self.batch_sampler = sampler

        def __iter__(self):
            return (({"ids": list(b)}, list(b)) for b in iter(self.batch_sampler))

    cfg = SimpleNamespace(data=SimpleNamespace(total_steps=1000))

    def fresh():
        s = StaticBatchSampler([_FakeDs(40)], batch_size=8, rampup_batch_size=None,
                               micro_bsz=1, seed=7)
        return s, _DL(s), TrainState(cfg, batch_sampler=s)

    s1, dl1, ts1 = fresh()
    it1 = iter(dl1)
    stream = []
    # epoch 1 has 5 batches; consume 7 -> rollover happens inside load_new_batch
    for _ in range(7):
        batch, it1 = load_new_batch(dl1, it1, ts1)
        stream.append(batch[1])
    snapshot = ts1.state_dict()
    # uninterrupted continuation
    cont = []
    for _ in range(3):
        batch, it1 = load_new_batch(dl1, it1, ts1)
        cont.append(batch[1])

    # resume from the snapshot into a fresh sampler
    s2, dl2, ts2 = fresh()
    ts2.load_state_dict(snapshot, train_dl=dl2)
    it2 = iter(dl2)
    resumed = []
    for _ in range(3):
        batch, it2 = load_new_batch(dl2, it2, ts2)
        resumed.append(batch[1])
    assert resumed == cont, (resumed, cont)
