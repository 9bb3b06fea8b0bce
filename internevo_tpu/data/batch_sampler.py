"""Batch samplers with batch-size rampup and exact-resume state.

Parity: reference ``internlm/data/tokenized/batch_sampler.py`` —
``StaticBatchSampler`` (:110-287; epoch-seeded shuffling, rampup
"start incr every", dp-rank slicing, state_dict/load_state_dict re-deriving
indices from the saved RNG state) and ``DataParallelSampler`` (:21, eval).
"""

from __future__ import annotations

import math

import numpy as np


class StaticBatchSampler:
    """Yields lists of dataset indices; one yield = one global step's micro-batches
    for this dp rank (batch_size = micro_num packs)."""

    def __init__(
        self,
        datasets,
        batch_size: int = 192,
        rampup_batch_size: str | None = "6 2 8",
        micro_bsz: int = 2,
        seed: int = 0,
        drop_last: bool = True,
        data_rank: int = 0,
        data_world_size: int = 1,
    ):
        assert drop_last is True, "Currently only support drop last"
        if rampup_batch_size:
            start_bsz, bsz_incre, incre_every = map(int, rampup_batch_size.split())
        else:
            start_bsz, bsz_incre, incre_every = batch_size, batch_size, 1
        self.raw_rampup_batch_size = rampup_batch_size
        self.start_bsz = start_bsz
        self.bsz_incre = bsz_incre
        self.incre_every = incre_every
        assert (batch_size - self.start_bsz) % self.bsz_incre == 0
        self.batch_size = batch_size
        self.epoch = 0
        self.seed = seed
        self.rng = np.random.RandomState(seed)
        self.batch_count = 0
        self.micro_bsz = micro_bsz
        self.data_rank = data_rank
        self.data_world_size = data_world_size
        self.num_consumed_samples_in_epoch = 0
        self.datasets = datasets
        self.num_samples = sum(len(ds) for ds in datasets)
        self.get_indices()

    def get_indices(self, old_indices=None):
        if old_indices is not None:
            assert len(old_indices) <= self.num_samples
        else:
            old_indices = np.array([])
        indices = np.arange(len(old_indices), self.num_samples)
        self.rng_state = self.rng.get_state()
        self.rng.shuffle(indices)
        # truncate so post-rampup steps are full-batch divisible (ref :176-212)
        ramp_steps = (self.batch_size - self.start_bsz) // self.bsz_incre
        if self.batch_count < ramp_steps * self.incre_every:
            rampup_samples = sum(
                (i * self.bsz_incre + self.start_bsz) * self.incre_every for i in range(ramp_steps)
            )
            assert rampup_samples * self.data_world_size <= self.num_samples, "Too much rampup samples"
            num_samples = (self.num_samples - rampup_samples * self.data_world_size) // (
                self.batch_size * self.data_world_size
            )
            num_samples = num_samples * self.batch_size * self.data_world_size + rampup_samples * self.data_world_size
        else:
            num_samples = self.num_samples // (self.batch_size * self.data_world_size)
            num_samples = num_samples * self.batch_size * self.data_world_size
        indices = np.concatenate([old_indices, indices]).astype(int)
        self.indices = indices[:num_samples]
        assert len(self.indices) >= self.batch_size
        self.num_consumed_samples_in_epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        self.rng = np.random.RandomState(self.seed + self.epoch)

    def __len__(self):
        ramp_steps = (self.batch_size - self.start_bsz) // self.bsz_incre
        if self.batch_count < ramp_steps * self.incre_every:
            rampup_samples = sum(
                (i * self.bsz_incre + self.start_bsz) * self.incre_every for i in range(ramp_steps)
            )
            num_batches = (self.num_samples - rampup_samples * self.data_world_size) // self.batch_size
            return num_batches // self.data_world_size + self.incre_every * ramp_steps
        return self.num_samples // self.batch_size // self.data_world_size

    def __iter__(self):
        indices = self.indices[self.data_rank :: self.data_world_size]
        while self.num_consumed_samples_in_epoch < len(indices):
            batch_rampup_idx = self.batch_count // self.incre_every
            cur_batch_size = min(batch_rampup_idx * self.bsz_incre + self.start_bsz, self.batch_size)
            batch = indices[self.num_consumed_samples_in_epoch : self.num_consumed_samples_in_epoch + cur_batch_size]
            self.num_consumed_samples_in_epoch += len(batch)
            self.batch_count += 1
            yield batch
        self.get_indices()  # next round

    def state_dict(self) -> dict:
        return {
            "batch_size": self.batch_size,
            "raw_rampup_batch_size": self.raw_rampup_batch_size,
            "rng_state": self.rng_state,
            "epoch": self.epoch,
            "seed": self.seed,
            "data_world_size": self.data_world_size,
            "num_consumed_samples_in_epoch": self.num_consumed_samples_in_epoch,
            "batch_count": self.batch_count,
            "indices": self.indices,
        }

    def load_state_dict(self, states: dict):
        for name in ("data_world_size", "raw_rampup_batch_size", "seed"):
            assert states[name] == getattr(self, name), (name, states[name], getattr(self, name))
        self.rng.set_state(states["rng_state"])
        self.get_indices(old_indices=None)  # re-derive indices from rng state (ref :265-272)
        self.epoch = states["epoch"]
        self.batch_count = states["batch_count"]
        self.num_consumed_samples_in_epoch = states["num_consumed_samples_in_epoch"]

    def copy(self) -> "StaticBatchSampler":
        out = StaticBatchSampler(
            self.datasets,
            self.batch_size,
            self.raw_rampup_batch_size,
            self.micro_bsz,
            self.seed,
            drop_last=True,
            data_rank=self.data_rank,
            data_world_size=self.data_world_size,
        )
        out.load_state_dict(self.state_dict())
        return out


class DataParallelSampler:
    """Eval-time dp sampler (reference :21): shards sample indices across dp ranks
    with optional shuffling; pads to equal length."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False, seed: int = 0,
                 drop_last: bool = False, data_rank: int = 0, data_world_size: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.data_rank = data_rank
        self.data_world_size = data_world_size
        self.epoch = 0
        if self.drop_last and len(self.dataset) % self.data_world_size != 0:
            self.num_samples = math.ceil((len(self.dataset) - self.data_world_size) / self.data_world_size)
        else:
            self.num_samples = math.ceil(len(self.dataset) / self.data_world_size)
        self.total_size = self.num_samples * self.data_world_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self):
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            indices = rng.permutation(len(self.dataset))
        else:
            indices = np.arange(len(self.dataset))
        if not self.drop_last:
            pad = self.total_size - len(indices)
            if pad > 0:
                indices = np.concatenate([indices, indices[:pad]])
        else:
            indices = indices[: self.total_size]
        indices = indices[self.data_rank : self.total_size : self.data_world_size]
        for i in range(0, len(indices), self.batch_size):
            batch = indices[i : i + self.batch_size]
            if self.drop_last and len(batch) < self.batch_size:
                break
            yield list(batch)

    def __len__(self):
        if self.drop_last:
            return self.num_samples // self.batch_size
        return math.ceil(self.num_samples / self.batch_size)
