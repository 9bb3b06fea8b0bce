"""Packed datasets: aggregate variable-length samples into fixed packed_length rows.

Parity: reference ``internlm/data/tokenized/packed_dataset.py`` —
``PackedDatasetWithCut`` (:206-390, samples CUT across pack boundaries, labels
pre-shifted per chunk with the cross-boundary label being the first token of the
next fragment, cu_seqlens re-split at ``max_length_per_sample``, position ids
restarting at each boundary) and ``PackedDatasetWithoutCuSeqlen`` (:70-204,
concatenation without boundaries).  Sample order is a seed-shuffled permutation
with DEFAULT_SEED=1024.

The behavioral contract here (SURVEY A.4) is what loss-matching the reference
depends on; the implementation is vectorised numpy rather than python lists.
"""

from __future__ import annotations

import itertools as it
import operator
import os

import numpy as np

DEFAULT_SEED = 1024


class PackedDataset:
    def __init__(self, dataset, max_length_per_sample: int = 2048, packed_length: int = 4096,
                 use_packed: bool = True, micro_bsz: int = 1):
        assert hasattr(dataset, "lengths")
        assert len(dataset.lengths) == len(dataset)
        self.dataset = dataset
        self.max_length_per_sample = max_length_per_sample
        self.lengths = dataset.lengths
        self.packed_length = packed_length
        self.seed = DEFAULT_SEED
        self.use_packed = use_packed
        self.micro_bsz = micro_bsz

    def __getitem__(self, item: int) -> dict:
        if self.use_packed:
            return self.build_pack(item)
        return self.build_unpack(item)

    def get_dataset_name(self):
        return self.dataset.get_dataset_name()


class PackedDatasetWithCut(PackedDataset):
    """Pack i = tokens [i*packed_length, (i+1)*packed_length) of the shuffled
    concatenation; samples are cut across pack boundaries."""

    def __init__(self, dataset, max_length_per_sample: int = 2048, packed_length: int = 4096,
                 use_packed: bool = True, micro_bsz: int = 1):
        super().__init__(dataset, max_length_per_sample, packed_length, use_packed, micro_bsz)
        self.sample_indices, self.len_samples_shuffled, self.acm_len_samples = self.accu_sample_len(seed=self.seed)
        self.num_tokens = int(sum(self.lengths))

    def accu_sample_len(self, seed=None):
        rng = np.random.RandomState(seed if seed is not None else self.seed - 1)
        sample_indices = np.arange(len(self.lengths))
        rng.shuffle(sample_indices)
        len_samples_shuffled = list(map(self.lengths.__getitem__, sample_indices))
        acm_len_samples = list(it.accumulate(len_samples_shuffled, operator.add))
        return sample_indices, len_samples_shuffled, acm_len_samples

    def __len__(self):
        return self.num_tokens // self.packed_length

    def cal_map(self, carriage_idx: int = 0) -> int:
        length_train = (carriage_idx + 1) * self.packed_length
        return int(np.searchsorted(self.acm_len_samples, length_train, side="left"))

    def mapping(self, pack_idx: int = 0):
        pre_pos, pre_token_id = 0, 0
        if pack_idx > 0:
            pre_pos = self.cal_map(pack_idx - 1)
            pre_token_id = self.len_samples_shuffled[pre_pos] - (
                self.acm_len_samples[pre_pos] - pack_idx * self.packed_length
            )
            if pre_token_id == self.len_samples_shuffled[pre_pos]:
                pre_pos += 1
                pre_token_id = 0
        pos = self.cal_map(pack_idx)
        token_id = self.len_samples_shuffled[pos] - (self.acm_len_samples[pos] - (pack_idx + 1) * self.packed_length)
        return pre_pos, pre_token_id, pos, int(token_id)

    def _append_chunk(self, chunk, next_token_label, type_id, out):
        """Append one sample fragment: labels shift-by-1 within the chunk with the
        given cross-boundary/next label at the end; cu_seqlens re-split every
        max_length_per_sample; position ids restart at each boundary."""
        pack, cu_seqlens, indexes, labels, type_ids = out
        chunk = list(chunk)
        pack.extend(chunk)
        labels.extend(list(chunk[1:]) + [next_token_label])
        type_ids.extend([type_id] * len(chunk))
        num_new_samples, tokens_left = divmod(len(chunk), self.max_length_per_sample)
        for _ in range(num_new_samples):
            cu_seqlens.append(cu_seqlens[-1] + self.max_length_per_sample)
            indexes.extend(range(self.max_length_per_sample))
        if tokens_left > 0:
            cu_seqlens.append(cu_seqlens[-1] + tokens_left)
            indexes.extend(range(tokens_left))

    def build_pack(self, item: int) -> dict:
        pre_pos, pre_token_id, pos, token_id = self.mapping(item)
        out = ([], [0], [], [], [])  # pack, cu_seqlens, indexes, labels, type_ids

        while pre_pos < pos:
            sample = self.dataset[self.sample_indices[pre_pos]]
            chunk = sample["tokens"][pre_token_id:]
            self._append_chunk(chunk, -100, sample.get("type_id", 0), out)
            pre_pos += 1
            pre_token_id = 0

        sample = self.dataset[self.sample_indices[pos]]
        chunk = sample["tokens"][pre_token_id:token_id]
        # cross-boundary label: the first token of the next fragment (ref :312-318)
        next_label = -100 if token_id == len(sample["tokens"]) else sample["tokens"][token_id]
        self._append_chunk(chunk, next_label, sample.get("type_id", 0), out)

        pack, cu_seqlens, indexes, labels, type_ids = out
        return {"tokens": pack, "cu_seqlens": cu_seqlens, "indexes": indexes,
                "labels": labels, "type_ids": type_ids}

    def cal_pos_unpack(self, index: int):
        return index * self.micro_bsz, (index + 1) * self.micro_bsz

    def build_unpack(self, index: int) -> dict:
        """Unpacked mode: micro_bsz whole samples truncated to max_length, padded
        to packed_length with 0s and label 0 (ref :342-389)."""
        pre_pos, pos = self.cal_pos_unpack(index)
        pack, cu_seqlens, indexes, labels, type_ids = [], [0], [], [], []
        while pre_pos < pos and pre_pos < len(self.dataset):
            sample = self.dataset[self.sample_indices[pre_pos]]
            length = min(len(sample["tokens"]), self.max_length_per_sample)
            chunk = list(sample["tokens"][0:length])
            pack.extend(chunk)
            labels.extend(list(chunk[1:]) + [-100])
            type_ids.extend([sample.get("type_id", 0)] * length)
            cu_seqlens.append(cu_seqlens[-1] + length)
            indexes.extend(range(length))
            pre_pos += 1
        if cu_seqlens[-1] != self.packed_length:
            pad = self.packed_length - cu_seqlens[-1]
            pack.extend([0] * pad)
            labels.extend([0] * pad)
            type_ids.extend([0] * pad)
            indexes.extend(range(pad))
            cu_seqlens.append(self.packed_length)
        return {"tokens": pack, "cu_seqlens": cu_seqlens, "indexes": indexes,
                "labels": labels, "type_ids": type_ids}


class PackedDatasetWithoutCuSeqlen(PackedDataset):
    """Concatenate seed-shuffled samples without boundaries (ref :70-204):
    one pack is a contiguous packed_length token window; labels are global
    shift-by-1 within the window; positions run 0..packed_length-1."""

    def __init__(self, dataset, max_length_per_sample: int = 2048, packed_length: int = 4096,
                 use_packed: bool = True, micro_bsz: int = 1):
        assert packed_length % max_length_per_sample == 0
        super().__init__(dataset, max_length_per_sample, packed_length, use_packed, micro_bsz)
        indices = np.arange(len(self.lengths))
        rng = np.random.RandomState(self.seed)
        rng.shuffle(indices)
        self.indices = indices
        self.cum_lens = np.cumsum(np.asarray(self.lengths)[self.indices])
        self.num_tokens = int(sum(self.lengths))

    def __len__(self):
        return self.num_tokens // self.packed_length

    def find_offset(self, offset: int):
        idx = int(np.searchsorted(self.cum_lens, offset, side="right"))
        if idx == 0:
            return idx, offset
        return idx, int(offset - self.cum_lens[idx - 1])

    def build_pack(self, item: int) -> dict:
        start = item * self.packed_length
        end = start + self.packed_length
        tokens, type_ids = [], []
        idx, offset = self.find_offset(start)
        while len(tokens) < self.packed_length and idx < len(self.indices):
            sample = self.dataset[self.indices[idx]]
            chunk = sample["tokens"][offset:]
            need = self.packed_length - len(tokens)
            chunk = chunk[:need]
            tokens.extend(chunk)
            type_ids.extend([sample.get("type_id", 0)] * len(chunk))
            idx += 1
            offset = 0
        labels = list(tokens[1:]) + [-100]
        cu_seqlens = list(range(0, self.packed_length + 1, self.max_length_per_sample))
        indexes = list(range(self.max_length_per_sample)) * (self.packed_length // self.max_length_per_sample)
        return {"tokens": tokens, "cu_seqlens": cu_seqlens, "indexes": indexes,
                "labels": labels, "type_ids": type_ids}

    build_unpack = build_pack  # no distinct unpacked mode for this variant


class ConcatDataset:
    """Minimal torch-free ConcatDataset with a merged ``lengths`` attribute."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        self.lengths = np.concatenate([np.asarray(d.lengths) for d in self.datasets])
        self._cum = np.cumsum([len(d) for d in self.datasets])

    def __len__(self):
        return int(self._cum[-1]) if len(self._cum) else 0

    def __getitem__(self, idx):
        ds_idx = int(np.searchsorted(self._cum, idx, side="right"))
        prev = 0 if ds_idx == 0 else int(self._cum[ds_idx - 1])
        return self.datasets[ds_idx][idx - prev]

    def get_dataset_name(self):
        return "+".join(d.get_dataset_name() for d in self.datasets)


def get_packed_dataset_without_short_length(
    folder,
    max_length_per_sample: int = 2048,
    packed_length: int = 4096,
    show_progress: bool = False,
    min_length: int = 50,
    min_length_dict: dict | None = None,
    pack_sample_into_one: bool = False,
    use_packed: bool = True,
    micro_bsz: int = 1,
):
    """Walk a dataset folder of ``*.bin`` files, filter short samples, wrap each in
    a packed dataset, concat (ref ``packed_dataset.py:392+``)."""
    from .single_dataset import JsonlDataset
    from .utils import get_dataset_type_id

    min_length_dict = min_length_dict or {}
    datasets = []
    delete_samples = 0
    for root, _dirs, files in os.walk(folder, followlinks=True):
        for fn in sorted(files):
            if not fn.endswith(".bin"):
                continue
            fp = os.path.join(root, fn)
            ds_type_id = get_dataset_type_id(path=fp)
            ds = JsonlDataset(fp, ds_type_id, min_length=min_length_dict.get(fp, min_length))
            if len(ds) == 0:
                continue
            if hasattr(ds, "old_length"):
                delete_samples += ds.old_length - len(ds)
            cls = PackedDatasetWithoutCuSeqlen if pack_sample_into_one else PackedDatasetWithCut
            datasets.append(cls(ds, max_length_per_sample, packed_length, use_packed, micro_bsz))
    if not datasets:
        raise FileNotFoundError(f"no .bin datasets found under {folder}")
    return ConcatDataset(datasets)
