"""Pack-construction parity vs the actual reference PackedDatasetWithCut.

Runs the reference data pipeline (same CPU harness as test_reference_parity)
over the SAME synthetic dataset and compares every field of every pack —
tokens, labels, cu_seqlens, indexes, type_ids — byte for byte.  This is the
contract exact loss-matching over long horizons depends on (SURVEY A.4).
"""

import json
import subprocess
import sys

import numpy as np

N_SAMPLES, MAX_LEN, PACKED = 120, 96, 192

DRIVER = rf"""
import json
import sys

sys.path.insert(0, "tests/test_training")
from reference_harness import install_reference, launch_reference, reference_config

cfg = reference_config(seq={MAX_LEN})
cfg["data"]["packed_length"] = {PACKED}
cfg["data"]["micro_bsz"] = {PACKED} // {MAX_LEN}
launch_reference(cfg)

from internlm.data.tokenized.dummy_dataset import RandomDataset
from internlm.data.tokenized.packed_dataset import PackedDatasetWithCut

ds = RandomDataset(num_samples={N_SAMPLES}, max_len={MAX_LEN})
packed = PackedDatasetWithCut(ds, max_length_per_sample={MAX_LEN}, packed_length={PACKED})
out = []
for i in range(min(10, len(packed))):
    p = packed.build_pack(i)
    out.append({{k: [int(x) for x in v] for k, v in p.items()}})
json.dump({{"n_packs": len(packed), "packs": out}}, open(sys.argv[1], "w"))
print("REF_OK")
"""


def test_packs_identical_to_reference(tmp_path):
    out_file = str(tmp_path / "packs.json")
    proc = subprocess.run([sys.executable, "-c", DRIVER, out_file],
                          capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert "REF_OK" in proc.stdout, proc.stdout[-1500:] + proc.stderr[-3000:]
    ref = json.load(open(out_file))

    from internevo_tpu.data.dummy_dataset import RandomDataset
    from internevo_tpu.data.packed_dataset import PackedDatasetWithCut

    ds = RandomDataset(num_samples=N_SAMPLES, max_len=MAX_LEN)
    packed = PackedDatasetWithCut(ds, max_length_per_sample=MAX_LEN, packed_length=PACKED)
    assert len(packed) == ref["n_packs"]
    for i, ref_pack in enumerate(ref["packs"]):
        ours = packed.build_pack(i)
        for key in ("tokens", "labels", "cu_seqlens", "indexes", "type_ids"):
            assert list(ours[key]) == ref_pack[key], f"pack {i} field {key} differs"


SAMPLER_DRIVER = r"""
import json
import sys

sys.path.insert(0, "tests/test_training")
from reference_harness import launch_reference, reference_config

launch_reference(reference_config())

class _FakeDs:
    def __init__(self, n): self.n = n
    def __len__(self): return self.n

from internlm.data.tokenized.batch_sampler import StaticBatchSampler

sampler = StaticBatchSampler([_FakeDs(4000)], batch_size=8, rampup_batch_size="4 2 3",
                             micro_bsz=1, seed=7, drop_last=True,
                             data_rank=0, data_world_size=2)
it = iter(sampler)
batches = [[int(x) for x in next(it)] for _ in range(12)]
json.dump(batches, open(sys.argv[1], "w"))
print("REF_OK")
"""


def test_sampler_stream_identical_to_reference(tmp_path):
    out_file = str(tmp_path / "sampler.json")
    proc = subprocess.run([sys.executable, "-c", SAMPLER_DRIVER, out_file],
                          capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert "REF_OK" in proc.stdout, proc.stdout[-1500:] + proc.stderr[-3000:]
    ref_batches = json.load(open(out_file))

    from internevo_tpu.data.batch_sampler import StaticBatchSampler

    class _FakeDs:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

    sampler = StaticBatchSampler([_FakeDs(4000)], batch_size=8, rampup_batch_size="4 2 3",
                                 micro_bsz=1, seed=7, drop_last=True,
                                 data_rank=0, data_world_size=2)
    it = iter(sampler)
    ours = [[int(x) for x in next(it)] for _ in range(12)]
    assert ours == ref_batches
