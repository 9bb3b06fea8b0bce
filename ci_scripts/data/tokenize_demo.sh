#!/usr/bin/env bash
# Data-pipeline e2e (parity: reference ci_scripts/data/tokenizer_*.sh):
# raw text -> tools/tokenizer.py -> .bin/.bin.meta -> JsonlDataset readback,
# plus an alpaca-format SFT split via tools/alpaca_tokenizer.py.
set -euo pipefail
cd "$(dirname "$0")/../.."
export IEVO_PLATFORM=cpu

workdir=$(mktemp -d)
trap 'rm -rf "$workdir"' EXIT

printf 'hello tpu world\nthe quick brown fox\npacked sequences everywhere\n' > "$workdir/raw.txt"
python tools/tokenizer.py --text_input_path "$workdir/raw.txt" \
    --bin_output_path "$workdir/ds/demo.bin"
python - "$workdir/ds/demo.bin" <<'PYEOF'
import sys
from internevo_tpu.data.single_dataset import JsonlDataset
ds = JsonlDataset(sys.argv[1], min_length=1)
assert len(ds) == 3, len(ds)
sample = ds[0]
assert len(sample["tokens"]) > 0
print(f"tokenized readback OK: {len(ds)} samples, first len {len(sample['tokens'])}")
PYEOF

python - "$workdir/alpaca.json" <<'PYEOF'
import json, sys
data = [{"instruction": f"say {i}", "input": "", "output": f"answer {i}"} for i in range(10)]
json.dump(data, open(sys.argv[1], "w"))
PYEOF
python tools/alpaca_tokenizer.py "$workdir/alpaca.json" "$workdir/sft" --split_ratio 0.2
ls "$workdir/sft"
echo "CI data tokenize PASSED"
