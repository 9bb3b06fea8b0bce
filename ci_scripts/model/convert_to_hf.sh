#!/usr/bin/env bash
# Export e2e (parity: reference ci_scripts/model/convert_to_hf.sh +
# loaded_as_transformer.py): short demo train -> save -> convert2hf -> load
# the folder with HF transformers and run a forward pass.
set -euo pipefail
cd "$(dirname "$0")/../.."
export IEVO_PLATFORM=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=8"

workdir=$(mktemp -d)
trap 'rm -rf "$workdir"' EXIT

cat > "$workdir/cfg.py" <<PYEOF
import sys; sys.path.insert(0, "$PWD/configs")
from demo import *
ckpt = dict(enable_save_ckpt=True, save_ckpt_folder="$workdir/ckpts",
            auto_resume=False, checkpoint_every=5, async_upload=False, oss_snapshot_freq=0)
data = dict(data, total_steps=5)
PYEOF
python train.py --config "$workdir/cfg.py" > "$workdir/train.log" 2>&1
grep -q "saved checkpoint" "$workdir/train.log"

python tools/convert2hf.py --config "$workdir/cfg.py" --ckpt "$workdir/ckpts/5" \
    --out "$workdir/hf" --format llama --dtype float32

python - "$workdir/hf" <<'PYEOF'
import sys
import torch
from transformers import AutoConfig, AutoModelForCausalLM
folder = sys.argv[1]
cfg = AutoConfig.from_pretrained(folder)
model = AutoModelForCausalLM.from_config(cfg)
sd = torch.load(f"{folder}/pytorch_model.bin", map_location="cpu", weights_only=True)
missing, unexpected = model.load_state_dict(sd, strict=False)
assert not unexpected, unexpected
with torch.no_grad():
    out = model(torch.randint(0, cfg.vocab_size, (1, 16))).logits
assert torch.isfinite(out).all()
print("loaded as transformers:", tuple(out.shape))
PYEOF
echo "CI convert-to-hf PASSED"
