#!/usr/bin/env bash
# e2e demo training (parity with reference ci_scripts/train/*.sh):
# trains the demo config on an 8-device virtual CPU mesh, checks that metric
# lines appear and loss decreases, exercises save + exact resume.
set -euo pipefail
cd "$(dirname "$0")/.."

export IEVO_PLATFORM=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=8"

workdir=$(mktemp -d)
trap 'rm -rf "$workdir"' EXIT

cat > "$workdir/ci_cfg.py" <<EOF
import sys; sys.path.insert(0, "$PWD/configs")
from demo import *
ckpt = dict(enable_save_ckpt=True, save_ckpt_folder="$workdir/ckpts",
            auto_resume=True, checkpoint_every=10, async_upload=False, oss_snapshot_freq=0)
data = dict(data, total_steps=15)
EOF

echo "== first run (15 steps, save at 10)"
python train.py --config "$workdir/ci_cfg.py" > "$workdir/run1.log" 2>&1
grep -q "saved checkpoint" "$workdir/run1.log"
echo "metric lines: $(grep -c 'tflops=' "$workdir/run1.log")"

first_loss=$(grep "tflops=" "$workdir/run1.log" | head -1 | sed 's/.*loss=\([0-9.]*\).*/\1/')
last_loss=$(grep "tflops=" "$workdir/run1.log" | tail -1 | sed 's/.*loss=\([0-9.]*\).*/\1/')
python - "$first_loss" "$last_loss" <<'PYEOF'
import sys
first, last = float(sys.argv[1]), float(sys.argv[2])
assert last < first, (first, last)
print(f"loss {first} -> {last} OK")
PYEOF

echo "== resume run (must continue bit-identically at step 10)"
python train.py --config "$workdir/ci_cfg.py" > "$workdir/run2.log" 2>&1
grep -q "resumed from" "$workdir/run2.log"
step10_run1=$(grep "step=10 " "$workdir/run1.log" | sed 's/.*\(loss=[0-9.]*\).*/\1/')
step10_run2=$(grep "step=10 " "$workdir/run2.log" | sed 's/.*\(loss=[0-9.]*\).*/\1/')
[ "$step10_run1" = "$step10_run2" ] && echo "resume bit-exact: $step10_run1"

echo "CI demo e2e PASSED"
