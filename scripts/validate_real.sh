#!/bin/bash
# Turn-key real-weight validation (VERDICT r3 item 5):
#
#   bash scripts/validate_real.sh <ckpt.pth> <tum_seq_dir> [gt.txt]
#
# One command from a released MASt3R checkpoint to an ATE number:
#   1. load the .pth via the REFERENCE loading path (ckpt-args eval,
#      landscape_only=False wrapper — reference mast3r/model.py:21-37),
#      convert to our JAX pytree, save .npz;
#   2. full-size forward parity check torch-CPU vs JAX (all four head
#      outputs at 384x512) — aborts if parity fails;
#   3. run the full SLAM system headless + deterministic on the TUM
#      sequence with the converted weights (reference scripts/eval_tum.sh);
#   4. score ATE RMSE with the built-in evo_ape-equivalent
#      (python -m mast3r_slam_tpu.evaluation gt est -as).
#
# gt.txt defaults to <tum_seq_dir>/groundtruth.txt (the TUM layout).
set -e
CKPT=${1:?usage: validate_real.sh <ckpt.pth> <tum_seq_dir> [gt.txt]}
SEQ=${2:?usage: validate_real.sh <ckpt.pth> <tum_seq_dir> [gt.txt]}
GT=${3:-$SEQ/groundtruth.txt}
NPZ=${NPZ:-logs/real/$(basename "$CKPT" .pth).npz}
mkdir -p "$(dirname "$NPZ")"

echo "=== 1+2. convert + parity check ($CKPT) ==="
JAX_PLATFORMS=cpu python scripts/full_parity_check.py \
    --ckpt "$CKPT" --save-npz "$NPZ"

echo "=== 3. SLAM run on $SEQ ==="
NAME=$(basename "$SEQ")
python main.py --dataset "$SEQ" --config config/eval_calib.yaml \
    --no-viz --save-as validate_real --weights "$NPZ"

echo "=== 4. ATE ==="
python -m mast3r_slam_tpu.evaluation "$GT" \
    "logs/validate_real/$NAME/$NAME.txt" -as
