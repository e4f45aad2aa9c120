#!/bin/bash
# TUM RGB-D evaluation harness (reference: scripts/eval_tum.sh).
# Usage: bash scripts/eval_tum.sh <datasets_root> [--no-calib] [--weights W]
set -e
ROOT=${1:-datasets/tum}
shift || true
CONFIG=config/eval_calib.yaml
EXTRA=()
while [[ $# -gt 0 ]]; do
  case "$1" in
    --no-calib) CONFIG=config/eval_no_calib.yaml ;;
    --weights) EXTRA+=(--weights "$2"); shift ;;
    *) EXTRA+=("$1") ;;
  esac
  shift
done

SEQS=(
  rgbd_dataset_freiburg1_360 rgbd_dataset_freiburg1_desk
  rgbd_dataset_freiburg1_desk2 rgbd_dataset_freiburg1_floor
  rgbd_dataset_freiburg1_plant rgbd_dataset_freiburg1_room
  rgbd_dataset_freiburg1_rpy rgbd_dataset_freiburg1_teddy
  rgbd_dataset_freiburg1_xyz
)

for seq in "${SEQS[@]}"; do
  [ -d "$ROOT/$seq" ] || { echo "skip $seq (not found)"; continue; }
  echo "=== $seq ==="
  python main.py --dataset "$ROOT/$seq" --config "$CONFIG" --no-viz \
      --save-as eval_tum "${EXTRA[@]}"
  python -m mast3r_slam_tpu.evaluation \
      "$ROOT/$seq/groundtruth.txt" "logs/eval_tum/$seq/$seq.txt" -as
done
