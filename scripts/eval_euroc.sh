#!/bin/bash
# EuRoC MAV evaluation (reference: scripts/eval_euroc.sh). Uncalibrated mode;
# EuRoC images are always undistorted by the loader.
set -e
ROOT=${1:-datasets/euroc}
shift || true
SEQS=(MH_01_easy MH_02_easy MH_03_medium MH_04_difficult MH_05_difficult
      V1_01_easy V1_02_medium V1_03_difficult V2_01_easy V2_02_medium)
for seq in "${SEQS[@]}"; do
  [ -d "$ROOT/$seq" ] || { echo "skip $seq"; continue; }
  echo "=== $seq ==="
  python main.py --dataset "$ROOT/$seq" --config config/eval_no_calib.yaml \
      --no-viz --save-as eval_euroc "$@"
  GT="groundtruths/euroc/$seq.txt"
  [ -f "$GT" ] || GT="$ROOT/$seq/mav0/state_groundtruth_estimate0/data.csv"
  python -m mast3r_slam_tpu.evaluation "$GT" "logs/eval_euroc/$seq/$seq.txt" -as
done
