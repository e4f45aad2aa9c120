#!/bin/bash
# 7-Scenes evaluation (reference: scripts/eval_7_scenes.sh).
set -e
ROOT=${1:-datasets/7-scenes}
shift || true
SEQS=(chess fire heads office pumpkin redkitchen stairs)
for seq in "${SEQS[@]}"; do
  [ -d "$ROOT/$seq" ] || { echo "skip $seq"; continue; }
  echo "=== $seq ==="
  python main.py --dataset "$ROOT/$seq" --config config/eval_calib.yaml \
      --no-viz --save-as eval_7scenes "$@"
  GT="groundtruths/7-scenes/$seq.txt"
  # derive the TUM-format gt from the dataset's own pose files if absent
  [ -f "$GT" ] || python scripts/make_7scenes_gt.py "$ROOT/$seq" "$GT"
  python -m mast3r_slam_tpu.evaluation "$GT" \
      "logs/eval_7scenes/$seq/$seq.txt" -as
done
