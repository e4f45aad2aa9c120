#!/bin/bash
# Replica evaluation (reference: scripts/eval_replica.sh).
set -e
ROOT=${1:-datasets/replica}
shift || true
SEQS=(office0 office1 office2 office3 office4 room0 room1 room2)
for seq in "${SEQS[@]}"; do
  [ -d "$ROOT/$seq" ] || { echo "skip $seq"; continue; }
  echo "=== $seq ==="
  python main.py --dataset "$ROOT/$seq" --config config/eval_replica.yaml \
      --no-viz --save-as eval_replica "$@"
  python -m mast3r_slam_tpu.evaluation "$ROOT/$seq/traj_tum.txt" \
      "logs/eval_replica/$seq/$seq.txt" -as
done
