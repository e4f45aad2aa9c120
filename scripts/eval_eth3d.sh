#!/bin/bash
# ETH3D SLAM evaluation (reference: scripts/eval_eth3d.sh).
set -e
ROOT=${1:-datasets/eth3d}
shift || true
for seqdir in "$ROOT"/*/; do
  seq=$(basename "$seqdir")
  [ -f "$seqdir/rgb.txt" ] || continue
  echo "=== $seq ==="
  python main.py --dataset "$seqdir" --config config/eth3d.yaml \
      --no-viz --save-as eval_eth3d "$@"
  python -m mast3r_slam_tpu.evaluation "$seqdir/groundtruth.txt" \
      "logs/eval_eth3d/$seq/$seq.txt" -as
done
