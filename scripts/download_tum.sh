#!/bin/bash
# Fetch the TUM RGB-D freiburg1 sequences used by eval_tum.sh
# (reference capability: scripts/download_tum.sh). Usage:
#   bash scripts/download_tum.sh [target_dir]
set -e
ROOT=${1:-datasets/tum}
mkdir -p "$ROOT" && cd "$ROOT"
SEQS=(360 floor desk desk2 room plant teddy xyz rpy)
for s in "${SEQS[@]}"; do
  f="rgbd_dataset_freiburg1_${s}.tgz"
  [ -d "rgbd_dataset_freiburg1_${s}" ] && continue
  wget -c "https://cvg.cit.tum.de/rgbd/dataset/freiburg1/${f}"
  tar -xzf "$f" && rm -f "$f"
done
