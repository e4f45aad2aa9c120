#!/bin/bash
# Fetch the EuRoC MAV sequences used by eval_euroc.sh. Usage:
#   bash scripts/download_euroc.sh [target_dir]
set -e
ROOT=${1:-datasets/euroc}
mkdir -p "$ROOT" && cd "$ROOT"
BASE=http://robotics.ethz.ch/~asl-datasets/ijrr_euroc_mav_dataset
declare -A SEQS=(
  [MH_01_easy]=machine_hall [MH_02_easy]=machine_hall
  [MH_03_medium]=machine_hall [MH_04_difficult]=machine_hall
  [MH_05_difficult]=machine_hall
  [V1_01_easy]=vicon_room1 [V1_02_medium]=vicon_room1
  [V1_03_difficult]=vicon_room1
  [V2_01_easy]=vicon_room2 [V2_02_medium]=vicon_room2
  [V2_03_difficult]=vicon_room2
)
for s in "${!SEQS[@]}"; do
  [ -d "$s" ] && continue
  wget -c "$BASE/${SEQS[$s]}/$s/$s.zip"
  mkdir -p "$s" && unzip -qo "$s.zip" -d "$s" && rm -f "$s.zip"
done
