#!/bin/bash
# Fetch the ETH3D SLAM training sequences used by eval_eth3d.sh. Usage:
#   bash scripts/download_eth3d.sh [target_dir]
set -e
ROOT=${1:-datasets/eth3d}
mkdir -p "$ROOT" && cd "$ROOT"
for s in cables_1 camera_shake_1 ceiling_1 desk_3 einstein_1 mannequin_face_1 \
         planar_2 plant_scene_1 sfm_lab_room_1 sofa_1 table_3; do
  [ -d "$s" ] && continue
  wget -c "https://www.eth3d.net/data/slam/datasets/${s}_mono.zip"
  unzip -qo "${s}_mono.zip" && rm -f "${s}_mono.zip"
done
