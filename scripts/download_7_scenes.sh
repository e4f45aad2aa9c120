#!/bin/bash
# Fetch the Microsoft 7-Scenes sequences used by eval_7_scenes.sh. Usage:
#   bash scripts/download_7_scenes.sh [target_dir]
set -e
ROOT=${1:-datasets/7_scenes}
mkdir -p "$ROOT" && cd "$ROOT"
BASE=http://download.microsoft.com/download/2/8/5/28564B23-0828-408F-8631-23B1EFF1DAC8
for s in chess fire heads office pumpkin redkitchen stairs; do
  [ -d "$s" ] && continue
  wget -c "$BASE/$s.zip"
  unzip -qo "$s.zip" && rm -f "$s.zip"
  for z in "$s"/seq-*.zip; do unzip -qo "$z" -d "$s" && rm -f "$z"; done
done
