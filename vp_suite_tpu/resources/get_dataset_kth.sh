#!/usr/bin/env bash
# Downloads and prepares the KTH Actions dataset (64x64 frame PNGs).
# Usage: get_dataset_kth.sh <target_dir>
# Flow: fetch the per-class video zips from the official KTH site, extract
# frames at 64x64 with ffmpeg into processed/<class>/<video>/, then build the
# JSON split metadata with vp_suite_tpu.datasets.kth.build_kth_metadata.
set -euo pipefail
TARGET=${1:?usage: get_dataset_kth.sh <target_dir>}
mkdir -p "$TARGET/raw" "$TARGET/processed"
CLASSES="boxing handclapping handwaving walking running jogging"
for c in $CLASSES; do
  if [ ! -f "$TARGET/raw/$c.zip" ]; then
    wget -q -O "$TARGET/raw/$c.zip" "https://www.csc.kth.se/cvap/actions/$c.zip"
  fi
  mkdir -p "$TARGET/raw/$c"
  unzip -oq "$TARGET/raw/$c.zip" -d "$TARGET/raw/$c"
  for vid in "$TARGET/raw/$c"/*.avi; do
    name=$(basename "$vid" .avi)
    out="$TARGET/processed/$c/$name"
    mkdir -p "$out"
    ffmpeg -loglevel error -y -i "$vid" -vf scale=64:64 "$out/image-%03d_64x64.png"
  done
done
python -c "
from pathlib import Path
from vp_suite_tpu.datasets.kth import build_kth_metadata, KTHActionsDataset
build_kth_metadata(Path('$TARGET')/'processed', KTHActionsDataset.CLASSES)
"
echo "KTH prepared at $TARGET/processed"
