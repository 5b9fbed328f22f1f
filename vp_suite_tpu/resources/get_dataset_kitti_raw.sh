#!/usr/bin/env bash
# Downloads the KITTI raw 'city' drives (synced+rectified PNGs).
# Usage: get_dataset_kitti_raw.sh <target_dir>
set -euo pipefail
TARGET=${1:?usage: get_dataset_kitti_raw.sh <target_dir>}
mkdir -p "$TARGET"
BASE="https://s3.eu-central-1.amazonaws.com/avg-kitti/raw_data"
DRIVES="2011_09_26_drive_0001 2011_09_26_drive_0002 2011_09_26_drive_0005 \
2011_09_26_drive_0009 2011_09_26_drive_0011 2011_09_26_drive_0013 \
2011_09_26_drive_0014 2011_09_26_drive_0017 2011_09_26_drive_0018"
for d in $DRIVES; do
  f="${d}_sync.zip"
  if [ ! -d "$TARGET/${d%_drive_*}" ] || ! ls "$TARGET"/*/"${d}_sync" >/dev/null 2>&1; then
    wget -q -O "$TARGET/$f" "$BASE/$d/$f" && unzip -oq "$TARGET/$f" -d "$TARGET" && rm "$TARGET/$f"
  fi
done
echo "KITTI raw drives at $TARGET"
