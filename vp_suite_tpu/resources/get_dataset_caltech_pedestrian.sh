#!/usr/bin/env bash
# Downloads the Caltech Pedestrian .seq videos (set00-set10).
# Usage: get_dataset_caltech_pedestrian.sh <target_dir>
set -euo pipefail
TARGET=${1:?usage: get_dataset_caltech_pedestrian.sh <target_dir>}
mkdir -p "$TARGET"
BASE="https://data.caltech.edu/records/f6rph-90m20/files"
for i in $(seq -w 0 10); do
  set="set$i"
  if [ ! -d "$TARGET/$set" ]; then
    wget -q -O "$TARGET/$set.tar" "$BASE/$set.tar?download=1"
    tar -xf "$TARGET/$set.tar" -C "$TARGET" && rm "$TARGET/$set.tar"
  fi
done
echo "Caltech Pedestrian sequences at $TARGET (frame counts are built by download_and_prepare_dataset)"
