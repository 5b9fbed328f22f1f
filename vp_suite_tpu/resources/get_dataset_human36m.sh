#!/usr/bin/env bash
# Downloads the Human 3.6M videos (requires a registered account cookie/token).
# Usage: get_dataset_human36m.sh <target_dir>
# The official download needs authentication; place PHPSESSID in H36M_SESSION.
set -euo pipefail
TARGET=${1:?usage: get_dataset_human36m.sh <target_dir>}
: "${H36M_SESSION:?set H36M_SESSION to your vision.imar.ro PHPSESSID cookie}"
mkdir -p "$TARGET/training" "$TARGET/testing"
BASE="http://vision.imar.ro/human3.6m/filebrowser.php"
# training subjects S1,S5,S6,S7,S8; testing S9,S11 (standard protocol)
for s in 1 5 6 7 8; do
  wget -q --header "Cookie: PHPSESSID=$H36M_SESSION" \
    -O "$TARGET/training/Videos_S$s.tgz" \
    "$BASE?download=1&filepath=Videos&filename=SubjectSpecific_$s.tgz"
  tar -xzf "$TARGET/training/Videos_S$s.tgz" -C "$TARGET/training" && rm "$TARGET/training/Videos_S$s.tgz"
done
for s in 9 11; do
  wget -q --header "Cookie: PHPSESSID=$H36M_SESSION" \
    -O "$TARGET/testing/Videos_S$s.tgz" \
    "$BASE?download=1&filepath=Videos&filename=SubjectSpecific_$s.tgz"
  tar -xzf "$TARGET/testing/Videos_S$s.tgz" -C "$TARGET/testing" && rm "$TARGET/testing/Videos_S$s.tgz"
done
echo "Human3.6M videos at $TARGET (frame counts are built by download_and_prepare_dataset)"
