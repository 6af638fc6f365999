#!/usr/bin/env bash
# Download VoxCeleb metadata (trial lists) — reference:
# preparation_scripts/download_voxceleb_meta.sh
set -euo pipefail
OUT="${1:-data/voxceleb/meta}"
mkdir -p "$OUT"
curl -fL -o "$OUT/veri_test2.txt" \
  https://www.robots.ox.ac.uk/~vgg/data/voxceleb/meta/veri_test2.txt
curl -fL -o "$OUT/list_test_hard2.txt" \
  https://www.robots.ox.ac.uk/~vgg/data/voxceleb/meta/list_test_hard2.txt || true
curl -fL -o "$OUT/list_test_all2.txt" \
  https://www.robots.ox.ac.uk/~vgg/data/voxceleb/meta/list_test_all2.txt || true
echo "metadata in $OUT"
