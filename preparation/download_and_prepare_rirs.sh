#!/usr/bin/env bash
# Download RIRS_NOISES and build pointsource-noise shards — reference:
# preparation_scripts/download_and_prepare_rirs.sh
set -euo pipefail
OUT="${1:-data/rirs}"
mkdir -p "$OUT"
curl -fL -o "$OUT/rirs_noises.zip" https://www.openslr.org/resources/28/rirs_noises.zip
unzip -q -o "$OUT/rirs_noises.zip" -d "$OUT"
python preparation/build_rirs_shards.py "$OUT/RIRS_NOISES/pointsource_noises" "$OUT/shards"
