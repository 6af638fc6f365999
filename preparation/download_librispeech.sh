#!/usr/bin/env bash
# Download LibriSpeech splits — reference: download_librispeech.sh
set -euo pipefail
OUT="${1:-data/librispeech}"
mkdir -p "$OUT"
for split in train-clean-100 dev-clean dev-other test-clean test-other; do
  curl -fL -o "$OUT/$split.tar.gz" "https://www.openslr.org/resources/12/$split.tar.gz"
  tar -xzf "$OUT/$split.tar.gz" -C "$OUT"
done
echo "NOTE: convert flac to wav with:"
echo "  python preparation/voxceleb_convert_to_wav.py $OUT/LibriSpeech <out> --ext flac"
