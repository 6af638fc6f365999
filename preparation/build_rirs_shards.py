#!/usr/bin/env python
"""Build pointsource-noise shards from the RIRS_NOISES corpus for the
ChoiceRirsNoiseAugment augmentation (the reference's
`download_and_prepare_rirs.sh` tar-building step).

Usage: python preparation/build_rirs_shards.py <rirs_pointsource_dir> <out_dir>
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from w2v2_speaker_tpu.data.io import load_raw_audio
from w2v2_speaker_tpu.data.shards import ShardWriter


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("in_dir", type=pathlib.Path)
    ap.add_argument("out_dir", type=pathlib.Path)
    ap.add_argument("--per-shard", type=int, default=200)
    args = ap.parse_args(argv)
    args.out_dir.mkdir(parents=True, exist_ok=True)

    wavs = sorted(args.in_dir.rglob("*.wav"))
    if not wavs:
        raise SystemExit(f"no wavs under {args.in_dir}")
    shard, writer, count = 0, None, 0
    for i, path in enumerate(wavs):
        if writer is None:
            writer = ShardWriter(
                args.out_dir / f"pointsource_noises-{shard:04d}.tar"
            )
        writer.write(
            f"noise/{path.stem}", load_raw_audio(path), {"source": path.name}
        )
        count += 1
        if count >= args.per_shard:
            writer.close()
            writer, count, shard = None, 0, shard + 1
    if writer is not None:
        writer.close()
    print(f"wrote {shard + (1 if count else 0)} shards from {len(wavs)} files")
    return 0


if __name__ == "__main__":
    sys.exit(main())
