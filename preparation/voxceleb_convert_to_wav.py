#!/usr/bin/env python
"""Convert VoxCeleb m4a/aac files to 16 kHz mono PCM16 wav with an ffmpeg
process pool (the reference's `preparation_scripts/voxceleb2_convert_to_wav.py`).

Usage: python preparation/voxceleb_convert_to_wav.py <in_dir> <out_dir> [-j N]
"""

from __future__ import annotations

import argparse
import pathlib
import subprocess
import sys
from concurrent.futures import ProcessPoolExecutor


def convert_one(args):
    src, dst = args
    dst.parent.mkdir(parents=True, exist_ok=True)
    cmd = [
        "ffmpeg", "-y", "-loglevel", "error", "-i", str(src),
        "-ar", "16000", "-ac", "1", "-c:a", "pcm_s16le", str(dst),
    ]
    return subprocess.run(cmd, capture_output=True).returncode, src


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("in_dir", type=pathlib.Path)
    ap.add_argument("out_dir", type=pathlib.Path)
    ap.add_argument("-j", "--jobs", type=int, default=8)
    ap.add_argument("--ext", default="m4a")
    args = ap.parse_args(argv)

    jobs = []
    for src in sorted(args.in_dir.rglob(f"*.{args.ext}")):
        rel = src.relative_to(args.in_dir).with_suffix(".wav")
        jobs.append((src, args.out_dir / rel))
    print(f"converting {len(jobs)} files with {args.jobs} workers")
    failures = 0
    with ProcessPoolExecutor(max_workers=args.jobs) as pool:
        for code, src in pool.map(convert_one, jobs, chunksize=16):
            if code != 0:
                failures += 1
                print(f"FAILED: {src}", file=sys.stderr)
    print(f"done, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
