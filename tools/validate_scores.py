#!/usr/bin/env python
"""Validate a score file against a trial-pair file and zip it for submission.

Equivalent of the reference's `preparation_scripts/validate_scores.py:1-135`:
every pair must have exactly one score line `<score> <file1> <file2>` with
the score in [0, 1]; on success the score file is zipped for upload.

Usage: python tools/validate_scores.py <scores.txt> <pairs.txt> [--zip]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import zipfile


def load_pair_file(path: pathlib.Path):
    pairs = []
    for line in path.read_text().splitlines():
        parts = line.strip().split(" ")
        if len(parts) == 3:
            pairs.append((parts[1], parts[2]))
        elif len(parts) == 2:
            pairs.append((parts[0], parts[1]))
    return pairs


def load_score_file(path: pathlib.Path):
    scores = {}
    for i, line in enumerate(path.read_text().splitlines()):
        parts = line.strip().split(" ")
        if len(parts) != 3:
            raise ValueError(f"line {i + 1}: expected '<score> <f1> <f2>'")
        score = float(parts[0])
        if not (0.0 <= score <= 1.0):
            raise ValueError(f"line {i + 1}: score {score} outside [0, 1]")
        key = (parts[1], parts[2])
        if key in scores:
            raise ValueError(f"line {i + 1}: duplicate pair {key}")
        scores[key] = score
    return scores


def validate(score_path: pathlib.Path, pair_path: pathlib.Path) -> int:
    pairs = load_pair_file(pair_path)
    scores = load_score_file(score_path)
    missing = [p for p in pairs if p not in scores]
    extra = set(scores) - set(pairs)
    if missing:
        raise ValueError(f"{len(missing)} pairs missing scores, e.g. {missing[0]}")
    if extra:
        raise ValueError(f"{len(extra)} scored pairs not in the trial list")
    return len(pairs)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("scores", type=pathlib.Path)
    ap.add_argument("pairs", type=pathlib.Path)
    ap.add_argument("--zip", action="store_true", help="zip for submission")
    args = ap.parse_args(argv)
    n = validate(args.scores, args.pairs)
    print(f"OK: {n} pairs validated")
    if args.zip:
        out = args.scores.with_suffix(".zip")
        with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
            z.write(args.scores, args.scores.name)
        print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
