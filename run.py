#!/usr/bin/env python
"""Train + evaluate entry point (the reference's `run.py` CLI contract).

Usage mirrors Hydra (`/root/reference/run.py:31-48`, README commands):

    python run.py +experiment=speaker_xvector \\
        data.module.data_dir=/data/voxceleb/wav \\
        trainer.max_steps=100000 optim.algo.lr=4e-4 tag=mytag

Loads `.env`-style variables from an `.env` file when present (the reference
uses python-dotenv), composes `config/train_eval.yaml` with the overrides,
runs training + evaluation, prints and returns the scalar objective
(EER or WER) for sweepers.
"""

from __future__ import annotations

import os
import pathlib
import sys

CONFIG_DIR = pathlib.Path(__file__).parent / "config"


def _load_dotenv(path: pathlib.Path = pathlib.Path(".env")) -> None:
    if not path.exists():
        return
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        k, _, v = line.partition("=")
        os.environ.setdefault(k.strip(), v.strip())


def _expand_multirun(overrides):
    """Hydra-style grid sweep: `key=a,b` fans out (lists `[a,b]` do not)."""
    import itertools

    fixed, axes = [], []
    for ov in overrides:
        key, _, raw = ov.partition("=")
        if "," in raw and not raw.strip().startswith(("[", "{")):
            axes.append([(key, v) for v in raw.split(",")])
        else:
            fixed.append(ov)
    if not axes:
        return [overrides]
    runs = []
    for combo in itertools.product(*axes):
        runs.append(fixed + [f"{k}={v}" for k, v in combo])
    return runs


def main(argv=None) -> float:
    _load_dotenv()
    overrides = list(sys.argv[1:] if argv is None else argv)
    multirun = False
    for flag in ("-m", "--multirun"):
        if flag in overrides:
            overrides.remove(flag)
            multirun = True

    from w2v2_speaker_tpu.runtime.config import load_config
    from w2v2_speaker_tpu.runtime.experiment import run_train_eval

    if not multirun:
        cfg = load_config(CONFIG_DIR, "train_eval", overrides)
        objective = run_train_eval(cfg)
        print(f"objective: {objective}")
        return objective

    # grid sweep (the reference's hydra-multirun/sweeper role)
    results = []
    for i, run_overrides in enumerate(_expand_multirun(overrides)):
        print(f"=== multirun job {i}: {run_overrides}")
        cfg = load_config(CONFIG_DIR, "train_eval", run_overrides)
        # each sweep job gets its own checkpoint subdir (hydra sweep-dir role)
        cfg["trainer"]["checkpoint_dir"] = (
            str(cfg["trainer"]["checkpoint_dir"]) + f"/job{i}"
        )
        results.append((run_overrides, run_train_eval(cfg)))
    print("=== multirun summary (sorted by objective)")
    results.sort(key=lambda r: r[1])
    for run_overrides, objective in results:
        print(f"{objective:.5f}  {run_overrides}")
    best = results[0][1]
    print(f"objective: {best}")
    return best


if __name__ == "__main__":
    main()
