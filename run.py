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


def main(argv=None) -> float:
    _load_dotenv()
    overrides = list(sys.argv[1:] if argv is None else argv)

    from w2v2_speaker_tpu.runtime.config import load_config
    from w2v2_speaker_tpu.runtime.experiment import run_train_eval

    cfg = load_config(CONFIG_DIR, "train_eval", overrides)
    objective = run_train_eval(cfg)
    print(f"objective: {objective}")
    return objective


if __name__ == "__main__":
    main()
