#!/usr/bin/env python
"""Fetch pretrained wav2vec checkpoints and convert them to native JAX trees.

Equivalent of the reference's preparation_scripts/download_pretrained_models.sh
(which curls fairseq .pt files), adapted to this framework's converters:

- wav2vec2 BASE/LARGE come from the HuggingFace hub dumps
  (facebook/wav2vec2-base / -large and the fine-tuned -960h variants) and
  are converted with models/wav2vec2_convert.py::hf_state_dict_to_flax.
- wav2vec v1 comes from the fairseq release URL (wav2vec_large.pt) and is
  converted with models/wav2vec1.py::fairseq_state_dict_to_flax.

Usage:
  python preparation/download_pretrained_models.py --out $DATA/pretrained \
      [--models base large base-960h large-960h wav2vec1] [--convert]

Downloads resume (curl -C -) and are skipped when the target exists, like
the reference script. --convert additionally writes `<name>.msgpack` flax
param trees next to the torch dumps so training hosts need no torch.
"""

from __future__ import annotations

import argparse
import pathlib
import subprocess
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# HF resolve endpoints serve plain files; *.safetensors loads torch-free.
URLS = {
    "base": (
        "https://huggingface.co/facebook/wav2vec2-base/resolve/main/model.safetensors",
        "wav2vec2_base_noft.safetensors",
    ),
    "base-960h": (
        "https://huggingface.co/facebook/wav2vec2-base-960h/resolve/main/model.safetensors",
        "wav2vec2_base_ft960h.safetensors",
    ),
    "large": (
        "https://huggingface.co/facebook/wav2vec2-large/resolve/main/model.safetensors",
        "wav2vec2_large_noft.safetensors",
    ),
    "large-960h": (
        "https://huggingface.co/facebook/wav2vec2-large-960h/resolve/main/model.safetensors",
        "wav2vec2_large_ft960h.safetensors",
    ),
    "wav2vec1": (
        "https://dl.fbaipublicfiles.com/fairseq/wav2vec/wav2vec_large.pt",
        "wav2vec_large.pt",
    ),
}


def fetch(url: str, dest: pathlib.Path) -> bool:
    if dest.exists():
        print(f"skip (exists): {dest.name}")
        return True
    print(f"{url} -> {dest}")
    r = subprocess.run(["curl", "-L", "-C", "-", url, "--output", str(dest)])
    return r.returncode == 0 and dest.exists()


def convert(path: pathlib.Path) -> None:
    import numpy as np
    from flax.serialization import msgpack_serialize

    from w2v2_speaker_tpu.models.wav2vec2 import BASE_CONFIG, LARGE_CONFIG
    from w2v2_speaker_tpu.models.wav2vec2_convert import load_hf_checkpoint

    if path.suffix == ".pt":  # fairseq wav2vec v1
        import torch

        from w2v2_speaker_tpu.models.wav2vec1 import fairseq_state_dict_to_flax

        ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
        params = fairseq_state_dict_to_flax(ckpt["model"])
    else:
        cfg = LARGE_CONFIG if "large" in path.name else BASE_CONFIG
        params = load_hf_checkpoint(str(path), cfg)
    out = path.with_suffix(".msgpack")
    out.write_bytes(msgpack_serialize(params))
    print(f"converted -> {out.name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, type=pathlib.Path)
    ap.add_argument(
        "--models", nargs="*", default=list(URLS), choices=list(URLS)
    )
    ap.add_argument("--convert", action="store_true")
    args = ap.parse_args()
    args.out.mkdir(parents=True, exist_ok=True)

    failed = []
    for name in args.models:
        url, fname = URLS[name]
        dest = args.out / fname
        if not fetch(url, dest):
            failed.append(name)
            continue
        if args.convert:
            convert(dest)
    if failed:
        print(f"FAILED: {', '.join(failed)}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
