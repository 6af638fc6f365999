#!/usr/bin/env python
"""Embedding-extraction + pair-scoring entry point (the reference's
predict.py CLI). Usage:

    python predict.py network=wav2vec2_fc \\
        load_network_from_checkpoint=logs/<exp>/checkpoints/best \\
        predict_folder_path=/data/voxsrc/wav \\
        pair_prediction_path=/data/voxsrc/pairs.txt
"""
import pathlib
import sys

CONFIG_DIR = pathlib.Path(__file__).parent / "config"


def main(argv=None):
    from w2v2_speaker_tpu.runtime.config import load_config
    from w2v2_speaker_tpu.runtime.predict import run_predictions

    overrides = list(sys.argv[1:] if argv is None else argv)
    if overrides[:1] == ["-sc"]:
        from w2v2_speaker_tpu.runtime.completion import (
            handle_shell_completion,
        )

        handle_shell_completion(
            CONFIG_DIR, overrides[1:], entry="predict", script_path=__file__
        )
        return None
    from w2v2_speaker_tpu.runtime.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    cfg = load_config(CONFIG_DIR, "predict", overrides)
    return run_predictions(cfg)


if __name__ == "__main__":
    main()
