"""Host input-pipeline throughput: decode -> augment -> chunk -> normalize
-> batch, samples/sec on this host.

The device step consumes batch_size/step_ms utt/s (BASE batch-66: ~560
utt/s on one v5e); the host pipeline must outrun that times the data-axis
size. This host has ONE CPU, so treat absolute numbers as a lower bound —
ParallelMap scales the DSP across cores on a real TPU VM host
(data/datamodule.py::ParallelMap). Usage:

  python tools/bench_pipeline.py [--augment] [--workers N] [--utts N]
"""

import argparse
import pathlib
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--augment", action="store_true")
    ap.add_argument("--workers", type=int, default=1)
    ap.add_argument("--utts", type=int, default=192)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    from w2v2_speaker_tpu.data.datamodule import (
        VoxCelebConfig,
        VoxCelebDataModule,
    )
    from w2v2_speaker_tpu.data.io import write_wav
    from w2v2_speaker_tpu.runtime.experiment import build_augmenter

    sr = 16000
    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as td:
        root = pathlib.Path(td)
        wav_dir = root / "wav"
        n_spk = max(8, args.utts // 6)
        made = 0
        for s in range(n_spk):
            for u in range(6):
                if made >= args.utts:
                    break
                p = wav_dir / f"id{s:05d}/yt0/{u:05d}.wav"
                p.parent.mkdir(parents=True, exist_ok=True)
                dur = int(sr * rng.uniform(3.5, 8.0))
                write_wav(
                    p, rng.normal(0, 0.1, dur).astype(np.float32), sr
                )
                made += 1
        aug = None
        if args.augment:
            aug = build_augmenter(
                {
                    "augment": {
                        "enabled": True,
                        # explicit params: build_augmenter gates on dict
                        # truthiness, so empty {} would disable the op
                        "time_dropout": {"max_seconds": 0.25, "max_count": 5},
                        "freq_dropout": {"max_count": 5},
                        "speed_choices": [0.95, 1.0, 1.05],
                        "reverb": True,
                        "noise_snr": [15, 20],
                        "stack": False,
                        "yield_intermediate": True,
                        "yield_unaugmented": True,
                    }
                },
                seed=0,
            )
        dm = VoxCelebDataModule(
            VoxCelebConfig(
                data_dir=wav_dir,
                shards_dir=root / "shards",
                samples_per_shard=min(64, max(8, args.utts // 3)),
                batch_size=args.batch,
                chunk_length_sec=3.0,
                augmenter=aug,
                num_pipeline_workers=args.workers,
                eer_validation_pairs=0,
                train_val_ratio=1.0,
            )
        )
        dm.prepare_data()
        # warm one epoch (decode caches, thread spin-up), then time one
        for _ in dm.train_batches(epoch=0):
            pass
        t0 = time.perf_counter()
        n_samples = 0
        for batch in dm.train_batches(epoch=1):
            n_samples += batch["features"].shape[0]
        dt = time.perf_counter() - t0
        label = "augmented" if args.augment else "plain"
        print(
            f"host pipeline ({label}, workers={args.workers}): "
            f"{n_samples / dt:.0f} samples/s "
            f"({n_samples} 3 s crops in {dt:.2f} s)"
        )


if __name__ == "__main__":
    main()
