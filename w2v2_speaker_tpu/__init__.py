"""TPU-native speaker & speech recognition framework (JAX / XLA / Pallas / pjit).

A from-scratch rebuild of the capabilities of the PyTorch-Lightning reference
``nikvaessen/w2v2-speaker`` (ICASSP 2022, arXiv:2109.15053), designed TPU-first:

- ``data``       host-side data layer: tar shards, chunking, normalization,
                 augmentation, batch builders emitting fixed-shape numpy batches
- ``models``     functional flax model zoo: wav2vec2, x-vector, ECAPA-TDNN,
                 wav2spk, pooling zoo, maskers
- ``objectives`` losses (CE / AAM-softmax / BCE / triplet / CTC) and LR schedules
- ``ops``        Pallas TPU kernels (flash attention, fused scoring)
- ``parallel``   device-mesh / sharding helpers (pjit data parallel and beyond)
- ``train``      TrainState, pjit-ed train/eval steps, checkpointing
- ``eval``       EER / minDCF / WER metrics and trial-list evaluators
- ``runtime``    config tree + CLI entry points mirroring run.py / predict.py
"""

__version__ = "0.1.0"
