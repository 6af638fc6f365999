"""Benchmark: speaker-embedding extraction throughput on one TPU chip.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "utt/s", "vs_baseline": N}

The tracked metric is utterances/sec/chip on 3 s clips for the flagship
model (BASELINE.md: target >= 50x real-time, i.e. >= 16.67 utt/s of 3 s
audio per chip). vs_baseline = achieved_realtime_factor / 50.
"""

from __future__ import annotations

import json
import time

import numpy as np

CLIP_SECONDS = 3.0
TARGET_REALTIME_FACTOR = 50.0


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import entry

    forward, example_args = entry()
    fn = jax.jit(forward)

    batch = example_args[0].shape[0]
    rng = np.random.default_rng(0)
    wav = jnp.asarray(
        rng.normal(size=example_args[0].shape).astype(np.float32)
    )

    # compile + warmup
    out = fn(wav)
    jax.block_until_ready(out)

    # measure
    n_iters = 20
    start = time.perf_counter()
    for _ in range(n_iters):
        out = fn(wav)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start

    utt_per_sec = n_iters * batch / elapsed
    realtime_factor = utt_per_sec * CLIP_SECONDS
    print(
        json.dumps(
            {
                "metric": "embedding_extraction_throughput_3s_clips",
                "value": round(utt_per_sec, 2),
                "unit": "utt/s/chip",
                "vs_baseline": round(
                    realtime_factor / TARGET_REALTIME_FACTOR, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
