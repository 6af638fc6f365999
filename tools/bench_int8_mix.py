"""Composite extraction benchmark on a VoxCeleb1-O-like duration mix:
bf16-only vs int8-only vs per-bucket auto dispatch
(`network.int8_matmuls=auto`, ops/quant.py::int8_auto_policy).

The serving path (predict.py / extract_embeddings) sorts utterances by
duration and pads each batch to `test_pad_to_multiple`, so extraction
cost decomposes exactly into per-bucket-shape forward costs. Measuring
each bucket shape once with fori_loop differentials (methodology as
bench.py: fresh inputs, traced loop bound, float() barrier — the axon
transport memoizes identical requests and resolves futures lazily) and
duration-weighting by the mix histogram gives a composite number immune
to the transport's round-trip noise, which a one-shot wall-clock of a
full extraction pass is not.

Duration mix: VoxCeleb1-O test utterances are >= ~4 s with mean ~8.2 s
(the corpus is environment-blocked here — no network/corpus — so the mix
is a clipped lognormal matched to those published moments; pass --mix to
override with a file of one duration-in-seconds per line, e.g. dumped
from a real manifest).

The reference serves this mix bs=1 f32 on GPU
(`/root/reference/src/predict.py:128-170`); this tool quantifies the
extra headroom auto-dispatch claims on top of our bf16 bucketed path.

Usage: python tools/bench_int8_mix.py [--n 512] [--batch 32] [--iters 32]
       [--large] [--mix durations.txt]
"""

from __future__ import annotations

import argparse
import collections
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SR = 16000


def sample_mix(n: int, seed: int = 0) -> np.ndarray:
    """Clipped lognormal matched to VoxCeleb1-O's published moments
    (min ~4 s, mean ~8.2 s, long tail to ~60 s; we clip at 20 s — the
    serving path chunks longer audio anyway)."""
    rng = np.random.default_rng(seed)
    d = rng.lognormal(mean=np.log(7.0), sigma=0.45, size=n) + 1.0
    return np.clip(d, 4.0, 20.0)


def bucket_histogram(durations, batch, pad_multiple):
    """-> {padded_samples: n_batches} exactly as extract_embeddings
    buckets (sort by duration, batch, pad each batch to its longest)."""
    samples = np.sort((durations * SR).astype(int))
    hist = collections.Counter()
    for i in range(0, len(samples), batch):
        chunk = samples[i : i + batch]
        padded = -(-int(chunk[-1]) // pad_multiple) * pad_multiple
        hist[padded] += 1
    return dict(sorted(hist.items()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--pad-multiple", type=int, default=16000)
    ap.add_argument("--large", action="store_true")
    ap.add_argument("--mix", type=str, default=None,
                    help="file with one duration-in-seconds per line")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from w2v2_speaker_tpu.runtime.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()  # 22 program shapes; reruns skip compiles

    from w2v2_speaker_tpu.models.wav2vec2 import BASE_CONFIG, LARGE_CONFIG
    from w2v2_speaker_tpu.ops.quant import (
        INT8_AUTO_MIN_SAMPLES,
        int8_auto_policy,
    )
    from w2v2_speaker_tpu.utils.benchmark import (
        build_extraction_bench,
        median_pair_differential,
    )

    assert jax.devices()[0].platform == "tpu", "run on the TPU host"
    if args.mix:
        durations = np.array(
            [float(x) for x in pathlib.Path(args.mix).read_text().split()]
        )
    else:
        durations = sample_mix(args.n)
    hist = bucket_histogram(durations, args.batch, args.pad_multiple)
    size = LARGE_CONFIG if args.large else BASE_CONFIG
    print(
        f"{len(durations)} utts (mean {durations.mean():.1f}s), "
        f"B={args.batch}: {len(hist)} bucket shapes, "
        f"{sum(hist.values())} batches"
    )

    rng = np.random.default_rng(0)

    def measure(int8, n):
        run, variables = build_extraction_bench(size, int8, args.batch, n)

        def fresh():
            return jnp.asarray(
                rng.normal(size=(args.batch, n)).astype(np.float32)
            )

        float(run(1, variables, fresh()))  # compile

        def timed(m):
            w = fresh()
            t0 = time.perf_counter()
            float(run(m, variables, w))
            return time.perf_counter() - t0

        # stall-robust shared estimator (utils/benchmark.py; independent
        # minima are stall-biased in BOTH directions — first observed here
        # as a 6 s bucket reading -15% then +31% across two sessions)
        return median_pair_differential(timed, args.iters)

    hidden = size.hidden_size
    per_bucket = {}
    for n in hist:
        tb = measure(False, n)
        ti = measure(True, n)
        auto8 = int8_auto_policy(n, hidden, INT8_AUTO_MIN_SAMPLES)
        per_bucket[n] = (tb, ti, auto8)
        print(
            f"bucket {n / SR:5.1f}s x{hist[n]:3d}: bf16 {tb * 1e3:7.2f} ms  "
            f"int8 {ti * 1e3:7.2f} ms ({(tb / ti - 1) * 100:+5.1f}%)  "
            f"auto->{'int8' if auto8 else 'bf16'}"
        )

    def composite(pick):
        return sum(hist[n] * pick(*per_bucket[n]) for n in hist)

    c_bf16 = composite(lambda tb, ti, a: tb)
    c_int8 = composite(lambda tb, ti, a: ti)
    c_auto = composite(lambda tb, ti, a: ti if a else tb)
    c_oracle = composite(lambda tb, ti, a: min(tb, ti))
    total_audio = durations.sum()
    print(
        f"\ncomposite extraction ({len(durations)} utts, "
        f"{total_audio / 60:.1f} min audio):"
    )
    for name, c in [
        ("bf16-only", c_bf16),
        ("int8-only", c_int8),
        ("auto     ", c_auto),
        ("oracle   ", c_oracle),
    ]:
        print(
            f"  {name}: {c:7.3f} s  ({total_audio / c:6.0f}x real-time, "
            f"{(c_bf16 / c - 1) * 100:+5.1f}% vs bf16)"
        )


if __name__ == "__main__":
    main()
