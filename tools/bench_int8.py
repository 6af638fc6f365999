"""A/B benchmark: bf16 vs dynamic-int8 matmuls on the extraction forward.

The MXU's int8 path is double its bf16 rate on v5e; this measures how much
of that reaches the full wav2vec2-BASE speaker-embedding forward
(`Wav2Vec2Config.int8_matmuls`, ops/quant.py). Methodology as bench.py:
fori_loop-chained iterations in ONE program, fresh inputs, n-vs-2n
differential, float() barrier (the axon transport memoizes identical
requests and resolves futures lazily — CLAUDE.md).

Usage: python tools/bench_int8.py [--batch 48] [--seconds 3] [--iters 64]
       [--sweep-batches 48,64,96]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--large", action="store_true")
    ap.add_argument(
        "--sweep-batches",
        type=str,
        default=None,
        help="comma-separated batch sizes; bf16 AND int8 throughput at "
        "each size in ONE session (cross-session readings differ ±2%% on "
        "this host — A/Bs are only valid back-to-back in one process)",
    )
    ap.add_argument(
        "--sweep-seconds",
        type=str,
        default=None,
        help="comma-separated clip durations at --batch; locates the BASE "
        "bf16/int8 crossover that ops/quant.py::int8_auto_policy encodes "
        "(network.int8_matmuls=auto bucket dispatch)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from w2v2_speaker_tpu.models.wav2vec2 import BASE_CONFIG, LARGE_CONFIG
    from w2v2_speaker_tpu.utils.benchmark import (
        build_extraction_bench,
        median_pair_differential,
    )

    assert jax.devices()[0].platform == "tpu", "run on the TPU host"
    rng = np.random.default_rng(0)
    n = int(16000 * args.seconds)
    size = LARGE_CONFIG if args.large else BASE_CONFIG

    def fresh(batch, n):
        return jnp.asarray(rng.normal(size=(batch, n)).astype(np.float32))

    def measure(label, int8, batch, n, seconds):
        run, variables = build_extraction_bench(size, int8, batch, n)
        float(run(1, variables, fresh(batch, n)))  # compile

        def timed(m):
            w = fresh(batch, n)
            t0 = time.perf_counter()
            float(run(m, variables, w))
            return time.perf_counter() - t0

        # stall-robust shared estimator (utils/benchmark.py) — this tool
        # previously kept independent min-of-3 per side, which a one-sided
        # transport stall biases by tens of % (PERF.md round-5
        # reconciliation)
        dt = median_pair_differential(timed, args.iters, pairs=3)
        print(
            f"{label}: {dt * 1e3:.2f} ms/batch-{batch} "
            f"({batch / dt:.0f} utt/s, "
            f"{batch / dt * seconds:.0f}x real-time)"
        )
        return dt

    if args.sweep_batches:
        # full bf16 x int8 matrix in ONE session so every pair of rows is a
        # valid back-to-back A/B (cross-session readings differ ±2%)
        for b in (int(s) for s in args.sweep_batches.split(",")):
            for label, int8 in (("bf16", False), ("int8", True)):
                measure(f"{label} B={b}", int8, b, n, args.seconds)
    elif args.sweep_seconds:
        for sec in (float(s) for s in args.sweep_seconds.split(",")):
            ns = int(16000 * sec)
            pair = {}
            for label, int8 in (("bf16", False), ("int8", True)):
                pair[label] = measure(
                    f"{label} {sec:g}s", int8, args.batch, ns, sec
                )
            print(
                f"  -> int8 vs bf16 at {sec:g}s: "
                f"{(pair['bf16'] / pair['int8'] - 1) * 100:+.1f}%"
            )
    else:
        for label, int8 in (("bf16", False), ("int8", True)):
            measure(label, int8, args.batch, n, args.seconds)


if __name__ == "__main__":
    main()
