"""Wall-clock A/B of per-step dispatch vs steps_per_dispatch chunking.

The PERF.md training numbers are fori_loop-chained *device* times; the real
`_train_loop` pays, per step, one host->device batch transfer, one program
dispatch and one blocking metrics read — all round trips through the axon
remote-TPU transport. `trainer.steps_per_dispatch=K` folds K optimizer steps
into one device program (train/steps.py::make_train_step), so those round
trips amortize /K. This tool measures the end-to-end wall clock of both
paths with FRESH batch data per step (the transport memoizes identical
requests, CLAUDE.md trap #2), replicating exactly what `_train_loop` does:
shard_batch -> step -> float(metrics) per step vs
stack -> shard_batch(stacked) -> chunk -> device_get once.

Also measures a pipelined variant per K (defer the metrics read of chunk
c until chunk c+1 is dispatched): measured round 4 as NO win on the
tunnel transport (it serializes upload/dispatch regardless), kept for
re-testing on PCIe-attached TPU-VM hosts where async dispatch overlaps.

  python tools/bench_dispatch.py                 # BASE, batch 66 x 3 s
  python tools/bench_dispatch.py --k 4 8 16 --repeats 3
"""

from __future__ import annotations

import argparse
import dataclasses
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="base", choices=["base", "large"])
    ap.add_argument("--batch", type=int, default=66)
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--k", type=int, nargs="*", default=[8])
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    import optax

    from w2v2_speaker_tpu.models.wav2vec2 import BASE_CONFIG, LARGE_CONFIG
    from w2v2_speaker_tpu.models.wav2vec2_speaker import (
        Wav2Vec2SpeakerConfig,
        Wav2Vec2SpeakerModel,
    )
    from w2v2_speaker_tpu.parallel.mesh import create_mesh, shard_batch
    from w2v2_speaker_tpu.train.speaker_task import SpeakerTask
    from w2v2_speaker_tpu.train.state import TrainState
    from w2v2_speaker_tpu.train.steps import make_train_step

    assert jax.devices()[0].platform == "tpu", "run on the TPU host"

    w2v2 = dataclasses.replace(
        BASE_CONFIG if args.size == "base" else LARGE_CONFIG,
        dtype="bfloat16",
        layerdrop=0.05,
    )
    model = Wav2Vec2SpeakerModel(
        cfg=Wav2Vec2SpeakerConfig(w2v2=w2v2, stat_pooling_type="mean"),
        num_speakers=5994,
    )
    task = SpeakerTask(model=model, mode="ce")
    mesh = create_mesh()

    b, n = args.batch, int(16000 * args.seconds)
    rng = np.random.default_rng(0)

    def host_batch():
        return {
            "features": rng.normal(0, 0.1, size=(b, n)).astype(np.float32),
            "mask": np.ones((b, n), bool),
            "labels": rng.integers(0, 5994, b).astype(np.int32),
        }

    b0 = host_batch()
    variables = jax.jit(model.init)(
        {k: jax.random.PRNGKey(i) for i, k in enumerate(
            ("params", "dropout", "pooling", "masking", "layerdrop")
        )},
        jnp.asarray(b0["features"][:2]),
        jnp.asarray(b0["mask"][:2]),
    )
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=optax.adam(1e-4), rng=jax.random.PRNGKey(0),
    )
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"{args.size}: {n_params/1e6:.1f}M params, batch {b} x "
          f"{args.seconds}s, repeats={args.repeats}")

    step1 = make_train_step(task, mesh)

    def run_per_step(state, batches):
        t0 = time.perf_counter()
        for hb in batches:
            state, m = step1(state, shard_batch(hb, mesh))
            float(m["loss"])  # the per-step metrics read _train_loop does
        return time.perf_counter() - t0, state

    results = {}
    kmax = max(args.k)
    # warmup/compile both paths (excluded from timing)
    wl, state = run_per_step(state, [host_batch()])
    for k in args.k:
        fn = make_train_step(task, mesh, steps_per_dispatch=k)
        stacked = {
            key: np.stack([host_batch()[key] for _ in range(k)])
            for key in b0
        }
        state, m = fn(state, shard_batch(stacked, mesh, stacked=True))
        jax.device_get(m)
        results[k] = fn

    # timed: per-step baseline
    per_step_ms = []
    for _ in range(args.repeats):
        dt, state = run_per_step(state, [host_batch() for _ in range(kmax)])
        per_step_ms.append(dt / kmax * 1e3)
    base_ms = min(per_step_ms)
    print(f"per-step dispatch: {base_ms:8.1f} ms/step "
          f"(runs: {[f'{x:.1f}' for x in per_step_ms]})")

    for k in args.k:
        fn = results[k]
        chunk_ms = []
        for _ in range(args.repeats):
            stacked = {
                key: np.stack([host_batch()[key] for _ in range(k)])
                for key in b0
            }
            t0 = time.perf_counter()
            state, m = fn(state, shard_batch(stacked, mesh, stacked=True))
            jax.device_get(m)
            chunk_ms.append((time.perf_counter() - t0) / k * 1e3)
        best = min(chunk_ms)
        print(f"steps_per_dispatch={k:3d}: {best:8.1f} ms/step "
              f"({base_ms / best:.2f}x vs per-step; runs: "
              f"{[f'{x:.1f}' for x in chunk_ms]})")

    # pipelined chunked dispatch: defer the metrics read of chunk c until
    # chunk c+1 is uploaded + dispatched (what _train_loop's
    # dispatch_pipeline does) — measures whether jax async dispatch can
    # overlap the next chunk's host->device bytes/dispatch round trip with
    # the device executing the current chunk on this transport
    for k in args.k:
        fn = results[k]
        n_chunks = max(2, args.repeats)
        stacks = [
            {
                key: np.stack([host_batch()[key] for _ in range(k)])
                for key in b0
            }
            for _ in range(n_chunks)
        ]
        t0 = time.perf_counter()
        pending = None
        for stacked in stacks:
            state, m = fn(state, shard_batch(stacked, mesh, stacked=True))
            if pending is not None:
                jax.device_get(pending)
            pending = m
        jax.device_get(pending)
        dt = (time.perf_counter() - t0) / (n_chunks * k) * 1e3
        print(f"steps_per_dispatch={k:3d} + pipelined read: {dt:8.1f} "
              f"ms/step ({base_ms / dt:.2f}x vs per-step, "
              f"{n_chunks} chunks)")


if __name__ == "__main__":
    main()
