"""Shared measurement helpers for every benchmark entry point.

One implementation of the transport-safe timing methodology (bench.py,
tools/bench_int8.py, tools/bench_int8_mix.py previously each carried a
copy, and the copies drifted — the int8 A/B tool kept the stall-biased
independent-minima estimator for a round after bench.py was fixed).

Methodology, derived from this host's device-transport traps (CLAUDE.md):
- the tunnel MEMOIZES identical (program, args) requests → iterations
  must be chained inside ONE program via `lax.fori_loop` with a traced
  bound, and every timed request needs never-seen-before input data;
- `block_until_ready` resolves futures lazily → the only reliable
  execution barrier is a device→host transfer (`float(x)`);
- per-request overhead is cancelled by the n-vs-2n differential, and the
  differential itself must be a MEDIAN OF INTERLEAVED PAIRS: a transport
  stall during a t(n) request shrinks t(2n)−t(n) and INFLATES apparent
  throughput (measured round 5: one stalled pair read 2765 utt/s against
  a 1904–1955 clean band — the mechanism behind the outlier-high
  BENCH_r02 artifact). Independent min-of-N per side has no defense;
  per-pair differentials keep a stall one-sided in one pair and the
  median discards it.

The reference benchmarks eager CUDA where none of this applies; these
helpers are the TPU-native substitute for its timing scripts.
"""

from __future__ import annotations

import time
from typing import Callable

__all__ = [
    "median_pair_differential",
    "make_fori_forward",
    "build_extraction_bench",
]


def median_pair_differential(
    timed: Callable[[int], float],
    iters: int,
    pairs: int = 5,
    warmup: bool = True,
) -> float:
    """Seconds per iteration from interleaved [t(n), t(2n)] pairs.

    `timed(m)` must run m fori_loop-chained iterations on FRESH input and
    return wall seconds (with a device→host barrier inside). One warmup
    of each program shape first — the first fresh-input call after
    compile is routinely an outlier.
    """
    if warmup:
        timed(iters)
        timed(2 * iters)
    diffs = []
    for _ in range(pairs):
        t_n = timed(iters)
        t_2n = timed(2 * iters)
        diffs.append(max(t_2n - t_n, 1e-9))
    return sorted(diffs)[len(diffs) // 2] / iters


def make_fori_forward(forward: Callable):
    """Wrap a `forward(*head, wav) -> embeddings` in a jitted program that
    runs a traced number of serially-dependent iterations (the scalar
    feedback keeps XLA from collapsing the loop), returning a scalar so
    the float() barrier transfers 4 bytes.

    Returns `run(n, *head, wav) -> scalar`; compile once with n=1 (the
    dynamic bound means ONE program serves every n).
    """
    import jax

    @jax.jit
    def run(n, *args):
        *head, w = args

        def body(i, w_):
            emb = forward(*head, w_)
            return w_ * (1.0 + 1e-20 * emb.sum())

        return jax.lax.fori_loop(0, n, body, w).sum()

    return run


def build_extraction_bench(size_cfg, int8: bool, batch: int, n_samples: int):
    """Serving-configuration speaker-embedding forward for benchmarking:
    BASE/LARGE wav2vec2 + mean pooling, bf16 weights (halves weight HBM
    traffic, +23% measured on v5e), optional int8 MXU matmuls — exactly
    the `entry()`/predict serving setup. Returns (run, variables) with
    `run = make_fori_forward(...)` (call as `run(m, variables, wav)`).

    Shared by tools/bench_int8.py and tools/bench_int8_mix.py so the A/B
    and the composite-mix tools measure the SAME program.
    """
    import jax
    import jax.numpy as jnp

    from ..models.wav2vec2 import Wav2Vec2Config
    from ..models.wav2vec2_speaker import (
        Wav2Vec2SpeakerConfig,
        Wav2Vec2SpeakerModel,
    )

    cfg = Wav2Vec2SpeakerConfig(
        w2v2=Wav2Vec2Config(
            **{
                **size_cfg.__dict__,
                "dtype": "bfloat16",
                "layerdrop": 0.0,
                "int8_matmuls": int8,
            }
        ),
        stat_pooling_type="mean",
    )
    model = Wav2Vec2SpeakerModel(cfg=cfg, num_speakers=5994)
    wav = jnp.zeros((batch, n_samples), jnp.float32)
    # jitted init: un-jitted flax init dispatches hundreds of tiny ops —
    # pathological through a remote-device transport
    variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, wav)
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables,
    )

    def forward(v, w):
        return model.apply(
            v, w, method=Wav2Vec2SpeakerModel.compute_embedding
        )

    return make_fori_forward(forward), variables
