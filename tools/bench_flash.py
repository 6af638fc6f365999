"""A/B benchmark: Pallas flash-attention kernel vs XLA attention on the
real TPU chip.

Methodology (see CLAUDE.md): the axon transport memoizes identical requests
and resolves futures lazily, so every timing chains iterations inside ONE
program via fori_loop with serially-dependent inputs and is forced by a
float() device->host transfer; n vs 2n differential cancels fixed overhead.

Usage:
  python tools/bench_flash.py                  # default sweep
  python tools/bench_flash.py --t 6016 --bq 512 --bk 1024
"""

from __future__ import annotations

import argparse
import functools
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, nargs="*", default=[2048, 4096, 6016])
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--h", type=int, default=12)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--bq", type=int, nargs="*", default=[512])
    ap.add_argument("--bk", type=int, nargs="*", default=[1024])
    ap.add_argument("--dtypes", nargs="*", default=["bf16"])
    ap.add_argument("--pad", type=float, default=0.0,
                    help="fraction of each row that is padding")
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--grad", action="store_true",
                    help="benchmark forward+backward instead of forward")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from w2v2_speaker_tpu.ops.flash_attention import (
        flash_attention_kernel,
        reference_attention,
    )

    assert jax.devices()[0].platform == "tpu", "run on the TPU host"

    def timed(fn, t, dtype, n, label):
        rng = np.random.default_rng(0)
        shape = (args.b, t, args.h, args.d)

        valid = int(t * (1.0 - args.pad))
        mask = jnp.asarray(np.arange(t)[None, :] < valid)
        mask = jnp.broadcast_to(mask, (args.b, t))

        if args.grad:
            def step(q, k, v):
                def loss(q, k, v):
                    return fn(q, k, v, mask).astype(jnp.float32).sum()
                gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
                return gq.astype(jnp.float32).sum() + gk.astype(
                    jnp.float32).sum() + gv.astype(jnp.float32).sum()
        else:
            def step(q, k, v):
                return fn(q, k, v, mask).astype(jnp.float32).sum()

        @jax.jit
        def run(n, q, k, v):
            def body(i, carry):
                q_, s = carry
                out = step(q_, k, v)
                bump = (1.0 + 1e-20 * out).astype(q_.dtype)
                return (q_ * bump, s + out)

            (_, s) = jax.lax.fori_loop(0, n, body, (q, jnp.float32(0)))
            return s

        def fresh():
            return tuple(
                jnp.asarray(rng.normal(size=shape).astype(np.float32)).astype(
                    dtype
                )
                for _ in range(3)
            )

        float(run(1, *fresh()))  # compile

        def once(m):
            xs = fresh()
            # force the host->device upload BEFORE the timed request so the
            # differential only has to cancel per-request overhead, not a
            # multi-MB transfer's jitter
            float(sum(x.astype(jnp.float32).sum() for x in xs))
            t0 = time.perf_counter()
            float(run(m, *xs))
            return time.perf_counter() - t0

        t_n = min(once(n) for _ in range(3))
        t_2n = min(once(2 * n) for _ in range(3))
        ms = (t_2n - t_n) / n * 1e3
        print(f"  {label:40s} {ms:8.3f} ms/iter")
        return ms

    dt = {"bf16": jnp.bfloat16, "f32": jnp.float32}
    mode = "fwd+bwd" if args.grad else "fwd"
    for t in args.t:
        for name in args.dtypes:
            dtype = dt[name]
            print(f"T={t} dtype={name} pad={args.pad} B={args.b} H={args.h} "
                  f"d={args.d} [{mode}]")
            timed(
                lambda q, k, v, m: reference_attention(q, k, v, m),
                t, dtype, args.iters, "xla",
            )
            for bq in args.bq:
                for bk in args.bk:
                    timed(
                        functools.partial(
                            flash_attention_kernel, block_q=bq, block_k=bk
                        ),
                        t, dtype, args.iters, f"flash bq={bq} bk={bk}",
                    )


if __name__ == "__main__":
    main()
