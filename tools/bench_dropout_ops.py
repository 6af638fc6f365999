"""Op-level dropout-sampler probe: jax.random.bernoulli (rbg) vs the
murmur3 counter-hash (ops/flash_attention.attention_dropout_keep) at the
BASE batch-66 x 3 s training shapes.

Times JUST the mask draw + apply (mask consumed by a scaled-where into the
activations, the way the model uses it), per site shape:

  probs  [66, 12, 149, 149]  attention-prob dropout (per layer)
  hidden [66, 149, 768]      hidden/activation dropout (per site)

Methodology as bench_train.py: fori_loop-chained fresh-seed iterations in
one program, float() barrier, n-vs-2n differential, min of 3, idle host.

Usage: python tools/bench_dropout_ops.py [--iters 64]
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
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from w2v2_speaker_tpu.ops.flash_attention import attention_dropout_keep

    assert jax.devices()[0].platform == "tpu", "run on the TPU host"

    rate = 0.1
    rng = np.random.default_rng(0)

    def timed(fn, label, x0):
        @jax.jit
        def run(m, x):
            def body(i, carry):
                x_, s = carry
                y = fn(x_, i)
                out = y.astype(jnp.float32).sum()
                bump = (1.0 + 1e-20 * out).astype(x_.dtype)
                return (x_ * bump, s + out)

            _, s = jax.lax.fori_loop(0, m, body, (x, jnp.float32(0)))
            return s

        def once(m):
            x = jnp.asarray(
                rng.normal(0, 1, x0.shape).astype(np.float32)
            ).astype(x0.dtype)
            float(x.astype(jnp.float32).sum())
            t0 = time.perf_counter()
            float(run(m, x))
            return time.perf_counter() - t0

        once(1)
        t1 = min(once(args.iters) for _ in range(3))
        t2 = min(once(2 * args.iters) for _ in range(3))
        ms = (t2 - t1) / args.iters * 1e3
        print(f"  {label:52s} {ms:8.3f} ms")
        return ms

    b, h, t, c = 66, 12, 149, 768

    def bern_probs(x, i):
        key = jax.random.PRNGKey(i.astype(jnp.int32))
        keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
        return jnp.where(keep, x / (1.0 - rate), 0.0)

    def hash_probs(x, i):
        seed = i.astype(jnp.int32)[None]
        keep = attention_dropout_keep(seed, b, h, t, t, rate)
        return jnp.where(keep, x / (1.0 - rate), 0.0)

    def bern_hidden(x, i):
        key = jax.random.PRNGKey(i.astype(jnp.int32))
        keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
        return jnp.where(keep, x / (1.0 - rate), 0.0)

    def hash_hidden(x, i):
        seed = i.astype(jnp.int32)[None]
        keep = attention_dropout_keep(seed, x.shape[0], 1, t, c, rate)[:, 0]
        return jnp.where(keep, x / (1.0 - rate), 0.0)

    probs0 = jnp.zeros((b, h, t, t), jnp.bfloat16)
    hid0 = jnp.zeros((b, t, c), jnp.bfloat16)
    print(f"dropout-sampler op probe, rate={rate}, iters={args.iters}")
    print(f"[{b}, {h}, {t}, {t}] attention probs (per layer):")
    pb = timed(bern_probs, "bernoulli (rbg PRNG + where)", probs0)
    ph = timed(hash_probs, "counter-hash (fused iota hash + where)", probs0)
    print(f"[{b}, {t}, {c}] hidden activations (per site):")
    hb = timed(bern_hidden, "bernoulli (rbg PRNG + where)", hid0)
    hh = timed(hash_hidden, "counter-hash (fused iota hash + where)", hid0)
    print(
        f"per-layer saving (1 probs + 2 hidden sites): "
        f"{(pb - ph) + 2 * (hb - hh):.3f} ms"
    )


if __name__ == "__main__":
    main()
