"""Probe: encoder sub-block fwd / fwd+bwd costs on the real chip.

Isolates PosConvEmbedding vs the scanned EncoderLayer stack to find where
the backward's time goes (fori_loop ladder methodology, CLAUDE.md).
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_default_prng_impl", "rbg")
import jax.numpy as jnp
import flax.linen as nn

from w2v2_speaker_tpu.models.wav2vec2 import (
    BASE_CONFIG,
    EncoderLayer,
    PosConvEmbedding,
    ScanEncoderLayer,
)

B, T = 66, 149
cfg = dataclasses.replace(
    BASE_CONFIG, dtype="bfloat16", layerdrop=0.0, hidden_dropout=0.0,
    attention_dropout=0.0,
)
rng = np.random.default_rng(0)


def fresh():
    return jnp.asarray(
        rng.normal(size=(B, T, cfg.hidden_size)).astype(np.float32)
    ).astype(jnp.bfloat16)


def timed(run, p, iters=16):
    float(run(1, p, fresh()))

    def once(m):
        x = fresh()
        float(x.astype(jnp.float32).sum())
        t0 = time.perf_counter()
        float(run(m, p, x))
        return time.perf_counter() - t0

    t1 = min(once(iters) for _ in range(2))
    t2 = min(once(2 * iters) for _ in range(2))
    return (t2 - t1) / iters * 1e3


def bench(label, module, apply_kwargs=None):
    kw = apply_kwargs or {}
    params = jax.jit(module.init)(jax.random.PRNGKey(0), fresh(), **kw)[
        "params"
    ]

    @jax.jit
    def fwd_loop(m, p, x):
        def body(i, carry):
            x_, s = carry
            y = module.apply({"params": p}, x_, **kw)
            y = y[0] if isinstance(y, tuple) else y
            out = y.astype(jnp.float32).sum()
            return (x_ * (1 + 1e-20 * out).astype(x_.dtype), s + out)

        return jax.lax.fori_loop(0, m, body, (x, 0.0))[1]

    @jax.jit
    def bwd_loop(m, p, x):
        def loss(p_, x_):
            y = module.apply({"params": p_}, x_, **kw)
            y = y[0] if isinstance(y, tuple) else y
            return y.astype(jnp.float32).sum()

        def body(i, carry):
            x_, s = carry
            g = jax.grad(loss)(p, x_)
            out = sum(v.astype(jnp.float32).sum() for v in jax.tree.leaves(g))
            return (x_ * (1 + 1e-20 * out).astype(x_.dtype), s + out)

        return jax.lax.fori_loop(0, m, body, (x, 0.0))[1]

    f = timed(fwd_loop, params)
    fb = timed(bwd_loop, params)
    print(f"{label:34s} fwd {f:7.3f} ms   fwd+bwd {fb:7.3f} ms"
          f"   ratio {fb/max(f,1e-9):.2f}", flush=True)


bench("pos conv (16 dense convs)", PosConvEmbedding(cfg))


class LayerStack(nn.Module):
    cfg: object

    @nn.compact
    def __call__(self, x):
        scan = nn.scan(
            ScanEncoderLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True, "layerdrop": True},
            in_axes=(nn.broadcast, nn.broadcast),
            length=self.cfg.num_layers,
        )(self.cfg, name="layers")
        y, _ = scan(x, None, False)
        return y


bench("12-layer scan stack", LayerStack(cfg))


class OneLayer(nn.Module):
    cfg: object

    @nn.compact
    def __call__(self, x):
        return EncoderLayer(self.cfg, name="l")(x, None, False)


bench("single encoder layer", OneLayer(cfg))


class MatmulChain(nn.Module):
    """Pure-matmul reference: 12x (LN -> 768->3072 gelu -> 3072->768)."""

    @nn.compact
    def __call__(self, x):
        for i in range(12):
            h = nn.LayerNorm(dtype=jnp.bfloat16, name=f"ln{i}")(x)
            h = nn.Dense(3072, dtype=jnp.bfloat16, name=f"up{i}")(h)
            h = nn.gelu(h, approximate=False)
            x = x + nn.Dense(768, dtype=jnp.bfloat16, name=f"dn{i}")(h)
        return x


bench("12x unrolled FFN-only chain", MatmulChain())


class UnrolledStack(nn.Module):
    cfg: object

    @nn.compact
    def __call__(self, x):
        for i in range(self.cfg.num_layers):
            x = EncoderLayer(self.cfg, name=f"layer_{i}")(x, None, False)
        return x


bench("12-layer unrolled stack", UnrolledStack(cfg))
