"""Probe: per-layer conv cost, XLA conv vs tap-sum matmul formulation.

Layer shapes of the wav2vec2 BASE conv feature encoder at batch 66 x 3 s.
fori_loop ladder methodology (CLAUDE.md).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

B = 66
LAYERS = [  # (T_in, C_in, C_out, k, s)
    (48000, 1, 512, 10, 5),
    (9599, 512, 512, 3, 2),
    (4799, 512, 512, 3, 2),
    (2399, 512, 512, 3, 2),
    (1199, 512, 512, 3, 2),
    (599, 512, 512, 2, 2),
    (299, 512, 512, 2, 2),
]

rng = np.random.default_rng(0)


def timed(run, *args, iters=32):
    float(run(1, *args))

    def once(m):
        t0 = time.perf_counter()
        float(run(m, *args))
        return time.perf_counter() - t0

    t1 = min(once(iters), once(iters + 1))
    t2 = min(once(2 * iters), once(2 * iters + 1))
    return (t2 - t1) / iters * 1e3


def conv_ref(x, w, s):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(s,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def conv_taps(x, w, s):
    # y[:, t, :] = sum_k x[:, t*s + k, :] @ w[k]
    k = w.shape[0]
    t_out = (x.shape[1] - k) // s + 1
    out = None
    for i in range(k):
        xi = jax.lax.slice_in_dim(x, i, i + (t_out - 1) * s + 1, stride=s,
                                  axis=1)
        y = jnp.einsum("btc,cd->btd", xi, w[i])
        out = y if out is None else out + y
    return out


_SKIP_MAIN = "--phase-only" in sys.argv or any(
    a.startswith("--pallas") for a in sys.argv
)

for (t_in, c_in, c_out, k, s) in LAYERS if not _SKIP_MAIN else []:
    x = jnp.asarray(rng.normal(size=(B, t_in, c_in)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(k, c_in, c_out)).astype(np.float32) * 0.05
                    ).astype(jnp.bfloat16)
    gf = B * ((t_in - k) // s + 1) * k * c_in * c_out * 2 / 1e9

    @jax.jit
    def run_ref(m, x, w, s=s):
        def body(i, carry):
            x_, acc = carry
            y = conv_ref(x_, w, s)
            return (x_ * (1 + 1e-20 * y.astype(jnp.float32).sum()).astype(x_.dtype), acc + y.astype(jnp.float32).sum())

        return jax.lax.fori_loop(0, m, body, (x, 0.0))[1]

    @jax.jit
    def run_tap(m, x, w, s=s):
        def body(i, carry):
            x_, acc = carry
            y = conv_taps(x_, w, s)
            return (x_ * (1 + 1e-20 * y.astype(jnp.float32).sum()).astype(x_.dtype), acc + y.astype(jnp.float32).sum())

        return jax.lax.fori_loop(0, m, body, (x, 0.0))[1]

    ms_ref = timed(run_ref, x, w)
    ms_tap = timed(run_tap, x, w)
    print(
        f"T={t_in:6d} C={c_in:4d}->{c_out} k={k:2d} s={s}  "
        f"{gf:6.1f} GF  conv {ms_ref:7.3f} ms ({gf/ms_ref:6.1f} TF/s)  "
        f"taps {ms_tap:7.3f} ms ({gf/ms_tap:6.1f} TF/s)"
    )


# ---------------------------------------------------------------- phase GEMM
# Strided conv as phase-decomposed matmuls on contiguous reshapes (no
# strided slicing, unlike conv_taps above):
#   k=2, s=2:  y = reshape(x, [B, T/2, 2C]) @ W            (pure GEMM)
#   k=3, s=2:  y = x2 @ W[0:2] + shift(x2)[..., :C] @ W[2] (GEMM + rank-C fix)
#   k=10,s=5:  y = concat(x5[t], x5[t+1]) @ W              (K=10 GEMM)
def conv_phase(x, w, s):
    k, c_in, c_out = w.shape
    b, t, _ = x.shape
    if k == s:  # k=2,s=2 and k=10,s=5-with-pad-below fall here after regroup
        t_use = (t // s) * s
        xg = x[:, :t_use].reshape(b, t_use // s, s * c_in)
        return xg @ w.reshape(k * c_in, c_out)
    if k == 3 and s == 2:
        t_out = (t - k) // s + 1
        # pad so pair frame t_out (holding x[2*t_out]) exists; XLA usually
        # fuses the pad into the producer
        t_pad = 2 * t_out + 2
        xp = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        x2 = xp.reshape(b, t_pad // 2, 2 * c_in)
        main = x2[:, :t_out] @ w[:2].reshape(2 * c_in, c_out)
        fix = x2[:, 1 : t_out + 1, :c_in] @ w[2]
        return main + fix
    if k == 10 and s == 5:
        t_out = (t - k) // s + 1
        x5 = x[:, : (t // 5) * 5].reshape(b, t // 5, 5 * c_in)
        pair = jnp.concatenate([x5[:, :t_out], x5[:, 1 : t_out + 1]], -1)
        return pair @ w.reshape(10 * c_in, c_out)
    raise ValueError((k, s))


def _run_phase_section():
    print("\nphase-GEMM formulation vs XLA conv:")
    for (t_in, c_in, c_out, k, s) in LAYERS:
        x = jnp.asarray(
            rng.normal(size=(B, t_in, c_in)).astype(np.float32)
        ).astype(jnp.bfloat16)
        w = jnp.asarray(
            rng.normal(size=(k, c_in, c_out)).astype(np.float32) * 0.05
        ).astype(jnp.bfloat16)
        t_out = (t_in - k) // s + 1
        gf = B * t_out * k * c_in * c_out * 2 / 1e9

        # numerical equivalence first (bf16 tolerance)
        ref = conv_ref(x[:1], w, s)
        got = conv_phase(x[:1], w, s)
        np.testing.assert_allclose(
            np.asarray(got[:, : ref.shape[1]], np.float32),
            np.asarray(ref, np.float32),
            rtol=0.05, atol=0.5,
        )

        @jax.jit
        def run_phase(m, x, w, s=s):
            def body(i, carry):
                x_, acc = carry
                y = conv_phase(x_, w, s)
                return (
                    x_ * (1 + 1e-20 * y.astype(jnp.float32).sum()).astype(
                        x_.dtype
                    ),
                    acc + y.astype(jnp.float32).sum(),
                )

            return jax.lax.fori_loop(0, m, body, (x, 0.0))[1]

        ms = timed(run_phase, x, w)
        print(
            f"T={t_in:6d} C={c_in:4d}->{c_out} k={k:2d} s={s}  "
            f"{gf:6.1f} GF  phase {ms:7.3f} ms ({gf/ms:6.1f} TF/s)",
            flush=True,
        )


# ------------------------------------------------------------ Pallas kernel
# ops/conv_encoder.py: the pair-phase GEMM *inside* a Pallas kernel — the
# decomposition that lost as an XLA formulation (pad/concat/add as separate
# HBM passes) stays in VMEM here, and GELU fuses into the same kernel. A/B
# against the XLA chain the model actually runs (conv + exact GELU).
def _run_pallas_section(batch):
    from w2v2_speaker_tpu.ops.conv_encoder import (
        conv_fused_reference,
        strided_conv_fused,
    )

    print(f"\nPallas fused conv+GELU vs XLA conv+GELU (B={batch}):")
    for (t_in, c_in, c_out, k, s) in LAYERS:
        if s != 2 or c_in != c_out or c_in % 128:
            continue
        x = jnp.asarray(
            rng.normal(size=(batch, t_in, c_in)).astype(np.float32)
        ).astype(jnp.bfloat16)
        w = jnp.asarray(
            rng.normal(size=(k, c_in, c_out)).astype(np.float32) * 0.05
        ).astype(jnp.bfloat16)
        t_out = (t_in - k) // s + 1
        gf = batch * t_out * k * c_in * c_out * 2 / 1e9

        ref = conv_fused_reference(x[:1], w)
        got = strided_conv_fused(x[:1], w, None, None, None)
        np.testing.assert_allclose(
            np.asarray(got, np.float32),
            np.asarray(ref, np.float32),
            rtol=0.05, atol=0.5,
        )

        def chain(fn):
            @jax.jit
            def run(m, x, w):
                def body(i, carry):
                    x_, acc = carry
                    y = fn(x_, w)
                    return (
                        x_
                        * (
                            1 + 1e-20 * y.astype(jnp.float32).sum()
                        ).astype(x_.dtype),
                        acc + y.astype(jnp.float32).sum(),
                    )

                return jax.lax.fori_loop(0, m, body, (x, 0.0))[1]

            return run

        ms_x = timed(chain(lambda x_, w_: conv_fused_reference(x_, w_)), x, w)
        row = (
            f"T={t_in:6d} k={k:2d}  {gf:6.1f} GF  "
            f"xla {ms_x:7.3f} ms ({gf/ms_x:6.1f} TF/s)"
        )
        for bt in (128, 256, 512):
            ms_p = timed(
                chain(
                    lambda x_, w_, bt=bt: strided_conv_fused(
                        x_, w_, None, None, None, block_t=bt
                    )
                ),
                x,
                w,
            )
            row += f"  bt{bt} {ms_p:7.3f} ({gf/ms_p:6.1f})"
        print(row, flush=True)


# LARGE layout: conv + bias + per-layer LayerNorm + GELU
# (feat_extract_norm="layer", conv_bias=True). The two-pass LN cannot fuse
# into XLA's conv output; the Pallas kernel applies it in-register.
def _run_pallas_large_section(batch):
    from w2v2_speaker_tpu.ops.conv_encoder import (
        conv_fused_reference,
        strided_conv_fused,
    )

    print(f"\nPallas fused conv+bias+LN+GELU vs XLA chain (B={batch}):")
    for (t_in, c_in, c_out, k, s) in LAYERS:
        if s != 2 or c_in != c_out or c_in % 128:
            continue
        x = jnp.asarray(
            rng.normal(size=(batch, t_in, c_in)).astype(np.float32)
        ).astype(jnp.bfloat16)
        w = jnp.asarray(
            rng.normal(size=(k, c_in, c_out)).astype(np.float32) * 0.05
        ).astype(jnp.bfloat16)
        bias = jnp.asarray(
            rng.normal(size=(c_out,)).astype(np.float32) * 0.05
        )
        ls = jnp.ones((c_out,), jnp.float32)
        lb = jnp.zeros((c_out,), jnp.float32)
        t_out = (t_in - k) // s + 1
        gf = batch * t_out * k * c_in * c_out * 2 / 1e9

        def chain(fn):
            @jax.jit
            def run(m, x, w):
                def body(i, carry):
                    x_, acc = carry
                    y = fn(x_, w)
                    return (
                        x_
                        * (
                            1 + 1e-20 * y.astype(jnp.float32).sum()
                        ).astype(x_.dtype),
                        acc + y.astype(jnp.float32).sum(),
                    )

                return jax.lax.fori_loop(0, m, body, (x, 0.0))[1]

            return run

        ms_x = timed(
            chain(lambda x_, w_: conv_fused_reference(x_, w_, bias, ls, lb)),
            x,
            w,
        )
        row = (
            f"T={t_in:6d} k={k:2d}  {gf:6.1f} GF  "
            f"xla {ms_x:7.3f} ms ({gf/ms_x:6.1f} TF/s)"
        )
        for bt in (256, 512):
            ms_p = timed(
                chain(
                    lambda x_, w_, bt=bt: strided_conv_fused(
                        x_, w_, bias, ls, lb, block_t=bt
                    )
                ),
                x,
                w,
            )
            row += f"  bt{bt} {ms_p:7.3f} ({gf/ms_p:6.1f})"
        print(row, flush=True)


if __name__ == "__main__":
    if "--phase" in sys.argv or "--phase-only" in sys.argv:
        _run_phase_section()
    b = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else B
    if "--pallas" in sys.argv:
        _run_pallas_section(b)
    if "--pallas-large" in sys.argv:
        _run_pallas_large_section(b)
