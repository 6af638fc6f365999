"""Flash-attention kernel vs reference attention (interpret mode on CPU; the
same kernel runs compiled on TPU — checked separately on hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from w2v2_speaker_tpu.ops.flash_attention import (
    flash_attention,
    flash_attention_kernel,
    reference_attention,
)


def _qkv(b=2, t=200, h=4, d=32, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(
        rng.normal(size=(b, t, h, d)).astype(np.float32)
    )
    return mk(), mk(), mk()


def test_kernel_matches_reference_no_mask():
    q, k, v = _qkv()
    want = reference_attention(q, k, v)
    got = flash_attention_kernel(q, k, v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )


def test_kernel_matches_reference_with_padding_mask():
    q, k, v = _qkv(t=300, seed=1)
    lengths = jnp.asarray([300, 137])
    mask = jnp.arange(300)[None, :] < lengths[:, None]
    want = reference_attention(q, k, v, mask)
    got = flash_attention_kernel(q, k, v, mask, interpret=True)
    # only compare valid query rows (padded queries attend to junk in both
    # implementations but are dropped by downstream pooling masks)
    np.testing.assert_allclose(
        np.asarray(got)[0], np.asarray(want)[0], rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got)[1, :137], np.asarray(want)[1, :137], rtol=2e-4, atol=2e-5
    )


def test_kernel_non_multiple_block_sizes():
    q, k, v = _qkv(t=77, seed=2)  # forces padding to 128
    want = reference_attention(q, k, v)
    got = flash_attention_kernel(q, k, v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )


def test_kernel_bf16_inputs():
    q, k, v = _qkv(t=128, seed=3)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    want = reference_attention(q, k, v)
    got = flash_attention_kernel(q, k, v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32),
        np.asarray(want, dtype=np.float32),
        rtol=2e-2,
        atol=2e-2,
    )


def test_public_entry_gradient_path():
    """On CPU the public entry uses the reference path; gradients must flow
    and match direct reference gradients."""
    q, k, v = _qkv(t=64, seed=4)

    def loss_flash(q, k, v):
        return flash_attention(q, k, v).sum()

    def loss_ref(q, k, v):
        return reference_attention(q, k, v).sum()

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_dropout_requires_rng():
    q, k, v = _qkv(t=64)
    with pytest.raises(ValueError):
        flash_attention(q, k, v, dropout_rate=0.1)
    # with an rng the public entry routes through the dropout-capable paths
    out = flash_attention(
        q, k, v, dropout_rate=0.5, rng=jax.random.PRNGKey(0)
    )
    base = flash_attention(q, k, v)
    assert not np.allclose(np.asarray(out), np.asarray(base))


def test_bias_to_key_mask_conversion():
    q, k, v = _qkv(t=64, seed=5)
    mask = jnp.ones((2, 64), bool).at[1, 40:].set(False)
    neg = float(jnp.finfo(jnp.float32).min)
    bias = jnp.where(mask[:, None, None, :], 0.0, neg)
    got = flash_attention(q, k, v, bias=bias)
    want = reference_attention(q, k, v, mask)
    np.testing.assert_allclose(
        np.asarray(got)[1, :40], np.asarray(want)[1, :40], rtol=1e-5, atol=1e-6
    )


def test_kernel_backward_matches_reference_no_mask():
    q, k, v = _qkv(b=1, t=256, h=2, d=32, seed=6)
    g = np.random.default_rng(7).normal(size=q.shape).astype(np.float32)
    g = jnp.asarray(g)

    def loss_kernel(q, k, v):
        return (flash_attention_kernel(q, k, v, interpret=True) * g).sum()

    def loss_ref(q, k, v):
        return (reference_attention(q, k, v) * g).sum()

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=f"d{name} mismatch",
        )


def test_kernel_backward_matches_reference_with_padding():
    q, k, v = _qkv(b=2, t=300, h=2, d=32, seed=8)
    lengths = jnp.asarray([300, 137])
    mask = jnp.arange(300)[None, :] < lengths[:, None]
    # upstream grads masked at padded rows (as downstream pooling does)
    g = np.random.default_rng(9).normal(size=q.shape).astype(np.float32)
    g = jnp.asarray(g) * mask[:, :, None, None]

    def loss_kernel(q, k, v):
        return (flash_attention_kernel(q, k, v, mask, interpret=True) * g).sum()

    def loss_ref(q, k, v):
        out = reference_attention(q, k, v, mask)
        return (out * g).sum()

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=f"d{name} mismatch",
        )


def test_kernel_fully_padded_q_blocks_skipped():
    """Rows beyond an utterance's length produce zeros (skipped blocks) and
    valid rows are unaffected by extreme padding."""
    q, k, v = _qkv(b=2, t=512, h=2, d=32, seed=10)
    lengths = jnp.asarray([512, 64])
    mask = jnp.arange(512)[None, :] < lengths[:, None]
    got = flash_attention_kernel(
        q, k, v, mask, block_q=128, block_k=128, interpret=True
    )
    want = reference_attention(q, k, v, mask)
    np.testing.assert_allclose(
        np.asarray(got)[1, :64], np.asarray(want)[1, :64], rtol=2e-4, atol=2e-5
    )
    # q blocks fully beyond the valid length were skipped -> exact zeros
    assert np.all(np.asarray(got)[1, 128:] == 0.0)


# ------------------------------------------------------- in-kernel dropout


def _np_keep_mask(seed, bh, t, rate):
    """NumPy reimplementation of the kernel's counter-hash keep mask —
    the mask is *defined* by this pure function of (seed, coordinates)."""
    with np.errstate(over="ignore"):
        qr = np.arange(t, dtype=np.uint32)[:, None]
        kc = np.arange(t, dtype=np.uint32)[None, :]
        x = (
            np.uint32(np.int64(seed) & 0xFFFFFFFF)
            + np.uint32(bh) * np.uint32(0x9E3779B1)
            + qr * np.uint32(0x85EBCA77)
            + kc * np.uint32(0xC2B2AE3D)
        )
        x = x ^ (x >> np.uint32(16))
        x = x * np.uint32(0x85EBCA6B)
        x = x ^ (x >> np.uint32(13))
        x = x * np.uint32(0xC2B2AE35)
        x = x ^ (x >> np.uint32(16))
    return x >= np.uint32(min(int(rate * 2**32), 2**32 - 1))


def test_kernel_dropout_matches_hash_defined_reference():
    """The kernel's dropout output must EXACTLY equal reference attention
    computed with the numpy-recreated keep mask (same semantics as torch
    F.dropout on the softmax probs)."""
    b, t, h, d, rate = 2, 128, 3, 32, 0.1
    q, k, v = _qkv(b=b, t=t, h=h, d=d, seed=8)
    seed = 1234
    got = np.asarray(
        flash_attention_kernel(
            q, k, v, interpret=True, dropout_rate=rate,
            dropout_seed=jnp.asarray([seed], jnp.int32),
        )
    )
    scale = d**-0.5
    logits = np.einsum(
        "bqhd,bkhd->bhqk", np.asarray(q) * scale, np.asarray(k)
    ).astype(np.float64)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    for bi in range(b):
        for hi in range(h):
            keep = _np_keep_mask(seed, bi * h + hi, t, rate)
            p = np.where(keep, probs[bi, hi] / (1 - rate), 0.0)
            want = p @ np.asarray(v)[bi, :, hi, :].astype(np.float64)
            np.testing.assert_allclose(
                got[bi, :, hi, :], want, rtol=2e-4, atol=2e-5
            )


def test_kernel_dropout_deterministic_and_seed_sensitive():
    q, k, v = _qkv(t=128, seed=9)
    mk = lambda s: np.asarray(
        flash_attention_kernel(
            q, k, v, interpret=True, dropout_rate=0.2,
            dropout_seed=jnp.asarray([s], jnp.int32),
        )
    )
    a, b_, c = mk(7), mk(7), mk(8)
    np.testing.assert_array_equal(a, b_)
    assert not np.allclose(a, c)


def test_kernel_dropout_zero_rate_is_identity():
    q, k, v = _qkv(t=128, seed=10)
    base = np.asarray(flash_attention_kernel(q, k, v, interpret=True))
    got = np.asarray(
        flash_attention_kernel(
            q, k, v, interpret=True, dropout_rate=0.0,
            dropout_seed=jnp.asarray([3], jnp.int32),
        )
    )
    np.testing.assert_array_equal(base, got)


def test_kernel_dropout_backward_matches_hash_defined_reference():
    """Gradients with dropout: kernel vjp vs autodiff through an XLA
    reference that uses the SAME numpy-recreated keep mask."""
    b, t, h, d, rate, seed = 1, 128, 2, 32, 0.15, 77
    q, k, v = _qkv(b=b, t=t, h=h, d=d, seed=11)
    g = jnp.asarray(
        np.random.default_rng(12).normal(size=q.shape).astype(np.float32)
    )
    keep = np.stack(
        [_np_keep_mask(seed, hi, t, rate) for hi in range(h)]
    )[None]  # [1, h, t, t]

    def loss_kernel(q, k, v):
        out = flash_attention_kernel(
            q, k, v, interpret=True, dropout_rate=rate,
            dropout_seed=jnp.asarray([seed], jnp.int32),
        )
        return (out * g).sum()

    def loss_ref(q, k, v):
        scale = d**-0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        probs = jnp.where(jnp.asarray(keep), probs / (1 - rate), 0.0)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v)
        return (out * g).sum()

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5,
            err_msg=f"d{name} mismatch",
        )


def test_kernel_dropout_with_padding_mask():
    """Dropout composes with suffix-padding: padded K columns stay excluded
    and valid-row outputs match the hash-defined reference."""
    b, t, h, d, rate, seed = 2, 256, 2, 32, 0.1, 5
    q, k, v = _qkv(b=b, t=t, h=h, d=d, seed=13)
    lengths = np.array([256, 150])
    mask = jnp.arange(t)[None, :] < jnp.asarray(lengths)[:, None]
    got = np.asarray(
        flash_attention_kernel(
            q, k, v, mask, interpret=True, dropout_rate=rate,
            dropout_seed=jnp.asarray([seed], jnp.int32),
        )
    )
    scale = d**-0.5
    for bi in range(b):
        L = lengths[bi]
        for hi in range(h):
            logits = (
                np.asarray(q)[bi, :L, hi, :].astype(np.float64) * scale
            ) @ np.asarray(k)[bi, :L, hi, :].astype(np.float64).T
            p = np.exp(logits - logits.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            keep = _np_keep_mask(seed, bi * h + hi, t, rate)[:L, :L]
            p = np.where(keep, p / (1 - rate), 0.0)
            want = p @ np.asarray(v)[bi, :L, hi, :].astype(np.float64)
            np.testing.assert_allclose(
                got[bi, :L, hi, :], want, rtol=2e-4, atol=2e-5
            )


def test_block_picking_never_explodes_padding():
    """T just above a block boundary must not lcm-explode the padded length
    (T=1049 once padded to lcm(1024, 1152) = 9216 — 8x waste and a VMEM
    overflow in the dkv backward on v5e)."""
    from w2v2_speaker_tpu.ops.flash_attention import _pick_blocks, _round_up

    for t in range(128, 8192, 107):
        tp0 = _round_up(t, 128)
        tp, bq, bk = _pick_blocks(tp0, 1024, 2048)
        assert tp % bq == 0 and tp % bk == 0
        assert tp < 2 * max(tp0, bq, bk), (t, tp, bq, bk)
        assert bq & (bq - 1) == 0 and bk & (bk - 1) == 0  # powers of two


def test_kernel_boundary_window_length():
    """End-to-end fwd+bwd at T=1049 (the length that triggered the blowup)."""
    q, k, v = _qkv(b=1, t=1049, h=2, d=32, seed=14)
    g = jnp.asarray(
        np.random.default_rng(15).normal(size=q.shape).astype(np.float32)
    )

    def loss_kernel(q, k, v):
        return (flash_attention_kernel(q, k, v, interpret=True) * g).sum()

    def loss_ref(q, k, v):
        return (reference_attention(q, k, v) * g).sum()

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5,
            err_msg=f"d{name} mismatch",
        )


def test_kernel_dispatch_profitability():
    """Public-entry dispatch: kernel only for lengths where block-rounded
    compute stays near T^2 (measured anchors in _kernel_profitable)."""
    from w2v2_speaker_tpu.ops.flash_attention import _kernel_profitable

    assert not _kernel_profitable(512)    # below crossover
    assert not _kernel_profitable(1049)   # 2048^2 work for 1049^2 problem
    assert not _kernel_profitable(1536)   # measured tie -> prefer XLA
    assert _kernel_profitable(2048)
    assert _kernel_profitable(3072)
    assert _kernel_profitable(4096)
    assert _kernel_profitable(6016)       # the 2-min-utterance shape


# ------------------------------- XLA fallback dropout (counter-hash, round 4)


def test_xla_fallback_keep_mask_matches_kernel_hash():
    """attention_dropout_keep (the XLA-path mask) must be bit-identical to
    the kernel's in-block _dropout_keep, i.e. to the numpy recreation that
    DEFINES the mask — same seed → same mask on every path."""
    from w2v2_speaker_tpu.ops.flash_attention import attention_dropout_keep

    b, h, t, rate, seed = 3, 2, 64, 0.2, 4242
    got = np.asarray(
        attention_dropout_keep(
            jnp.asarray([seed], jnp.int32), b, h, t, t, rate
        )
    )
    for bi in range(b):
        for hi in range(h):
            np.testing.assert_array_equal(
                got[bi, hi], _np_keep_mask(seed, bi * h + hi, t, rate)
            )


def test_xla_fallback_dropout_matches_kernel_same_seed():
    """The short-sequence XLA fallback and the Pallas kernel draw the SAME
    dropout mask for the same seed: outputs agree to accumulation-order
    tolerance (f32)."""
    from w2v2_speaker_tpu.ops.flash_attention import (
        _xla_dropout_attention,
        flash_attention_kernel,
    )

    b, t, h, d, rate, seed = 2, 128, 3, 32, 0.1, 99
    q, k, v = _qkv(b=b, t=t, h=h, d=d, seed=21)
    seed_arr = jnp.asarray([seed], jnp.int32)
    kernel = np.asarray(
        flash_attention_kernel(
            q, k, v, interpret=True, dropout_rate=rate,
            dropout_seed=seed_arr,
        )
    )
    fallback = np.asarray(
        _xla_dropout_attention(q, k, v, None, rate, seed_arr)
    )
    np.testing.assert_allclose(fallback, kernel, rtol=2e-4, atol=2e-5)


def test_public_entry_dropout_deterministic_per_key():
    """flash_attention(dropout_rate, rng): same key → same output, another
    key → different output (dropout still stochastic across keys)."""
    from w2v2_speaker_tpu.ops.flash_attention import flash_attention

    q, k, v = _qkv(t=96, seed=22)
    mk = lambda s: np.asarray(
        flash_attention(
            q, k, v, dropout_rate=0.2, rng=jax.random.PRNGKey(s)
        )
    )
    a, b_, c = mk(5), mk(5), mk(6)
    np.testing.assert_array_equal(a, b_)
    assert not np.allclose(a, c)


# ------------------------------------------- HashDropout module (round 4)


def test_hash_dropout_rate_scaling_and_determinism():
    """HashDropout: kept elements scaled by 1/(1-rate), dropped exactly 0,
    empirical drop fraction ~= rate, same key -> same mask."""
    from w2v2_speaker_tpu.models.wav2vec2 import HashDropout

    rate = 0.3
    x = jnp.ones((8, 64, 128), jnp.float32)
    mod = HashDropout(rate=rate)
    run = lambda s: np.asarray(
        mod.apply({}, x, rngs={"dropout": jax.random.PRNGKey(s)})
    )
    y, y2, y3 = run(0), run(0), run(1)
    np.testing.assert_array_equal(y, y2)
    assert not np.array_equal(y, y3)
    vals = np.unique(y)
    np.testing.assert_allclose(
        vals, [0.0, 1.0 / (1.0 - rate)], rtol=1e-6
    )
    drop_frac = float((y == 0).mean())
    assert abs(drop_frac - rate) < 0.01, drop_frac


def test_hash_dropout_deterministic_mode_is_identity():
    from w2v2_speaker_tpu.models.wav2vec2 import HashDropout

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 8)))
    y = HashDropout(rate=0.5, deterministic=True).apply(
        {}, x, rngs={"dropout": jax.random.PRNGKey(0)}
    )
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_hash_dropout_bernoulli_fallback_semantics():
    """use_hash=False: jax.random.bernoulli sampler with nn.Dropout
    semantics (kept elements scaled, dropped zeroed, fraction ~= rate) —
    and a DIFFERENT mask stream than the hash sampler for the same key."""
    from w2v2_speaker_tpu.models.wav2vec2 import HashDropout

    rate = 0.2
    x = jnp.ones((8, 64, 128), jnp.float32)
    key = jax.random.PRNGKey(7)
    got = np.asarray(
        HashDropout(rate=rate, use_hash=False).apply(
            {}, x, rngs={"dropout": key}
        )
    )
    np.testing.assert_allclose(
        np.unique(got), [0.0, 1.0 / (1.0 - rate)], rtol=1e-6
    )
    assert abs(float((got == 0).mean()) - rate) < 0.01
    hashed = np.asarray(
        HashDropout(rate=rate, use_hash=True).apply(
            {}, x, rngs={"dropout": key}
        )
    )
    assert not np.array_equal(got, hashed)
