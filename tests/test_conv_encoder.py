"""Fused strided-conv kernel vs the XLA reference formulation (interpret
mode on CPU; the same kernel runs compiled on TPU — A/B'd separately on
hardware, see PERF.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from w2v2_speaker_tpu.ops.conv_encoder import (
    conv_fused_reference,
    eligible,
    strided_conv_fused,
)


def _xw(b=2, t_in=97, c=128, k=3, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, t_in, c)).astype(dtype))
    w = jnp.asarray(
        (rng.normal(size=(k, c, c)) * (k * c) ** -0.5).astype(dtype)
    )
    return x, w


def test_eligibility():
    assert eligible(3, 2, 512, 512)
    assert eligible(2, 2, 512, 512)
    assert not eligible(10, 5, 1, 512)  # layer 0
    assert not eligible(3, 1, 512, 512)
    assert not eligible(3, 2, 512, 768)
    assert not eligible(3, 2, 100, 100)


@pytest.mark.parametrize("k", [2, 3])
def test_matches_reference_multi_tile(k):
    # block_t=16 forces several tiles per batch row, exercising the k=3
    # cross-block seam row and the ragged final tile (t_out=48 or 47)
    x, w = _xw(t_in=97, k=k, seed=k)
    want = conv_fused_reference(x, w)
    got = strided_conv_fused(
        x, w, None, None, None, block_t=16, interpret=True
    )
    assert got.shape == want.shape == (2, (97 - k) // 2 + 1, 128)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_matches_reference_single_partial_tile():
    x, w = _xw(t_in=21, k=3, seed=7)  # t_out=10 < block_t
    want = conv_fused_reference(x, w)
    got = strided_conv_fused(
        x, w, None, None, None, block_t=256, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_bias_and_layernorm_large_layout():
    # LARGE: conv_bias=True + per-layer LayerNorm before GELU
    rng = np.random.default_rng(11)
    x, w = _xw(t_in=130, k=3, seed=11)
    bias = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    ls = jnp.asarray(
        (1.0 + 0.1 * rng.normal(size=(128,))).astype(np.float32)
    )
    lb = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    want = conv_fused_reference(x, w, bias, ls, lb)
    got = strided_conv_fused(
        x, w, bias, ls, lb, block_t=32, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )


def test_no_gelu():
    x, w = _xw(t_in=64, k=2, seed=3)
    want = conv_fused_reference(x, w, fuse_gelu=False)
    got = strided_conv_fused(
        x, w, None, None, None, fuse_gelu=False, block_t=16,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_bf16_io():
    x, w = _xw(t_in=97, k=3, seed=5)
    xb, wb = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
    want = conv_fused_reference(xb, wb)
    got = strided_conv_fused(
        xb, wb, None, None, None, block_t=16, interpret=True
    )
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32),
        np.asarray(want, dtype=np.float32),
        rtol=2e-2,
        atol=2e-2,
    )


def test_gradients_match_reference_vjp():
    # custom_vjp routes the backward through the XLA formulation —
    # gradients must equal differentiating conv_fused_reference directly
    x, w = _xw(b=1, t_in=65, k=3, seed=9)
    g_shape = (1, (65 - 3) // 2 + 1, 128)
    rng = np.random.default_rng(9)
    ct = jnp.asarray(rng.normal(size=g_shape).astype(np.float32))

    def via_kernel(x_, w_):
        return strided_conv_fused(
            x_, w_, None, None, None, block_t=16, interpret=True
        )

    def via_ref(x_, w_):
        return conv_fused_reference(x_, w_)

    _, vjp_k = jax.vjp(via_kernel, x, w)
    _, vjp_r = jax.vjp(via_ref, x, w)
    for got, want in zip(vjp_k(ct), vjp_r(ct)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )


def test_gradients_with_bias_and_ln():
    rng = np.random.default_rng(13)
    x, w = _xw(b=1, t_in=33, k=2, seed=13)
    bias = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    ls = jnp.ones((128,), jnp.float32)
    lb = jnp.zeros((128,), jnp.float32)
    g_shape = (1, 16, 128)
    ct = jnp.asarray(rng.normal(size=g_shape).astype(np.float32))

    def via_kernel(x_, w_, b_, s_, lb_):
        return strided_conv_fused(
            x_, w_, b_, s_, lb_, block_t=16, interpret=True
        )

    _, vjp_k = jax.vjp(via_kernel, x, w, bias, ls, lb)
    _, vjp_r = jax.vjp(conv_fused_reference, x, w, bias, ls, lb)
    for got, want in zip(vjp_k(ct), vjp_r(ct)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )


@pytest.mark.parametrize(
    "norm,bias", [("group", False), ("layer", True)]
)
def test_model_fused_path_matches_xla_path(norm, bias):
    # conv_impl="fused_pallas" must share the exact parameter tree with the
    # default path (checkpoints interchangeable) and reproduce its outputs
    from dataclasses import replace as dc_replace

    from w2v2_speaker_tpu.models.wav2vec2 import (
        ConvFeatureEncoder,
        Wav2Vec2Config,
    )

    cfg = Wav2Vec2Config(
        conv_dim=(128,) * 3,
        conv_kernel=(10, 3, 2),
        conv_stride=(5, 2, 2),
        feat_extract_norm=norm,
        conv_bias=bias,
        conv_impl="xla",
    )
    enc_x = ConvFeatureEncoder(cfg)
    enc_f = ConvFeatureEncoder(dc_replace(cfg, conv_impl="fused_pallas"))

    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(2, 2000)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    params_x = enc_x.init(key, wav)["params"]
    params_f = enc_f.init(key, wav)["params"]
    assert jax.tree.structure(params_x) == jax.tree.structure(params_f)

    out_x = enc_x.apply({"params": params_x}, wav)
    out_f = enc_f.apply({"params": params_x}, wav)  # xla-init'd params
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_x), rtol=2e-4, atol=2e-5
    )
