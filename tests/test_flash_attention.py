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


def test_dropout_rejected():
    q, k, v = _qkv(t=64)
    with pytest.raises(NotImplementedError):
        flash_attention(
            q, k, v, dropout_rate=0.1, rng=jax.random.PRNGKey(0)
        )


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
