"""Pooling zoo: padding invariance (the TPU-critical property), golden values
vs plain numpy/torch on unpadded data, shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from w2v2_speaker_tpu.models.pooling import (
    get_pooling,
    pooled_embedding_size,
)

B, T, F = 3, 20, 8


def _make_batch(seed=0):
    rng = np.random.default_rng(seed)
    lengths = np.array([20, 13, 7])
    x = rng.normal(size=(B, T, F)).astype(np.float32)
    mask = np.arange(T)[None, :] < lengths[:, None]
    x = x * mask[:, :, None]  # zero the padding
    return jnp.asarray(x), jnp.asarray(mask), lengths


def _init_and_run(pool, x, mask, train=False):
    variables = pool.init(
        {"params": jax.random.PRNGKey(0), "pooling": jax.random.PRNGKey(1)},
        x,
        mask,
    )
    return pool.apply(variables, x, mask, train=train)


@pytest.mark.parametrize(
    "name", ["mean", "mean+std", "max", "quantile", "attentive", "first",
             "middle", "last"]
)
def test_padding_invariance(name):
    """Pooling a padded batch with mask == pooling each unpadded sample."""
    x, mask, lengths = _make_batch()
    pool = get_pooling(name)
    variables = pool.init(
        {"params": jax.random.PRNGKey(0)}, x, mask
    )
    batched = pool.apply(variables, x, mask)
    for i, L in enumerate(lengths):
        solo = pool.apply(
            variables, x[i : i + 1, :L], jnp.ones((1, L), bool)
        )
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(solo[0]), rtol=2e-4, atol=2e-5
        )


def test_mean_std_order_matches_reference():
    """Reference MeanStdStatPool1D concatenates (std, mean) in that order."""
    x, mask, _ = _make_batch()
    pool = get_pooling("mean+std")
    out = _init_and_run(pool, x[:1, :10], jnp.ones((1, 10), bool))
    xs = np.asarray(x[0, :10])
    np.testing.assert_allclose(
        np.asarray(out[0, :F]), xs.std(axis=0, ddof=1), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out[0, F:]), xs.mean(axis=0), rtol=1e-5
    )


def test_quantile_matches_numpy():
    x, mask, lengths = _make_batch(3)
    pool = get_pooling("quantile")
    out = _init_and_run(pool, x, mask)
    i, L = 1, lengths[1]
    want = np.quantile(
        np.asarray(x[i, :L]), [0, 0.25, 0.5, 0.75, 1], axis=0
    ).reshape(-1)
    np.testing.assert_allclose(np.asarray(out[i]), want, rtol=1e-4, atol=1e-5)


def test_index_pooling_semantics():
    x, mask, lengths = _make_batch()
    first = _init_and_run(get_pooling("first"), x, mask)
    np.testing.assert_allclose(np.asarray(first), np.asarray(x[:, 0]))
    last = _init_and_run(get_pooling("last"), x, mask)
    for i, L in enumerate(lengths):
        np.testing.assert_allclose(np.asarray(last[i]), np.asarray(x[i, L - 1]))
    middle = _init_and_run(get_pooling("middle"), x, mask)
    for i, L in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(middle[i]), np.asarray(x[i, L // 2])
        )


def test_random_index_pool_runs_in_train():
    x, mask, lengths = _make_batch()
    pool = get_pooling("random")
    variables = pool.init({"params": jax.random.PRNGKey(0)}, x, mask)
    out = pool.apply(
        variables, x, mask, train=True, rngs={"pooling": jax.random.PRNGKey(5)}
    )
    assert out.shape == (B, F)
    # each row must be one of its own (valid) frames
    for i, L in enumerate(lengths):
        diffs = np.abs(
            np.asarray(x[i, :L]) - np.asarray(out[i])[None, :]
        ).sum(axis=1)
        assert diffs.min() < 1e-6


def test_attentive_output_shape_and_finite():
    x, mask, _ = _make_batch()
    pool = get_pooling("attentive", attention_channels=16)
    out = _init_and_run(pool, x, mask)
    assert out.shape == (B, 2 * F)
    assert np.isfinite(np.asarray(out)).all()


def test_none_pooling_identity():
    x, mask, _ = _make_batch()
    out = _init_and_run(get_pooling("none"), x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))


def test_pooled_embedding_size():
    assert pooled_embedding_size("mean", 10) == 10
    assert pooled_embedding_size("mean+std", 10) == 20
    assert pooled_embedding_size("attentive", 10) == 20
    assert pooled_embedding_size("quantile", 10) == 50
    with pytest.raises(ValueError):
        pooled_embedding_size("bogus", 10)
