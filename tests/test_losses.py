"""Loss parity vs torch (the reference's substrate), computed independently."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as tF

from w2v2_speaker_tpu.objectives import losses

RNG = np.random.default_rng(0)


def test_cross_entropy_matches_torch():
    logits = RNG.normal(size=(6, 10)).astype(np.float32)
    labels = RNG.integers(0, 10, size=6)
    loss, preds = losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    want = tF.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels)
    ).item()
    assert float(loss) == pytest.approx(want, rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(preds),
        tF.softmax(torch.from_numpy(logits), dim=1).numpy(),
        rtol=1e-5,
        atol=1e-6,
    )


def test_binary_cross_entropy_matches_torch():
    logits = RNG.normal(size=(8, 1)).astype(np.float32)
    labels = RNG.integers(0, 2, size=8)
    loss, preds = losses.binary_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels)
    )
    want = tF.binary_cross_entropy_with_logits(
        torch.from_numpy(logits).squeeze(),
        torch.from_numpy(labels).float(),
    ).item()
    assert float(loss) == pytest.approx(want, rel=1e-5)


@pytest.mark.parametrize("easy_margin", [False, True])
def test_aam_margin_logits_match_reference_formula(easy_margin):
    """Independent torch computation of ArcFace margin (aam_softmax.py:50-69)."""
    import math

    margin, scale = 0.2, 30.0
    cosine_np = np.clip(RNG.normal(0, 0.5, size=(5, 7)), -1, 1).astype(
        np.float32
    )
    labels_np = RNG.integers(0, 7, size=5)

    cosine = torch.from_numpy(cosine_np)
    labels = torch.from_numpy(labels_np)
    sine = torch.sqrt((1.0 - cosine * cosine).clamp(0, 1))
    phi = cosine * math.cos(margin) - sine * math.sin(margin)
    if easy_margin:
        phi = torch.where(cosine > 0, phi, cosine)
    else:
        th = math.cos(math.pi - margin)
        mm = math.sin(math.pi - margin) * margin
        phi = torch.where(cosine - th > 0, phi, cosine - mm)
    one_hot = torch.zeros_like(cosine).scatter_(1, labels.view(-1, 1), 1)
    want = ((one_hot * phi) + ((1.0 - one_hot) * cosine)) * scale

    got = losses.aam_margin_logits(
        jnp.asarray(cosine_np),
        jnp.asarray(labels_np),
        margin,
        scale,
        easy_margin,
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-6)


def test_aam_head_loss_consistent_with_torch_reference():
    """Full AAM head (normalize + margin + CE) vs an independent torch chain
    with identical weights."""
    from w2v2_speaker_tpu.models.heads import AAMSoftmaxHead

    d, c, b = 16, 9, 12
    emb_np = RNG.normal(size=(b, d)).astype(np.float32)
    labels_np = RNG.integers(0, c, size=b)

    head = AAMSoftmaxHead(num_classes=c, margin=0.2, scale=30.0)
    variables = head.init(
        jax.random.PRNGKey(0), jnp.asarray(emb_np), jnp.asarray(labels_np)
    )
    w_np = np.asarray(variables["params"]["weights"])
    loss, preds = head.apply(
        variables, jnp.asarray(emb_np), jnp.asarray(labels_np)
    )

    # independent torch chain
    import math

    x = tF.normalize(torch.from_numpy(emb_np))
    w = tF.normalize(torch.from_numpy(w_np))
    cosine = tF.linear(x, w)
    sine = torch.sqrt((1.0 - cosine * cosine).clamp(0, 1))
    phi = cosine * math.cos(0.2) - sine * math.sin(0.2)
    th = math.cos(math.pi - 0.2)
    mm = math.sin(math.pi - 0.2) * 0.2
    phi = torch.where(cosine - th > 0, phi, cosine - mm)
    one_hot = torch.zeros_like(cosine).scatter_(
        1, torch.from_numpy(labels_np).view(-1, 1), 1
    )
    out = ((one_hot * phi) + ((1.0 - one_hot) * cosine)) * 30.0
    want = tF.cross_entropy(out, torch.from_numpy(labels_np)).item()
    assert float(loss) == pytest.approx(want, rel=1e-4)


def test_triplet_loss_matches_torch_given_mined_indices():
    emb_np = RNG.normal(size=(10, 6)).astype(np.float32)
    labels_np = np.array([0, 0, 1, 1, 2, 2, 0, 1, 2, 0])
    rng = jax.random.PRNGKey(3)
    pos_idx, neg_idx = losses.mine_triplets(rng, jnp.asarray(labels_np))
    pos_idx, neg_idx = np.asarray(pos_idx), np.asarray(neg_idx)
    # mining validity
    for i in range(10):
        assert labels_np[pos_idx[i]] == labels_np[i] and pos_idx[i] != i
        assert labels_np[neg_idx[i]] != labels_np[i]

    got = losses.triplet_loss(
        jnp.asarray(emb_np), jnp.asarray(labels_np), rng, margin=1.0
    )
    e = torch.from_numpy(emb_np)
    want = tF.triplet_margin_loss(
        anchor=e,
        positive=e[torch.from_numpy(pos_idx)],
        negative=e[torch.from_numpy(neg_idx)],
        margin=1.0,
    ).item()
    assert float(got) == pytest.approx(want, rel=1e-4)


def test_mine_triplets_is_uniform_ish():
    labels = jnp.asarray(np.array([0] * 4 + [1] * 4))
    counts = np.zeros(8)
    for seed in range(200):
        pos, _ = losses.mine_triplets(jax.random.PRNGKey(seed), labels)
        counts[np.asarray(pos)[0]] += 1
    # anchor 0's positives are indices 1, 2, 3 — each ~ 1/3 of 200
    assert counts[0] == 0 and counts[4:].sum() == 0
    assert (counts[1:4] > 30).all()


def test_ctc_loss_matches_torch():
    b, t, c, l = 3, 30, 8, 5
    logits_np = RNG.normal(size=(b, t, c)).astype(np.float32)
    labels_np = RNG.integers(1, c, size=(b, l))
    logit_lens = np.array([30, 25, 18])
    label_lens = np.array([5, 3, 2])
    labels_np[1, 3:] = 0
    labels_np[2, 2:] = 0

    got = losses.ctc_loss(
        jnp.asarray(logits_np),
        jnp.asarray(logit_lens),
        jnp.asarray(labels_np),
        jnp.asarray(label_lens),
    )
    lp = tF.log_softmax(torch.from_numpy(logits_np).transpose(0, 1), dim=2)
    want = tF.ctc_loss(
        log_probs=lp,
        targets=torch.from_numpy(labels_np),
        input_lengths=torch.from_numpy(logit_lens),
        target_lengths=torch.from_numpy(label_lens),
        blank=0,
        zero_infinity=True,
    ).item()
    assert float(got) == pytest.approx(want, rel=1e-4)
