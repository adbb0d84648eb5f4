"""Baseline method tests: Sinkhorn-Knopp, UNO multi-head + swapped loss,
AutoNovel ranking stats + pairwise BCE, OSR/combine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scd_tpu.train.baselines import (
    MultiHeadPrototypes,
    TwoHeadClassifier,
    autonovel_loss,
    combine_classifier_and_cluster_preds,
    osr_threshold_preds,
    pairwise_bce,
    ranking_stats_similarity,
    sinkhorn_knopp,
    swapped_prediction_loss,
    uno_targets,
)


def test_sinkhorn_knopp_marginals(rng):
    logits = jnp.asarray(rng.standard_normal((32, 8)), jnp.float32)
    q = sinkhorn_knopp(logits, n_iters=10, epsilon=0.1)
    np.testing.assert_allclose(np.asarray(q.sum(axis=1)), 1.0, atol=1e-3)
    assert (np.asarray(q) >= 0).all()
    # column balance improves with iterations (last projection is the row
    # one, so columns only converge asymptotically)
    def col_err(n):
        qq = sinkhorn_knopp(logits, n_iters=n, epsilon=0.1)
        return float(np.abs(np.asarray(qq.sum(axis=0)) - 32 / 8).max())

    assert col_err(50) < col_err(3)
    assert col_err(200) < 0.4


def test_multihead_prototypes_shapes(rng):
    model = MultiHeadPrototypes(num_heads=3, hidden_dim=32, proj_dim=16,
                                num_prototypes=7)
    feats = jnp.asarray(rng.standard_normal((5, 12)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), feats)
    logits, proj = model.apply(params, feats)
    assert logits.shape == (3, 5, 7)
    assert proj.shape == (3, 5, 16)
    # prototypes are unit-norm -> logits are cosine similarities in [-1, 1]
    assert np.abs(np.asarray(logits)).max() <= 1.0 + 1e-5
    # heads are independently initialized
    assert not np.allclose(np.asarray(logits[0]), np.asarray(logits[1]))


def test_swapped_prediction_prefers_agreement(rng):
    h, b, c = 2, 16, 6
    t = jax.nn.one_hot(jnp.asarray(rng.integers(0, c, b)), c)
    targets = jnp.broadcast_to(t, (2, h, b, c))
    aligned_logits = jnp.broadcast_to(10 * t, (2, h, b, c))
    wrong = jnp.roll(aligned_logits, 1, axis=-1)
    good = swapped_prediction_loss(aligned_logits, targets)
    bad = swapped_prediction_loss(wrong, targets)
    assert float(good) < float(bad)


def test_uno_targets_layout(rng):
    v, h, b, p, nlc = 2, 2, 10, 6, 4
    logits_unlab = jnp.asarray(rng.standard_normal((v, h, b, p)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, nlc, b))
    mask_lab = jnp.asarray(np.arange(b) < 5)
    t = uno_targets(logits_unlab, labels, mask_lab, nlc)
    assert t.shape == (v, h, b, nlc + p)
    t_np = np.asarray(t)
    # labelled rows: one-hot in first nlc cols, zeros after
    assert np.allclose(t_np[:, :, :5, nlc:], 0)
    assert np.allclose(t_np[:, :, :5, :nlc].sum(-1), 1)
    # unlabelled rows: zero in first nlc cols, pseudo-labels after
    assert np.allclose(t_np[:, :, 5:, :nlc], 0)
    assert t_np[:, :, 5:, nlc:].sum(-1).min() > 0.5


def test_ranking_stats_similarity():
    f = jnp.asarray([[9.0, 5.0, 1.0, 0.0],
                     [8.0, 6.0, 0.5, 0.2],
                     [0.0, 1.0, 5.0, 9.0]])
    simi = ranking_stats_similarity(f, topk=2)
    s = np.asarray(simi)
    assert s[0, 1] == 1.0 and s[1, 0] == 1.0  # same top-2 {0,1}
    assert s[0, 2] == -1.0  # disjoint top-2
    assert (np.diag(s) == 1.0).all()


def test_pairwise_bce_behavior():
    p_same = jnp.asarray([[1.0, 0.0], [1.0, 0.0]])
    p_diff = jnp.asarray([[0.0, 1.0], [0.0, 1.0]])
    # similar pairs with identical distributions -> near-zero loss
    low = pairwise_bce(p_same, p_same, jnp.asarray([1.0, 1.0]))
    high = pairwise_bce(p_same, p_diff, jnp.asarray([1.0, 1.0]))
    assert float(low) < 1e-3 < float(high)
    # dissimilar pairs with orthogonal distributions -> near-zero loss
    low2 = pairwise_bce(p_same, p_diff, jnp.asarray([-1.0, -1.0]))
    assert float(low2) < 1e-3


def test_autonovel_loss_runs(rng):
    model = TwoHeadClassifier(num_labeled=4, num_unlabeled=6)
    feats = jnp.asarray(rng.standard_normal((12, 16)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), feats)
    o1, o2, trunk = model.apply(params, feats)
    o1b, _, _ = model.apply(params, feats + 0.01)
    # reference head layout (rerun_autonovel.py:339): head1 spans ALL
    # classes, head2 the novel block only
    assert o1.shape == (12, 10) and o2.shape == (12, 6)
    labels = jnp.asarray(rng.integers(0, 4, 12))
    mask_lab = jnp.asarray(np.arange(12) < 6)
    out = autonovel_loss(o1, o1b, trunk, labels, mask_lab,
                         rampup_weight=0.5, topk=3)
    for k in ("loss", "ce", "bce", "consistency", "kl"):
        assert np.isfinite(float(out[k])), k


def test_osr_and_combine(rng):
    logits = jnp.asarray([[10.0, 0.0, 0.0], [0.4, 0.5, 0.4],
                          [0.0, 9.0, 0.0]])
    preds = np.asarray(osr_threshold_preds(logits, threshold=0.9))
    assert preds[0] == 0 and preds[1] == -1 and preds[2] == 1
    combined = combine_classifier_and_cluster_preds(
        preds, np.array([7, 8, 9]), n_labeled_classes=3)
    np.testing.assert_array_equal(combined, [0, 8, 1])


def test_sinkhorn_row_mask_balances_unlabelled_only(rng):
    """The transport constraints must hold among UNLABELLED rows only
    (reference slices logits_unlab[..., ~mask_lab] before sk,
    uno_v2.py:115-121); labelled rows carry zero mass."""
    from scd_tpu.train.baselines import sinkhorn_knopp

    logits = jnp.asarray(rng.standard_normal((16, 4)), jnp.float32)
    mask_lab = jnp.asarray(np.arange(16) < 6)  # 6 labelled, 10 unlabelled
    q = np.asarray(sinkhorn_knopp(logits, n_iters=200,
                                  row_mask=~np.asarray(mask_lab)))
    assert np.abs(q[:6]).max() == 0.0  # labelled rows: zero mass
    np.testing.assert_allclose(q[6:].sum(axis=1), 1.0, rtol=1e-3)
    # columns balance toward B_unlab / K among the unlabelled rows (the
    # last projection is the row one, so columns converge asymptotically
    # — same tolerance convention as test_sinkhorn_knopp_marginals)
    assert np.abs(q[6:].sum(axis=0) - 10 / 4).max() < 0.4
    # the masked solve must equal sinkhorn run on the sliced rows alone
    q_ref = np.asarray(sinkhorn_knopp(logits[6:], n_iters=200))
    np.testing.assert_allclose(q[6:], q_ref, rtol=1e-4, atol=1e-6)
