"""End-to-end (trunk-finetuning) UNO v2 / AutoNovel: a tiny ViT trains for
a few epochs on separable synthetic images, the per-epoch eval runs, and
the best-head/best-epoch tracking works (reference
``uno_v2.py:62-170``, ``rerun_autonovel.py:42-110``)."""

import jax
import numpy as np
import pytest

from scd_tpu.metrics.cluster import cluster_acc
from scd_tpu.models.vit import ViTConfig
from scd_tpu.train.baselines_e2e import train_autonovel_e2e, train_uno_e2e

SIZE, N_CLS, N_LAB, N_PER = 16, 4, 2, 24


def _tiny_cfg():
    return ViTConfig(image_size=SIZE, patch_size=8, width=32, depth=2,
                     heads=4)


@pytest.fixture(scope="module")
def img_data():
    rng = np.random.default_rng(0)
    base = rng.standard_normal((N_CLS, SIZE, SIZE, 3)).astype(np.float32)
    imgs = np.concatenate([
        base[c] + 0.25 * rng.standard_normal(
            (N_PER, SIZE, SIZE, 3)).astype(np.float32)
        for c in range(N_CLS)])
    labels = np.repeat(np.arange(N_CLS), N_PER)
    mask_lab = (labels < N_LAB) & (np.arange(len(labels)) % 2 == 0)
    views = np.stack([
        imgs + 0.1 * rng.standard_normal(imgs.shape).astype(np.float32)
        for _ in range(2)])
    return imgs, views, labels, mask_lab


def test_uno_e2e_trains_and_tracks_best_head(img_data):
    imgs, views, labels, mask_lab = img_data
    evals = []

    def eval_fn(predict, epoch):
        acc = cluster_acc(labels, predict(imgs))
        evals.append(acc)
        return {"acc": acc}

    state, predict, history = train_uno_e2e(
        jax.random.PRNGKey(0), views, labels, mask_lab, N_LAB,
        N_CLS - N_LAB, _tiny_cfg(), num_heads=2, epochs=3, batch_size=32,
        lr=0.05, warmup_epochs=1, eval_fn=eval_fn)

    assert len(history) == 3 and len(evals) == 3
    # the trunk actually trains: loss drops across epochs
    assert history[-1]["loss"] < history[0]["loss"]
    # best-head index is tracked per epoch and predictions use it
    assert 0 <= state["best_head"] < 2
    assert state["best"] is not None and "acc" in state["best"]
    assert state["best"]["acc"] == max(evals)
    preds = predict(imgs)
    assert preds.shape == (len(imgs),)
    assert preds.max() < N_CLS


def test_autonovel_e2e_trains_with_eval(img_data):
    imgs, views, labels, mask_lab = img_data

    def eval_fn(predict, epoch):
        u = ~mask_lab
        return {"acc": cluster_acc(labels[u], predict(imgs[u]))}

    state, predict, history = train_autonovel_e2e(
        jax.random.PRNGKey(1), views[0], views[1], labels, mask_lab,
        N_LAB, N_CLS - N_LAB, _tiny_cfg(), epochs=3, batch_size=32,
        lr=0.05, eval_fn=eval_fn)

    assert len(history) == 3
    assert history[-1]["loss"] < history[0]["loss"]
    # ramp weight follows the sigmoid schedule (epoch 0 < epoch 2)
    assert history[0]["rampup_w"] < history[2]["rampup_w"]
    assert state["best"] is not None
    preds = predict(imgs)
    # head1 spans all classes (labelled first) — global ids directly
    assert preds.min() >= 0 and preds.max() < N_CLS


def test_uno_e2e_overcluster(img_data):
    """overcluster_factor adds the reference's second head block
    (``uno_v2_utils.py:142-146``); loss averages cluster + overcluster and
    prediction still uses the cluster heads."""
    imgs, views, labels, mask_lab = img_data
    state, predict, history = train_uno_e2e(
        jax.random.PRNGKey(2), views, labels, mask_lab, N_LAB,
        N_CLS - N_LAB, _tiny_cfg(), num_heads=2, epochs=2, batch_size=32,
        lr=0.05, warmup_epochs=1, overcluster_factor=3)
    assert "heads_over" in state["params"]
    preds = predict(imgs)
    assert preds.max() < N_CLS  # cluster heads predict, not the over block
    assert np.isfinite(history[-1]["loss"])


def test_uno_e2e_checkpoints_best(img_data, tmp_path):
    """Per-epoch checkpointing with best-metric tracking (the reference's
    model.pt + model_best.pt pattern): the best checkpoint restores and
    predicts identically to the in-memory best-head state."""
    from scd_tpu.metrics.cluster import cluster_acc
    from scd_tpu.train.checkpoint import CheckpointManager

    imgs, views, labels, mask_lab = img_data
    ckpt = CheckpointManager(str(tmp_path), keep=2, best_metric="acc")
    state, predict, history = train_uno_e2e(
        jax.random.PRNGKey(0), views, labels, mask_lab, N_LAB,
        N_CLS - N_LAB, _tiny_cfg(), num_heads=2, epochs=2, batch_size=32,
        lr=0.05, warmup_epochs=1, ckpt=ckpt,
        eval_fn=lambda p, e: {"acc": cluster_acc(labels, p(imgs))})
    best_step, restored = ckpt.restore_best(
        {"params": state["params"], "best_head": state["best_head"]})
    assert best_step == state["best"]["epoch"]
    assert 0 <= restored["best_head"] < 2


def test_uno_e2e_mesh_matches_single_device(img_data):
    """dp+tp mesh training optimizes the same objective: the per-epoch
    loss trajectory matches the single-device run to float tolerance
    (GSPMD keeps the Sinkhorn pseudo-label normalization global)."""
    from scd_tpu.core.config import MeshConfig
    from scd_tpu.core.mesh import make_mesh

    imgs, views, labels, mask_lab = img_data
    kwargs = dict(num_heads=2, epochs=2, batch_size=32, lr=0.05,
                  warmup_epochs=1)
    _, _, hist_single = train_uno_e2e(
        jax.random.PRNGKey(0), views, labels, mask_lab, N_LAB,
        N_CLS - N_LAB, _tiny_cfg(), **kwargs)
    mesh = make_mesh(MeshConfig(data=4, model=2))
    state, predict, hist_mesh = train_uno_e2e(
        jax.random.PRNGKey(0), views, labels, mask_lab, N_LAB,
        N_CLS - N_LAB, _tiny_cfg(), mesh=mesh, **kwargs)
    for hs, hm in zip(hist_single, hist_mesh):
        np.testing.assert_allclose(hm["loss"], hs["loss"], rtol=2e-4)
        assert hm["best_head"] == hs["best_head"]
    preds = predict(imgs)
    assert preds.shape == (len(imgs),) and preds.max() < N_CLS


def test_autonovel_e2e_mesh_matches_single_device(img_data):
    """AutoNovel's ranking statistics need the GLOBAL pairwise similarity:
    the mesh run must reproduce the single-device loss trajectory."""
    from scd_tpu.core.config import MeshConfig
    from scd_tpu.core.mesh import make_mesh

    imgs, views, labels, mask_lab = img_data
    kwargs = dict(epochs=2, batch_size=32, lr=0.05)
    _, _, hist_single = train_autonovel_e2e(
        jax.random.PRNGKey(1), views[0], views[1], labels, mask_lab,
        N_LAB, N_CLS - N_LAB, _tiny_cfg(), **kwargs)
    mesh = make_mesh(MeshConfig(data=8, model=1))
    _, predict, hist_mesh = train_autonovel_e2e(
        jax.random.PRNGKey(1), views[0], views[1], labels, mask_lab,
        N_LAB, N_CLS - N_LAB, _tiny_cfg(), mesh=mesh, **kwargs)
    for hs, hm in zip(hist_single, hist_mesh):
        np.testing.assert_allclose(hm["loss"], hs["loss"], rtol=2e-4)
    preds = predict(imgs)
    assert preds.min() >= 0 and preds.max() < N_CLS
