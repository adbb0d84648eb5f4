"""K-means evaluation runners over feature datasets.

Reference: ``gcd/methods/clustering/k_means.py`` (``test_kmeans`` :25,
``test_kmeans_semi_sup`` :70-138, ``test_kmeans_optimal`` :141-206) and
``gcd/methods/clustering/k_means_stratified.py`` (SSB Easy/Medium/Hard
stratified reporting, :54-151).

TPU-first: feature collation L2-normalizes on device in one fused op; the
GT-centroid "optimal" runner is a segment-mean + one MXU distance matmul
(the reference loops ``np.unique`` classes on host and chunks the distance
computation, ``k_means.py:180-189``); clustering itself goes through
``fit_kmeans`` / ``fit_sskm`` (vmapped restart axis).

Note: the reference's stratified difficulty mask is built with
``for cls in enumerate(u_targets)`` (``k_means_stratified.py:139``), which
compares an ``(index, value)`` tuple against class ids and therefore selects
nothing.  We implement the evidently intended behavior: mask unlabelled
instances whose target class belongs to the difficulty stratum.
"""

from __future__ import annotations

import os
import pickle
from functools import partial
from typing import Dict, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scd_tpu.core.config import ClusterConfig
from scd_tpu.cluster.kmeans import KMeansResult, fit_kmeans, fit_sskm
from scd_tpu.metrics.cluster import log_accs_from_preds
from scd_tpu.ops.distance import estep_assign
from scd_tpu.ops.segment import segment_mean


def collate_features(dataset, n_train_classes: int, batch_size: int = 512,
                     num_workers: int = 8, normalize: bool = True
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Collate a feature dataset (``FeatureVectorDataset`` contract:
    (feat, label, uq[, mask_lab]) items) into arrays.

    Returns (feats [N, D] f32 L2-normalized, targets [N] i64,
    mask_cls [N] bool — target in the first ``n_train_classes`` transformed
    ids, mask_lab [N] bool).  Reference collation loop:
    ``k_means.py:36-45`` / ``:82-97``.
    """
    from scd_tpu.data.loader import iterate_batches

    feats, targets, masks_lab = [], [], []
    for batch in iterate_batches(dataset, batch_size,
                                 num_workers=num_workers):
        x, label, _uq, mask_lab = batch
        feats.append(np.asarray(x, np.float32))
        targets.append(np.asarray(label, np.int64))
        masks_lab.append(np.asarray(mask_lab, bool))
    x = np.concatenate(feats)
    targets = np.concatenate(targets)
    mask_lab = np.concatenate(masks_lab)
    if normalize:
        x = np.asarray(_normalize_rows(jnp.asarray(x)))
    mask_cls = targets < n_train_classes
    return x, targets, mask_cls, mask_lab


@jax.jit
def _normalize_rows(x: jnp.ndarray) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def eval_kmeans(key: jax.Array, feats: np.ndarray, targets: np.ndarray,
                mask_cls: np.ndarray, cfg: ClusterConfig,
                eval_funcs: Sequence[str] = ("v1", "v2", "v3"),
                save_name: str = "Train ACC Unlabelled", writer=None,
                print_output: bool = True
                ) -> Tuple[float, float, float, KMeansResult]:
    """Plain k-means over all features, ACC on everything
    (reference ``test_kmeans``, ``k_means.py:25-68``)."""
    res = fit_kmeans(key, feats, cfg)
    all_acc, old_acc, new_acc = log_accs_from_preds(
        y_true=targets, y_pred=res.labels, mask=mask_cls,
        eval_funcs=eval_funcs, save_name=save_name, writer=writer,
        print_output=print_output)
    return all_acc, old_acc, new_acc, res


def eval_kmeans_semi_sup(key: jax.Array, feats: np.ndarray,
                         targets: np.ndarray, mask_cls: np.ndarray,
                         mask_lab: np.ndarray, cfg: ClusterConfig,
                         eval_funcs: Sequence[str] = ("v1", "v2", "v3"),
                         save_name: str = "SS-K-Means Train ACC Unlabelled",
                         writer=None, print_output: bool = True):
    """Semi-supervised k-means over the merged labelled+unlabelled set;
    ACC on the unlabelled portion (reference ``test_kmeans_semi_sup``,
    ``k_means.py:70-138``).

    Returns (all_acc, old_acc, new_acc, u_preds, KMeansResult).
    """
    mask_lab = np.asarray(mask_lab, bool)
    res = fit_sskm(key, feats[~mask_lab], feats[mask_lab],
                   targets[mask_lab], cfg)
    # fit_sskm returns labels labelled-first, then unlabelled.
    n_lab = int(mask_lab.sum())
    u_preds = res.labels[n_lab:]
    u_targets = targets[~mask_lab]
    mask = mask_cls[~mask_lab]
    all_acc, old_acc, new_acc = log_accs_from_preds(
        y_true=u_targets, y_pred=u_preds, mask=mask, eval_funcs=eval_funcs,
        save_name=save_name, writer=writer, print_output=print_output)
    return all_acc, old_acc, new_acc, u_preds, res


@partial(jax.jit, static_argnames=("n_classes",))
def _gt_centroid_assign(x: jnp.ndarray, dense_targets: jnp.ndarray,
                        n_classes: int) -> jnp.ndarray:
    centers, _counts = segment_mean(x, dense_targets, n_classes)
    labels, _d = estep_assign(x, centers)
    return labels


def eval_kmeans_optimal(feats: np.ndarray, targets: np.ndarray,
                        mask_cls: np.ndarray, mask_lab: np.ndarray,
                        eval_funcs: Sequence[str] = ("v1", "v2", "v3"),
                        save_name: str = "Optimal K-Means Train ACC Unlabelled",
                        writer=None, print_output: bool = True):
    """Assign every instance to its nearest ground-truth class centroid —
    the k-means upper bound (reference ``test_kmeans_optimal``,
    ``k_means.py:141-206``).  Returns (all, old, new, u_preds)."""
    mask_lab = np.asarray(mask_lab, bool)
    classes, dense = np.unique(np.asarray(targets, np.int64),
                               return_inverse=True)
    labels = np.asarray(_gt_centroid_assign(
        jnp.asarray(feats, jnp.float32), jnp.asarray(dense.astype(np.int32)),
        len(classes)))
    u_preds = labels[~mask_lab]
    u_targets = targets[~mask_lab]
    mask = mask_cls[~mask_lab]
    all_acc, old_acc, new_acc = log_accs_from_preds(
        y_true=u_targets, y_pred=u_preds, mask=mask, eval_funcs=eval_funcs,
        save_name=save_name, writer=writer, print_output=print_output)
    return all_acc, old_acc, new_acc, u_preds


# ------------------------------------------------------- stratified (SSB)

def load_ssb_difficulty_splits(dataset_name: str, ssb_dir: str
                               ) -> Dict[str, list]:
    """{'Easy'|'Medium'|'Hard': [original class ids]} from the SSB pickle
    (reference ``get_fgvc_osr_class_splits``,
    ``k_means_stratified.py:28-52``)."""
    path = os.path.join(ssb_dir, f"{dataset_name}_osr_splits.pkl")
    with open(path, "rb") as f:
        info = pickle.load(f)
    return info["unknown_classes"]


def stratified_accs(u_targets: np.ndarray, u_preds: np.ndarray,
                    mask: np.ndarray,
                    difficulty_classes: Dict[str, Iterable[int]],
                    train_classes: Sequence[int],
                    unlabeled_classes: Sequence[int],
                    eval_funcs: Sequence[str] = ("v1", "v2", "v3"),
                    writer=None, print_output: bool = True
                    ) -> Dict[str, Tuple[float, float, float]]:
    """Report ACC per SSB difficulty stratum over the unlabelled set
    (reference ``k_means_stratified.py:125-151``; intended-behavior fix for
    the reference's no-op mask, see module docstring).

    ``difficulty_classes`` holds ORIGINAL class ids; targets are transformed
    (train_classes first, then unlabeled_classes), so we map through the
    same target transform the datasets applied.
    """
    to_transformed = {cls: i for i, cls in
                      enumerate(list(train_classes) + list(unlabeled_classes))}
    u_targets = np.asarray(u_targets, np.int64)
    u_preds = np.asarray(u_preds, np.int64)
    mask = np.asarray(mask, bool)
    out: Dict[str, Tuple[float, float, float]] = {}
    for diff in ("Easy", "Medium", "Hard"):
        tcls = np.array([to_transformed[c] for c in difficulty_classes[diff]
                         if c in to_transformed], np.int64)
        diff_mask = np.isin(u_targets, tcls)
        if not diff_mask.any():
            out[diff] = (float("nan"),) * 3
            continue
        out[diff] = log_accs_from_preds(
            y_true=u_targets[diff_mask], y_pred=u_preds[diff_mask],
            mask=mask[diff_mask], eval_funcs=eval_funcs,
            save_name=f"Train ACC Unlabelled {diff}", writer=writer,
            print_output=print_output)
    return out


def eval_kmeans_semi_sup_stratified(
        key: jax.Array, feats: np.ndarray, targets: np.ndarray,
        mask_cls: np.ndarray, mask_lab: np.ndarray, cfg: ClusterConfig,
        difficulty_classes: Dict[str, Iterable[int]],
        train_classes: Sequence[int], unlabeled_classes: Sequence[int],
        eval_funcs: Sequence[str] = ("v1", "v2", "v3"),
        writer=None, print_output: bool = True):
    """SSKM + overall ACC + per-difficulty ACC (reference
    ``k_means_stratified.py:54-151``).  Returns (overall triple,
    {difficulty: triple}, u_preds)."""
    all_acc, old_acc, new_acc, u_preds, _res = eval_kmeans_semi_sup(
        key, feats, targets, mask_cls, mask_lab, cfg, eval_funcs=eval_funcs,
        save_name="SS-K-Means All Data Train ACC", writer=writer,
        print_output=print_output)
    mask_lab = np.asarray(mask_lab, bool)
    strata = stratified_accs(targets[~mask_lab], u_preds,
                             mask_cls[~mask_lab], difficulty_classes,
                             train_classes, unlabeled_classes,
                             eval_funcs=eval_funcs, writer=writer,
                             print_output=print_output)
    return (all_acc, old_acc, new_acc), strata, u_preds


def main(argv=None):
    from scd_tpu.utils.runtime import apply_platform_override
    apply_platform_override()
    """CLI covering the reference's ``k_means.py`` and
    ``k_means_stratified.py`` __main__ blocks: run (semi-sup) k-means over a
    packed feature store and report ACC (optionally stratified)."""
    import argparse

    p = argparse.ArgumentParser(description="K-means feature evaluation")
    p.add_argument("--features", type=str, required=True,
                   help="npz with features/targets/mask_lab arrays")
    p.add_argument("--K", type=int, default=None)
    p.add_argument("--n_train_classes", type=int, required=True)
    p.add_argument("--semi_sup", action="store_true")
    p.add_argument("--optimal", action="store_true",
                   help="ground-truth-centroid upper bound")
    p.add_argument("--max_kmeans_iter", type=int, default=100)
    p.add_argument("--n_init", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval_funcs", nargs="+", default=["v1", "v2", "v3"])
    p.add_argument("--dataset_name", type=str, default=None,
                   help="with --ssb_dir: report SSB-stratified ACC")
    p.add_argument("--ssb_dir", type=str, default=None)
    p.add_argument("--n_classes_total", type=int, default=None)
    args = p.parse_args(argv)

    with np.load(args.features) as z:
        feats = np.asarray(z["features"], np.float32)
        targets = np.asarray(z["targets"], np.int64)
        mask_lab = (np.asarray(z["mask_lab"], bool) if "mask_lab" in z
                    else np.zeros(len(targets), bool))
    feats = np.asarray(_normalize_rows(jnp.asarray(feats)))
    mask_cls = targets < args.n_train_classes
    k = args.K or (args.n_classes_total or int(targets.max()) + 1)
    cfg = ClusterConfig(n_clusters=k, n_init=args.n_init,
                        max_iterations=args.max_kmeans_iter)
    key = jax.random.PRNGKey(args.seed)

    if args.optimal:
        return eval_kmeans_optimal(feats, targets, mask_cls, mask_lab,
                                   eval_funcs=args.eval_funcs)
    if args.dataset_name and args.ssb_dir:
        diff = load_ssb_difficulty_splits(args.dataset_name, args.ssb_dir)
        n_total = args.n_classes_total or int(targets.max()) + 1
        return eval_kmeans_semi_sup_stratified(
            key, feats, targets, mask_cls, mask_lab, cfg, diff,
            train_classes=range(args.n_train_classes),
            unlabeled_classes=range(args.n_train_classes, n_total),
            eval_funcs=args.eval_funcs)
    if args.semi_sup:
        return eval_kmeans_semi_sup(key, feats, targets, mask_cls, mask_lab,
                                    cfg, eval_funcs=args.eval_funcs)
    return eval_kmeans(key, feats, targets, mask_cls, cfg,
                       eval_funcs=args.eval_funcs)


if __name__ == "__main__":
    main()
