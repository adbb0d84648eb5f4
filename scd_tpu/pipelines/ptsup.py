"""Partially-supervised SCD pipeline — the ``main_ptsup.py`` equivalent.

Same skeleton as the unsupervised pipeline plus (reference SURVEY §3.2):

- zero-shot sACC lower bound (full vocabulary) and upper bound (vocabulary
  restricted to the ground-truth names) before any voting
  (``main_ptsup.py:548-585``);
- labelled classes pin their ground-truth names; the voting loop runs only
  over unlabelled clusters with known-name pruning
  (``main_ptsup.py:629-705``).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from scd_tpu.core.config import PipelineConfig
from scd_tpu.data import get_class_splits, get_datasets
from scd_tpu.metrics import name_set_iou, split_cluster_acc_v2
from scd_tpu.naming.classnames import remap_cidx_to_cname, \
    resolve_class_names
from scd_tpu.naming.loop import (gather_weight_columns,
                                 voting_loop_ptsup)
from scd_tpu.naming.templates import IMAGENET_TEMPLATES
from scd_tpu.naming.vote import topk_names
from scd_tpu.ops.topk import classify_topk
from scd_tpu.pipelines.common import (
    cluster_cache_key,
    load_shared_features,
    load_zeroshot_weights,
    pipeline_transform,
    print_acc_block,
    run_clustering,
    stage_cache,
)
from scd_tpu.pipelines.unsup import (
    build_argparser,
    build_encoders,
    config_from_args,
    load_vocabulary,
)


def zero_shot_preds(clip_feats: np.ndarray, weights: np.ndarray,
                    scale: float = 100.0, batch: int = 8192) -> np.ndarray:
    """Streaming zero-shot argmax over a (possibly huge) vocabulary.

    Reference ``get_clip_preds_fast`` (``main_ptsup.py:78-99``) batches rows
    for the same reason; here each chunk goes through ``classify_topk(k=1)``
    so on TPU the fused Pallas kernel streams the vocabulary axis and the
    [N, V] logits matrix never exists in HBM (at ImageNet-100 scale that is
    127k x 68k = ~34 GB f32 — guaranteed OOM if materialized).

    The final ragged chunk is zero-padded to the chunk size so every call
    reuses one compiled program (row padding cannot change other rows'
    argmax).
    """
    n = len(clip_feats)
    if n == 0:  # degenerate split (all rows labelled): no rows to predict
        return np.zeros(0, np.int64)
    w = jnp.asarray(weights, jnp.float32)
    chunk = min(batch, n)
    preds = []
    for i in range(0, n, chunk):
        f = np.asarray(clip_feats[i:i + chunk], np.float32)
        rows = len(f)
        if rows < chunk:
            f = np.pad(f, ((0, chunk - rows), (0, 0)))
        _, idx = classify_topk(jnp.asarray(f), w, k=1, scale=scale,
                               apply_softmax=False)
        preds.append(np.asarray(idx)[:rows, 0])
    return np.concatenate(preds).astype(np.int64)


def _top1_acc(preds: np.ndarray, targets: np.ndarray,
              cidx_to_cname: Dict[int, str], names: Sequence[str]) -> float:
    name_to_idx = {n: i for i, n in enumerate(names)}
    gt = np.array([name_to_idx[cidx_to_cname[int(t)]] for t in targets])
    return float((preds == gt).mean() * 100.0)


def zero_shot_top1(clip_feats: np.ndarray, targets: np.ndarray,
                   cidx_to_cname: Dict[int, str], names: Sequence[str],
                   weights: np.ndarray, scale: float = 100.0) -> float:
    """Zero-shot top-1 accuracy of CLIP features against a name list
    (reference ``evaluate_semantic_acc_ub_lb``, ``main_ptsup.py:102-129``)."""
    preds = zero_shot_preds(clip_feats, weights, scale=scale)
    return _top1_acc(preds, targets, cidx_to_cname, names)


def soft_sacc_bounds(clip_u: np.ndarray, u_targets: np.ndarray,
                     mask: np.ndarray, cidx_to_cname: Dict[int, str],
                     nouns: Sequence[str], weights: np.ndarray,
                     name_similarity, scale: float = 100.0,
                     lb_preds: Optional[np.ndarray] = None,
                     ub_preds: Optional[np.ndarray] = None) -> Dict:
    """Soft-sACC lower/upper bound block (``main_ptsup.py:564-585``).

    LB: zero-shot preds over the FULL vocabulary scored with soft-sACC.
    UB: vocabulary restricted to the ground-truth class names; also prints
    the number of distinct predictions and the "clip ACC" split-v2 line the
    reference emits in the same block (``main_ptsup.py:578-580``).
    Each all/old/new subset normalizes by its own batch max, exactly like
    the reference's per-call normalization.

    ``lb_preds``/``ub_preds``: precomputed zero-shot argmax indices over the
    full / GT-restricted vocabulary — the sACC bound block computes the
    identical passes, and at real scale each full-vocab pass streams ~8.6G
    logit evaluations; pass them to avoid recomputing.
    """
    from scd_tpu.metrics.semantic import evaluate_soft_semantic_acc

    out: Dict = {}

    def _soft3(preds: np.ndarray, cand: Sequence[str]):
        vals = []
        for sel in (np.ones(len(preds), bool), mask, ~mask):
            if sel.sum() == 0:
                vals.append(float("nan"))
                continue
            vals.append(evaluate_soft_semantic_acc(
                u_targets[sel], cidx_to_cname, preds[sel], cand,
                name_similarity))
        return tuple(vals)

    print("=====Soft sACC lower bound=====")
    if lb_preds is None:
        lb_preds = zero_shot_preds(clip_u, weights, scale=scale)
    s_all, s_old, s_new = _soft3(lb_preds, nouns)
    print(f"Soft sACC all {s_all},sACC old {s_old}, sACC new {s_new}")
    out["soft_lb"] = (s_all, s_old, s_new)

    print("=====Soft sACC upper bound=====")
    cand = [n.lower().replace("-", "_") for n in cidx_to_cname.values()]
    if ub_preds is None:
        noun_cols = {n: i for i, n in enumerate(nouns)}
        # residency-aware: host weights slice on host, device weights
        # gather on device — the full [D, V] never crosses the link
        zw_sel = gather_weight_columns(weights,
                                       [noun_cols[n] for n in cand])
        ub_preds = zero_shot_preds(clip_u, zw_sel, scale=scale)
    print(len(set(ub_preds.tolist())))
    all_acc, old_acc, new_acc = split_cluster_acc_v2(u_targets, ub_preds, mask)
    print(f"clip ACC: All {all_acc} | Old {old_acc} | New {new_acc}")
    out["clip_acc"] = (all_acc, old_acc, new_acc)
    s_all, s_old, s_new = _soft3(ub_preds, cand)
    print(f"Soft sACC all {s_all},sACC old {s_old}, sACC new {s_new}")
    out["soft_ub"] = (s_all, s_old, s_new)
    return out


def run_ptsup(cfg: PipelineConfig) -> Dict:
    from scd_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    cache = stage_cache(cfg)
    train_classes, unlabeled_classes = get_class_splits(cfg.data)
    tf = pipeline_transform(cfg)
    train_merged, test_ds, unlab_ds, extras = get_datasets(cfg.data, train_transform=tf, test_transform=tf)

    from scd_tpu.pipelines.common import _pipeline_mesh

    mesh = _pipeline_mesh(cfg)
    # lazy: fully-cached re-entries construct no models (see run_unsup)
    from scd_tpu.pipelines.common import lazy_encoders

    feat_encode, clip_encode, encode_text = lazy_encoders(
        lambda: build_encoders(cfg, extras, mesh=mesh))

    # single shared dataset pass for both encoders, cache-miss-aware
    # (pipelines.common.load_shared_features)
    feats, clip_feats = load_shared_features(
        cfg, cache, feat_encode, clip_encode, train_merged, train_classes)

    cluster_result = cache.load_or_compute(
        "cluster", cluster_cache_key(cfg),
        lambda: run_clustering(cfg, feats), refresh=cfg.run_cluster)

    all_preds = cluster_result["all_preds"].astype(np.int64)
    u_preds = cluster_result["u_preds"].astype(np.int64)
    u_targets = cluster_result["u_targets"].astype(np.int64)
    mask = cluster_result["mask"].astype(bool)

    nouns, taxonomy = load_vocabulary(cfg, extras)
    zw = load_zeroshot_weights(cfg, cache, encode_text, nouns, mesh=mesh)

    cidx_to_cname = remap_cidx_to_cname(
        resolve_class_names(
            cfg.data.dataset_name, extras, nouns, zw, encode_text,
            IMAGENET_TEMPLATES,
            wnid_to_name=taxonomy.wnid_to_name if taxonomy else None,
            corpus=cfg.naming.corpus),
        train_classes, unlabeled_classes)

    clip_all = clip_feats["all_feats"]
    mask_lab = clip_feats["mask_lab"].astype(bool)
    clip_u = clip_all[~mask_lab]

    # ---- sACC bounds (reference main_ptsup.py:548-561).  Each vocabulary
    # pass streams the full [N, V] logits once (8.6G logit evals at
    # ImageNet-100 scale); the all/old/new splits and the Soft-sACC block
    # below all reuse the same two passes instead of recomputing.
    noun_cols = {n: i for i, n in enumerate(nouns)}
    print("=====sACC lower bound=====")
    lb_preds = zero_shot_preds(clip_u, zw)
    lb_all = _top1_acc(lb_preds, u_targets, cidx_to_cname, nouns)
    lb_old = _top1_acc(lb_preds[mask], u_targets[mask], cidx_to_cname, nouns)
    lb_new = _top1_acc(lb_preds[~mask], u_targets[~mask], cidx_to_cname,
                       nouns)
    print(f"sACC all {lb_all},sACC old {lb_old}, sACC new {lb_new}")

    print("=====sACC upper bound=====")
    gt_cand = [n.lower().replace("-", "_") for n in cidx_to_cname.values()]
    zw_gt = gather_weight_columns(zw, [noun_cols[n] for n in gt_cand])
    ub_preds = zero_shot_preds(clip_u, zw_gt)
    ub_all = _top1_acc(ub_preds, u_targets, cidx_to_cname, gt_cand)
    ub_old = _top1_acc(ub_preds[mask], u_targets[mask], cidx_to_cname,
                       gt_cand)
    ub_new = _top1_acc(ub_preds[~mask], u_targets[~mask], cidx_to_cname,
                       gt_cand)
    print(f"sACC all {ub_all},sACC old {ub_old}, sACC new {ub_new}")

    # ---- Soft-sACC LB/UB + clip ACC (reference main_ptsup.py:564-585,
    # gated off for CUB exactly like the reference's `if 'cub' != ...`)
    name_sim = taxonomy.name_similarity if taxonomy else None
    if name_sim is None and cfg.data.dataset_name == "synthetic":
        from scd_tpu.models.synthetic import synthetic_name_similarity

        name_sim = synthetic_name_similarity
    eval_soft = cfg.eval_soft_sacc and cfg.data.dataset_name != "cub"
    soft_bounds = None
    if eval_soft and name_sim is not None:
        soft_bounds = soft_sacc_bounds(clip_u, u_targets, mask, cidx_to_cname,
                                       nouns, zw, name_sim,
                                       scale=cfg.naming.logit_scale,
                                       lb_preds=lb_preds, ub_preds=ub_preds)

    # ---- clustering ACC + voting (reference main_ptsup.py:588-705)
    # only unlabelled rows vote (see unsup.py): skip the labelled ~25%
    # of the [N, 68k] fused top-k stage
    name_idx_u, _ = topk_names(clip_u, zw, cfg.naming.topk,
                               scale=cfg.naming.logit_scale)

    all_acc, old_acc, new_acc = split_cluster_acc_v2(u_targets, u_preds, mask)
    print(f"{cfg.cluster.algorithm} Accuracies: All {all_acc} | Old {old_acc} "
          f"| New {new_acc}")

    gt_names = list(cidx_to_cname.values())
    lab_names = [gt_names[c] for c in range(len(train_classes))]
    l_preds = all_preds[mask_lab]
    lab_cluster_idx = sorted(set(l_preds.tolist()))
    unlab_cluster_idx = sorted(set(u_preds.tolist()) - set(lab_cluster_idx))

    def metrics_cb(it: int, preds: np.ndarray, cand_names: List[str]) -> Dict:
        print(f"iter: {it}")
        return print_acc_block("vote", u_targets, preds, mask, cidx_to_cname,
                               cand_names, name_similarity=name_sim,
                               eval_soft=eval_soft)

    result = voting_loop_ptsup(nouns, name_idx_u, clip_u, zw, u_preds,
                               unlab_cluster_idx, lab_names,
                               cfg.cluster.n_clusters, cfg.naming,
                               metrics_cb=metrics_cb)

    if cfg.naming.textual_enhancement:
        from scd_tpu.naming.loop import voting_loop_ptsup_te

        print("-- textual enhancement round --")
        result = voting_loop_ptsup_te(nouns, name_idx_u, clip_u, zw, result,
                                      lab_names, cfg.cluster.n_clusters,
                                      cfg.naming, alpha=cfg.naming.te_alpha,
                                      metrics_cb=metrics_cb)

    iou = name_set_iou(result.cand_names, gt_names)
    print(f"IoU: {iou}")
    return {"bounds": {"lb": (lb_all, lb_old, lb_new),
                       "ub": (ub_all, ub_old, ub_new)},
            "soft_bounds": soft_bounds,
            "cluster_acc": (all_acc, old_acc, new_acc),
            "voting": result, "iou": iou,
            "cidx_to_cname": cidx_to_cname}


def main(argv=None):
    from scd_tpu.utils.runtime import apply_platform_override
    apply_platform_override()
    args = build_argparser().parse_args(argv)
    cfg = config_from_args(args, partially_supervised=True)
    return run_ptsup(cfg)


if __name__ == "__main__":
    main()
