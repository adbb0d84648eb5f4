"""Iterative CLIP vocabulary-voting loops (unsupervised & partially supervised).

Reference: the ``while set(cur_voted_names) != set(prev_voted_names)`` loops
of ``main_unsup.py:568-641`` and ``main_ptsup.py:629-705``.  Each round:

1. per-cluster histograms over the members' (fixed) top-k full-vocabulary
   name indices;
2. candidate pool = union of each cluster's ``num_common_vote`` most common
   names (ptsup: known labelled-class names are pruned from the histograms,
   ``main_ptsup.py:638``);
3. Hungarian assignment over the cluster×candidate vote matrix picks one
   candidate per cluster; unsup keeps the resulting name list **positional**
   (row order), ptsup rebuilds ``cand_names = sorted(voted ∪ labelled)``
   (``main_ptsup.py:657-659``);
4. every unlabelled image is re-classified against only the selected names'
   text embeddings — one [N, D]·[D, K] device matmul
   (``main_unsup.py:601-614``); the argmaxes become the new memberships;
5. repeat until the voted name set reaches a fixpoint.

Host work is only set algebra and a tiny Hungarian; all N-sized work is
jitted.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from scd_tpu.core.config import NamingConfig
from scd_tpu.naming.vote import assign_name, cluster_name_counters


@dataclasses.dataclass
class VotingResult:
    cand_names: List[str]  # candidate index -> name (u_preds index into this)
    u_preds: np.ndarray  # final per-image candidate assignment
    n_iters: int
    history: List[dict]  # per-iteration diagnostics from the callback
    lab_class_index: Optional[List[int]] = None  # ptsup: candidate cols of labelled names


def _reclassify_device(feats, zw, cols, n_valid, scale):
    """Module-level jitted body (defining jitted fns per call would retrace
    every invocation — jax.jit caches per function object).  The candidate
    columns are GATHERED ON DEVICE from the full [D, V] weight matrix —
    slicing on host would first fetch the whole matrix through the tunnel
    (~139 MB at V=68k, ~3 s/round; the gather moves a [C]-int vector
    instead).  ``cols`` is padded to a bucket; ``n_valid`` masks the
    padding out of the argmax."""
    import jax
    import jax.numpy as jnp

    w_sel = jnp.take(zw, cols, axis=1)  # [D, C_pad] device gather
    logits = scale * jax.lax.dot_general(
        feats, w_sel, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGH)
    col = jnp.arange(cols.shape[0])[None, :]
    logits = jnp.where(col < n_valid, logits, -jnp.inf)
    return jnp.argmax(logits, axis=-1)


def _reclassify_hostsel(feats, w_sel, n_valid, scale):
    """Host-sliced variant: ``w_sel`` [D, C_pad] was cut from a HOST numpy
    weight matrix (cheap) and only the tiny slice crosses the tunnel —
    uploading the full [D, V] just to gather C columns would cost a ~139 MB
    transfer at V=68k."""
    import jax
    import jax.numpy as jnp

    logits = scale * jax.lax.dot_general(
        feats, w_sel, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGH)
    col = jnp.arange(w_sel.shape[1])[None, :]
    logits = jnp.where(col < n_valid, logits, -jnp.inf)
    return jnp.argmax(logits, axis=-1)


def _te_mix_device(f, w_sel, preds, alpha):
    import jax.numpy as jnp

    t = w_sel.T[preds]  # [N, D] text embedding of the assigned name
    mixed = f + alpha * t
    return mixed / jnp.maximum(
        jnp.linalg.norm(mixed, axis=-1, keepdims=True), 1e-12)


def _jitted(fn):
    import jax

    return jax.jit(fn)


_reclassify_jit = None
_reclassify_hostsel_jit = None
_te_mix_jit = None


def gather_weight_columns(weights, cols_idx):
    """[D, C] candidate columns cut from a [D, V] weight matrix,
    residency-aware: device arrays gather ON DEVICE (only the [C]-int
    vector crosses the link — fetching [D, V] costs ~139 MB at V=68k);
    host numpy slices ON HOST (only the tiny [D, C] slice is ever
    uploaded).  The result lives on the same side as ``weights``.  Shared
    by the voting loops, the serving classifier, and the ptsup bound
    evaluators — keep every column-selection call site on this helper."""
    import jax
    import jax.numpy as jnp

    cols_idx = np.asarray(cols_idx, np.int32)
    if isinstance(weights, jax.Array):
        # gather THEN cast: casting first would materialize a full f32
        # copy of the [D, V] matrix on device for non-f32 inputs
        return jnp.take(weights, jnp.asarray(cols_idx),
                        axis=1).astype(jnp.float32)
    return np.asarray(weights, np.float32)[:, cols_idx]


def _select_cols(zeroshot_weights, name_cols: Sequence[int]):
    """Bucket-padded variant for the per-round reclassify jit: returns
    ``(w_sel_or_None, cols_or_None, n_cand)`` — device arrays defer the
    gather INTO the jitted program (fused with the matmul), host arrays
    slice eagerly via :func:`gather_weight_columns`."""
    import jax

    cols, n_cand = _pad_cols(name_cols)
    if isinstance(zeroshot_weights, jax.Array):
        return None, cols, n_cand
    return gather_weight_columns(zeroshot_weights, cols), None, n_cand


def _pad_cols(name_cols: Sequence[int], bucket: int = 64):
    """Column-index vector padded to a bucket (padding repeats col 0; the
    device masks it out via n_valid).  Bucketing keeps one compiled program
    per bucket size instead of one per round: the candidate count changes
    every voting round, and an exact-shape jit would pay a remote recompile
    (tens of seconds through the tunnel) each time."""
    cols = np.asarray(list(name_cols), np.int32)
    n_cand = cols.shape[0]
    pad = (-n_cand) % bucket
    if pad:
        cols = np.pad(cols, (0, pad))
    return cols, n_cand


def _reclassify(clip_u_feats, zeroshot_weights,
                name_cols: Sequence[int], scale: float) -> np.ndarray:
    """argmax over the selected name columns (reference ``main_unsup.py:601-614``),
    residency-aware (see ``_select_cols``)."""
    import jax.numpy as jnp

    global _reclassify_jit, _reclassify_hostsel_jit
    w_sel, cols, n_cand = _select_cols(zeroshot_weights, name_cols)
    feats = jnp.asarray(clip_u_feats, dtype=jnp.float32)  # no-op if on device
    if cols is not None:
        if _reclassify_jit is None:
            _reclassify_jit = _jitted(_reclassify_device)
        return np.asarray(_reclassify_jit(
            feats, zeroshot_weights.astype(jnp.float32), jnp.asarray(cols),
            jnp.int32(n_cand), jnp.float32(scale)))
    if _reclassify_hostsel_jit is None:
        _reclassify_hostsel_jit = _jitted(_reclassify_hostsel)
    return np.asarray(_reclassify_hostsel_jit(
        feats, jnp.asarray(w_sel), jnp.int32(n_cand), jnp.float32(scale)))


def voting_loop(nouns: Sequence[str],
                name_idx_topk: np.ndarray,
                clip_u_feats: np.ndarray,
                zeroshot_weights: np.ndarray,
                u_preds_init: np.ndarray,
                n_clusters: int,
                cfg: NamingConfig,
                metrics_cb: Optional[Callable[[int, np.ndarray, List[str]], dict]] = None,
                ) -> VotingResult:
    """Unsupervised voting loop (``main_unsup.py:568-641``).

    ``cand_names`` is positional: entry ``i`` is the name the Hungarian gave
    the ``i``-th cluster id present in ``u_preds`` (sorted), truncated to
    ``n_clusters`` rows, exactly as the reference builds it.
    """
    import jax.numpy as jnp

    noun_to_col = {n: i for i, n in enumerate(nouns)}
    # stage the features once: re-uploading [N, D] through the tunnel every
    # round would dominate the loop (~200 MB/round at ImageNet-100 scale).
    # The [D, V] weights keep their residency — _reclassify gathers
    # candidate columns on whichever side the matrix already lives.
    clip_u_feats = jnp.asarray(clip_u_feats, jnp.float32)
    u_preds = np.asarray(u_preds_init).copy()
    cur_voted = [0]
    prev_voted = [1]
    history: List[dict] = []
    it = 0
    cand_names: List[str] = []

    while set(cur_voted) != set(prev_voted) and it < cfg.max_vote_iters:
        it += 1
        counters = cluster_name_counters(name_idx_topk, u_preds, cfg.topk)

        voted_idx = sorted({n for e in counters.values()
                            for n, _ in e[:cfg.num_common_vote]})
        ind, _w = assign_name(voted_idx, counters,
                              num_common=cfg.num_common_linear)

        prev_voted = cur_voted
        # positional: row i of ind is the i-th cluster in sorted-cluster order;
        # rows past len(voted_idx) would KeyError in the reference — skip
        # them (loudly: dropped rows break the one-name-per-cluster contract)
        cur_voted = [nouns[voted_idx[col]] for _row, col in ind[:n_clusters]
                     if col < len(voted_idx)]
        n_dropped = min(n_clusters, len(ind)) - len(cur_voted)
        if n_dropped:
            print(f"[voting] {n_dropped} cluster(s) got no candidate name "
                  f"this round (candidate pool {len(voted_idx)} < clusters)")
        cand_names = list(cur_voted)

        u_preds = _reclassify(clip_u_feats, zeroshot_weights,
                              [noun_to_col[n] for n in cand_names],
                              cfg.logit_scale)
        if metrics_cb is not None:
            history.append(metrics_cb(it, u_preds, cand_names) or {})

    return VotingResult(cand_names=cand_names, u_preds=u_preds,
                        n_iters=it, history=history)


def textual_enhancement(clip_u_feats: np.ndarray,
                        zeroshot_weights: np.ndarray,
                        u_preds: np.ndarray,
                        name_cols: Sequence[int],
                        alpha: float = 0.5):
    """Text-enhanced image features ('TE' in the reference's result tables,
    ``README.md:23,32`` — the technique has no code in the reference repo;
    this implements the natural reading): mix each image's visual embedding
    with the text embedding of its currently assigned name, re-normalized.
    The enhanced features sharpen cluster structure in the joint space, and
    re-running the voting loop on them gives the 'w/TE' rows.

    clip_u_feats [N, D] L2-normalized; zeroshot_weights [D, V];
    u_preds [N] indices into ``name_cols`` (candidate columns).  Returns a
    DEVICE-resident [N, D] array (the TE wrappers feed it straight back
    into ``voting_loop``; ``np.asarray`` it if host residency is needed).
    """
    import jax.numpy as jnp

    global _te_mix_jit
    if _te_mix_jit is None:
        _te_mix_jit = _jitted(_te_mix_device)
    # residency-aware column selection (see _select_cols); padded cols
    # repeat col 0, but preds only index the valid range, so no mask is
    # needed for the [N, D] gather.  The result stays a DEVICE array: the
    # TE wrappers feed it straight back into voting_loop, and a host
    # round-trip of [N, D] here costs ~10 s at ImageNet-100 scale through
    # the tunnel.
    cols, _n_cand = _pad_cols(name_cols)
    w_sel = gather_weight_columns(zeroshot_weights, cols)
    return _te_mix_jit(jnp.asarray(clip_u_feats, jnp.float32),
                       jnp.asarray(w_sel),
                       jnp.asarray(np.asarray(u_preds), jnp.int32),
                       jnp.float32(alpha))


def voting_loop_te(nouns: Sequence[str],
                   name_idx_topk: np.ndarray,
                   clip_u_feats: np.ndarray,
                   zeroshot_weights: np.ndarray,
                   result: "VotingResult",
                   n_clusters: int,
                   cfg: NamingConfig,
                   alpha: float = 0.5,
                   metrics_cb=None) -> "VotingResult":
    """One textual-enhancement round: enhance features with the converged
    assignment's name embeddings, then re-run the voting loop from the
    enhanced re-classification ('w/TE' rows of the reference tables)."""
    noun_to_col = {n: i for i, n in enumerate(nouns)}
    cols = [noun_to_col[n] for n in result.cand_names]
    enhanced = textual_enhancement(clip_u_feats, zeroshot_weights,
                                   result.u_preds, cols, alpha=alpha)
    return voting_loop(nouns, name_idx_topk, enhanced, zeroshot_weights,
                       result.u_preds, n_clusters, cfg,
                       metrics_cb=metrics_cb)


def voting_loop_ptsup_te(nouns: Sequence[str],
                         name_idx_topk: np.ndarray,
                         clip_u_feats: np.ndarray,
                         zeroshot_weights: np.ndarray,
                         result: "VotingResult",
                         lab_names: Sequence[str],
                         n_clusters: int,
                         cfg: NamingConfig,
                         alpha: float = 0.5,
                         metrics_cb=None) -> "VotingResult":
    """Textual-enhancement round for the partially supervised loop: enhance
    the visual features with the converged assignment's name embeddings and
    re-run ``voting_loop_ptsup`` from that assignment (labelled names stay
    pinned).  Gives the ptsup 'w/TE' rows of the reference tables."""
    noun_to_col = {n: i for i, n in enumerate(nouns)}
    cols = [noun_to_col[n] for n in result.cand_names]
    enhanced = textual_enhancement(clip_u_feats, zeroshot_weights,
                                   result.u_preds, cols, alpha=alpha)
    lab_set = set(lab_names)
    unlab_cluster_idx = [i for i, n in enumerate(result.cand_names)
                         if n not in lab_set]
    return voting_loop_ptsup(nouns, name_idx_topk, enhanced,
                             zeroshot_weights, result.u_preds,
                             unlab_cluster_idx, lab_names, n_clusters, cfg,
                             metrics_cb=metrics_cb)


def voting_loop_ptsup(nouns: Sequence[str],
                      name_idx_topk: np.ndarray,
                      clip_u_feats: np.ndarray,
                      zeroshot_weights: np.ndarray,
                      u_preds_init: np.ndarray,
                      unlab_cluster_idx_init: Sequence[int],
                      lab_names: Sequence[str],
                      n_clusters: int,
                      cfg: NamingConfig,
                      metrics_cb: Optional[Callable[[int, np.ndarray, List[str]], dict]] = None,
                      ) -> VotingResult:
    """Partially-supervised voting loop (``main_ptsup.py:629-705``).

    Labelled classes pin their ground-truth names; only unlabelled clusters
    vote, with labelled names pruned from the histograms.  After each round
    ``cand_names = sorted(voted ∪ labelled)`` and the cluster/known index
    sets are recomputed against the new candidate list.
    """
    import jax.numpy as jnp

    noun_to_col = {n: i for i, n in enumerate(nouns)}
    lab_names = list(lab_names)
    num_unlab_classes = n_clusters - len(lab_names)

    # stage once (see voting_loop): avoids a [N, D] re-upload every round;
    # the [D, V] weights keep their residency (_reclassify gathers in place)
    clip_u_feats = jnp.asarray(clip_u_feats, jnp.float32)
    u_preds = np.asarray(u_preds_init).copy()
    known_name_idx = {noun_to_col[n] for n in lab_names}
    unlab_cluster_idx = list(unlab_cluster_idx_init)  # clusters not owned by labelled classes
    unlab_cluster_set = set(unlab_cluster_idx)
    cur_voted = [0]
    prev_voted = [1]
    history: List[dict] = []
    it = 0
    cand_names: List[str] = []
    lab_class_index: List[int] = []

    while set(cur_voted) != set(prev_voted) and it < cfg.max_vote_iters:
        it += 1
        counters = cluster_name_counters(name_idx_topk, u_preds, cfg.topk)
        counters = {c: [(n, v) for n, v in e if n not in known_name_idx]
                    for c, e in counters.items() if c in unlab_cluster_set}
        if not counters:
            # every image reclassified into a labelled name (or all unlab
            # histograms were pruned away): nothing left to vote on —
            # terminate with the labelled names as the candidate set
            # (the reference would crash on a zero-size vote matrix here).
            # u_preds must index the RETURNED cand_names: on a first-
            # iteration break they are still the caller's raw cluster ids,
            # so reclassify against the final candidate list (and report
            # the labelled columns) before returning.
            if not cand_names:
                cand_names = sorted(lab_names)
                u_preds = _reclassify(clip_u_feats, zeroshot_weights,
                                      [noun_to_col[n] for n in cand_names],
                                      cfg.logit_scale)
                name_pos = {n: i for i, n in enumerate(cand_names)}
                lab_class_index = [name_pos[n] for n in lab_names]
            break

        voted_idx = sorted({n for e in counters.values()
                            for n, _ in e[:cfg.num_common_vote]})
        ind, _w = assign_name(voted_idx, counters,
                              num_common=cfg.num_common_linear)

        prev_voted = cur_voted
        cur_voted = [nouns[voted_idx[col]] for _row, col in ind[:num_unlab_classes]
                     if col < len(voted_idx)]

        cand_names = sorted(set(cur_voted) | set(lab_names))
        # single dict inversion keeps the host bookkeeping O(K); repeated
        # list.index calls were O(K^2) per round (fine at K<=1000, quadratic
        # toward Herbarium-683 and beyond)
        name_pos = {n: i for i, n in enumerate(cand_names)}
        lab_set = set(lab_names)
        lab_class_index = [name_pos[n] for n in lab_names]
        unlab_cluster_idx = [name_pos[n] for n in cand_names
                             if n not in lab_set]
        unlab_cluster_set = set(unlab_cluster_idx)

        u_preds = _reclassify(clip_u_feats, zeroshot_weights,
                              [noun_to_col[n] for n in cand_names],
                              cfg.logit_scale)
        if metrics_cb is not None:
            history.append(metrics_cb(it, u_preds, cand_names) or {})

    return VotingResult(cand_names=cand_names, u_preds=u_preds,
                        n_iters=it, history=history,
                        lab_class_index=lab_class_index)
