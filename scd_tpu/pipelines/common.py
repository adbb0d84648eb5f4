"""Shared pipeline stages for the unsup/ptsup entry points.

Mirrors the stage structure of the reference mains (``main_unsup.py``,
``main_ptsup.py``): encoder setup -> feature extraction (cached) ->
clustering (cached) -> vocabulary + zero-shot weights -> per-image top-k
names -> voting loop -> metric printouts.  Every stage's output goes through
the ``ArtifactCache`` so runs re-enter from cache exactly like the
reference's ``.pt`` protocol (``main_unsup.py:294-311``).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from scd_tpu.core.cache import ArtifactCache
from scd_tpu.core.config import PipelineConfig, config_hash
from scd_tpu.cluster.kmeans import fit_kmeans, fit_sskm
from scd_tpu.cluster.constrained import fit_constrained
from scd_tpu.data import get_datasets, iterate_batches
from scd_tpu.metrics import (
    evaluate_semantic_acc,
    name_set_iou,
    split_cluster_acc_v2,
)
from scd_tpu.metrics.semantic import evaluate_soft_semantic_acc


def _prefetched(batches, depth: int = 2, stage_fn=None):
    """Overlap host decode + H2D staging of the next batches with the
    current batch's device compute: the image batch of iteration n+1 is
    `jax.device_put` while iteration n's encoder runs.  On the slow
    host->device link of tunneled TPUs this hides most of the transfer
    (the reference's torch DataLoader pin_memory analogue).  ``stage_fn``
    overrides the plain device_put — a mesh encoder's ``.stage`` pads and
    row-shards the batch so each chip receives only its slice."""
    import collections

    import jax

    stage_fn = stage_fn or jax.device_put
    q = collections.deque()

    def stage(item):
        images, *rest = item
        return (stage_fn(images), *rest)

    it = iter(batches)
    try:
        for _ in range(depth):
            q.append(stage(next(it)))
    except StopIteration:
        pass
    while q:
        out = q.popleft()
        try:
            q.append(stage(next(it)))
        except StopIteration:
            pass
        yield out


def make_sharded_image_encoder(forward: Callable, variables, mesh):
    """Data-parallel image encoder over a mesh — the multi-chip path for
    the pipeline's dominant stage, feature extraction (reference hot loop
    #1, ``main_unsup.py:114-147``; two full encoder passes over every
    image).

    ``forward(variables, images) -> feats`` is any per-image encoder
    forward.  The batch axis shards over the mesh's data axis
    (``NamedSharding(mesh, P("data"))``), parameters replicate — the same
    dp pattern the GCD train step uses (``train/gcd.py:194-206``); XLA
    runs the ViT forward SPMD with zero collectives (per-image compute is
    independent), so throughput scales ~linearly in chips.

    Ragged tail batches are zero-padded to a shard multiple and the pad
    rows sliced off after; padding to the batch's own next multiple (not a
    fixed bucket) costs at most one extra XLA compile for the final batch,
    identical to the unsharded path's behavior.

    Returns ``encode(images) -> np.ndarray`` with two extra attributes:
    ``encode.stage`` (pad + row-shard device_put, used by ``_prefetched``
    to overlap H2D of batch n+1 with batch n's compute) and
    ``encode.forward``/``encode.variables`` for callers that re-derive
    jitted paths (mirrors ``build_encoders``'s encode_text contract).
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from scd_tpu.core.multihost import (host_fetch, is_multiprocess,
                                        replicate_to_mesh,
                                        rows_from_process_local)

    data_axis = mesh.axis_names[0]
    n_shards = mesh.shape[data_axis]
    rows = NamedSharding(mesh, P(data_axis))
    variables = replicate_to_mesh(mesh, variables)
    fwd = jax.jit(forward,
                  in_shardings=(NamedSharding(mesh, P()), rows),
                  out_shardings=rows)

    def stage(images):
        # device-resident inputs pad + reshard ON DEVICE — never np.asarray
        # a device array just to re-upload it (CLAUDE.md rule 3: the
        # tunneled host link is ~50 MB/s, per-batch D2H+H2D would dominate)
        on_device = isinstance(images, jax.Array)
        if on_device:
            import jax.numpy as jnp
        else:
            images = np.asarray(images)
            if is_multiprocess():
                # multi-controller: the host batch is THIS PROCESS's
                # shard.  Ragged tails (every real dataset's last batch)
                # pad per process, so the valid spec is a MASK, not a
                # prefix count.
                staged, valid = rows_from_process_local(mesh, images,
                                                        pad=True)
                return staged, (staged.shape[0] if valid is None else valid)
        n = images.shape[0]
        target = -(-n // n_shards) * n_shards
        if target != n:
            pad = [(0, target - n)] + [(0, 0)] * (images.ndim - 1)
            images = (jnp.pad if on_device else np.pad)(images, pad)
        return jax.device_put(images, rows), n

    def _take_valid(arr, n_or_mask):
        # prefix count (int) or interleaved-pad bool mask (ragged pod tail)
        if isinstance(n_or_mask, np.ndarray):
            return arr[n_or_mask]
        return arr[:n_or_mask]

    def encode(images):
        # accepts either a raw host batch or a (staged, n_valid) pair from
        # ``stage`` (the _prefetched contract)
        staged, n = images if isinstance(images, tuple) else stage(images)
        return _take_valid(host_fetch(fwd(variables, staged)), n)

    def encode_sharded(images):
        """Device-resident variant: returns the (row-sharded global
        features, valid_spec) WITHOUT a host fetch — the handoff for
        composing with the mesh clusterers (features never leave the
        chips between stages).  valid_spec is an int row count, or — for
        ragged multi-controller batches — a host bool mask consumers
        must apply after their own host fetch."""
        staged, n = images if isinstance(images, tuple) else stage(images)
        return fwd(variables, staged), n

    encode.stage = stage
    encode.sharded = encode_sharded
    encode.forward = forward
    encode.variables = variables
    encode.mesh = mesh  # consumers (e.g. serving) replicate side inputs
    return encode


def extract_features(encode_image: Callable[[np.ndarray], np.ndarray],
                     dataset, train_classes: Sequence[int],
                     batch_size: int = 256, num_workers: int = 8,
                     normalize: bool = True) -> Dict[str, np.ndarray]:
    """Batched feature extraction with the reference's output contract
    (``main_unsup.py:114-147``): all_feats (L2-normalized), mask_lab,
    mask_cls, targets.  When ``encode_image`` is a mesh encoder
    (``make_sharded_image_encoder``), its ``.stage`` pads + row-shards each
    batch during prefetch and every chip encodes only its slice."""
    feats, targets, mask_lab, mask_cls = [], [], [], []
    # dataset targets are REMAPPED (make_target_transform: labelled classes
    # first), so Old-class membership is id < n_lab — an isin() against the
    # original train ids silently breaks on SSB splits (scattered ids)
    n_lab = len(train_classes)
    for images, labels, _uq, mlab in _prefetched(
            iterate_batches(dataset, batch_size, num_workers=num_workers),
            stage_fn=getattr(encode_image, "stage", None)):
        f = np.asarray(encode_image(images), np.float32)
        if normalize:
            f = f / np.maximum(np.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
        feats.append(f)
        targets.append(labels)
        mask_lab.append(mlab)
        mask_cls.append(np.asarray(labels) < n_lab)
    return {
        "all_feats": np.concatenate(feats),
        "targets": np.concatenate(targets).astype(np.float64),
        "mask_lab": np.concatenate(mask_lab),
        "mask_cls": np.concatenate(mask_cls),
    }


def extract_features_multi(encoders: Dict[str, Callable], dataset,
                           train_classes: Sequence[int],
                           batch_size: int = 256, num_workers: int = 8,
                           normalize: bool = True
                           ) -> Dict[str, Dict[str, np.ndarray]]:
    """ONE pass over the dataset feeding every encoder.

    The reference iterates the dataset twice — once per encoder
    (``main_unsup.py:297-311``: feature model, then CLIP) — paying image
    decode + transform + H2D twice.  With real image datasets the host
    side is the actual bottleneck, so a single shared pass halves the
    dominant cost; the per-batch device work simply runs both towers
    back-to-back (independent dispatches pipeline through the async
    queue).

    Returns ``{encoder_name: extract_features-style dict}``.  When every
    encoder is a mesh encoder (``make_sharded_image_encoder``), one
    pad+row-shard staging feeds all of them (identical geometry);
    otherwise batches stage with a plain device_put.
    """
    stage_fns = [getattr(f, "stage", None) for f in encoders.values()]
    common_stage = stage_fns[0] if all(
        s is not None for s in stage_fns) else None

    feats: Dict[str, list] = {k: [] for k in encoders}
    targets, mask_lab, mask_cls = [], [], []
    n_lab = len(train_classes)  # remapped ids: Old classes are 0..n_lab-1
    for images, labels, _uq, mlab in _prefetched(
            iterate_batches(dataset, batch_size, num_workers=num_workers),
            stage_fn=common_stage):
        for k, enc in encoders.items():
            f = np.asarray(enc(images), np.float32)
            if normalize:
                f = f / np.maximum(
                    np.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
            feats[k].append(f)
        targets.append(labels)
        mask_lab.append(mlab)
        mask_cls.append(np.asarray(labels) < n_lab)
    meta = {
        "targets": np.concatenate(targets).astype(np.float64),
        "mask_lab": np.concatenate(mask_lab),
        "mask_cls": np.concatenate(mask_cls),
    }
    return {k: {"all_feats": np.concatenate(v), **meta}
            for k, v in feats.items()}


class _RowRange:
    """Index-window view over a 3/4-tuple dataset (decode-on-access)."""

    def __init__(self, ds, lo: int, hi: int):
        self._ds, self._lo, self._hi = ds, lo, hi

    def __len__(self) -> int:
        return self._hi - self._lo

    def __getitem__(self, i: int):
        return self._ds[self._lo + i]


def extract_features_pod(encoders: Dict[str, Callable], dataset,
                         train_classes: Sequence[int],
                         batch_size: int = 256, num_workers: int = 8,
                         normalize: bool = True
                         ) -> Dict[str, Dict[str, np.ndarray]]:
    """Multi-controller extraction: each process DECODES only its
    contiguous shard of the dataset; the mesh encoders reassemble global
    batches on device (``rows_from_process_local`` inside ``.stage``
    tolerates unequal per-process counts); features and metadata come
    back identical on every host, row-aligned with the single-process
    extraction order.

    Host image decode — the real-dataset bottleneck — scales linearly
    with hosts, and every chip in the pod encodes a slice of every
    batch.  Metadata (targets/mask_lab) comes from the dataset's
    host-side arrays, which every process holds in full (only image
    DECODE is sharded).  Requires multi-process mesh encoders
    (``make_sharded_image_encoder``)."""
    import jax

    rank, n_proc = jax.process_index(), jax.process_count()
    n = len(dataset)
    share = -(-n // n_proc)  # contiguous equal shares; tail procs ragged
    lo, hi = min(rank * share, n), min(rank * share + share, n)
    n_batches = -(-share // batch_size)

    # per-(batch, process) REAL row counts — identical on every host
    starts = np.minimum(np.arange(n_proc) * share, n)
    stops = np.minimum(starts + share, n)
    counts = np.clip((stops - starts)[None, :]
                     - np.arange(n_batches)[:, None] * batch_size,
                     0, batch_size).astype(np.int64)

    it = iter(iterate_batches(_RowRange(dataset, lo, hi), batch_size,
                              num_workers=num_workers))
    img_shape = None
    feats: Dict[str, np.ndarray] = {}
    for b in range(n_batches):
        cnt = int(counts[b, rank])
        if cnt:
            images, _labels, _uq, _m = next(it)
            assert len(images) == cnt, (len(images), cnt)
            img_shape = images.shape[1:]
        else:
            if img_shape is None:  # this process owns no rows at all
                img_shape = np.asarray(dataset[0][0]).shape
            images = np.zeros((0,) + tuple(img_shape), np.float32)
        # global row ids of this batch, in the gathered (process-block)
        # order the encoder returns
        idxs = np.concatenate([
            np.arange(starts[p] + b * batch_size,
                      starts[p] + b * batch_size + counts[b, p])
            for p in range(n_proc)])
        for k, enc in encoders.items():
            f = np.asarray(enc(images), np.float32)
            if normalize:
                f = f / np.maximum(
                    np.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
            if k not in feats:
                feats[k] = np.empty((n, f.shape[1]), np.float32)
            feats[k][idxs] = f

    targets = np.asarray(dataset.targets, np.int64)
    mask_lab = (np.asarray(dataset.mask_lab, bool)
                if hasattr(dataset, "mask_lab")
                else np.zeros(n, bool))
    meta = {
        "targets": targets.astype(np.float64),
        "mask_lab": mask_lab,
        # remapped ids: Old classes are 0..n_lab-1 (extract_features note)
        "mask_cls": targets < len(train_classes),
    }
    return {k: {"all_feats": v, **meta} for k, v in feats.items()}


def make_shared_extractor(feat_encode, clip_encode, dataset,
                          train_classes: Sequence[int], batch_size: int,
                          num_workers: int,
                          needed: Sequence[str] = ("feat", "clip")):
    """Memoized single-pass extraction for the pipelines' feat+CLIP
    encoder pair (the reference iterates the dataset once per encoder,
    ``main_unsup.py:297-311``, paying decode/transform/H2D twice).

    ``needed``: the feature sets whose cache lookups MISSED.  Only those
    towers run — a run with one set already cached doesn't pay the other
    tower's full encoder pass — and when both are needed they share one
    dataset pass.  Returns ``extract(key) -> extract_features-style
    dict``, memoized so the two cache-miss lambdas trigger at most one
    pass.
    """
    memo: Dict[str, Dict] = {}
    by_key = {"feat": feat_encode, "clip": clip_encode}

    def extract(key: str) -> Dict[str, np.ndarray]:
        if key not in memo:
            want = set(needed) | {key}
            encoders = {k: by_key[k] for k in sorted(want)}
            if encoders.get("clip") is encoders.get("feat"):
                encoders.pop("clip")  # same tower: run once, alias below
            from scd_tpu.core.multihost import is_multiprocess

            if is_multiprocess() and all(
                    hasattr(e, "mesh") for e in encoders.values()):
                # pod: each process decodes only its dataset shard
                memo.update(extract_features_pod(
                    encoders, dataset, train_classes, batch_size,
                    num_workers))
            else:
                memo.update(extract_features_multi(
                    encoders, dataset, train_classes, batch_size,
                    num_workers))
            if "clip" in want and "clip" not in memo:
                memo["clip"] = memo["feat"]
        return memo[key]

    return extract


class _LazyProxy:
    """Call/attribute proxy that builds its target on first use — keeps
    encoder CONSTRUCTION (model init, checkpoint load) off the path of
    fully-cached pipeline re-entries while the call sites stay oblivious.
    ``encode_text``'s ``.forward``/``.variables``/``.tokenize`` attributes
    (the mesh zeroshot build uses them) resolve through ``__getattr__``."""

    def __init__(self, get):
        self._get = get

    def __call__(self, *a, **kw):
        return self._get()(*a, **kw)

    def __getattr__(self, name):
        return getattr(self._get(), name)


def lazy_encoders(factory) -> Tuple[Callable, Callable, Callable]:
    """(feat_encode, clip_encode, encode_text) proxies over ``factory()``
    (a ``build_encoders`` thunk), built at most once and only when an
    encoder is actually invoked — i.e. on a cache miss.  The reference
    re-enters from cache but still pays ``clip.load`` + ``torch.hub``
    model construction every run (``main_unsup.py:237-264``); here a
    warm-cache run touches no weights at all."""
    memo: list = []

    def built():
        if not memo:
            memo.append(factory())
        return memo[0]

    return (_LazyProxy(lambda: built()[0]), _LazyProxy(lambda: built()[1]),
            _LazyProxy(lambda: built()[2]))


def load_shared_features(cfg: PipelineConfig, cache: ArtifactCache,
                         feat_encode, clip_encode, dataset,
                         train_classes: Sequence[int]) -> Tuple[Dict, Dict]:
    """Cache-aware feat+CLIP extraction for the pipelines: derives the two
    feature cache keys, determines which sets will actually miss, and wires
    a :func:`make_shared_extractor` through ``cache.load_or_compute`` so at
    most ONE dataset pass runs (the reference pays one full pass per
    encoder, ``main_unsup.py:297-311``).  Returns ``(feats, clip_feats)``.
    The miss predicate must mirror ``load_or_compute``'s refresh semantics
    — keeping it here (not in each pipeline) keeps the two in sync."""
    feat_key = feature_cache_key(cfg, "feat")
    clip_key = feature_cache_key(cfg, "clip")
    needed = tuple(k for k, ck in (("feat", feat_key), ("clip", clip_key))
                   if cfg.extract_feat or not cache.has("features", ck))
    extract = make_shared_extractor(
        feat_encode, clip_encode, dataset, train_classes,
        cfg.data.batch_size, cfg.data.num_workers, needed=needed)
    feats = cache.load_or_compute(
        "features", feat_key,
        lambda: extract("feat"), refresh=cfg.extract_feat)
    clip_feats = cache.load_or_compute(
        "features", clip_key,
        lambda: extract("clip"), refresh=cfg.extract_feat)
    return feats, clip_feats


def pipeline_transform(cfg: PipelineConfig):
    """The mains' transform: CLIP's own preprocess emitting uint8 for
    on-device normalization (reference overrides every transform with
    ``preprocess``, ``main_unsup.py:271``); synthetic datasets carry their
    own arrays (None)."""
    if cfg.data.dataset_name == "synthetic":
        return None
    from scd_tpu.data.transforms import clip_preprocess

    return clip_preprocess(cfg.data.image_size, device_normalize=True)


def load_zeroshot_weights(cfg: PipelineConfig, cache: ArtifactCache,
                          encode_text, nouns, mesh=None) -> np.ndarray:
    """[D, V] zero-shot weights: an explicit ``--zeroshot_weights`` file
    (the reference's precomputed ``zeroshot_weights/*.pt``,
    ``main_unsup.py:387-395``), else the cached on-the-fly build."""
    from scd_tpu.naming.templates import IMAGENET_TEMPLATES
    from scd_tpu.naming.zeroshot import build_zeroshot_weights

    if cfg.data.zeroshot_weights:
        return (np.load(cfg.data.zeroshot_weights)["weights"]
                if cfg.data.zeroshot_weights.endswith(".npz")
                else np.load(cfg.data.zeroshot_weights))
    return cache.load_or_compute(
        "zeroshot", feature_cache_key(cfg, f"zw_{cfg.naming.corpus}"),
        lambda: {"weights": build_zeroshot_weights(
            encode_text, nouns, IMAGENET_TEMPLATES,
            mesh=mesh)})["weights"]


def _pipeline_mesh(cfg: PipelineConfig):
    """A data mesh when >1 device is visible (KM/SSKM shard the instance
    axis; single-device runs skip the sharding machinery)."""
    import jax

    if len(jax.devices()) <= 1:
        return None
    from scd_tpu.core.mesh import make_mesh

    return make_mesh(cfg.mesh)


def _pod_shard(x: np.ndarray) -> np.ndarray:
    """THIS PROCESS's contiguous share of a host array that is replicated
    on every host — the slicing half of the multi-controller fitter
    contract (a numpy row input to a mesh fitter is the process's shard;
    feeding the full replicated array would duplicate every row
    ``process_count`` times).  Ragged tails are fine: the fitters
    pad+mask unequal shares."""
    import jax

    n_proc = jax.process_count()
    if n_proc == 1:
        return x
    share = -(-len(x) // n_proc)
    lo = min(jax.process_index() * share, len(x))
    return x[lo:lo + share]


def run_clustering(cfg: PipelineConfig, feats: Dict[str, np.ndarray]
                   ) -> Dict[str, np.ndarray]:
    """Cluster per config (reference ``main_unsup.py:334-364``).  Returns the
    reference's cluster_result contract: all_preds (None for KM), u_preds,
    u_targets, mask.

    Multi-controller: ``feats`` is the replicated full feature dict (the
    pod extraction's output); the unlabelled rows slice per process
    (``_pod_shard``) before entering the mesh fitters, labelled side
    inputs stay full, and the fitters gather global results back."""
    c = cfg.cluster
    mesh = _pipeline_mesh(cfg)
    all_feats = feats["all_feats"]
    mask_lab = feats["mask_lab"].astype(bool)
    mask_cls = feats["mask_cls"].astype(bool)
    targets = feats["targets"].astype(np.int64)

    l_feats, u_feats = all_feats[mask_lab], all_feats[~mask_lab]
    l_targets, u_targets = targets[mask_lab], targets[~mask_lab]
    mask = mask_cls[~mask_lab]

    from scd_tpu.core.multihost import is_multiprocess

    u_in = (_pod_shard(u_feats) if mesh is not None and is_multiprocess()
            else u_feats)

    key = jax.random.PRNGKey(c.seed)
    if c.algorithm == "KM":
        res = fit_kmeans(key, u_in, c, mesh=mesh)
        preds = res.labels
        all_preds = np.full(len(all_feats), -1, np.int64)
        all_preds[~mask_lab] = preds
    elif c.algorithm == "SSKM":
        res = fit_sskm(key, u_in, l_feats, l_targets, c, mesh=mesh)
        all_preds = np.empty(len(all_feats), np.int64)
        all_preds[mask_lab] = res.labels[:mask_lab.sum()]
        all_preds[~mask_lab] = res.labels[mask_lab.sum():]
        preds = all_preds[~mask_lab]
    elif c.algorithm == "ConSSKM":
        res = fit_constrained(key, u_in, l_feats, l_targets, c,
                              mesh=mesh)
        all_preds = np.empty(len(all_feats), np.int64)
        all_preds[mask_lab] = res.labels[:mask_lab.sum()]
        all_preds[~mask_lab] = res.labels[mask_lab.sum():]
        preds = all_preds[~mask_lab]
    elif c.algorithm == "FINCH":
        from scd_tpu.cluster.finch import finch_fit

        preds = finch_fit(u_feats, req_clust=c.n_clusters)
        all_preds = np.full(len(all_feats), -1, np.int64)
        all_preds[~mask_lab] = preds
    else:
        raise ValueError(f"unknown cluster algorithm {c.algorithm!r}")

    return {"all_preds": all_preds, "u_preds": np.asarray(preds, np.int64),
            "u_targets": u_targets, "mask": mask}


def print_acc_block(tag: str, u_targets, u_preds, mask,
                    cidx_to_cname, cand_names,
                    name_similarity: Optional[Callable] = None,
                    eval_soft: bool = True) -> Dict[str, float]:
    """The reference's per-iteration metric printout
    (``main_unsup.py:617-641``), returning the numbers as a dict."""
    out: Dict[str, float] = {}
    all_acc, old_acc, new_acc = split_cluster_acc_v2(u_targets, u_preds, mask)
    out.update(all_acc=all_acc, old_acc=old_acc, new_acc=new_acc)
    print(f"Accuracies: All {all_acc} | Old {old_acc} | New {new_acc}")

    subsets = {"All": np.ones(len(u_preds), bool), "old": mask, "new": ~mask}
    sacc = {}
    for name, sel in subsets.items():
        if sel.sum() == 0:
            sacc[name] = (0.0, 0.0)
            continue
        sacc[name] = evaluate_semantic_acc(u_targets[sel], cidx_to_cname,
                                           u_preds[sel], cand_names)
    for label, (acc_key, sel_name) in (("All", ("all_acc", "All")),
                                       ("old", ("old_acc", "old")),
                                       ("new", ("new_acc", "new"))):
        avg, allv = sacc[sel_name]
        print(f"ACC/sACC_avg/sACC_all: {label} "
              f"{round(out[acc_key] * 100, 2)}/{round(avg * 100, 2)}"
              f"/{round(allv * 100, 2)} ")
        out[f"sacc_avg_{label}"] = avg
        out[f"sacc_all_{label}"] = allv

    if eval_soft and name_similarity is not None:
        for label, sel in subsets.items():
            if sel.sum() == 0:
                continue
            try:
                soft = evaluate_soft_semantic_acc(
                    u_targets[sel], cidx_to_cname, u_preds[sel], cand_names,
                    name_similarity)
            except KeyError:
                break
            acc_val = {"All": all_acc, "old": old_acc, "new": new_acc}[label]
            print(f"ACC/Soft sACC: {label} {round(acc_val * 100, 2)}"
                  f"/{round(soft * 100, 2)}")
            out[f"soft_sacc_{label}"] = soft
    return out


def stage_cache(cfg: PipelineConfig) -> ArtifactCache:
    root = cfg.data.cache_dir
    if not os.path.isabs(root):
        root = os.path.join(os.getcwd(), root)
    return ArtifactCache(root)


def feature_cache_key(cfg: PipelineConfig, which: str) -> str:
    # only the clustering-feature key depends on feat_model: CLIP features
    # and zeroshot weights are byte-identical across feat_model choices,
    # and baking it into their keys forced a full CLIP re-extraction (and
    # vocabulary rebuild) on every backbone switch
    extra = {"model": which}
    if which == "feat":
        extra["feat"] = cfg.feature.feat_model
    return config_hash(cfg.data, extra=extra)


def cluster_cache_key(cfg: PipelineConfig) -> str:
    return config_hash(cfg.cluster, extra={
        "data": config_hash(cfg.data), "feat": cfg.feature.feat_model})
