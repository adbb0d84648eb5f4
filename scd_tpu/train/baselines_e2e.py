"""End-to-end (trunk-finetuning) UNO v2 and AutoNovel baselines.

The frozen-feature drivers in ``scd_tpu.train.baselines`` cover the GCD
setting; the reference additionally trains these methods THROUGH the
backbone with SGD and a scheduled LR, evaluating every epoch:

- UNO v2 (``gcd/methods/baselines/uno_v2.py:62-170``): SGD +
  ``LinearWarmupCosineAnnealingLR``, per-head swapped-prediction loss
  accumulated into a per-head tracker, per-epoch eval with the
  **best head** (argmin accumulated cluster loss).
- AutoNovel (``gcd/methods/baselines/rerun_autonovel.py:42-110``): SGD +
  StepLR, ranking statistics on the model's own DETACHED trunk features,
  sigmoid-ramped consistency weight, per-epoch eval on the unlabelled
  split.

TPU-first: each step is one jitted program (backbone fwd over all views +
heads + pseudo-labels + bwd + SGD); per-step losses stay on device until
epoch end (one fetch per epoch — a ``float(loss)`` per step costs a ~33 ms
tunnel round trip); the per-head loss tracker is a device array carried
through the epoch.  Works with any ``ViTConfig`` backbone (tests use a
tiny ViT; real runs ``dino_vit_b16_config``).

Multi-chip: pass ``mesh=`` (axes ``data`` x ``model``) and the step jits
with the same dp+tp shardings as the GCD trainer (``train/gcd.py``) —
batch over ``data``, qkv/fc1/proj/fc2 over ``model``, heads replicated.
The global-batch semantics (Sinkhorn column sums, ranking-statistics
pairwise similarities) are preserved by GSPMD's global-view partitioning,
so mesh and single-device runs optimize the same objective
(``tests/test_baselines_e2e.py`` asserts matching loss trajectories).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scd_tpu.models.vit import ViTConfig, VisionTransformer
from scd_tpu.train.baselines import (
    MultiHeadPrototypes,
    TwoHeadClassifier,
    _epoch_mean,
    autonovel_loss,
    uno_targets,
)
from scd_tpu.train.schedulers import (
    cosine_warmup_schedule,
    sigmoid_rampup,
)


def _swapped_loss_per_head(logits: jnp.ndarray, targets: jnp.ndarray,
                           temperature: float) -> jnp.ndarray:
    """Per-head swapped-prediction CE: logits/targets [V, H, B, C] ->
    [H].  The reference accumulates exactly this into ``loss_per_head``
    for best-head selection (``uno_v2.py:133``)."""
    v = logits.shape[0]
    logp = jax.nn.log_softmax(logits / temperature, axis=-1)
    per_head = jnp.zeros((logits.shape[1],), jnp.float32)
    n_terms = 0
    for view in range(v):
        for other in range(v):
            if other == view:
                continue
            # mean over batch, sum over classes; keep the head axis
            per_head = per_head - jnp.mean(
                jnp.sum(targets[view] * logp[other], axis=-1), axis=-1)
            n_terms += 1
    return per_head / n_terms


def _put(a, dtype=None, sharding=None):
    """Batch staging: ``jnp.asarray`` single-controller (async H2D, jit
    reshards per its in_shardings).  Multi-controller with a target
    ``sharding``: assemble the global array explicitly from this host's
    identical full copy (``put_global``) — jit rejects numpy inputs
    against non-replicated shardings, and a committed local array would
    conflict with the global spec."""
    from scd_tpu.core.multihost import is_multiprocess, put_global

    a = np.asarray(a, dtype) if dtype is not None else np.asarray(a)
    if sharding is not None and is_multiprocess():
        return put_global(a, sharding)
    return jnp.asarray(a)


def _shard_setup(mesh: Mesh, params):
    """dp+tp shardings for an e2e trainer: backbone parameters carry the
    same tensor-parallel specs as the GCD trainer (qkv/fc1 out-sharded,
    proj/fc2 in-sharded over ``model``); head/prototype parameters
    replicate; the batch shards over ``data`` (XLA inserts the grad
    all-reduce and the tp collectives).  Returns ``(params_on_mesh,
    param_specs, dp_sharding)``."""
    from scd_tpu.train.gcd import _tp_spec

    param_specs = jax.tree_util.tree_map_with_path(
        lambda path, v: NamedSharding(mesh, _tp_spec(
            tuple(getattr(k, "key", k) for k in path), v)), params)
    from scd_tpu.core.multihost import is_multiprocess, put_global

    if is_multiprocess():
        # multi-controller: every host built identical params from the
        # same rng; materialize each host's own shards (device_put can't
        # target non-addressable devices).  Batch inputs stay host numpy
        # — jit's in_shardings assembles them globally (every process
        # passes the identical full batch).
        params = jax.tree_util.tree_map(
            lambda v, s: put_global(np.asarray(v), s), params, param_specs)
    else:
        params = jax.device_put(params, param_specs)
    return params, param_specs, NamedSharding(mesh, P("data"))


def _mesh_batch_size(batch_size: int, mesh: Optional[Mesh], n: int) -> int:
    """Largest batch <= batch_size that splits evenly over the data axis
    (GSPMD shards the batch dimension; ragged shards don't compile)."""
    batch_size = min(batch_size, n)
    if mesh is None:
        return batch_size
    d = mesh.shape["data"]
    if batch_size < d:
        raise ValueError(f"batch_size {batch_size} < data-axis size {d}")
    return batch_size - batch_size % d


def _epoch_iter(rng, n: int, batch_size: int):
    order = rng.permutation(n)
    for s in range(0, n - batch_size + 1, batch_size):
        yield order[s:s + batch_size]


def _run_epochs(epochs: int, epoch_fn, eval_fn, best_metric: str,
                log_fn, ckpt=None, get_state=None) -> Tuple[list, Optional[dict]]:
    """Shared epoch driver: run ``epoch_fn(epoch) -> metrics`` then
    ``eval_fn(epoch) -> dict``; track the best epoch by ``best_metric``
    (the reference keeps the best checkpoint by eval ACC).  With ``ckpt``
    (a ``scd_tpu.train.checkpoint.CheckpointManager``) and ``get_state``,
    every epoch is checkpointed with its metrics — the manager's
    best-metric tracking mirrors the reference's ``model_best.pt``
    (``uno_v2.py``/``learn_metric.py`` per-epoch save pattern)."""
    history, best = [], None
    for epoch in range(epochs):
        metrics = epoch_fn(epoch)
        if eval_fn is not None:
            metrics.update(eval_fn(epoch) or {})
        history.append(metrics)
        if best_metric in metrics and (
                best is None or metrics[best_metric] > best[best_metric]):
            best = dict(metrics, epoch=epoch)
        if ckpt is not None and get_state is not None:
            ckpt.save(epoch, get_state(), metrics={
                k: float(v) for k, v in metrics.items()
                if isinstance(v, (int, float, np.floating, np.integer))})
        if log_fn is not None:
            msg = " | ".join(
                f"{k} {v:.4f}" for k, v in metrics.items()
                if isinstance(v, (int, float)) and np.isfinite(v))
            log_fn(f"Epoch {epoch}: {msg}")
    return history, best


def train_uno_e2e(key: jax.Array, views, labels: np.ndarray = None,
                  mask_lab: np.ndarray = None, n_labeled: int = 0,
                  n_unlabeled: int = 0,
                  vit_cfg: ViTConfig = None, num_heads: int = 4,
                  epochs: int = 10,
                  batch_size: int = 64, lr: float = 0.4,
                  min_lr: float = 1e-3, warmup_epochs: int = 2,
                  momentum: float = 0.9, weight_decay: float = 1e-4,
                  sk_iters: int = 3, sk_epsilon: float = 0.05,
                  temperature: float = 0.1, overcluster_factor: int = 0,
                  steps_per_epoch: int = None, seed: int = 0,
                  eval_fn: Optional[Callable] = None,
                  best_metric: str = "acc", log_fn=None, ckpt=None,
                  mesh: Optional[Mesh] = None):
    """UNO v2 trained through a ViT backbone (reference
    ``uno_v2.py:62-170``): multi-head prototype heads over backbone
    features, Sinkhorn pseudo-labels, swapped-prediction CE, SGD with
    linear-warmup cosine LR, per-head loss tracking and best-head
    prediction.

    ``views``: [V, N, H, W, C] float image views held in memory, OR a
    callable ``views(epoch, rng) -> iterator of (batch_views [V, B, ...],
    labels [B], mask_lab [B])`` for datasets too large to materialize
    (pass ``steps_per_epoch`` for the LR schedule; the reference streams
    through a DataLoader the same way).  ``eval_fn(epoch) -> dict`` runs
    every epoch (use ``predict`` exposed on the returned state); the best
    epoch by ``best_metric`` is tracked like the reference's
    best-checkpoint logic.

    ``overcluster_factor`` > 0 adds the reference's overclustering heads
    (``uno_v2_utils.py:142-146``: a second multi-head block with
    ``n_unlabeled * factor`` prototypes; total loss = (cluster +
    overcluster) / 2, ``uno_v2.py:127-130``; the best-head tracker uses
    the cluster loss only, matching ``loss_per_head += loss_cluster``).
    The reference default is 3; 0 disables (cheaper, same prediction
    head).

    Returns ``(state, predict_fn, history)`` where ``state`` carries
    params + the best-head index and ``predict_fn(images) -> labels`` uses
    the best head.
    """
    if callable(views):
        if not steps_per_epoch:
            raise ValueError("streaming views need steps_per_epoch "
                             "(drives the cosine LR schedule)")
        batches = views
    else:
        views = np.asarray(views, np.float32)
        n = views.shape[1]
        batch_size = _mesh_batch_size(batch_size, mesh, n)
        labels = np.asarray(labels)
        mask_lab = np.asarray(mask_lab)
        steps_per_epoch = steps_per_epoch or max(n // batch_size, 1)

        def batches(_epoch, rng):
            for idx in _epoch_iter(rng, n, batch_size):
                yield views[:, idx], labels[idx], mask_lab[idx]

    backbone = VisionTransformer(vit_cfg)
    feat_dim = vit_cfg.output_proj or vit_cfg.width
    heads = MultiHeadPrototypes(num_heads=num_heads,
                                num_prototypes=n_labeled + n_unlabeled)

    kb, kh, ko = jax.random.split(key, 3)
    dummy = jnp.zeros((1, vit_cfg.image_size, vit_cfg.image_size, 3),
                      jnp.float32)
    params = {
        "backbone": jax.jit(backbone.init)(kb, dummy)["params"],
        "heads": jax.jit(heads.init)(
            kh, jnp.zeros((1, feat_dim), jnp.float32))["params"],
    }
    heads_over = None
    if overcluster_factor > 0:
        heads_over = MultiHeadPrototypes(
            num_heads=num_heads,
            num_prototypes=n_labeled + n_unlabeled * overcluster_factor)
        params["heads_over"] = jax.jit(heads_over.init)(
            ko, jnp.zeros((1, feat_dim), jnp.float32))["params"]

    total_steps = epochs * steps_per_epoch
    # short runs: warmup must leave >=1 decay step or the cosine schedule
    # is degenerate (optax rejects decay_steps=0)
    warmup_steps = min(warmup_epochs * steps_per_epoch, total_steps - 1)
    schedule = cosine_warmup_schedule(
        lr, warmup_steps=max(warmup_steps, 0), total_steps=total_steps,
        final_lr=min_lr)
    tx = optax.chain(optax.add_decayed_weights(weight_decay),
                     optax.sgd(schedule, momentum=momentum))
    dp = None
    if mesh is not None:
        # shard BEFORE tx.init so the optimizer state inherits the specs
        params, param_specs, dp = _shard_setup(mesh, params)
    opt_state = tx.init(params)

    def loss_fn(p, batch_views, lab, m_lab):
        # one backbone pass over all views: [V*B, H, W, C] -> [V, B, D]
        n_v, vb = batch_views.shape[0], batch_views.shape[1]
        flat = batch_views.reshape((-1,) + batch_views.shape[2:])
        feats = backbone.apply({"params": p["backbone"]}, flat)
        feats = feats.reshape(n_v, vb, -1)

        def head_loss(module, pname):
            logits = jax.vmap(lambda f: module.apply(
                {"params": p[pname]}, f)[0])(feats)  # [V, H, B, nlc+P']
            targets = uno_targets(
                jax.lax.stop_gradient(logits[..., n_labeled:]), lab, m_lab,
                n_labeled, sk_iters, sk_epsilon)
            return _swapped_loss_per_head(logits, targets, temperature)

        per_head = head_loss(heads, "heads")
        loss = per_head.mean()
        if heads_over is not None:
            # reference: loss = (cluster + overcluster) / 2
            loss = (loss + head_loss(heads_over, "heads_over").mean()) / 2
        return loss, per_head

    def _step(p, o, head_loss, batch_views, lab, m_lab):
        (loss, per_head), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, batch_views, lab, m_lab)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, head_loss + per_head, loss

    vdp = None
    if mesh is None:
        step = jax.jit(_step)
    else:
        # views [V, B, ...] shard on axis 1; GSPMD keeps the Sinkhorn
        # pseudo-label normalization global (it all-reduces the per-shard
        # column sums), so mesh and single-device runs optimize the same
        # objective
        vdp = NamedSharding(mesh, P(None, "data"))
        step = jax.jit(_step, in_shardings=(
            param_specs, None, None, vdp, dp, dp))

    @jax.jit
    def _predict(p, images, best_head):
        feats = backbone.apply({"params": p["backbone"]}, images)
        logits, _ = heads.apply({"params": p["heads"]}, feats)  # [H, B, C]
        return jnp.argmax(logits[best_head], axis=-1)

    rng = np.random.default_rng(seed)
    state = {"params": params, "best_head": 0}

    def predict(images, batch: int = 256) -> np.ndarray:
        images = np.asarray(images, np.float32)
        out = [np.asarray(_predict(state["params"], jnp.asarray(
            images[s:s + batch]), state["best_head"]))
            for s in range(0, len(images), batch)]
        return np.concatenate(out)

    def epoch_fn(epoch):
        nonlocal opt_state
        head_loss = _put(np.zeros((num_heads,), np.float32),
                         sharding=(None if mesh is None
                                   else NamedSharding(mesh, P())))
        losses = []
        for bv, lab, m in batches(epoch, rng):
            state["params"], opt_state, head_loss, loss = step(
                state["params"], opt_state, head_loss,
                _put(bv, np.float32, vdp), _put(lab, None, dp),
                _put(m, None, dp))
            losses.append(loss)
        # ONE fetch for the epoch: per-head tracker + stacked losses
        head_loss_h = np.asarray(head_loss)
        state["best_head"] = int(head_loss_h.argmin())
        return {"loss": _epoch_mean(losses),
                "best_head": state["best_head"]}

    history, best = _run_epochs(
        epochs, epoch_fn,
        (lambda epoch: eval_fn(predict, epoch)) if eval_fn else None,
        best_metric, log_fn, ckpt=ckpt,
        get_state=lambda: {"params": state["params"],
                           "best_head": state["best_head"],
                           "opt_state": opt_state})
    state["best"] = best
    return state, predict, history


def train_autonovel_e2e(key: jax.Array, images,
                        images_bar: np.ndarray = None,
                        labels: np.ndarray = None,
                        mask_lab: np.ndarray = None, n_labeled: int = 0,
                        n_unlabeled: int = 0, vit_cfg: ViTConfig = None,
                        epochs: int = 10, batch_size: int = 64,
                        lr: float = 0.1, momentum: float = 0.9,
                        weight_decay: float = 1e-4, step_size: int = 170,
                        gamma: float = 0.1, rampup_length: float = 150.0,
                        rampup_coeff: float = 50.0, topk: int = 5,
                        seed: int = 0, eval_fn: Optional[Callable] = None,
                        best_metric: str = "acc", log_fn=None, ckpt=None,
                        mesh: Optional[Mesh] = None):
    """AutoNovel trained through a ViT backbone (reference
    ``rerun_autonovel.py:42-110``): two augmented views, ranking
    statistics on the model's own detached trunk features, pairwise BCE +
    labelled CE + ramped MSE consistency, SGD + StepLR, per-epoch eval.

    Returns ``(state, predict_fn, history)``; ``predict_fn`` maps images
    to all-classes-head argmax ids (already global — labelled classes
    occupy the first ``n_labeled`` columns, matching the reference's
    eval on ``output1.max(1)``).

    ``images`` may instead be a callable ``images(epoch, rng) -> iterator
    of (x [B, ...], x_bar [B, ...], labels [B], mask_lab [B])`` to stream
    datasets too large to materialize.
    """
    if callable(images):
        batches = images
    else:
        images = np.asarray(images, np.float32)
        images_bar = np.asarray(images_bar, np.float32)
        n = images.shape[0]
        batch_size = _mesh_batch_size(batch_size, mesh, n)
        labels = np.asarray(labels)
        mask_lab = np.asarray(mask_lab)

        def batches(_epoch, rng):
            for idx in _epoch_iter(rng, n, batch_size):
                yield images[idx], images_bar[idx], labels[idx], mask_lab[idx]

    backbone = VisionTransformer(vit_cfg)
    feat_dim = vit_cfg.output_proj or vit_cfg.width
    heads = TwoHeadClassifier(num_labeled=n_labeled,
                              num_unlabeled=n_unlabeled)
    kb, kh = jax.random.split(key)
    dummy = jnp.zeros((1, vit_cfg.image_size, vit_cfg.image_size, 3),
                      jnp.float32)
    params = {
        "backbone": jax.jit(backbone.init)(kb, dummy)["params"],
        "heads": jax.jit(heads.init)(
            kh, jnp.zeros((1, feat_dim), jnp.float32))["params"],
    }
    # StepLR decays per EPOCH (reference ``exp_lr_scheduler.step()`` runs
    # once at each epoch start, rerun_autonovel.py:43,53) — the LR is an
    # injected hyperparameter set by epoch_fn, NOT an optimizer-step
    # schedule (which would collapse the LR within the first epoch at
    # hundreds of steps/epoch).
    tx = optax.chain(optax.add_decayed_weights(weight_decay),
                     optax.inject_hyperparams(optax.sgd)(
                         learning_rate=lr, momentum=momentum))
    dp = None
    if mesh is not None:
        params, param_specs, dp = _shard_setup(mesh, params)
    opt_state = tx.init(params)

    def loss_fn(p, x, x_bar, lab, m_lab, w):
        feats = backbone.apply({"params": p["backbone"]}, x)
        feats_bar = backbone.apply({"params": p["backbone"]}, x_bar)
        o1, _o2, _ = heads.apply({"params": p["heads"]}, feats)
        o1b, _, _ = heads.apply({"params": p["heads"]}, feats_bar)
        # ranking stats on the DETACHED trunk features of the current
        # model (reference ``rank_feat = feat.detach()``,
        # rerun_autonovel.py:66)
        return autonovel_loss(o1, o1b, jax.lax.stop_gradient(feats),
                              lab, m_lab, w, topk=topk)["loss"]

    def _step(p, o, x, x_bar, lab, m_lab, w):
        loss, grads = jax.value_and_grad(loss_fn)(p, x, x_bar, lab, m_lab, w)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    if mesh is None:
        step = jax.jit(_step)
    else:
        # the ranking-statistics pairwise [B, B] similarity is global:
        # GSPMD all-gathers the detached trunk features across the data
        # shards, so the pseudo-pair targets match the single-device run
        step = jax.jit(_step, in_shardings=(
            param_specs, None, dp, dp, dp, dp, None))

    @jax.jit
    def _predict(p, x):
        feats = backbone.apply({"params": p["backbone"]}, x)
        o1, _, _ = heads.apply({"params": p["heads"]}, feats)
        return jnp.argmax(o1, axis=-1)

    rng = np.random.default_rng(seed)
    state = {"params": params}

    def predict(imgs, batch: int = 256) -> np.ndarray:
        imgs = np.asarray(imgs, np.float32)
        out = [np.asarray(_predict(state["params"],
                                   jnp.asarray(imgs[s:s + batch])))
               for s in range(0, len(imgs), batch)]
        # head1 spans all classes (labelled first): ids already global
        return np.concatenate(out)

    def epoch_fn(epoch):
        nonlocal opt_state
        # per-epoch StepLR, stepped at epoch start like the reference
        # (torch last_epoch semantics: lr = lr0 * gamma^((e+1)//step_size))
        opt_state[1].hyperparams["learning_rate"] = jnp.asarray(
            lr * gamma ** ((epoch + 1) // step_size), jnp.float32)
        w = rampup_coeff * sigmoid_rampup(epoch, rampup_length)
        losses = []
        for x, x_bar, lab, m in batches(epoch, rng):
            state["params"], opt_state, loss = step(
                state["params"], opt_state,
                _put(x, np.float32, dp), _put(x_bar, np.float32, dp),
                _put(lab, None, dp), _put(m, None, dp), np.float32(w))
            losses.append(loss)
        return {"loss": _epoch_mean(losses), "rampup_w": w}

    history, best = _run_epochs(
        epochs, epoch_fn,
        (lambda epoch: eval_fn(predict, epoch)) if eval_fn else None,
        best_metric, log_fn, ckpt=ckpt,
        get_state=lambda: {"params": state["params"],
                           "opt_state": opt_state})
    state["best"] = best
    return state, predict, history
