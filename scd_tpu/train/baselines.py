"""Baseline NCD methods: UNO v2 and AutoNovel, plus the supervised
classifier + combine-with-kmeans evaluator.

References: ``gcd/methods/baselines/uno_v2.py`` / ``uno_v2_utils.py``
(multi-head prototype classifier, Sinkhorn-Knopp pseudo-labels, swapped
prediction), ``rerun_autonovel.py`` / ``auto_novel_utils.py`` (ranking
statistics pairwise pseudo-labels + pairwise BCE + consistency),
``cluster_and_classifier/train_supervised.py`` (label-smoothed linear head,
OSR max-prob thresholding) and ``combine_classifier_and_kmeans.py``.

TPU-first: multi-head projectors/prototypes are a vmapped head axis (the
reference loops over ``nn.ModuleList``); pseudo-label generation
(Sinkhorn-Knopp, ranking-stats pair enumeration) is fully vectorized inside
the jitted step — no [B², D] host materialization.  Projector norm layers
use LayerNorm (batch-size-independent, SPMD-friendly) where the reference
uses BatchNorm1d.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


# ------------------------------------------------------------------ UNO v2

def sinkhorn_knopp(logits: jnp.ndarray, n_iters: int = 3,
                   epsilon: float = 0.05,
                   row_mask: jnp.ndarray = None) -> jnp.ndarray:
    """SwAV-style equality-constrained pseudo-labels (reference
    ``uno_v2.py:72,113-121``).  logits [B, K] -> soft targets [B, K] whose
    rows sum to 1 and columns balance to B_eff/K.

    ``row_mask`` [B] (1 = participate) restricts the transport problem to
    a subset of rows with STATIC shapes — the reference slices
    ``logits_unlab[..., ~mask_lab]`` before sk (uno_v2.py:118): excluded
    rows carry zero mass (their returned rows are zeros) and B_eff is the
    participating-row count, so the balanced-assignment constraint holds
    among exactly the rows the reference constrains."""
    z = logits.astype(jnp.float32) / epsilon
    # max-shift before exp: unshifted exp overflows f32 for |logit| > ~4.4
    # at the default epsilon; the shift cancels in the first normalization
    q = jnp.exp(z - jnp.max(z)).T  # [K, B]
    k = q.shape[0]
    if row_mask is None:
        b = q.shape[1]
    else:
        mask = row_mask.astype(q.dtype)
        q = q * mask[None, :]
        b = jnp.maximum(jnp.sum(mask), 1.0)
    q = q / jnp.maximum(jnp.sum(q), 1e-12)

    def body(_, q):
        q = q / jnp.maximum(jnp.sum(q, axis=1, keepdims=True), 1e-12) / k
        q = q / jnp.maximum(jnp.sum(q, axis=0, keepdims=True), 1e-12) / b
        return q

    q = jax.lax.fori_loop(0, n_iters, body, q)
    return (q * b).T


class MultiHeadPrototypes(nn.Module):
    """H independent (projector MLP -> unit-norm prototype layer) heads,
    vmapped over the head axis (reference ``MultiHead``,
    ``uno_v2_utils.py:64-91``)."""

    num_heads: int = 4
    hidden_dim: int = 2048
    proj_dim: int = 256
    num_prototypes: int = 100
    num_hidden_layers: int = 1

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """feats [B, D] -> (logits [H, B, P], proj [H, B, proj_dim])."""

        class _Head(nn.Module):
            hidden_dim: int
            proj_dim: int
            num_prototypes: int
            num_hidden_layers: int

            @nn.compact
            def __call__(self, x):
                for i in range(self.num_hidden_layers):
                    x = nn.Dense(self.hidden_dim, name=f"fc{i}")(x)
                    x = nn.LayerNorm(name=f"ln{i}")(x)
                    x = nn.relu(x)
                x = nn.Dense(self.proj_dim, name="out")(x)
                z = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                                    1e-12)
                proto = self.param("prototypes", nn.initializers.normal(0.02),
                                   (self.proj_dim, self.num_prototypes))
                proto = proto / jnp.maximum(
                    jnp.linalg.norm(proto, axis=0, keepdims=True), 1e-12)
                return z @ proto, z

        heads = nn.vmap(
            _Head,
            in_axes=None, out_axes=0,
            axis_size=self.num_heads,
            variable_axes={"params": 0},
            split_rngs={"params": True},
        )(self.hidden_dim, self.proj_dim, self.num_prototypes,
          self.num_hidden_layers)
        return heads(feats)


def swapped_prediction_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                            temperature: float = 0.1) -> jnp.ndarray:
    """Cross-view swapped CE (reference ``uno_v2.py:47-57``):
    logits/targets [V, H, B, C]; view v is scored against view w's targets."""
    v = logits.shape[0]
    logp = jax.nn.log_softmax(logits / temperature, axis=-1)
    loss = 0.0
    n_terms = 0
    for view in range(v):
        for other in range(v):
            if other == view:
                continue
            loss = loss - jnp.mean(
                jnp.sum(targets[view] * logp[other], axis=-1))
            n_terms += 1
    return loss / n_terms


def uno_targets(logits_unlab: jnp.ndarray, labels: jnp.ndarray,
                mask_lab: jnp.ndarray, n_labeled_classes: int,
                sk_iters: int = 3, sk_epsilon: float = 0.05) -> jnp.ndarray:
    """Targets [V, H, B, nlc+P]: labelled rows one-hot in the first nlc
    columns; unlabelled rows get Sinkhorn pseudo-labels over the prototype
    block.  Sinkhorn runs on the UNLABELLED rows only (the reference
    slices ``logits_unlab[v, h, ~mask_lab]`` before sk, uno_v2.py:115-121)
    — with labelled rows in the transport problem they would absorb
    cluster mass and the surviving unlabelled pseudo-labels would no
    longer be balance-constrained among themselves."""
    v, h, b, p = logits_unlab.shape
    one_hot_lab = jax.nn.one_hot(labels, n_labeled_classes)
    unlab_mask = jnp.logical_not(mask_lab)

    def per_vh(lg):  # [B, P]
        pseudo = sinkhorn_knopp(lg, sk_iters, sk_epsilon,
                                row_mask=unlab_mask)
        lab_part = jnp.where(mask_lab[:, None], one_hot_lab, 0.0)
        unlab_part = jnp.where(mask_lab[:, None], 0.0, pseudo)
        return jnp.concatenate([lab_part, unlab_part], axis=-1)

    return jax.vmap(jax.vmap(per_vh))(logits_unlab)


# --------------------------------------------------------------- AutoNovel

def ranking_stats_similarity(feats: jnp.ndarray, topk: int = 5) -> jnp.ndarray:
    """Pairwise ±1 pseudo-labels from top-k feature-rank agreement
    (reference ``rerun_autonovel.py:64-74``): +1 when two samples share an
    identical sorted top-k feature-index set.  Returns [B, B]."""
    rank_idx = jnp.argsort(-feats, axis=1)[:, :topk]
    rank_sorted = jnp.sort(rank_idx, axis=1)  # [B, k]
    diff = jnp.sum(jnp.abs(rank_sorted[:, None, :] - rank_sorted[None, :, :]),
                   axis=-1)
    return jnp.where(diff == 0, 1.0, -1.0)


def pairwise_bce(prob1: jnp.ndarray, prob2: jnp.ndarray,
                 simi: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """AutoNovel's pairwise BCE (reference ``cluster_utils.py:142-151``):
    P = <p_i, p_j>; loss = -log(P) for similar, -log(1-P) for dissimilar.
    prob1/prob2 [N, C] enumerate pairs row-major; simi in {+1, -1, 0}."""
    p = jnp.sum(prob1 * prob2, axis=1)
    p = p * simi + (simi == -1).astype(p.dtype)
    valid = simi != 0
    neglog = -jnp.log(p + eps)
    return jnp.sum(jnp.where(valid, neglog, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1)


class TwoHeadClassifier(nn.Module):
    """Feature trunk with the reference's two output heads
    (``rerun_autonovel.py:339``: ``ResNet(..., nlc + nuc, nuc)``): head1
    spans ALL classes — it receives the labelled CE, the pairwise BCE,
    and is the eval head; head2 (novel classes only) exists for arch
    parity but the ranking-stats objective never touches it, exactly as
    the reference's train loop discards ``output2``."""

    num_labeled: int
    num_unlabeled: int
    hidden_dim: int = 512

    @nn.compact
    def __call__(self, feats):
        x = nn.Dense(self.hidden_dim, name="trunk")(feats)
        x = nn.relu(x)
        out1 = nn.Dense(self.num_labeled + self.num_unlabeled,
                        name="head1")(x)
        out2 = nn.Dense(self.num_unlabeled, name="head2")(x)
        return out1, out2, x


def autonovel_loss(output1: jnp.ndarray, output1_bar: jnp.ndarray,
                   feats: jnp.ndarray,
                   labels: jnp.ndarray, mask_lab: jnp.ndarray,
                   rampup_weight: float, topk: int = 5,
                   kl_weight: float = 0.0) -> Dict[str, jnp.ndarray]:
    """The AutoNovel objective (reference ``rerun_autonovel.py:55-84``)
    on the all-classes head: CE on labelled rows, pairwise ranking-stats
    BCE across two views over the full batch, MSE consistency, uniform-KL.

    ``feats`` must be the DETACHED trunk features (the ranking-statistics
    pseudo-labels come from ``rank_feat = feat.detach()``,
    rerun_autonovel.py:66).

    ``kl_weight`` note: the reference passes PROBABILITIES to
    ``F.kl_div`` (which expects log-probabilities,
    rerun_autonovel.py:83), making its KL term a CONSTANT with zero
    gradient — so the reference's kl_div_loss=0.5 has no training effect
    and our default 0.0 matches its effective objective.  Setting
    kl_weight > 0 here enables a real collapse regularizer (KL of the
    batch-mean prediction to uniform).
    """
    prob1 = jax.nn.softmax(output1, axis=1)
    prob1_bar = jax.nn.softmax(output1_bar, axis=1)

    simi = ranking_stats_similarity(jax.lax.stop_gradient(feats), topk)
    b = prob1.shape[0]
    p1 = jnp.repeat(prob1, b, axis=0)  # pair (i, j) row-major: i slow
    p2 = jnp.tile(prob1_bar, (b, 1))
    loss_bce = pairwise_bce(p1, p2, simi.reshape(-1))

    # CE on labelled rows of the all-classes head (masked mean; labelled
    # targets live in the first nlc columns)
    logp = jax.nn.log_softmax(output1, axis=-1)
    ce_rows = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    loss_ce = jnp.sum(jnp.where(mask_lab, ce_rows, 0.0)) / jnp.maximum(
        jnp.sum(mask_lab), 1)

    consistency = 2.0 * jnp.mean((prob1 - prob1_bar) ** 2)
    # collapse regularizer: KL of the BATCH-MEAN prediction to uniform
    # (per-sample KL would penalize confidence itself)
    mean_p = jnp.mean(prob1, axis=0)
    kl = jnp.sum(mean_p * (jnp.log(mean_p + 1e-12)
                           - jnp.log(1.0 / prob1.shape[1])))

    total = loss_ce + loss_bce + rampup_weight * consistency + kl_weight * kl
    return {"loss": total, "ce": loss_ce, "bce": loss_bce,
            "consistency": consistency, "kl": kl}


# ------------------------------------------- supervised + combine evaluator

def osr_threshold_preds(logits: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Open-set recognition: predict argmax where max softmax prob clears the
    threshold, else -1 (reference ``train_supervised.py:68-130``)."""
    prob = jax.nn.softmax(logits, axis=-1)
    conf = jnp.max(prob, axis=-1)
    preds = jnp.argmax(prob, axis=-1)
    return jnp.where(conf >= threshold, preds, -1)


def combine_classifier_and_cluster_preds(classifier_preds, cluster_preds,
                                         n_labeled_classes: int):
    """Classifier wins on confident Old-class predictions; cluster assignment
    covers the rest (reference ``combine_classifier_and_kmeans.py``)."""
    import numpy as np

    classifier_preds = np.asarray(classifier_preds)
    cluster_preds = np.asarray(cluster_preds)
    use_cls = (classifier_preds >= 0) & (classifier_preds < n_labeled_classes)
    return np.where(use_cls, classifier_preds, cluster_preds)


# ------------------------------------------------------- training drivers
#
# The reference trains these baselines end-to-end over a ResNet/ViT
# (``uno_v2.py``, ``rerun_autonovel.py``, ``train_supervised.py``).  In the
# GCD setting the backbone is frozen and only the heads learn, so the
# TPU-native drivers train over precomputed feature views: every step is a
# single jitted program and the whole epoch loop stays on device-sized
# batches with no image pipeline in the loop.

def _batched(rng, n: int, batch_size: int):
    order = rng.permutation(n)
    for s in range(0, n - batch_size + 1, batch_size):
        yield order[s:s + batch_size]


def _epoch_mean(device_losses) -> float:
    """Mean of per-step device scalars with ONE host fetch.  Fetching each
    loss inside the batch loop costs a ~33 ms tunnel round-trip per step on
    the remote TPU (see GCDTrainer.train_epoch)."""
    if not device_losses:
        return float("nan")
    return float(jnp.stack(device_losses).mean())


def train_uno(key: jax.Array, views: jnp.ndarray, labels: jnp.ndarray,
              mask_lab: jnp.ndarray, n_labeled: int, n_unlabeled: int,
              num_heads: int = 4, epochs: int = 10, batch_size: int = 256,
              lr: float = 0.1, sk_iters: int = 3, sk_epsilon: float = 0.05,
              temperature: float = 0.1, seed: int = 0):
    """UNO v2 over feature views (reference train loop ``uno_v2.py:96-160``):
    multi-head prototypes on nlc+P logits, Sinkhorn pseudo-labels on the
    prototype block, swapped-prediction CE across views.

    ``views``: [V, N, D] float — V augmented views of N features.
    Returns (params, predict_fn [N,D]->[N] ints, history).
    """
    import numpy as np
    import optax

    views = jnp.asarray(views, jnp.float32)  # device-resident: avoids a
    labels = jnp.asarray(labels)              # host->device ship per step
    mask_lab = jnp.asarray(mask_lab)
    v, n, d = views.shape
    batch_size = min(batch_size, n)  # n < batch would otherwise yield 0 steps
    model = MultiHeadPrototypes(num_heads=num_heads,
                                num_prototypes=n_labeled + n_unlabeled)
    params = jax.jit(model.init)(key, views[0, :1])
    tx = optax.sgd(lr, momentum=0.9)
    opt_state = tx.init(params)

    def loss_fn(p, batch_views, lab, m_lab):
        logits = jnp.stack([model.apply(p, batch_views[i])[0]
                            for i in range(v)])  # [V, H, B, nlc+P]
        targets = uno_targets(
            jax.lax.stop_gradient(logits[..., n_labeled:]), lab, m_lab,
            n_labeled, sk_iters, sk_epsilon)
        return swapped_prediction_loss(logits, targets, temperature)

    @jax.jit
    def step(p, o, batch_views, lab, m_lab):
        loss, grads = jax.value_and_grad(loss_fn)(p, batch_views, lab, m_lab)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    rng = np.random.default_rng(seed)
    history = []
    for _epoch in range(epochs):
        losses = []
        for idx in _batched(rng, n, batch_size):
            params, opt_state, loss = step(
                params, opt_state, views[:, idx], labels[idx], mask_lab[idx])
            losses.append(loss)  # device scalar — fetched once per epoch
        # float(loss) per step would block ~33 ms/step through the TPU
        # tunnel (the serialization GCDTrainer.train_epoch documents)
        history.append(_epoch_mean(losses))

    @jax.jit
    def _predict(p, feats):
        logits, _ = model.apply(p, feats)  # [H, B, C]
        return jnp.argmax(jnp.mean(jax.nn.softmax(logits, axis=-1), axis=0),
                          axis=-1)

    return params, (lambda feats: _predict(params, jnp.asarray(feats))), \
        history


def train_autonovel(key: jax.Array, feats: jnp.ndarray,
                    feats_bar: jnp.ndarray, labels: jnp.ndarray,
                    mask_lab: jnp.ndarray, n_labeled: int, n_unlabeled: int,
                    epochs: int = 10, batch_size: int = 256, lr: float = 0.1,
                    rampup_length: float = 150.0, rampup_coeff: float = 50.0,
                    topk: int = 5, seed: int = 0):
    """AutoNovel over two feature views (reference
    ``rerun_autonovel.py:44-110``): ranking-stats pairwise BCE + labelled
    CE on the all-classes head + MSE consistency with a sigmoid-ramped
    weight (rampup defaults = the reference's rampup_length=150 /
    rampup_coefficient=50, rerun_autonovel.py:192-193).  Returns
    (params, predict_fn, history); predictions are all-class ids."""
    import numpy as np
    import optax

    from scd_tpu.train.schedulers import sigmoid_rampup

    feats = jnp.asarray(feats, jnp.float32)
    feats_bar = jnp.asarray(feats_bar, jnp.float32)
    labels = jnp.asarray(labels)
    mask_lab = jnp.asarray(mask_lab)
    batch_size = min(batch_size, feats.shape[0])
    model = TwoHeadClassifier(num_labeled=n_labeled,
                              num_unlabeled=n_unlabeled)
    params = jax.jit(model.init)(key, feats[:1])
    tx = optax.sgd(lr, momentum=0.9)
    opt_state = tx.init(params)

    def loss_fn(p, x, x_bar, lab, m_lab, w):
        o1, _o2, _trunk = model.apply(p, x)
        o1b, _, _ = model.apply(p, x_bar)
        # ranking stats run on the FROZEN input features: the trainable
        # trunk is a random projection at init, which would label pairs at
        # random and drift as it trains
        return autonovel_loss(o1, o1b, x, lab, m_lab, w,
                              topk=topk)["loss"]

    @jax.jit
    def step(p, o, x, x_bar, lab, m_lab, w):
        loss, grads = jax.value_and_grad(loss_fn)(p, x, x_bar, lab, m_lab, w)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    rng = np.random.default_rng(seed)
    n = feats.shape[0]
    history = []
    for epoch in range(epochs):
        w = rampup_coeff * sigmoid_rampup(epoch, rampup_length)
        losses = []
        for idx in _batched(rng, n, batch_size):
            params, opt_state, loss = step(
                params, opt_state, feats[idx], feats_bar[idx], labels[idx],
                mask_lab[idx], w)
            losses.append(loss)  # device scalar — fetched once per epoch
        history.append(_epoch_mean(losses))

    @jax.jit
    def _predict(p, x):
        o1, _o2, _ = model.apply(p, x)
        return jnp.argmax(o1, axis=-1)

    return params, (lambda x: _predict(params, jnp.asarray(x))), history


def train_supervised(key: jax.Array, feats: jnp.ndarray, labels: jnp.ndarray,
                     n_classes: int, epochs: int = 20, batch_size: int = 256,
                     lr: float = 0.1, smoothing: float = 0.1,
                     hidden_dim: int = 0, seed: int = 0):
    """Label-smoothed supervised head on labelled features (reference
    ``train_supervised.py:38-66`` + training loop).  Returns
    (params, logits_fn, history); combine with
    ``osr_threshold_preds`` + ``combine_classifier_and_cluster_preds``."""
    import numpy as np
    import optax

    from scd_tpu.train.losses import label_smoothing_ce

    class _Head(nn.Module):
        @nn.compact
        def __call__(self, x):
            if hidden_dim:
                x = nn.relu(nn.Dense(hidden_dim, name="fc")(x))
            return nn.Dense(n_classes, name="out")(x)

    feats = jnp.asarray(feats, jnp.float32)
    labels = jnp.asarray(labels)
    batch_size = min(batch_size, feats.shape[0])
    model = _Head()
    params = jax.jit(model.init)(key, feats[:1])
    tx = optax.sgd(lr, momentum=0.9)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, o, x, y):
        def loss_fn(p):
            return label_smoothing_ce(model.apply(p, x), y, smoothing)
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    rng = np.random.default_rng(seed)
    n = feats.shape[0]
    history = []
    for _epoch in range(epochs):
        losses = []
        for idx in _batched(rng, n, batch_size):
            params, opt_state, loss = step(params, opt_state, feats[idx],
                                           labels[idx])
            losses.append(loss)  # device scalar — fetched once per epoch
        history.append(_epoch_mean(losses))

    @jax.jit
    def _logits(p, x):
        return model.apply(p, x)

    return params, (lambda x: _logits(params, jnp.asarray(x))), history
