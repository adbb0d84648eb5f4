"""Contrastive and classification losses.

References: ``info_nce_logits`` (``learn_metric.py:183-214``), ``SupConLoss``
(``learn_metric.py:80-170``, duplicate at ``local_utils/supcon_loss.py``),
NT-Xent (``local_utils/nt_xent.py``), ``LabelSmoothingLoss``
(``train_supervised.py:38-66``).  All are pure jnp functions of already
L2-normalized features — no module state, no masks materialized on host.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def info_nce_loss(features: jnp.ndarray, n_views: int = 2,
                  temperature: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SimCLR InfoNCE over ``n_views`` stacked views.

    ``features``: [n_views*B, D] L2-normalized, view-major (view0 batch then
    view1 batch — the reference's ``torch.cat(views)`` layout).  Returns
    (logits [N, N-1], labels [N]) whose cross-entropy is the loss, matching
    the reference's contract of returning logits/labels for an external CE.
    """
    n = features.shape[0]
    b = n // n_views
    sim = features @ features.T  # [N, N]

    ids = jnp.arange(n) % b  # same-instance ids across views
    pos_mask = (ids[:, None] == ids[None, :]) & ~jnp.eye(n, dtype=bool)
    self_mask = jnp.eye(n, dtype=bool)

    # positives: mean similarity to the other views of the same instance
    # (for n_views=2 there is exactly one positive per anchor)
    pos = jnp.sum(jnp.where(pos_mask, sim, 0.0), axis=1, keepdims=True) / (
        n_views - 1)
    # negatives: everything that is neither self nor a positive
    neg_mask = ~(pos_mask | self_mask)
    neg = jnp.where(neg_mask, sim, -jnp.inf)

    logits = jnp.concatenate([pos, neg], axis=1) / temperature
    labels = jnp.zeros((n,), jnp.int32)  # positive is column 0
    return logits, labels


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                                         axis=1))


def supcon_loss(features: jnp.ndarray, labels: jnp.ndarray,
                temperature: float = 0.07,
                base_temperature: float = 0.07) -> jnp.ndarray:
    """Supervised contrastive loss (Khosla et al.), 'all' contrast mode.

    ``features``: [B, n_views, D] L2-normalized; ``labels``: [B].
    Matches the reference ``SupConLoss.forward`` (``learn_metric.py:93-170``).
    """
    b, v, _ = features.shape
    # view-major stacking, the torch.cat(torch.unbind(f, dim=1)) layout
    flat = jnp.concatenate(jnp.split(features, v, axis=1), axis=0)[:, 0]
    lab = jnp.tile(labels, (v,))

    sim = flat @ flat.T / temperature
    # numerical stability
    sim = sim - jax.lax.stop_gradient(jnp.max(sim, axis=1, keepdims=True))

    pos_mask = (lab[:, None] == lab[None, :]) & ~jnp.eye(b * v, dtype=bool)
    logits_mask = ~jnp.eye(b * v, dtype=bool)

    exp_sim = jnp.exp(sim) * logits_mask
    log_prob = sim - jnp.log(jnp.sum(exp_sim, axis=1, keepdims=True) + 1e-12)

    pos_count = jnp.maximum(jnp.sum(pos_mask, axis=1), 1)
    mean_log_prob_pos = jnp.sum(jnp.where(pos_mask, log_prob, 0.0), axis=1) / pos_count

    loss = -(temperature / base_temperature) * mean_log_prob_pos
    return jnp.mean(loss)


def nt_xent_loss(z_i: jnp.ndarray, z_j: jnp.ndarray,
                 temperature: float = 0.5) -> jnp.ndarray:
    """NT-Xent (SimCLR) between two view batches (``local_utils/nt_xent.py``)."""
    z = jnp.concatenate([z_i, z_j], axis=0)
    z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
    logits, labels = info_nce_loss(z, n_views=2, temperature=temperature)
    return cross_entropy(logits, labels)


def label_smoothing_ce(logits: jnp.ndarray, labels: jnp.ndarray,
                       smoothing: float = 0.1) -> jnp.ndarray:
    """Label-smoothed cross-entropy (``train_supervised.py:38-66``)."""
    n_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    one_hot = jax.nn.one_hot(labels, n_classes)
    smooth = one_hot * (1 - smoothing) + smoothing / n_classes
    return -jnp.mean(jnp.sum(smooth * logp, axis=-1))
