"""GCD contrastive finetuning — TPU-native training loop.

Reference ``gcd/methods/metric_learn/learn_metric.py:217-338``: finetune the
last ViT blocks with ``loss = (1-w)·InfoNCE + w·SupCon``, SGD + cosine LR,
two augmented views per image, a DINO projection head, balanced
labelled/unlabelled sampling.

TPU-first design:

- one jitted ``train_step`` containing forward, both losses, backward and
  the SGD update — the whole step is a single XLA program;
- partial freezing (blocks >= ``grad_from_block``, reference
  ``learn_metric.py:463-471``) via ``optax.multi_transform`` with a
  ``set_to_zero`` branch, so frozen parameters cost no optimizer state;
- multi-chip: parameters carry tensor-parallel PartitionSpecs (qkv/fc1
  sharded on the out axis, proj/fc2 on the in axis over the ``model`` mesh
  axis) and the batch shards over ``data``; XLA inserts the collectives.
  ``make_gcd_state(..., mesh=...)`` returns a step function jitted with
  those shardings — the same code runs single-chip when ``mesh=None``.
- SupCon's labelled-only subset is a mask (no dynamic shapes): unlabelled
  rows are excluded from anchors, positives, and denominators.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scd_tpu.core.config import TrainConfig
from scd_tpu.models.vit import ViTConfig, VisionTransformer
from scd_tpu.train.losses import cross_entropy, info_nce_loss
from scd_tpu.train.schedulers import cosine_warmup_schedule


class DINOHead(nn.Module):
    """3-layer MLP projection head with a unit-norm final layer
    (reference ``learn_metric.py:30-77``; the weight-normed last layer keeps
    g=1 as in DINO)."""

    out_dim: int = 65536
    hidden_dim: int = 2048
    bottleneck_dim: int = 256

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.hidden_dim, name="fc2")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.bottleneck_dim, name="fc3")(x)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        v = self.param("last_layer", nn.initializers.normal(0.02),
                       (self.bottleneck_dim, self.out_dim))
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=0, keepdims=True), 1e-12)
        return x @ v


def masked_supcon_loss(features: jnp.ndarray, labels: jnp.ndarray,
                       valid: jnp.ndarray, temperature: float = 0.07,
                       base_temperature: float = 0.07) -> jnp.ndarray:
    """SupCon over [B, V, D] restricted to rows where ``valid`` is True."""
    b, v, _ = features.shape
    flat = jnp.concatenate(jnp.split(features, v, axis=1), axis=0)[:, 0]
    lab = jnp.tile(labels, (v,))
    ok = jnp.tile(valid, (v,))

    sim = flat @ flat.T / temperature
    sim = sim - jax.lax.stop_gradient(jnp.max(sim, axis=1, keepdims=True))

    eye = jnp.eye(b * v, dtype=bool)
    both_ok = ok[:, None] & ok[None, :]
    pos_mask = (lab[:, None] == lab[None, :]) & ~eye & both_ok
    logits_mask = ~eye & both_ok

    exp_sim = jnp.exp(sim) * logits_mask
    log_prob = sim - jnp.log(jnp.sum(exp_sim, axis=1, keepdims=True) + 1e-12)

    pos_count = jnp.maximum(jnp.sum(pos_mask, axis=1), 1)
    mean_log_prob_pos = (jnp.sum(jnp.where(pos_mask, log_prob, 0.0), axis=1)
                         / pos_count)
    per_anchor = -(temperature / base_temperature) * mean_log_prob_pos
    denom = jnp.maximum(jnp.sum(ok), 1)
    return jnp.sum(jnp.where(ok, per_anchor, 0.0)) / denom


@dataclasses.dataclass
class GCDModels:
    backbone: VisionTransformer
    head: DINOHead


def _param_label(path: Tuple[str, ...], grad_from_block: int) -> str:
    """'train' for head params, final norm, and blocks >= grad_from_block."""
    parts = [str(p) for p in path]
    joined = "/".join(parts)
    if joined.startswith("head"):
        return "train"
    for p in parts:
        if p.startswith("block_"):
            return "train" if int(p.split("_")[1]) >= grad_from_block else "frozen"
    if "norm" in joined or "ln_post" in joined:
        return "train"
    return "frozen"


def _tp_spec(path: Tuple[str, ...], value) -> P:
    """Tensor-parallel PartitionSpec for a ViT/head parameter."""
    parts = [str(p) for p in path]
    name = parts[-2] if len(parts) >= 2 else ""
    leaf = parts[-1]
    if leaf == "kernel" and value.ndim == 2:
        if name in ("qkv", "fc1"):
            return P(None, "model")
        if name in ("proj", "fc2"):
            return P("model", None)
    if leaf == "bias" and name in ("qkv", "fc1"):
        return P("model")
    return P()


def make_gcd_state(vit_cfg: ViTConfig, cfg: TrainConfig, rng: jax.Array,
                   total_steps: int = 10_000,
                   mesh: Optional[Mesh] = None):
    """Build (params, opt_state, step_fn).  ``step_fn(params, opt_state,
    batch, rng) -> (params, opt_state, metrics)`` is jitted; with a mesh it
    carries dp+tp shardings."""
    if cfg.int8_frozen and cfg.grad_from_block > 0:
        import dataclasses as _dc

        # frozen blocks (< grad_from_block) never receive gradients: their
        # forward runs the W8A8 int8 dense path (models/vit.py Int8Dense)
        vit_cfg = _dc.replace(vit_cfg, dense_int8_until=cfg.grad_from_block)
    backbone = VisionTransformer(vit_cfg)
    head = DINOHead(out_dim=cfg.proj_dim)

    img_rng, head_rng = jax.random.split(rng)
    dummy = jnp.zeros((1, vit_cfg.image_size, vit_cfg.image_size, 3),
                      jnp.float32)
    # jitted init: one compiled program instead of hundreds of eager ops
    # through the TPU tunnel (minutes for ViT-B)
    bb_vars = jax.jit(backbone.init)(img_rng, dummy)
    feat_dim = vit_cfg.output_proj or vit_cfg.width
    hd_vars = jax.jit(head.init)(head_rng,
                                 jnp.zeros((1, feat_dim), jnp.float32))
    params = {"backbone": bb_vars["params"], "head": hd_vars["params"]}

    # eta_min = lr * 1e-3, the reference's CosineAnnealingLR floor
    # (learn_metric.py:222-226) — decaying to 0 stalls the last epochs
    schedule = cosine_warmup_schedule(cfg.lr, warmup_steps=0,
                                      total_steps=total_steps,
                                      final_lr=cfg.lr * 1e-3)
    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: _param_label(
            tuple(getattr(k, "key", k) for k in path), cfg.grad_from_block),
        params)
    tx = optax.multi_transform(
        {"train": optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(schedule, momentum=cfg.momentum)),
         "frozen": optax.set_to_zero()},
        labels)
    opt_state = tx.init(params)

    def loss_fn(p, batch):
        images = batch["images"]  # [n_views*B, H, W, C], view-major
        if images.ndim == 5:
            # multi-controller layout [n_views, B, H, W, C] (stage_pod_batch
            # shards the batch axis); flatten back to view-major
            images = images.reshape((-1,) + images.shape[2:])
        lab = batch["labels"]  # [B]
        mask_lab = batch["mask_lab"]  # [B] bool
        feats = backbone.apply({"params": p["backbone"]}, images)
        proj = head.apply({"params": p["head"]}, feats)
        proj = proj / jnp.maximum(
            jnp.linalg.norm(proj, axis=-1, keepdims=True), 1e-12)

        logits, targets = info_nce_loss(proj, n_views=cfg.n_views,
                                        temperature=cfg.temperature)
        contrastive = cross_entropy(logits, targets)

        b = lab.shape[0]
        per_view = jnp.stack(jnp.split(proj, cfg.n_views, axis=0), axis=1)
        sup_con = masked_supcon_loss(per_view[:b], lab, mask_lab,
                                     temperature=cfg.sup_temperature)
        loss = ((1 - cfg.sup_con_weight) * contrastive
                + cfg.sup_con_weight * sup_con)
        return loss, {"loss": loss, "contrastive": contrastive,
                      "sup_con": sup_con}

    def step(params, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    if mesh is None:
        return params, opt_state, jax.jit(step)

    # ---- sharded: params tp over 'model', batch dp over 'data'
    from scd_tpu.core.multihost import is_multiprocess, put_global

    param_specs = jax.tree_util.tree_map_with_path(
        lambda path, v: NamedSharding(mesh, _tp_spec(
            tuple(getattr(k, "key", k) for k in path), v)),
        params)
    if is_multiprocess():
        # every host built identical params from the same rng; each
        # materializes its own devices' shards (device_put can't target
        # non-addressable devices)
        params = jax.tree_util.tree_map(
            lambda v, s: put_global(np.asarray(v), s), params, param_specs)
    else:
        params = jax.device_put(params, param_specs)
    # opt-state shardings are inferred by jit from the param shardings.
    # Multi-controller batches arrive as [n_views, B, ...] globals from
    # stage_pod_batch (batch axis = dim 1); single-controller keeps the
    # flat view-major layout
    imgspec = P(None, "data") if is_multiprocess() else P("data")
    batch_sharding = {"images": NamedSharding(mesh, imgspec),
                      "labels": NamedSharding(mesh, P("data")),
                      "mask_lab": NamedSharding(mesh, P("data"))}
    step_sharded = jax.jit(step,
                           in_shardings=(param_specs, None, batch_sharding),
                           out_shardings=None)
    return params, opt_state, step_sharded


def stage_pod_batch(mesh: Mesh, batch: Dict[str, np.ndarray],
                    n_views: int) -> Dict[str, Any]:
    """Assemble a GLOBAL train batch from THIS PROCESS's local batch shard
    (multi-controller training): local view-major images
    [n_views*B_local, H, W, C] become one global [n_views, B_global, ...]
    array sharded over ``data`` on the batch axis (the step flattens back
    to view-major); labels/mask_lab row-shard.  Every process must
    contribute the same B_local, divisible by its device count."""
    from scd_tpu.core.multihost import rows_from_process_local

    imgs = np.asarray(batch["images"])
    bl = imgs.shape[0] // n_views
    local5 = imgs.reshape((n_views, bl) + imgs.shape[1:])
    sh = NamedSharding(mesh, P(None, "data"))
    images = jax.make_array_from_process_local_data(
        sh, local5,
        (n_views, bl * jax.process_count()) + imgs.shape[1:])
    labels, _ = rows_from_process_local(
        mesh, np.asarray(batch["labels"]))
    mask, _ = rows_from_process_local(
        mesh, np.asarray(batch["mask_lab"]))
    return {"images": images, "labels": labels, "mask_lab": mask}


class GCDTrainer:
    """Epoch driver (host loop) over a MergedDataset with two augmented
    views per image (reference ``ContrastiveLearningViewGenerator``,
    ``learn_metric.py:172-181``)."""

    def __init__(self, vit_cfg: ViTConfig, cfg: TrainConfig,
                 seed: int = 0, total_steps: int = 10_000,
                 mesh: Optional[Mesh] = None):
        self.cfg = cfg
        self._vit_cfg = vit_cfg
        self.params, self.opt_state, self.step_fn = make_gcd_state(
            vit_cfg, cfg, jax.random.PRNGKey(seed), total_steps, mesh=mesh)
        self.metrics_log = []
        self._feat_fn = None

    def train_epoch(self, batches) -> Dict[str, float]:
        """``batches``: iterable of dicts with images (view-major
        [n_views*B, H, W, C]), labels [B], mask_lab [B].

        Per-step metrics stay ON DEVICE until the epoch ends: ``float(v)``
        inside the loop would block on a device fetch every step (~33 ms
        fixed round-trip each through the TPU tunnel), serializing the
        pipeline; at epoch end each metric's buffers are stacked in ONE
        device program and fetched as ONE transfer."""
        device_metrics: Dict[str, list] = {}
        n = 0
        for batch in batches:
            self.params, self.opt_state, metrics = self.step_fn(
                self.params, self.opt_state,
                {k: jnp.asarray(v) for k, v in batch.items()})
            n += 1
            if device_metrics and set(metrics) != set(device_metrics):
                # each metric is averaged over its own buffer length, which
                # silently changes semantics if a key appears intermittently
                raise ValueError(
                    f"step metrics changed keys mid-epoch: "
                    f"{sorted(device_metrics)} -> {sorted(metrics)}")
            for k, v in metrics.items():
                device_metrics.setdefault(k, []).append(v)
        out = {k: float(np.asarray(jnp.stack(vs).mean()))
               for k, vs in device_metrics.items()}
        self.metrics_log.append(out)
        return out

    @property
    def state(self):
        return {"params": self.params, "opt_state": self.opt_state}

    def load_state(self, state):
        self.params = state["params"]
        self.opt_state = state["opt_state"]

    def extract_features(self, batches) -> np.ndarray:
        """L2-normalized backbone features over an iterable of image
        batches (the per-epoch k-means eval path, reference
        ``learn_metric.py:341-383``)."""
        if self._feat_fn is None:
            backbone = VisionTransformer(self._vit_cfg)

            @jax.jit
            def feat(p, x):
                f = backbone.apply({"params": p}, x)
                return f / jnp.maximum(
                    jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12)

            self._feat_fn = feat
        out = [np.asarray(self._feat_fn(self.params["backbone"],
                                        jnp.asarray(x, jnp.float32)))
               for x in batches]
        return np.concatenate(out)

    def fit(self, epochs: int, make_train_batches, eval_fn=None,
            ckpt=None, log_fn=print) -> Dict[str, float]:
        """Full training driver (reference ``train()``,
        ``learn_metric.py:217-338``): per epoch run ``train_epoch`` over
        ``make_train_batches(epoch)``, call ``eval_fn(trainer, epoch) ->
        metrics dict``, checkpoint every epoch.  Best-checkpoint selection
        lives in the ``ckpt`` CheckpointManager's own ``best_metric``
        (the reference keeps ``model.pt`` + ``model_best.pt`` chosen by
        old-class TEST ACC, learn_metric.py:328-338 — pass an eval_fn
        that evaluates the test split and a manager keyed on it)."""
        last: Dict[str, float] = {}
        for epoch in range(epochs):
            train_metrics = self.train_epoch(make_train_batches(epoch))
            metrics = dict(train_metrics)
            if eval_fn is not None:
                metrics.update(eval_fn(self, epoch))
            if log_fn is not None:
                msg = " | ".join(f"{k} {v:.4f}" for k, v in metrics.items())
                log_fn(f"Epoch {epoch}: {msg}")
            if ckpt is not None:
                ckpt.save(epoch, self.state, metrics=metrics)
            last = metrics
        return last
