"""Training subsystem tests: losses, schedules, and the GCD step — incl. the
dp+tp sharded variant on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scd_tpu.core.config import TrainConfig
from scd_tpu.models.vit import ViTConfig
from scd_tpu.train import (
    cosine_warmup_schedule,
    info_nce_loss,
    label_smoothing_ce,
    nt_xent_loss,
    sigmoid_rampup,
    supcon_loss,
)
from scd_tpu.train.gcd import GCDTrainer, make_gcd_state, masked_supcon_loss
from scd_tpu.train.losses import cross_entropy


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_info_nce_perfect_alignment(rng):
    # identical views -> positives at similarity 1, loss near minimum
    b, d = 8, 16
    f = _norm(rng.standard_normal((b, d))).astype(np.float32)
    feats = jnp.asarray(np.concatenate([f, f]))
    logits, labels = info_nce_loss(feats, n_views=2, temperature=0.1)
    assert logits.shape == (2 * b, 2 * b + 1)  # pos col + full -inf-masked negs
    loss = cross_entropy(logits, labels)
    # shuffled second view should be much worse
    f2 = _norm(rng.standard_normal((b, d))).astype(np.float32)
    logits2, labels2 = info_nce_loss(jnp.asarray(np.concatenate([f, f2])),
                                     n_views=2, temperature=0.1)
    assert float(loss) < float(cross_entropy(logits2, labels2))


def test_supcon_same_class_lower_loss(rng):
    b, d = 8, 16
    f = _norm(rng.standard_normal((b, 2, d))).astype(np.float32)
    same = supcon_loss(jnp.asarray(f), jnp.zeros(b, jnp.int32))
    # tight same-class cluster scores better than spread
    tight = _norm(np.ones((b, 2, d)) + 0.01 * rng.standard_normal((b, 2, d)))
    tight_loss = supcon_loss(jnp.asarray(tight.astype(np.float32)),
                             jnp.zeros(b, jnp.int32))
    assert float(tight_loss) < float(same)


def test_masked_supcon_matches_subset(rng):
    b, d = 10, 8
    f = _norm(rng.standard_normal((b, 2, d))).astype(np.float32)
    labels = rng.integers(0, 3, b).astype(np.int32)
    valid = np.zeros(b, bool)
    valid[:6] = True
    masked = masked_supcon_loss(jnp.asarray(f), jnp.asarray(labels),
                                jnp.asarray(valid))
    subset = supcon_loss(jnp.asarray(f[:6]), jnp.asarray(labels[:6]))
    np.testing.assert_allclose(float(masked), float(subset), rtol=1e-5)


def test_nt_xent_and_label_smoothing(rng):
    a = jnp.asarray(rng.standard_normal((6, 8)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((6, 8)), jnp.float32)
    assert np.isfinite(float(nt_xent_loss(a, b)))
    logits = jnp.asarray(rng.standard_normal((5, 4)), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3, 0])
    assert float(label_smoothing_ce(logits, labels, 0.0)) == pytest.approx(
        float(cross_entropy(logits, labels)), rel=1e-5)


def test_schedules():
    sched = cosine_warmup_schedule(0.1, warmup_steps=10, total_steps=100)
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(10)) == pytest.approx(0.1, rel=1e-3)
    assert float(sched(100)) < 0.01
    assert sigmoid_rampup(0, 10) == pytest.approx(np.exp(-5))
    assert sigmoid_rampup(10, 10) == 1.0


def _tiny_vit():
    return ViTConfig(image_size=16, patch_size=8, width=32, depth=4, heads=4)


def _tiny_train_cfg():
    return TrainConfig(grad_from_block=2, proj_dim=64, batch_size=4, lr=0.1)


def _batch(rng, b=4, size=16):
    imgs = rng.standard_normal((2 * b, size, size, 3)).astype(np.float32)
    return {"images": imgs,
            "labels": rng.integers(0, 3, b).astype(np.int32),
            "mask_lab": (rng.random(b) < 0.5)}


def test_gcd_step_updates_only_unfrozen(rng):
    params, opt_state, step = make_gcd_state(
        _tiny_vit(), _tiny_train_cfg(), jax.random.PRNGKey(0), total_steps=10)
    batch = {k: jnp.asarray(v) for k, v in _batch(rng).items()}
    new_params, _, metrics = step(params, opt_state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # frozen early block unchanged, late block and head updated
    before = params["backbone"]["block_0"]["attn"]["qkv"]["kernel"]
    after = new_params["backbone"]["block_0"]["attn"]["qkv"]["kernel"]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
    b3_before = params["backbone"]["block_3"]["attn"]["qkv"]["kernel"]
    b3_after = new_params["backbone"]["block_3"]["attn"]["qkv"]["kernel"]
    assert not np.allclose(np.asarray(b3_before), np.asarray(b3_after))
    h_before = params["head"]["fc1"]["kernel"]
    h_after = new_params["head"]["fc1"]["kernel"]
    assert not np.allclose(np.asarray(h_before), np.asarray(h_after))


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the 8-device mesh (virtual CPU or multi-chip)")
def test_gcd_step_sharded_multichip(rng):
    from scd_tpu.core.config import MeshConfig
    from scd_tpu.core.mesh import make_mesh

    mesh = make_mesh(MeshConfig(data=4, model=2))
    params, opt_state, step = make_gcd_state(
        _tiny_vit(), _tiny_train_cfg(), jax.random.PRNGKey(0),
        total_steps=10, mesh=mesh)
    batch = {k: jnp.asarray(v) for k, v in _batch(rng, b=8).items()}
    new_params, opt_state, metrics = step(params, opt_state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # a tp-sharded kernel really is distributed over the model axis
    qkv = new_params["backbone"]["block_3"]["attn"]["qkv"]["kernel"]
    assert len(qkv.sharding.device_set) >= 2


def test_gcd_trainer_epoch(rng):
    trainer = GCDTrainer(_tiny_vit(), _tiny_train_cfg(), total_steps=10)
    out = trainer.train_epoch([_batch(rng) for _ in range(3)])
    assert set(out) == {"loss", "contrastive", "sup_con"}
    assert np.isfinite(out["loss"])


def test_gcd_step_int8_frozen_trunk(rng):
    """int8_frozen=True quantizes only the frozen blocks' dense layers
    (< grad_from_block): the step must behave like the f32 recipe — same
    freeze boundary, finite loss in the same regime — since trainable
    blocks keep exact bf16/f32 math and frozen cotangents are dead code."""
    import dataclasses

    cfg32 = _tiny_train_cfg()
    cfg8 = dataclasses.replace(cfg32, int8_frozen=True)
    p32, o32, step32 = make_gcd_state(
        _tiny_vit(), cfg32, jax.random.PRNGKey(0), total_steps=10)
    p8, o8, step8 = make_gcd_state(
        _tiny_vit(), cfg8, jax.random.PRNGKey(0), total_steps=10)
    # identical param trees (Int8Dense keeps nn.Dense's kernel/bias)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        p32, p8)
    batch = {k: jnp.asarray(v) for k, v in _batch(rng).items()}
    n32, _, m32 = step32(p32, o32, batch)
    n8, _, m8 = step8(p8, o8, batch)
    assert np.isfinite(float(m8["loss"]))
    # quantized frozen forward perturbs activations slightly, not regimes
    assert float(m8["loss"]) == pytest.approx(float(m32["loss"]), rel=0.05)
    # freeze boundary unchanged: block_0 frozen, block_3 + head train
    np.testing.assert_array_equal(
        np.asarray(p8["backbone"]["block_0"]["attn"]["qkv"]["kernel"]),
        np.asarray(n8["backbone"]["block_0"]["attn"]["qkv"]["kernel"]))
    assert not np.allclose(
        np.asarray(p8["backbone"]["block_3"]["attn"]["qkv"]["kernel"]),
        np.asarray(n8["backbone"]["block_3"]["attn"]["qkv"]["kernel"]))


def test_gcd_step_remat_matches_exact(rng):
    """remat composes with the GCD recipe (incl. int8 frozen trunk): the
    rematerialized step reproduces the exact step's loss and updated
    params — jax.checkpoint only changes WHEN activations are computed."""
    import dataclasses

    cfg = dataclasses.replace(_tiny_train_cfg(), int8_frozen=True)
    vit = _tiny_vit()
    vit_r = dataclasses.replace(vit, remat=True)
    p0, o0, step0 = make_gcd_state(vit, cfg, jax.random.PRNGKey(0),
                                   total_steps=10)
    p1, o1, step1 = make_gcd_state(vit_r, cfg, jax.random.PRNGKey(0),
                                   total_steps=10)
    batch = {k: jnp.asarray(v) for k, v in _batch(rng).items()}
    n0, _, m0 = step0(p0, o0, batch)
    n1, _, m1 = step1(p1, o1, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(n0),
                    jax.tree_util.tree_leaves(n1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
