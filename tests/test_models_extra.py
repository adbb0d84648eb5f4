"""ResNet two-head, ViT-with-linear, and top-k accuracy tests (reference
``gcd/models/resnet_twohead.py``, ``vision_transformer.py:301-322``,
``clip_lang_util.py:151-154``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scd_tpu.metrics import topk_accuracy
from scd_tpu.models import ResNetTwoHead, ViTConfig, \
    VisionTransformerWithLinear


def test_resnet_twohead_shapes():
    m = ResNetTwoHead(num_labeled_classes=4, num_unlabeled_classes=6,
                      num_blocks=(1, 1, 1, 1))
    x = jnp.zeros((2, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    o1, o2, feats = m.apply(params, x)
    assert o1.shape == (2, 4) and o2.shape == (2, 6)
    assert feats.shape == (2, 512)


def test_resnet_twohead_downsamples():
    m = ResNetTwoHead(num_labeled_classes=2, num_unlabeled_classes=2,
                      num_blocks=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    o1, _o2, _f = m.apply(params, x)
    assert np.isfinite(np.asarray(o1)).all()


def test_vit_with_linear():
    cfg = ViTConfig(image_size=32, patch_size=16, width=32, depth=1, heads=2)
    m = VisionTransformerWithLinear(cfg, num_classes=7)
    x = jnp.zeros((3, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    logits, feats = m.apply(params, x)
    assert logits.shape == (3, 7) and feats.shape == (3, 32)


def test_topk_accuracy():
    logits = np.array([[0.1, 0.9, 0.0],
                       [0.8, 0.1, 0.0],
                       [0.5, 0.2, 0.3]])
    targets = np.array([1, 1, 1])
    top1, top2 = topk_accuracy(logits, targets, ks=(1, 2))
    assert top1 == pytest.approx(100 / 3)
    assert top2 == pytest.approx(200 / 3)


def test_gelu_tanh_features_close_to_exact():
    """The tanh-gelu throughput option must stay within the bf16 compute
    dtype's own noise floor of the exact-erf features."""
    import jax
    import jax.numpy as jnp

    from scd_tpu.models.vit import ViTConfig, VisionTransformer

    kw = dict(image_size=32, patch_size=8, width=64, depth=3, heads=4)
    exact = VisionTransformer(ViTConfig(**kw))
    tanh = VisionTransformer(ViTConfig(gelu_tanh=True, **kw))
    v = jax.jit(exact.init)(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 3), jnp.float32))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    fe = np.asarray(exact.apply(v, x))
    ft = np.asarray(tanh.apply(v, x))
    # same params, near-identical activations: rel deviation ~bf16 eps
    denom = np.maximum(np.abs(fe), 1e-3)
    assert np.max(np.abs(fe - ft) / denom) < 0.02
