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


def test_int8_dense_matches_f32_within_quant_error():
    """Int8Dense == exact f32 matmul within the W8A8 quantization bound:
    per-token/per-channel symmetric scales give elementwise error
    ~|x|_max*|w|_max*D/127^2-class; assert a practical relative bound."""
    import jax
    import jax.numpy as jnp

    from scd_tpu.models.vit import Int8Dense

    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, 96)).astype(np.float32)
    m = Int8Dense(48)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(m.apply(v, jnp.asarray(x)))
    k = np.asarray(v["params"]["kernel"])
    b = np.asarray(v["params"]["bias"])
    want = x @ k + b
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 0.02
    # param tree matches nn.Dense's (checkpoint-loader compatibility)
    assert set(v["params"].keys()) == {"kernel", "bias"}


def test_vit_int8_features_close_to_f32():
    """dense_int8=True on the SAME params must produce near-identical
    CLS features: the gate for flipping the extraction towers to the
    int8 MXU path (cosine similarity, not bitwise — 12 quantized layers
    compound ~0.5%/layer worst-case)."""
    import jax
    import jax.numpy as jnp

    from scd_tpu.models.vit import ViTConfig, VisionTransformer

    kw = dict(image_size=32, patch_size=8, width=64, depth=4, heads=4,
              pre_post_norm=True, output_proj=32, quick_gelu=True,
              patch_bias=False)
    f32 = VisionTransformer(ViTConfig(**kw))
    q = VisionTransformer(ViTConfig(dense_int8=True, **kw))
    v = jax.jit(f32.init)(jax.random.PRNGKey(0),
                          jnp.zeros((1, 32, 32, 3), jnp.float32))
    # int8 variant must accept the identical param tree
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    a = np.asarray(f32.apply(v, x))
    b = np.asarray(q.apply(v, x))
    cos = np.sum(a * b, axis=1) / (
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1))
    assert cos.min() > 0.995, cos.min()


def test_clip_text_tower_int8_close_to_f32():
    """dense_int8 quantizes BOTH towers (the vocabulary build is as
    dense-bound as extraction): same params, near-identical text
    embeddings."""
    import jax
    import jax.numpy as jnp

    from scd_tpu.models.clip import CLIPConfig, CLIPModel
    from scd_tpu.models.vit import ViTConfig

    def cfg(q):
        return CLIPConfig(
            vision=ViTConfig(image_size=32, patch_size=8, width=32, depth=1,
                             heads=2, output_proj=16, pre_post_norm=True,
                             quick_gelu=True, patch_bias=False,
                             dense_int8=q),
            vocab_size=128, context_length=16, text_width=32, text_depth=2,
            text_heads=2, embed_dim=16)

    f32, q8 = CLIPModel(cfg(False)), CLIPModel(cfg(True))
    v = jax.jit(f32.init)(jax.random.PRNGKey(0),
                          jnp.zeros((1, 32, 32, 3), jnp.float32),
                          jnp.zeros((1, 16), jnp.int32))
    toks = jax.random.randint(jax.random.PRNGKey(1), (6, 16), 1, 127,
                              jnp.int32)
    a = np.asarray(f32.apply(v, toks, method=CLIPModel.encode_text))
    b = np.asarray(q8.apply(v, toks, method=CLIPModel.encode_text))
    cos = np.sum(a * b, 1) / (np.linalg.norm(a, axis=1)
                              * np.linalg.norm(b, axis=1))
    assert cos.min() > 0.995, cos.min()


def test_vit_remat_matches_exact_values_and_grads():
    """remat=True (per-block jax.checkpoint) must be a pure memory/FLOPs
    trade: identical parameter tree, identical forward values, identical
    gradients — XLA recomputes the block activations in the backward pass
    instead of storing them."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from scd_tpu.models.vit import ViTConfig, VisionTransformer

    cfg = ViTConfig(image_size=16, patch_size=8, width=32, depth=2, heads=4)
    model = VisionTransformer(cfg)
    model_r = VisionTransformer(dataclasses.replace(cfg, remat=True))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (3, 16, 16, 3)), jnp.float32)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    v_r = jax.jit(model_r.init)(jax.random.PRNGKey(0), x)
    # identical parameter tree (lifted remat preserves module paths)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v_r))

    def loss(variables, m):
        return jnp.sum(m.apply(variables, x) ** 2)

    l0, g0 = jax.value_and_grad(loss)(v, model)
    l1, g1 = jax.value_and_grad(loss)(v, model_r)  # same params, remat fwd
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_vit_seq_padding_preserves_features():
    """pad_seq_to padding (the int8 tile-alignment trick, see
    ViTConfig.pad_seq_to) must not change real-token outputs: pad keys
    are masked to -inf (exp(-inf)=0 exactly), pad rows never feed back,
    and the CLS readout is row 0.  Only the attention contraction length
    changes, so parity is float-reassociation-tight, not bitwise."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from scd_tpu.models.vit import ViTConfig, VisionTransformer, \
        seq_pad_target

    kw = dict(image_size=32, patch_size=8, width=64, depth=3, heads=4,
              pre_post_norm=True, output_proj=32, quick_gelu=True,
              patch_bias=False)
    base = ViTConfig(pad_seq_to=0, **kw)          # L=17, never padded
    padded = ViTConfig(pad_seq_to=32, **kw)       # forced pad 17 -> 32
    m0, m1 = VisionTransformer(base), VisionTransformer(padded)
    v = jax.jit(m0.init)(jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 32, 3), jnp.float32))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    a = np.asarray(m0.apply(v, x))
    b = np.asarray(m1.apply(v, x))  # identical param tree
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)

    # "auto" resolves to mult-of-16 iff the int8 path is active
    assert seq_pad_target(ViTConfig(**kw), 197) == 197
    assert seq_pad_target(ViTConfig(dense_int8=True, **kw), 197) == 208
    assert seq_pad_target(
        ViTConfig(dense_int8_until=2, **kw), 197) == 208
    assert seq_pad_target(
        dataclasses.replace(ViTConfig(dense_int8=True, **kw),
                            pad_seq_to=0), 197) == 197


def test_clip_text_padding_preserves_embeddings():
    """Text-tower sequence padding (77 -> 80 under int8) rides the causal
    mask alone: pad rows sit at the end, so no real query ever attends
    to them.  Forced padding on the f32 tower must be output-identical."""
    import jax
    import jax.numpy as jnp

    from scd_tpu.models.clip import CLIPConfig, CLIPModel
    from scd_tpu.models.vit import ViTConfig

    def cfg(pad):
        return CLIPConfig(
            vision=ViTConfig(image_size=32, patch_size=8, width=32, depth=1,
                             heads=2, output_proj=16, pre_post_norm=True,
                             quick_gelu=True, patch_bias=False,
                             pad_seq_to=pad),
            vocab_size=128, context_length=13, text_width=32, text_depth=2,
            text_heads=2, embed_dim=16)

    # The text tower builds its own block ViTConfig (pad_seq_to="auto"
    # never pads with int8 off), so the no-pad-leak property is asserted
    # structurally on Block: padded input, causal=True, real rows must
    # be identical — the causal mask alone hides end-of-sequence pad
    # keys from every real query.
    from scd_tpu.models.vit import Block

    c = ViTConfig(width=32, depth=1, heads=2, quick_gelu=True)
    blk = Block(c)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 13, 32), jnp.float32)
    v = jax.jit(blk.init)(jax.random.PRNGKey(1), x)
    y0 = np.asarray(blk.apply(v, x, causal=True))
    xp = jnp.pad(x, ((0, 0), (0, 3), (0, 0)))
    y1 = np.asarray(blk.apply(v, xp, causal=True))[:, :13]
    np.testing.assert_allclose(y0, y1, rtol=2e-6, atol=2e-6)

    # and the full text tower end-to-end under forced vision padding
    # still produces sane embeddings (smoke for the padded init path)
    model = CLIPModel(cfg(32))
    toks = jnp.asarray(np.random.default_rng(0).integers(
        1, 128, (2, 13)), jnp.int32)
    imgs = jnp.zeros((2, 32, 32, 3), jnp.float32)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), imgs, toks)
    logits = np.asarray(model.apply(v, imgs, toks))
    assert np.isfinite(logits).all()
