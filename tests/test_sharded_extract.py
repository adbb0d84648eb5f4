"""Mesh-sharded feature extraction (reference hot loop #1,
``main_unsup.py:114-147``): the data-parallel encoder must reproduce the
single-device features — sharding the batch axis changes layout, not
per-image math (up to last-ulp f32 reassociation from the per-shard batch
shape changing XLA's vectorization choices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scd_tpu.core.config import MeshConfig
from scd_tpu.core.mesh import make_mesh
from scd_tpu.pipelines.common import extract_features, make_sharded_image_encoder


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device mesh (virtual CPU or multi-chip)")
    return make_mesh(MeshConfig(data=8, model=1))


def _tiny_vit():
    from scd_tpu.models.vit import ViTConfig, VisionTransformer

    cfg = ViTConfig(image_size=16, patch_size=8, width=32, depth=2, heads=4)
    model = VisionTransformer(cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3), jnp.float32))

    def forward(v, x):
        return model.apply(v, x)

    return forward, variables


def test_sharded_encoder_matches_single_device(mesh):
    forward, variables = _tiny_vit()
    rng = np.random.default_rng(0)
    images = rng.standard_normal((32, 16, 16, 3)).astype(np.float32)

    single = np.asarray(jax.jit(forward)(variables, jnp.asarray(images)))
    encode = make_sharded_image_encoder(forward, variables, mesh)
    sharded = encode(images)
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-5)


def test_sharded_encoder_ragged_tail(mesh):
    """A batch not divisible by the shard count pads to a multiple and
    slices the pad rows off — output rows must match the input count and
    the unpadded forward."""
    forward, variables = _tiny_vit()
    rng = np.random.default_rng(1)
    images = rng.standard_normal((13, 16, 16, 3)).astype(np.float32)

    encode = make_sharded_image_encoder(forward, variables, mesh)
    out = encode(images)
    assert out.shape[0] == 13
    single = np.asarray(jax.jit(forward)(variables, jnp.asarray(images)))
    np.testing.assert_allclose(out, single, rtol=1e-5, atol=1e-5)

    # the staged (pre-padded, row-sharded) form used by _prefetched
    out2 = encode(encode.stage(images))
    np.testing.assert_allclose(out2, out, rtol=0, atol=0)


def test_extract_features_sharded_matches_single(mesh):
    """Full extraction stage: sharded-vs-single parity on the synthetic
    dataset, including L2 normalization and the mask contracts."""
    from scd_tpu.core.config import DataConfig
    from scd_tpu.data import get_class_splits, get_datasets
    from scd_tpu.models.synthetic import SyntheticCLIP

    dcfg = DataConfig(dataset_name="synthetic", prop_train_labels=0.5)
    train_classes, _ = get_class_splits(dcfg)
    train_merged, _test, _unlab, extras = get_datasets(dcfg)
    clip = SyntheticCLIP(extras["class_colors"])

    single = extract_features(clip.encode_image, train_merged, train_classes,
                              batch_size=64, num_workers=1)
    encode = make_sharded_image_encoder(
        lambda vv, x: clip._encode_with(vv[0], vv[1], x),
        (clip.w1, clip.w2), mesh)
    sharded = extract_features(encode, train_merged, train_classes,
                               batch_size=64, num_workers=1)

    np.testing.assert_allclose(sharded["all_feats"], single["all_feats"],
                               rtol=1e-5, atol=1e-5)
    for k in ("targets", "mask_lab", "mask_cls"):
        np.testing.assert_array_equal(sharded[k], single[k])


def test_extract_features_multi_matches_separate_passes(mesh):
    """One shared dataset pass feeding both encoders must reproduce the
    two-pass per-encoder extraction exactly (the reference pays decode +
    transform + H2D twice, main_unsup.py:297-311)."""
    from scd_tpu.core.config import DataConfig
    from scd_tpu.data import get_class_splits, get_datasets
    from scd_tpu.models.synthetic import SyntheticCLIP
    from scd_tpu.pipelines.common import extract_features_multi

    dcfg = DataConfig(dataset_name="synthetic", prop_train_labels=0.5)
    train_classes, _ = get_class_splits(dcfg)
    train_merged, _t, _u, extras = get_datasets(dcfg)
    clip = SyntheticCLIP(extras["class_colors"])

    # heterogeneous pair: one sharded encoder + one plain closure
    sharded = make_sharded_image_encoder(
        lambda vv, x: clip._encode_with(vv[0], vv[1], x),
        (clip.w1, clip.w2), mesh)

    multi = extract_features_multi(
        {"feat": sharded, "clip": clip.encode_image},
        train_merged, train_classes, batch_size=64, num_workers=1)
    single = extract_features(clip.encode_image, train_merged, train_classes,
                              batch_size=64, num_workers=1)
    for k in ("feat", "clip"):
        np.testing.assert_allclose(multi[k]["all_feats"],
                                   single["all_feats"], rtol=0, atol=1e-6)
        for m in ("targets", "mask_lab", "mask_cls"):
            np.testing.assert_array_equal(multi[k][m], single[m])

    # all-sharded pair shares ONE staging and still matches
    multi_sh = extract_features_multi(
        {"a": sharded, "b": sharded}, train_merged, train_classes,
        batch_size=64, num_workers=1)
    np.testing.assert_allclose(multi_sh["a"]["all_feats"],
                               single["all_feats"], rtol=1e-5, atol=1e-5)


def test_shared_extractor_runs_only_missing_towers():
    """Partial-cache state: when only one feature set's cache missed, the
    other tower must NOT run (a full wasted ViT pass otherwise —
    ``make_shared_extractor(needed=...)``); when both missed, one shared
    dataset pass feeds both."""
    from scd_tpu.core.config import DataConfig
    from scd_tpu.data import get_class_splits, get_datasets
    from scd_tpu.models.synthetic import SyntheticCLIP
    from scd_tpu.pipelines.common import make_shared_extractor

    dcfg = DataConfig(dataset_name="synthetic", prop_train_labels=0.5)
    train_classes, _ = get_class_splits(dcfg)
    train_merged, _t, _u, extras = get_datasets(dcfg)
    clip = SyntheticCLIP(extras["class_colors"])

    def counting(name, calls):
        def enc(images):
            calls.append(name)
            return clip.encode_image(images)
        return enc

    # only "clip" missed: feat tower must not run
    calls = []
    ext = make_shared_extractor(
        counting("feat", calls), counting("clip", calls), train_merged,
        train_classes, batch_size=64, num_workers=1, needed=("clip",))
    out = ext("clip")
    assert set(calls) == {"clip"}
    assert "all_feats" in out

    # both missed: one pass runs both towers, memoized across calls
    calls2 = []
    ext2 = make_shared_extractor(
        counting("feat", calls2), counting("clip", calls2), train_merged,
        train_classes, batch_size=64, num_workers=1,
        needed=("feat", "clip"))
    a, b = ext2("feat"), ext2("clip")
    n_batches = calls2.count("feat")
    assert calls2.count("clip") == n_batches > 0
    np.testing.assert_array_equal(a["targets"], b["targets"])

    # identical towers: encoder runs once per batch, result aliased
    calls3 = []
    shared_enc = counting("both", calls3)
    ext3 = make_shared_extractor(
        shared_enc, shared_enc, train_merged, train_classes,
        batch_size=64, num_workers=1, needed=("feat", "clip"))
    f, c = ext3("feat"), ext3("clip")
    assert calls3.count("both") == n_batches
    np.testing.assert_array_equal(f["all_feats"], c["all_feats"])
