"""Augmentation, WTA hashing, and plot-saver tests (reference
``gcd/data/augmentations/randaugment.py``, ``cut_out.py``,
``local_utils/wta.py``, ``local_utils/util.py:178-247``)."""

import jax
import numpy as np
import pytest
from PIL import Image

from scd_tpu.data.augment import (ContrastiveViewGenerator, RandAugment,
                                  cutout)
from scd_tpu.data.transforms import get_transform
from scd_tpu.ops.wta import hash_transform, structured_hash_idx, wta_hash


def _img(seed=0, size=64):
    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 255, (size, size, 3),
                                        dtype=np.uint8))


def test_randaugment_all_ops_run():
    img = _img()
    for m in (0, 15, 30):
        aug = RandAugment(n=2, m=m, seed=3)
        for _ in range(20):  # covers the op bank with high probability
            out = aug(img)
            assert out.size == img.size and out.mode == "RGB"


def test_randaugment_deterministic_per_seed():
    a = RandAugment(n=2, m=10, seed=5)(_img())
    b = RandAugment(n=2, m=10, seed=5)(_img())
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cutout_masks_square():
    x = np.ones((32, 32, 3), np.uint8) * 255
    fn = cutout(mask_size=16, p=1.0, cutout_inside=True, seed=0)
    out = fn(x)
    n_zero = (out == 0).all(axis=-1).sum()
    assert n_zero == 16 * 16  # inside placement: full square masked
    # p=0 is identity
    fn0 = cutout(mask_size=16, p=0.0, cutout_inside=True, seed=0)
    np.testing.assert_array_equal(fn0(x), x)


def test_view_generator():
    tf = get_transform("imagenet", image_size=32, train=True, seed=0)
    views = ContrastiveViewGenerator(tf, n_views=2)(_img())
    assert len(views) == 2
    assert views[0].shape == (32, 32, 3)
    assert not np.allclose(views[0], views[1])  # independent draws


def test_get_transform_cutout_and_randaug():
    tf = get_transform("cutout", image_size=32, train=True, seed=0,
                       rand_aug=(2, 10))
    out = tf(_img())
    assert out.shape == (32, 32, 3) and np.isfinite(out).all()


def test_wta_hash_shapes_and_invariance():
    key = jax.random.PRNGKey(0)
    feats = np.random.default_rng(0).normal(size=(8, 64)).astype(np.float32)
    idx = structured_hash_idx(key, 64, 16, 4)
    assert idx.shape == (16, 4)
    # windows draw without replacement
    assert all(len(set(np.asarray(row))) == 4 for row in np.asarray(idx))
    codes = wta_hash(feats, idx)
    assert codes.shape == (8, 16)
    assert int(codes.max()) < 4
    # ordinal invariance: monotone rescaling preserves the hash
    codes2 = wta_hash(feats * 3.7 + 0.0, idx)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes2))
    one_call = hash_transform(key, feats, 16, 4)
    np.testing.assert_array_equal(np.asarray(one_call), np.asarray(codes))


def test_plot_savers(tmp_path):
    pytest.importorskip("matplotlib")
    from scd_tpu.utils.plots import save_cvi_curves, save_heatmap, save_tsne

    rng = np.random.default_rng(0)
    emb = rng.normal(size=(60, 8)).astype(np.float32)
    labels = np.repeat(np.arange(3), 20)
    save_tsne(emb, labels, path=str(tmp_path / "t.png"))
    save_heatmap(rng.random((6, 4)), path=str(tmp_path / "h.png"))
    save_cvi_curves([[0.5, 0.4, 0.3, 0.2, 0.1], [0.6, 0.5, 0.4, 0.3, 0.2]],
                    [5, 10], path=str(tmp_path / "c.png"))
    for f in ("t.png", "h.png", "c.png"):
        assert (tmp_path / f).stat().st_size > 0


def test_cifar_transform_family():
    """CIFAR family: 4px-pad random crop + flip train, square-resize eval,
    pytorch-cifar normalization stats (reference
    ``gcd/data/augmentations/__init__.py:34-51``)."""
    img = _img(size=32)
    train = get_transform("cifar", image_size=32, train=True, seed=0)
    out = train(img)
    assert out.shape == (32, 32, 3)
    ev = get_transform("cifar", image_size=32)(
        _img(seed=1, size=48))  # non-square-safe resize
    assert ev.shape == (32, 32, 3)
    # stats: a mid-gray image normalizes near (0.5-mean)/std
    grey = Image.fromarray(np.full((32, 32, 3), 128, np.uint8))
    v = get_transform("cifar", image_size=32)(grey)
    exp = (128 / 255 - 0.4914) / 0.2023
    assert abs(v[0, 0, 0] - exp) < 1e-4
