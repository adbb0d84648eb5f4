"""Data layer tests: split algebra invariants (the reference's dataset
__main__ checks), RNG parity of instance subsampling, reader formats via
tiny generated fixtures, loader batching."""

import os
import pickle

import numpy as np
import pytest
from PIL import Image

from scd_tpu.core.config import DataConfig
from scd_tpu.data import (
    MergedDataset,
    build_gcd_splits,
    get_class_splits,
    get_datasets,
    iterate_batches,
    subsample_instances,
)
from scd_tpu.data.core import ImageTable
from scd_tpu.data.datasets import make_cifar, make_cub, make_imagefolder, make_synthetic
from scd_tpu.data.transforms import clip_preprocess, get_transform


def test_subsample_instances_parity():
    """Must reproduce the reference's np.random.seed(0) draw exactly."""
    np.random.seed(0)
    expected = np.random.choice(range(100), replace=False, size=(50,))
    got = subsample_instances(100, 0.5)
    np.testing.assert_array_equal(got, expected)


def test_split_invariants_synthetic():
    whole, test, _ = make_synthetic(n_classes=10, per_class=20)
    splits = build_gcd_splits(whole, test, train_classes=range(5),
                              prop_train_labels=0.5)
    lab, unlab = splits.train_labelled, splits.train_unlabelled
    # the reference's dataset __main__ checks: no uq overlap, total preserved
    assert not (set(lab.uq_idxs) & set(unlab.uq_idxs))
    assert len(lab) + len(unlab) == len(whole)
    # labelled only contains Old classes, half of them
    assert set(lab.targets) <= set(range(5))
    assert len(lab) == int(0.5 * 10 * 20 / 2 * 1)  # 5 classes * 20 * 0.5
    # unlabelled contains all of classes 5-9 plus the other half of 0-4
    assert set(unlab.targets) == set(range(10))


def test_merged_dataset_contract():
    whole, test, _ = make_synthetic(n_classes=4, per_class=10)
    splits = build_gcd_splits(whole, test, train_classes=range(2),
                              prop_train_labels=0.5)
    m = MergedDataset(splits.train_labelled, splits.train_unlabelled)
    img, label, uq, lab_flag = m[0]
    assert lab_flag == np.array([1])
    img, label, uq, lab_flag = m[len(splits.train_labelled)]
    assert lab_flag == np.array([0])
    assert m.mask_lab.sum() == len(splits.train_labelled)


def test_get_datasets_synthetic_end_to_end():
    cfg = DataConfig(dataset_name="synthetic")
    train, test, unlab_test, extras = get_datasets(cfg)
    assert len(train) == len(extras["splits"].train_labelled) + len(unlab_test)
    # target transform remaps classes to 0..9 (identity for synthetic ranges)
    _img, label, _uq, _m = train[0]
    assert 0 <= label < 10


def test_iterate_batches_shapes():
    cfg = DataConfig(dataset_name="synthetic")
    train, *_ = get_datasets(cfg)
    batches = list(iterate_batches(train, batch_size=32, num_workers=2))
    total = sum(b[0].shape[0] for b in batches)
    assert total == len(train)
    imgs, labels, uqs, mask = batches[0]
    assert imgs.shape == (32, 32, 32, 3) and imgs.dtype == np.float32
    assert labels.shape == (32,) and mask.dtype == bool
    # labelled-first ordering from MergedDataset
    assert mask.all()


def _write_img(path, color, size=20):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.new("RGB", (size, size), color).save(path)


def test_imagefolder_reader(tmp_path):
    for split in ("train", "val"):
        for ci, cls in enumerate(["ants", "bees"]):
            for i in range(3):
                _write_img(str(tmp_path / split / cls / f"{i}.png"),
                           (ci * 100, 50, 50))
    whole, test, extra = make_imagefolder(str(tmp_path / "train"),
                                          str(tmp_path / "val"))
    assert len(whole) == 6 and len(test) == 6
    assert extra["classes"] == ["ants", "bees"]
    img, target, uq = whole[0]
    assert target == 0 and np.asarray(img).shape == (20, 20, 3)


def test_cub_reader(tmp_path):
    base = tmp_path / "CUB_200_2011"
    os.makedirs(base / "images")
    names = ["001.Black_footed_Albatross", "002.Laysan_Albatross"]
    (base / "classes.txt").write_text("1 001.Black_footed_Albatross\n"
                                     "2 002.Laysan_Albatross\n")
    images, labels, split = [], [], []
    idx = 1
    for ci, cls in enumerate(names):
        for i in range(4):
            rel = f"{cls}/img_{i}.jpg"
            _write_img(str(base / "images" / rel), (ci * 80, 100, 100))
            images.append(f"{idx} {rel}")
            labels.append(f"{idx} {ci + 1}")
            split.append(f"{idx} {1 if i < 3 else 0}")  # 3 train, 1 test each
            idx += 1
    (base / "images.txt").write_text("\n".join(images) + "\n")
    (base / "image_class_labels.txt").write_text("\n".join(labels) + "\n")
    (base / "train_test_split.txt").write_text("\n".join(split) + "\n")

    whole, test, extra = make_cub(str(tmp_path))
    assert len(whole) == 6 and len(test) == 2
    assert extra["classnames"] == names
    img, target, uq = whole[0]
    assert target == 0


def test_cifar_reader(tmp_path):
    base = tmp_path / "cifar-10-batches-py"
    os.makedirs(base)
    rng = np.random.default_rng(0)

    def batch(n):
        return {b"data": rng.integers(0, 255, (n, 3072), dtype=np.uint8),
                b"labels": rng.integers(0, 10, n).tolist()}

    for i in range(1, 6):
        with open(base / f"data_batch_{i}", "wb") as f:
            pickle.dump(batch(20), f)
    with open(base / "test_batch", "wb") as f:
        pickle.dump(batch(10), f)
    with open(base / "batches.meta", "wb") as f:
        pickle.dump({b"label_names": [f"c{i}".encode() for i in range(10)]}, f)

    whole, test, extra = make_cifar(str(tmp_path), 10)
    assert len(whole) == 100 and len(test) == 10
    img, target, uq = whole[0]
    assert np.asarray(img).shape == (32, 32, 3)


def test_transforms_shapes(tmp_path):
    img = Image.new("RGB", (300, 200), (120, 80, 40))
    out = clip_preprocess(224)(img)
    assert out.shape == (224, 224, 3) and out.dtype == np.float32
    ev = get_transform("imagenet", image_size=224)(img)
    assert ev.shape == (224, 224, 3)
    tr = get_transform("imagenet", image_size=224, train=True)(img)
    assert tr.shape == (224, 224, 3)


def test_feature_vector_dataset(tmp_path):
    from scd_tpu.data.features import (FeatureVectorDataset,
                                       save_features_packed,
                                       save_features_tree)

    whole, test, _ = make_synthetic(n_classes=3, per_class=4)
    feats = np.arange(len(whole) * 8, dtype=np.float32).reshape(len(whole), 8)

    tree_root = str(tmp_path / "tree")
    save_features_tree(tree_root, feats, whole.targets, whole.uq_idxs)
    fvd = FeatureVectorDataset(whole, tree_root)
    f0, label0, uq0 = fvd[0]
    np.testing.assert_array_equal(f0, feats[0])

    packed_root = str(tmp_path / "packed")
    save_features_packed(packed_root, feats, whole.uq_idxs)
    fvd2 = FeatureVectorDataset(whole, packed_root)
    f5, *_ = fvd2[5]
    np.testing.assert_array_equal(f5, feats[5])


def test_class_splits_defaults():
    cfg = DataConfig(dataset_name="imagenet_100")
    old, new = get_class_splits(cfg)
    assert list(old) == list(range(50)) and list(new) == list(range(50, 100))
    cfg = DataConfig(dataset_name="cub", use_ssb_splits=False)
    old, new = get_class_splits(cfg)
    assert list(old) == list(range(100))


def test_uint8_device_normalize_matches_host():
    """uint8 H2D + on-device normalize == f32 host normalize (4x less
    host->device traffic for the extraction loop)."""
    import numpy as np
    from PIL import Image

    import jax.numpy as jnp

    from scd_tpu.data.transforms import clip_preprocess, device_normalize_clip

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (300, 250, 3), dtype=np.uint8))
    host = clip_preprocess(224)(img)
    u8 = clip_preprocess(224, device_normalize=True)(img)
    assert u8.dtype == np.uint8 and u8.shape == (224, 224, 3)
    dev = np.asarray(device_normalize_clip(jnp.asarray(u8)))
    np.testing.assert_allclose(dev, host, atol=1e-5)
    # float input is passed through untouched
    passthru = np.asarray(device_normalize_clip(jnp.asarray(host)))
    np.testing.assert_allclose(passthru, host, atol=1e-6)


def test_loader_preserves_uint8():
    import numpy as np

    from scd_tpu.data.loader import iterate_batches

    class _DS:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            return (np.full((8, 8, 3), i, np.uint8), i, i, i % 2)

    batches = list(iterate_batches(_DS(), 4, num_workers=2))
    assert batches[0][0].dtype == np.uint8


def test_loader_readahead_matches_inline():
    """The background-readahead pipeline yields identical batches in the
    identical order as the inline decode, including the ragged tail."""
    import numpy as np

    from scd_tpu.data.loader import iterate_batches

    class _DS:
        def __len__(self):
            return 11

        def __getitem__(self, i):
            return (np.full((4, 4, 3), i, np.float32), i, 100 + i, i % 2)

    inline = list(iterate_batches(_DS(), 4, num_workers=2, readahead=0))
    ahead = list(iterate_batches(_DS(), 4, num_workers=2, readahead=3))
    assert len(inline) == len(ahead) == 3
    for a, b in zip(inline, ahead):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


def test_loader_readahead_propagates_errors_and_allows_break():
    """A decode exception re-raises in the consumer; breaking out early
    must not deadlock the producer thread (bounded queue + stop flag)."""
    import threading

    import numpy as np
    import pytest

    from scd_tpu.data.loader import iterate_batches

    class _Boom:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise ValueError("bad image")
            return (np.zeros((4, 4, 3), np.float32), i, i, 0)

    with pytest.raises(ValueError, match="bad image"):
        list(iterate_batches(_Boom(), 2, num_workers=2, readahead=2))

    class _DS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return (np.zeros((4, 4, 3), np.float32), i, i, 0)

    before = threading.active_count()
    for j, _batch in enumerate(iterate_batches(_DS(), 2, num_workers=2,
                                               readahead=2)):
        if j == 1:
            break
    # the producer observes the stop flag within its 0.1 s put timeout
    import time
    time.sleep(0.5)
    assert threading.active_count() <= before + 1


def test_image_shards_round_trip(tmp_path):
    """write_image_shards + iterate_shard_batches reproduce the exact
    batch stream (images/labels/uq_idxs/mask_lab), across shard
    boundaries and ragged tails."""
    import numpy as np

    from scd_tpu.data.shards import (iterate_shard_batches, shard_manifest,
                                     write_image_shards)

    rng = np.random.default_rng(0)
    n, h = 530, 8
    images = rng.integers(0, 256, (n, h, h, 3), dtype=np.uint8)
    labels = rng.integers(0, 10, n).astype(np.int64)
    uqs = np.arange(n, dtype=np.int64)
    mask = rng.random(n) < 0.5

    def batches(bs):
        for s in range(0, n, bs):
            e = min(s + bs, n)
            yield images[s:e], labels[s:e], uqs[s:e], mask[s:e]

    out = str(tmp_path / "shards")
    write_image_shards(batches(96), out, shard_size=128)
    man = shard_manifest(out)
    assert man["n_images"] == n
    assert [s["n"] for s in man["shards"]] == [128, 128, 128, 128, 18]

    got = list(iterate_shard_batches(out, batch_size=64))
    assert [len(b[0]) for b in got] == [64] * 8 + [18]
    np.testing.assert_array_equal(np.concatenate([b[0] for b in got]), images)
    np.testing.assert_array_equal(np.concatenate([b[1] for b in got]), labels)
    np.testing.assert_array_equal(np.concatenate([b[2] for b in got]), uqs)
    np.testing.assert_array_equal(np.concatenate([b[3] for b in got]), mask)

    # per-process slicing covers every shard exactly once
    parts = [list(iterate_shard_batches(out, 64, process_shard=(i, 2)))
             for i in range(2)]
    tot = sum(len(b[0]) for p in parts for b in p)
    assert tot == n
    np.testing.assert_array_equal(
        np.concatenate([b[2] for p in parts for b in p]), uqs)


def test_image_shards_reject_float(tmp_path):
    import numpy as np
    import pytest as _pytest

    from scd_tpu.data.shards import write_image_shards

    def batches():
        yield (np.zeros((4, 8, 8, 3), np.float32), np.zeros(4, np.int64),
               np.arange(4), np.zeros(4, bool))

    with _pytest.raises(ValueError, match="uint8"):
        write_image_shards(batches(), str(tmp_path / "s"))
