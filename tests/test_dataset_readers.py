"""Dataset readers against miniature on-disk fixtures in each dataset's real
file format (reference layouts: ``gcd/data/{cub,stanford_dogs,cifar,
fgvc_aircraft,stanford_cars,herbarium_19,imagenet}.py``).  The readers are
otherwise only exercised with the synthetic dataset, so format drift would
surface only when real data appears."""

import os
import pickle

import numpy as np
import pytest
from PIL import Image

from scd_tpu.data.datasets import (make_aircraft, make_cifar, make_cub,
                                   make_herbarium, make_imagenet_100,
                                   make_scars, make_sdogs)


def _write_jpg(path, color=(255, 0, 0), size=8):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.new("RGB", (size, size), color).save(path)


def test_make_cub(tmp_path):
    base = tmp_path / "CUB_200_2011"
    os.makedirs(base / "images")
    (base / "images.txt").write_text(
        "1 001.Black_footed_Albatross/a.jpg\n2 002.Laysan_Albatross/b.jpg\n"
        "3 001.Black_footed_Albatross/c.jpg\n")
    (base / "image_class_labels.txt").write_text("1 1\n2 2\n3 1\n")
    (base / "train_test_split.txt").write_text("1 1\n2 0\n3 1\n")
    (base / "classes.txt").write_text(
        "1 001.Black_footed_Albatross\n2 002.Laysan_Albatross\n")
    for rel in ("001.Black_footed_Albatross/a.jpg",
                "002.Laysan_Albatross/b.jpg",
                "001.Black_footed_Albatross/c.jpg"):
        _write_jpg(str(base / "images" / rel))

    train, test, extra = make_cub(str(tmp_path))
    assert len(train) == 2 and len(test) == 1
    np.testing.assert_array_equal(train.targets, [0, 0])
    np.testing.assert_array_equal(test.targets, [1])
    img, label, _uq = train[0]
    assert label == 0 and np.asarray(img).shape == (8, 8, 3)
    assert extra["classnames"][1] == "002.Laysan_Albatross"


def test_make_sdogs(tmp_path):
    from scipy.io import savemat

    base = tmp_path / "StanfordDogs"
    for breed in ("n02085620-Chihuahua", "n02085782-Japanese_spaniel"):
        _write_jpg(str(base / "Images" / breed / "x.jpg"))

    def mat(files, labels, name):
        fl = np.empty((len(files), 1), object)
        for i, f in enumerate(files):
            fl[i, 0] = np.array([f])
        savemat(str(base / name), {"file_list": fl,
                                   "labels": np.array([[l] for l in labels])})

    mat(["n02085620-Chihuahua/x.jpg", "n02085782-Japanese_spaniel/x.jpg"],
        [1, 2], "train_list.mat")
    mat(["n02085620-Chihuahua/x.jpg"], [1], "test_list.mat")

    train, test, extra = make_sdogs(str(tmp_path))
    assert len(train) == 2 and len(test) == 1
    np.testing.assert_array_equal(train.targets, [0, 1])
    assert extra["breeds"][0].startswith("n02085620")
    img, label, _ = test[0]
    assert label == 0 and np.asarray(img).shape == (8, 8, 3)


@pytest.mark.parametrize("which", [10, 100])
def test_make_cifar(tmp_path, which):
    rng = np.random.default_rng(0)
    if which == 10:
        base = tmp_path / "cifar-10-batches-py"
        os.makedirs(base)
        for i in range(1, 6):
            with open(base / f"data_batch_{i}", "wb") as f:
                pickle.dump({b"data": rng.integers(
                    0, 255, (4, 3072), dtype=np.uint8).astype(np.uint8),
                    b"labels": [0, 1, 2, 3]}, f)
        with open(base / "test_batch", "wb") as f:
            pickle.dump({b"data": rng.integers(
                0, 255, (2, 3072), dtype=np.uint8),
                b"labels": [1, 0]}, f)
        with open(base / "batches.meta", "wb") as f:
            pickle.dump({b"label_names": [f"c{i}".encode()
                                          for i in range(10)]}, f)
    else:
        base = tmp_path / "cifar-100-python"
        os.makedirs(base)
        with open(base / "train", "wb") as f:
            pickle.dump({b"data": rng.integers(
                0, 255, (6, 3072), dtype=np.uint8),
                b"fine_labels": [0, 1, 2, 3, 4, 5]}, f)
        with open(base / "test", "wb") as f:
            pickle.dump({b"data": rng.integers(
                0, 255, (2, 3072), dtype=np.uint8),
                b"fine_labels": [2, 5]}, f)
        with open(base / "meta", "wb") as f:
            pickle.dump({b"fine_label_names": [f"f{i}".encode()
                                               for i in range(100)]}, f)

    train, test, extra = make_cifar(str(tmp_path), which=which)
    assert len(train) == (20 if which == 10 else 6)
    img, label, _ = train[0]
    assert np.asarray(img).shape == (32, 32, 3)
    assert len(extra["class_to_idx"]) == which


def test_make_aircraft(tmp_path):
    base = tmp_path / "fgvc-aircraft-2013b" / "data"
    os.makedirs(base / "images")
    (base / "variants.txt").write_text("707-320\nA310\n")
    (base / "images_variant_trainval.txt").write_text(
        "0001 707-320\n0002 A310\n")
    (base / "images_variant_test.txt").write_text("0003 A310\n")
    for i in ("0001", "0002", "0003"):
        _write_jpg(str(base / "images" / f"{i}.jpg"))

    train, test, extra = make_aircraft(str(tmp_path))
    assert len(train) == 2 and len(test) == 1
    np.testing.assert_array_equal(train.targets, [0, 1])
    assert extra["class_to_idx"]["A310"] == 1


def test_make_scars(tmp_path):
    from scipy.io import savemat

    os.makedirs(tmp_path / "devkit")
    cn = np.empty((1, 2), object)
    cn[0, 0] = np.array(["AM General Hummer"])
    cn[0, 1] = np.array(["Acura RL"])
    savemat(str(tmp_path / "devkit" / "cars_meta.mat"), {"class_names": cn})

    def annos(path, entries):
        arr = np.zeros((1, len(entries)),
                       dtype=[("fname", "O"), ("class", "O")])
        for i, (f, c) in enumerate(entries):
            arr[0, i] = (np.array([f]), np.array([[c]]))
        savemat(str(path), {"annotations": arr})

    annos(tmp_path / "devkit" / "cars_train_annos.mat",
          [("a.jpg", 1), ("b.jpg", 2)])
    annos(tmp_path / "devkit" / "cars_test_annos_withlabels.mat",
          [("c.jpg", 2)])
    for sub, name in (("cars_train", "a.jpg"), ("cars_train", "b.jpg"),
                      ("cars_test", "c.jpg")):
        _write_jpg(str(tmp_path / sub / name))

    train, test, extra = make_scars(str(tmp_path))
    assert len(train) == 2 and len(test) == 1
    np.testing.assert_array_equal(train.targets, [0, 1])
    np.testing.assert_array_equal(test.targets, [1])
    assert extra["classnames"][1] == "Acura RL"


def test_make_herbarium_and_imagenet100(tmp_path):
    # imagefolder layouts
    for split in ("small-train", "small-validation"):
        for cls in ("100", "200"):
            _write_jpg(str(tmp_path / split / cls / "i.jpg"))
    train, test, _ = make_herbarium(str(tmp_path))
    assert len(train) == 2 and len(test) == 2

    # imagenet-100: selection is by index into the sorted class-dir list
    # (the reference subsamples indices into the full 1000-class ordering)
    np.random.seed(0)
    chosen = set(np.random.choice(range(1000), size=(100,),
                                  replace=False).tolist())
    n_dirs = 5
    root = tmp_path / "imagenet"
    for split in ("train", "val"):
        for i in range(n_dirs):
            _write_jpg(str(root / split / f"n{i:08d}" / "i.jpg"))
    whole, test, extra = make_imagenet_100(str(root))
    expected = len([i for i in range(n_dirs) if i in chosen])
    assert len(whole) == expected and len(test) == expected
    assert len(extra["class_map"]) == 100


def test_make_imagenet_127(tmp_path):
    """ImageNet-127 fixture: 127 wnid dirs under <root>/imagenet127/val
    serve as both training pool and test set (imagenet.py:395-453);
    the seed-0 'subsample' is the identity, class_map maps folder order
    straight through, and the dataset resolves end-to-end through
    get_datasets."""
    from scd_tpu.core.config import DataConfig
    from scd_tpu.data import get_class_splits, get_datasets
    from scd_tpu.data.datasets import make_imagenet_127

    root = tmp_path / "imagenet127"
    for i in range(127):
        _write_jpg(str(root / "val" / f"n{i:08d}" / "i.jpg"),
                   color=(i, 255 - i, 0))
    whole, test, extra = make_imagenet_127(str(tmp_path / "imagenet127"))
    assert len(whole) == 127 and len(test) == 127
    assert extra["class_map"] == {i: i for i in range(127)}
    np.testing.assert_array_equal(np.unique(whole.targets),
                                  np.arange(127))

    cfg = DataConfig(dataset_name="imagenet_127", root_dir=str(tmp_path),
                     prop_train_labels=0.5)
    train_classes, unlab_classes = get_class_splits(cfg)
    assert list(train_classes) == list(range(64))
    assert list(unlab_classes) == list(range(64, 127))
    merged, test_ds, unlab_test, extras = get_datasets(cfg)
    # split invariant (the reference's __main__ check, imagenet.py:456-474):
    lab = extras["splits"].train_labelled
    unlab = extras["splits"].train_unlabelled
    assert not set(lab.uq_idxs.tolist()) & set(unlab.uq_idxs.tolist())
    assert len(lab) + len(unlab) == 127


def test_imagenet_osr_splits():
    """I21K OSR machinery (imagenet.py:55-199) on a synthetic hypernym
    tree: tier ordering by semantic distance, and the seed-0 random draw."""
    from scd_tpu.data.imagenet_osr import (get_imagenet_osr_class_splits,
                                           osr_difficulty_splits,
                                           semantic_tree_distances)

    # wnids: a (I1K), b/c/d (I21K); paths leaf->root over shared ancestors
    class_list = ["a", "b", "c", "d", "animal", "thing"]
    tree = [
        [0, 4, 5],   # a -> animal -> thing
        [1, 4, 5],   # b -> animal -> thing   (closest to a)
        [2, 5],      # c -> thing             (medium)
        [3],         # d (no common ancestor) (farthest)
    ]
    mat, rows = semantic_tree_distances(tree, class_list, ["a"],
                                        ["b", "c", "d"])
    assert rows == ["a"]
    # a<->b meet at 'animal': path 1 up + 1 down = 2
    assert mat[0, 0] == 2
    # a<->c meet at 'thing': a is 2 up, c is 1 up = 3
    assert mat[0, 1] == 3
    # a<->d: no common ancestor: 3 + 1 + 1 = 5
    assert mat[0, 2] == 5

    tiers = osr_difficulty_splits(mat, ["b", "c", "d"], tier_size=1)
    assert tiers["hard_i21k_classes"] == ["b"]
    assert tiers["easy_i21k_classes"] == ["d"]
    assert tiers["medium_i21k_classes"] == ["c"]

    c2i = {w: i for i, w in enumerate(class_list)}
    got = get_imagenet_osr_class_splits(c2i, ["a"], ["b", "c", "d"],
                                        num_classes=2, osr_split="random")
    assert len(got) == 2 and set(got) <= {1, 2, 3}
    # deterministic across calls (sorted disjoint list + seed 0)
    assert got == get_imagenet_osr_class_splits(
        c2i, ["a"], ["b", "c", "d"], num_classes=2, osr_split="random")

    hard = get_imagenet_osr_class_splits(c2i, ["a"], ["b", "c", "d"],
                                         osr_split="Hard", precomputed=tiers)
    assert hard == [1]


def test_osr_difficulty_splits_small_vocab_clamps():
    """tier_size larger than the I21K vocabulary: the medium window must
    clamp its start to 0 instead of slicing with a negative index (which
    silently returns a short window from the tail)."""
    import numpy as np

    from scd_tpu.data.imagenet_osr import osr_difficulty_splits

    wnids = [f"w{i}" for i in range(5)]
    mat = np.arange(5, dtype=float)[None, :]  # distances 0..4
    tiers = osr_difficulty_splits(mat, wnids, tier_size=1000)
    # every tier covers the whole (smaller-than-tier) vocabulary
    assert tiers["hard_i21k_classes"] == wnids
    assert tiers["easy_i21k_classes"] == wnids
    assert tiers["medium_i21k_classes"] == wnids
