"""Fabricate the full artifact root for the composed-pipeline oracle.

One deterministic fixture tree that BOTH sides consume:

- the reference ``main_unsup.py`` subprocess (via its own ``.pt`` cache
  protocol, ``main_unsup.py:294-311, 366-374, 387-395``, a fabricated
  nltk WordNet corpus, and an ``ILSVRC12/train`` wnid directory scan);
- our ``run_unsup`` (via ``pipelines.interop`` imports of the same
  ``.pt`` files, ``Taxonomy.from_wndb`` over the same WNDB bytes, and the
  same ImageNet-100 tree through ``data.registry``).

Layout under ``root``:
    nltk_data/corpora/wordnet/   WNDB corpus (tests/wndb_fabricate.py)
    ILSVRC12/train/<wnid>/x.jpg  1000 class dirs (2 empty jpgs each)
    ILSVRC12/val/<wnid>/v.jpg
    data/wordnet_all_noun.txt    the vocabulary (all taxonomy names)
    extracted_features/*.pt      both towers' feature dicts
    cluster/KM_dino_vit_imagenet_100_<K>.pt
    zeroshot_weights/zeroshot_weights_all_nouns_vit_b_16.pt
    class_map.json               idx1000 -> idx100 (seed-0 choice)
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np

from wndb_fabricate import build_wndb

N_GENUS = 50
SPECIES_PER_GENUS = 20  # 1000 species = the ImageNet-1k class dirs
D_CLIP = 32
K_CLUSTERS = 20
N_IMAGES = 1200


def fabricate_oracle_root(root: str, seed: int = 0) -> Dict:
    """Build the tree; returns the ground-truth pieces the test asserts
    against (nouns order, class_map, fabricated arrays)."""
    rng = np.random.default_rng(seed)

    # ---- taxonomy: entity -> genus_g -> species_g_i (1000 leaves)
    tree: Dict[str, list] = {"entity": []}
    species = []
    for g in range(N_GENUS):
        genus = f"genus_{g:02d}"
        tree["entity"].append(genus)
        tree[genus] = []
        for i in range(SPECIES_PER_GENUS):
            sp = f"species_{g:02d}_{i:02d}"
            tree[genus].append(sp)
            tree[sp] = []
            species.append(sp)
    wn_dir = os.path.join(root, "nltk_data", "corpora", "wordnet")
    offsets = build_wndb(wn_dir, tree)
    species_wnids = {sp: f"n{offsets[sp]:08d}" for sp in species}

    # ---- the vocabulary: every taxonomy name, species first (stable
    # deterministic order defines the zeroshot weight columns)
    nouns = species + [f"genus_{g:02d}" for g in range(N_GENUS)] + ["entity"]
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    with open(os.path.join(root, "data", "wordnet_all_noun.txt"), "w") as f:
        f.write("\n".join(nouns) + "\n")

    # ---- ImageNet-1k dir tree: wnid dirs sorted == offset order (offsets
    # are assigned in tree insertion order, so sort the names)
    train_dir = os.path.join(root, "ILSVRC12", "train")
    val_dir = os.path.join(root, "ILSVRC12", "val")
    for wnid in species_wnids.values():
        os.makedirs(os.path.join(train_dir, wnid), exist_ok=True)
        os.makedirs(os.path.join(val_dir, wnid), exist_ok=True)
        for sub, names in ((train_dir, ("a.jpg", "b.jpg")),
                           (val_dir, ("v.jpg",))):
            for n in names:
                open(os.path.join(sub, wnid, n), "w").close()

    # the seed-0 class choice both sides derive (reference
    # imagenet.py:275-333 / our make_imagenet_100)
    chosen = np.sort(np.random.RandomState(0).choice(
        range(1000), size=(100,), replace=False))
    class_map = {int(i): j for j, i in enumerate(chosen)}
    with open(os.path.join(root, "class_map.json"), "w") as f:
        json.dump({str(k): v for k, v in class_map.items()}, f)

    # idx100 -> vocabulary column of its species name
    sorted_wnids = sorted(species_wnids.values())
    wnid_to_species = {w: s for s, w in species_wnids.items()}
    cidx_to_name = {j: wnid_to_species[sorted_wnids[int(i)]]
                    for i, j in class_map.items()}
    noun_col = {n: c for c, n in enumerate(nouns)}

    # ---- features / cluster / zeroshot artifacts
    import torch

    v = len(nouns)
    zw = rng.standard_normal((D_CLIP, v)).astype(np.float32)
    zw /= np.linalg.norm(zw, axis=0, keepdims=True)

    n = N_IMAGES
    present_classes = rng.choice(100, size=K_CLUSTERS, replace=False)
    targets = present_classes[rng.integers(0, K_CLUSTERS, n)].astype(np.int64)
    mask_lab = rng.random(n) < 0.33
    mask_cls = rng.random(n) < 0.5

    # clip features: the class name's text column + noise, renormalized —
    # strong signal so per-cluster vote counts rarely tie (tied Hungarian
    # optima legitimately differ between scipy and the vendored Munkres)
    cols = np.array([noun_col[cidx_to_name[t]] for t in targets])
    feats = zw[:, cols].T + 0.35 * rng.standard_normal((n, D_CLIP))
    feats = (feats / np.linalg.norm(feats, axis=1, keepdims=True)
             ).astype(np.float32)

    feat_dict = {"all_feats": feats, "mask_lab": mask_lab,
                 "mask_cls": mask_cls, "targets": targets}
    os.makedirs(os.path.join(root, "extracted_features"), exist_ok=True)
    # the clustering tower's features are only a cache-presence requirement
    # (cluster result is itself cached); reuse the same arrays
    for name in ("dino_vit_imagenet_100_all.pt", "clip_imagenet_100_all.pt"):
        torch.save(feat_dict, os.path.join(root, "extracted_features", name))

    # KM cluster result: clusters = noisy class identity, ids permuted
    u_targets = targets[~mask_lab]
    n_u = len(u_targets)
    perm = rng.permutation(K_CLUSTERS)
    class_to_cluster = {int(c): int(perm[i])
                        for i, c in enumerate(present_classes)}
    u_preds = np.array([class_to_cluster[int(t)] for t in u_targets],
                       np.int64)
    flip = rng.random(n_u) < 0.10
    u_preds[flip] = rng.integers(0, K_CLUSTERS, int(flip.sum()))
    cluster = {"all_preds": None, "u_preds": u_preds,
               "u_targets": u_targets, "mask": mask_cls[~mask_lab]}
    os.makedirs(os.path.join(root, "cluster"), exist_ok=True)
    torch.save(cluster, os.path.join(
        root, "cluster", f"KM_dino_vit_imagenet_100_{K_CLUSTERS}.pt"))

    os.makedirs(os.path.join(root, "zeroshot_weights"), exist_ok=True)
    torch.save(torch.from_numpy(zw), os.path.join(
        root, "zeroshot_weights", "zeroshot_weights_all_nouns_vit_b_16.pt"))

    return {"nouns": nouns, "class_map": class_map,
            "cidx_to_name": cidx_to_name, "cluster": cluster,
            "zw": zw, "feat_dict": feat_dict, "k": K_CLUSTERS}
