"""Offline feature extraction — dump per-instance backbone features into a
``FeatureVectorDataset`` store.

Reference ``gcd/methods/clustering/extract_features.py:22-65``: iterate the
train/test splits through a frozen backbone and write
``feature_root/{split}/{label}/{uq_idx}.npy`` per instance.  We write the
same tree layout for compatibility plus the packed single-file variant
(``features_packed.npz``) that the TPU pipelines prefer — one IO op instead
of N tiny files.

Run: ``python -m scd_tpu.pipelines.extract --dataset_name synthetic
--feat_model synthetic --save_dir /tmp/feats``
"""

from __future__ import annotations

import argparse
import os
from typing import Dict

import numpy as np

from scd_tpu.data import get_class_splits, get_datasets
from scd_tpu.data.features import save_features_packed, save_features_tree
from scd_tpu.data.loader import iterate_batches
from scd_tpu.pipelines.common import extract_features
from scd_tpu.pipelines.unsup import build_argparser, build_encoders, \
    config_from_args


def extract_to_store(encode_image, dataset, save_dir: str, split: str,
                     batch_size: int = 256, num_workers: int = 8,
                     tree: bool = False) -> Dict[str, np.ndarray]:
    """Extract features for one split and persist them."""
    feats, targets, uqs, masks = [], [], [], []
    for images, labels, uq, m in iterate_batches(dataset, batch_size,
                                                 num_workers=num_workers):
        f = np.asarray(encode_image(images))
        feats.append(f)
        targets.append(labels)
        uqs.append(uq)
        masks.append(m)
    feats = np.concatenate(feats)
    targets = np.concatenate(targets)
    uqs = np.concatenate(uqs)
    mask_lab = np.concatenate(masks).astype(bool)

    root = os.path.join(save_dir, split)
    save_features_packed(root, feats, uqs, targets=targets,
                         mask_lab=mask_lab)
    if tree:
        save_features_tree(root, feats, targets, uqs)
    return {"features": feats, "targets": targets, "uq_idxs": uqs,
            "mask_lab": mask_lab}


def run_extract(cfg, save_dir: str, tree: bool = False) -> Dict[str, Dict]:
    get_class_splits(cfg.data)
    # the reference mains override every transform with CLIP's own
    # preprocess (main_unsup.py:271); we emit uint8 and normalize on device
    # (4x less H2D traffic). Synthetic datasets carry their own arrays.
    if cfg.data.dataset_name == "synthetic":
        tf = None
    else:
        from scd_tpu.data.transforms import clip_preprocess

        tf = clip_preprocess(cfg.data.image_size, device_normalize=True)
    train_merged, test_ds, _unlab, extras = get_datasets(cfg.data, train_transform=tf, test_transform=tf)
    feat_encode, _clip_encode, _txt = build_encoders(cfg, extras)
    out = {}
    for split, ds in (("train", train_merged), ("test", test_ds)):
        out[split] = extract_to_store(
            feat_encode, ds, save_dir, split,
            batch_size=cfg.data.batch_size,
            num_workers=cfg.data.num_workers, tree=tree)
        print(f"{split}: {out[split]['features'].shape} features -> "
              f"{os.path.join(save_dir, split)}")
    return out


def main(argv=None):
    from scd_tpu.utils.runtime import apply_platform_override
    apply_platform_override()
    p = build_argparser()
    p.description = "Offline feature extraction (TPU)"
    p.add_argument("--save_dir", type=str, required=True)
    p.add_argument("--tree", action="store_true",
                   help="also write the per-instance .npy tree layout")
    args = p.parse_args(argv)
    cfg = config_from_args(args)
    return run_extract(cfg, args.save_dir, tree=args.tree)


if __name__ == "__main__":
    main()
