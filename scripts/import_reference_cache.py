#!/usr/bin/env python
"""Import the reference's cached ``.pt`` artifacts into the npz stage cache.

Usage:
    python scripts/import_reference_cache.py --ref_root /path/to/SCD_root \
        --dataset_name imagenet_100 --feat_model dino_vit --cluster KM \
        --n_cluster 100 --corpus wordnet --cache_dir artifacts

Sweeps the reference root for the feature/cluster/zeroshot caches this
config would consume (``scd_tpu.pipelines.interop``) and writes them under
the exact keys ``run_unsup``/``run_ptsup`` re-enter from — the BASELINE.md
north-star parity check on the reference's own cached features then runs
with zero new code (``python -m scd_tpu.pipelines.unsup --no-run_cluster
--dataset_name ... --cache_dir ...``).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ref_root", required=True,
                   help="the reference's root_dir (holds extracted_features/"
                        ", cluster/, zeroshot_weights/)")
    p.add_argument("--dataset_name", default="imagenet_100")
    p.add_argument("--feat_model", default="dino_vit")
    p.add_argument("--cluster", default="KM")
    p.add_argument("--n_cluster", type=int, default=100)
    p.add_argument("--corpus", default="wordnet")
    p.add_argument("--cache_dir", default="artifacts")
    args = p.parse_args(argv)

    from scd_tpu.core.config import (ClusterConfig, DataConfig,
                                     FeatureConfig, NamingConfig,
                                     PipelineConfig)
    from scd_tpu.pipelines.interop import import_reference_artifacts

    cfg = PipelineConfig(
        data=DataConfig(dataset_name=args.dataset_name,
                        cache_dir=args.cache_dir),
        feature=FeatureConfig(feat_model=args.feat_model),
        cluster=ClusterConfig(algorithm=args.cluster,
                              n_clusters=args.n_cluster),
        naming=NamingConfig(corpus=args.corpus),
    )
    imported = import_reference_artifacts(args.ref_root, cfg)
    if not imported:
        print(f"no reference artifacts found under {args.ref_root} for "
              f"this config")
        return 1
    for name, path in imported.items():
        print(f"imported {name}: {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
