#!/usr/bin/env bash
# (Semi-sup) k-means over extracted features (reference gcd/bash_scripts/k_means.sh).
set -e
python -m scd_tpu.cluster.runners \
    --features "${FEATURES:?set FEATURES=path/to/features_packed.npz}" \
    --n_train_classes "${N_TRAIN_CLASSES:?set N_TRAIN_CLASSES}" \
    --semi_sup \
    "$@"
