#!/usr/bin/env bash
# SSB-stratified semi-sup k-means eval (reference k_means_stratified.py CLI).
set -e
python -m scd_tpu.cluster.runners \
    --features "${FEATURES:?set FEATURES}" \
    --n_train_classes "${N_TRAIN_CLASSES:?set N_TRAIN_CLASSES}" \
    --dataset_name "${DATASET:?set DATASET (cub|scars|aircraft)}" \
    --ssb_dir "${SSB_DIR:?set SSB_DIR}" \
    "$@"
