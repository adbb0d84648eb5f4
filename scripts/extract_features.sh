#!/usr/bin/env bash
# Offline feature extraction (reference gcd/bash_scripts/extract_features.sh).
set -e
python -m scd_tpu.pipelines.extract \
    --dataset_name "${DATASET:-synthetic}" \
    --feat_model "${FEAT_MODEL:-synthetic}" \
    --root_dir "${ROOT_DIR:-/data}" \
    --save_dir "${SAVE_DIR:-features}" \
    "$@"
