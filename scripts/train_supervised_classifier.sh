#!/usr/bin/env bash
# Supervised classifier + combine-with-kmeans (reference
# gcd/bash_scripts/train_supervised_classifer.sh + combine_classifier_and_kmeans.py).
set -e
python -m scd_tpu.train.run_baseline --method supervised \
    --features "${FEATURES:?set FEATURES}" \
    --n_labeled "${N_LABELED:?set N_LABELED}" \
    "$@"
