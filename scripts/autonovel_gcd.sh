#!/usr/bin/env bash
# AutoNovel baseline (reference gcd/bash_scripts/autonovel_gcd.sh).
set -e
python -m scd_tpu.train.run_baseline --method autonovel \
    --features "${FEATURES:?set FEATURES}" \
    --n_labeled "${N_LABELED:?set N_LABELED}" \
    "$@"
# End-to-end (trunk finetuning) variant, reference train loop parity:
#   python -m scd_tpu.train.run_baseline_e2e --method autonovel --dataset_name <ds> ...
