#!/usr/bin/env bash
# UNO v2 baseline (reference gcd/bash_scripts/uno_v2_gcd.sh).
set -e
python -m scd_tpu.train.run_baseline --method uno \
    --features "${FEATURES:?set FEATURES}" \
    --n_labeled "${N_LABELED:?set N_LABELED}" \
    "$@"
# End-to-end (trunk finetuning) variant, reference train loop parity:
#   python -m scd_tpu.train.run_baseline_e2e --method uno --dataset_name <ds> ...
