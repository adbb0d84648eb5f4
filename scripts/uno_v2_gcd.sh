#!/usr/bin/env bash
# UNO v2 baseline (reference gcd/bash_scripts/uno_v2_gcd.sh).
set -e
python -m scd_tpu.train.run_baseline --method uno \
    --features "${FEATURES:?set FEATURES}" \
    --n_labeled "${N_LABELED:?set N_LABELED}" \
    "$@"
