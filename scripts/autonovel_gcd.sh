#!/usr/bin/env bash
# AutoNovel baseline (reference gcd/bash_scripts/autonovel_gcd.sh).
set -e
python -m scd_tpu.train.run_baseline --method autonovel \
    --features "${FEATURES:?set FEATURES}" \
    --n_labeled "${N_LABELED:?set N_LABELED}" \
    "$@"
