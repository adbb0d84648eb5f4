#!/usr/bin/env bash
# Capture the per-round hardware evidence on the real chip (VERDICT r3
# item 6): the compiled-kernel parity suite outcome goes to
# AXON_SUITE_r<N>.txt and a bench run (stderr log + JSON line) to
# BENCH_LOCAL_r<N>.txt.  Usage: scripts/hw_evidence.sh <round-number>
set -uo pipefail
R="${1:?usage: scripts/hw_evidence.sh <round-number>}"
cd "$(dirname "$0")/.."

{
  echo "== on-chip suite $(date -u +%FT%TZ) =="
  # kernel-level Mosaic parity + composed jit paths (SSKM / constrained
  # sinkhorn / vocab top-k) — interpret-mode CPU tests cannot see
  # Mosaic lowering or scoped-VMEM failures (VERDICT r4 item 8)
  SCD_TEST_PLATFORM=axon timeout 3600 python -m pytest \
      tests/test_pallas_on_tpu.py tests/test_composed_on_tpu.py -q -rA 2>&1
  echo "exit=$?"
} | tee "AXON_SUITE_r${R}.txt"

{
  echo "== bench $(date -u +%FT%TZ) =="
  timeout 3600 python bench.py 2>&1
  echo "exit=$?"
} | tee "BENCH_LOCAL_r${R}.txt"
