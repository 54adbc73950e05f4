#!/bin/bash
# Round-5 on-chip session F: each stage in its own process so an HBM OOM
# in one cannot poison the next (axon client state is per-process).
#   1. config[4] train-from-scratch proof (the committed VERDICT item 6
#      deliverable) — extended run; session D reached 29.98 dB at 3000
#      steps and was still climbing;
#   2. config[2] at bands=1 (may OOM — isolated process);
#   3. FULL pytest suite on the real chip (TPU_TESTS_r05 evidence).
set -u
cd /root/repo
export GVRT_TEST_TPU=1
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
LOG=artifacts/session_f
mkdir -p "$LOG"

echo "==== stage 1: train_scratch 7000 128 1200 ===="
timeout 2400 python scripts/train_scratch.py 7000 128 1200 \
    >"$LOG/train_scratch.log" 2>&1
echo "train_scratch rc=$? ($(date +%T))"
tail -4 "$LOG/train_scratch.log"

echo "==== stage 2: config2 span bands=1 ===="
timeout 2400 python scripts/config2_scale.py 5000000 1 \
    >"$LOG/config2_b1.log" 2>&1
echo "config2 bands=1 rc=$? ($(date +%T))"
tail -6 "$LOG/config2_b1.log"

echo "==== stage 3: full suite on chip ===="
timeout 5400 python -m pytest tests/ -q >"$LOG/pytest.log" 2>&1
echo "pytest rc=$? ($(date +%T))"
tail -3 "$LOG/pytest.log"
echo "==== session F done ===="
