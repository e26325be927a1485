#!/bin/bash
# Round-4 phase 2: kernel validations + sequential-step anatomy, run AFTER
# round4_tpu_followup.sh completes. Serialized, one TPU process at a time.
set -x
cd "$(dirname "$0")/.."

# 0. Tiny-shape probe of the new Pallas bit kernels — the Yelp LightGCN
#    bench crashed the worker; bisect kernel-fault vs consts-OOM FIRST.
timeout 1200 python -u scripts/debug_bit_kernels.py

# 1. Where does the SASRec 11.7ms step actually go?
timeout 2400 python -u scripts/bench_seq_anatomy.py 2048 50

# 2. Embedding-grad strategies at sequential shape (scatter vs segsum vs
#    one-hot MXU kernel).
timeout 2400 python -u scripts/bench_embed_grad.py

# 2b. Criteo CTR step decomposition (scatter vs towers vs adam sweep).
timeout 2400 python -u scripts/bench_ctr_anatomy.py

# 3. Pallas bit kernels: micro ops + full restricted LightGCN step
#    (Yelp-scale consts are generated on-device; watch for worker crash).
timeout 3000 python -u scripts/bench_bit_kernels.py micro
timeout 3000 python -u scripts/bench_bit_kernels.py step

# 3b. Driver bench with the post-A/B defaults (plain-scatter CTR backward).
timeout 3000 python -u bench.py

# 4. Optional 2-host scaling (needs a second host; no-op otherwise).
if [ -n "$RECBOLE_MULTIHOST_COORD" ]; then
    timeout 3000 python -u scripts/bench_multihost.py \
        --coordinator="$RECBOLE_MULTIHOST_COORD"
fi
