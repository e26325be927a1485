#!/bin/bash
# Round-3 measurements that were blocked by the TPU-worker outage on
# 2026-08-20 (the tunneled worker died mid-session; see PARITY.md "Yelp
# scale" notes). Run top-to-bottom on a healthy chip — each step is
# independent and writes to stdout; total ~30-45 min including compiles.
# RULES for this environment: run ONE job at a time (contention measured
# 28x distortion), never kill a client mid-compile, and let the persistent
# compile cache (/tmp/recbole_tpu_xla_cache) do its job on reruns.
set -x
cd "$(dirname "$0")/.."

# 1. LightGCN@Yelp: restricted step (2 full applies) vs classic (4) —
#    the verdict-#1 headline. Target <59.9ms/step (= reference 67.9 s/ep
#    at batch 2048); cost model predicts 45-55ms.
timeout 3000 python -u scripts/bench_graph_prop.py step fullstep hybrid

# 2. MFU / HBM-utilization columns for PARITY.md's throughput tables
#    (one representative model per family; add more as time allows).
timeout 3000 python -u scripts/bench_models.py BPR LightGCN SASRec GRU4Rec \
    BERT4Rec NARM DeepFM FM NeuMF

# 3. NeuMF Yelp eval with the round-3 bf16 auto-chunked fallback
#    (verdict #5: target <=190s vs round-2's 380.6s; run with
#    eval_score_dtype=bfloat16).
timeout 3000 python -u scripts/bench_scale.py --dataset yelp NeuMF LightGCN

# 4. Criteo CTR with true lazy sparse_adam (landed round 3, a865122) vs
#    dense adam — fills the verdict-#3b A/B.
timeout 3000 python -u scripts/bench_ctr.py FM DeepFM

# 5. Re-run the driver bench for the two headline JSON lines.
timeout 3000 python -u bench.py
