#!/bin/bash
# Round-4 TPU measurement sweep (VERDICT r3 tasks 1, 4, 7). Serialized —
# ONE TPU process at a time, each under timeout, on-device consts only.
set -x
cd "$(dirname "$0")/.."

# 1. LightGCN@Yelp restricted step (2 full applies) vs classic vs hybrid.
#    Bar: <59.9 ms/step == beating the reference's 67.9 s/ep at batch 2048.
timeout 3000 python -u scripts/bench_graph_prop.py step fullstep hybrid

# 2. MFU / HBM-BW% columns, one model per family + the sequential set.
timeout 3600 python -u scripts/bench_models.py BPR LightGCN SASRec GRU4Rec \
    BERT4Rec NARM DeepFM FM NeuMF

# 3. NeuMF Yelp bf16 auto-chunked eval (target <=190 s vs 380.6 s).
timeout 3000 python -u scripts/bench_scale.py --dataset yelp NeuMF LightGCN

# 4. Criteo scatter A/B: {adam,sparse_adam} x {dedup,scatter} + HLO audit.
timeout 4500 python -u scripts/bench_ctr_ab.py FM DeepFM

# 5. Driver headline lines (DeepFM now 5 timed epochs).
timeout 3000 python -u bench.py
