#!/bin/bash
# Round-5 pickup list: measurements/work round 4 could not finish.
# Run serialized on the TPU; CPU jobs are single-core-bound — plan hours.
set -x
cd "$(dirname "$0")/.."

# 1. SASRec 3-seed head-to-head — TPU side DONE (all 3 seeds measured
#    2026-08-21, docs/evidence/h2h_sasrec_tpu.jsonl; GRU4Rec
#    uni1000-valid cell also measured, ours ahead). Only the reference
#    side remains, and it needs ~2.5h CPU per 50-epoch seed on this box
#    (round-4 measured ~180-400 s/epoch torch-CPU under load).
#    RECBOLE_H2H_PLATFORM=cpu keeps our side off the TPU.
# RECBOLE_H2H_PLATFORM=cpu python -u scripts/parity_head2head.py \
#     --model=SASRec --preset=seq --side=ref

# 2. 2-host scaling when a second host exists (BASELINE >=80% efficiency).
if [ -n "$RECBOLE_MULTIHOST_COORD" ]; then
    timeout 3000 python -u scripts/bench_multihost.py \
        --coordinator="$RECBOLE_MULTIHOST_COORD"
fi

# 3. Re-verify the headline lines at round-5 HEAD.
timeout 3000 python -u bench.py

# Parked engineering (see docstrings):
#  - ops/embed_grad.windowed_grad: DMA-chunked redesign (full-R VMEM
#    residency lane-pads (R,10)->(R,128)); would serve single-field
#    mega-vocab tables that grouped_take_rows cannot split.
#  - Sequential >=5x: the remaining gap is XLA layout copies around the
#    (B,H,L,L) attention tensors (PARITY.md round-4 analysis) — a
#    from-scratch bf16 whole-layer Pallas kernel with custom VJP is the
#    only untried lever; previous fused kernels measured slower.
