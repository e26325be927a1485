#!/bin/bash
# Round-6 pickup list: what round 5 finished, and the measurements/work
# it could not. (Round-5 status of the round-4 VERDICT tasks: 1 kernel
# SHIPPED — layer2, SASRec 3.6x; 2 partially — see below; 3 FM 1.7x with
# the adam-sweep floor documented; 4 DONE — Yelp seq rows 3.7x; 5
# RippleNet 2.2x with anatomy; 6/7/9/10 DONE; 8 DONE — bench.py stable
# within 2%.)
set -x
cd "$(dirname "$0")/.."

# 1. SASRec reference-side seq protocol (the one missing head-to-head
#    side). Round 5 ran it from ~14:35 UTC on the single CPU core; at
#    ~11 min/epoch (train ~180-250 s + uni1000 valid ~360 s under load)
#    a 50-epoch seed needs ~9 h. If the round-5 run was cut short, its
#    partial valid trajectory is in log/SASRec-*.log and summarized in
#    docs/evidence/h2h_sasrec_ref_r5_partial.json; resume with:
# RECBOLE_H2H_PLATFORM=cpu nice -n 15 python -u scripts/parity_head2head.py \
#     --model=SASRec --preset=seq --epochs=50 --side=ref --seeds=2020
#    NOTE: the fork's full-sort TEST eval OOMs >128GB on this box (3x
#    dmesg-confirmed); the valid trajectory is the comparable artifact.

# 2. 2-host scaling when a second host exists (BASELINE >=80% efficiency).
if [ -n "$RECBOLE_MULTIHOST_COORD" ]; then
    timeout 3000 python -u scripts/bench_multihost.py \
        --coordinator="$RECBOLE_MULTIHOST_COORD"
fi

# 3. Re-verify the headline lines at round-6 HEAD.
timeout 3000 python -u bench.py

# Parked engineering (measured-loss notes in the respective docstrings):
#  - trm_layer residual-saving backward: measured net-neutral (4.597 vs
#    4.584 ms) — only worth revisiting if the kernel's true binder is
#    found and removed first (per-block issue overhead? profile Mosaic).
#  - Pallas adam sweep: all 3 block layouts measured slower than the XLA
#    3-pass expression (ops/fused_adam.py docstring) — an 11-column table
#    has no copy-free fat-2D view. A (V, 16)-padded param layout would
#    unlock it (pads cols 11-15), at the cost of 45% more table bytes.
#  - SASRec >=5x (currently 3.6x, step 10.1 ms): remaining anatomy is
#    bwd kernel 2.46 ms/layer, embedding-grad while-loop 0.89 ms, CE
#    chain ~1.4 ms. The kernel is NOT bound by recompute, saves, or
#    block size (all swept); suspect per-block fixed costs x 64 blocks.
#  - GCSAN eval 0.4x stays dispatch-bound (63.5 ms wall = 23 device +
#    40 tunnel; scripts/trace_eval_floor.py) vs a reference outlier 0.02s.
