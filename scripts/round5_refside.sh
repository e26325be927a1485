#!/bin/bash
# Round-5 reference-side CPU jobs (VERDICT task 2), serialized on the one
# host CPU, nice'd so builder work preempts them.
#
# Order: the two GRU4Rec uni1000-valid seeds first (they complete in ~3-4h
# and make the "every seed ahead" claim 3-vs-3 symmetric), then the SASRec
# 50-epoch seq-protocol seed 2020 (the missing reference side of the SASRec
# head-to-head; its per-epoch valid trajectory lands in ./log/ so a partial
# run is still evidence).
set -x
cd "$(dirname "$0")/.."
mkdir -p docs/evidence

for seed in 2021 2022; do
  nice -n 15 python -u scripts/parity_head2head.py \
      --model=GRU4Rec --preset=seq --epochs=25 --side=ref --seeds=$seed \
      >> docs/evidence/h2h_gru4rec_ref_seeds_r5.jsonl 2>> /tmp/r5_refside.err
done

nice -n 15 python -u scripts/parity_head2head.py \
    --model=SASRec --preset=seq --epochs=50 --side=ref --seeds=2020 \
    >> docs/evidence/h2h_sasrec_ref_r5.jsonl 2>> /tmp/r5_refside.err
