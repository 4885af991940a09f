#!/bin/bash
# Round-5 at-scale evidence queue, phase 2 — after the lookup-tile fix and
# the link-task generator swap (SBM -> latent dot-product graph).
# Serial (one TPU process at a time); timeouts guard tunnel hangs.
cd "$(dirname "$0")/.." || exit 1
set -x

timeout -k 30 1200 python tools/inductive_experiment.py --bench \
  > results/inductive_bench_r5.log 2>&1
timeout -k 30 4500 python tools/link_experiment.py --arms both \
  --exact-epochs 120 --segment-dir results/seg_link_r5 \
  > results/link_parity_r5.log 2>&1
timeout -k 30 3600 python tools/inductive_experiment.py --arms both \
  --exact-epochs 120 --segment-dir results/seg_ind_r5 \
  > results/inductive_parity_r5.log 2>&1
timeout -k 30 900 python tools/link_experiment.py --bench \
  > results/link_bench_r5.log 2>&1
timeout -k 30 3600 python tools/bench_sweep.py --reps 2 \
  > results/bench_sweep_r5.md 2> results/bench_sweep_r5.err
echo QUEUE_DONE
