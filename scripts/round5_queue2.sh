#!/bin/bash
# Round-5 chip queue, phase 2 — runs after round5_queue.sh writes its
# "queue done" breadcrumb (launch detached; polls the status file).
#
#   setsid nohup bash scripts/round5_queue2.sh > runs/queue2.log 2>&1 &
#
# Steps (VERDICT r4 item 6 composed-speed rows + headline re-confirmation,
# then the CPU validation lane once the chip is idle):
#   1. crop-512 composed batch sweep: batch 4 and 8, no-remat
#   2. parity-exact batch-2 quadrant re-confirmation (7.23 samples/s in r4)
#   3. fast pytest lane (CPU, 8-dev virtual mesh)
#   4. __graft_entry__ dryrun (CPU mesh)
set -u
cd /root/repo
Q=runs/queue_status.txt
note() { echo "$(date '+%m-%d %H:%M:%S') [q2] $*" >> "$Q"; }

note "phase-2 queue start (pid $$); waiting for 'queue done'"
while ! grep -q "^.* queue done$" "$Q" 2>/dev/null; do sleep 120; done
note "phase 1 drained; starting composed crop-512 benches"

VTS_BENCH_LPIPSCROP=512 VTS_BENCH_BATCH=4 VTS_BENCH_REMAT=off \
  VTS_BENCH_LPIPSREMAT=off timeout 3600 python bench.py \
  > runs/bench_crop512_b4.log 2>&1
note "crop512 batch4 rc=$? ($(grep -o '{.*}' runs/bench_crop512_b4.log | tail -1))"

VTS_BENCH_LPIPSCROP=512 VTS_BENCH_BATCH=8 VTS_BENCH_REMAT=off \
  VTS_BENCH_LPIPSREMAT=off timeout 3600 python bench.py \
  > runs/bench_crop512_b8.log 2>&1
note "crop512 batch8 rc=$? ($(grep -o '{.*}' runs/bench_crop512_b8.log | tail -1))"

VTS_BENCH_BATCH=2 VTS_BENCH_REMAT=on VTS_BENCH_LPIPSREMAT=off \
  timeout 3600 python bench.py > runs/bench_parity_b2.log 2>&1
note "parity batch2 rc=$? ($(grep -o '{.*}' runs/bench_parity_b2.log | tail -1))"

note "chip work drained; running CPU validation lane"
timeout 2400 python -m pytest tests/ -q -m "not slow" \
  > runs/pytest_fast.log 2>&1
note "pytest fast lane rc=$? ($(tail -1 runs/pytest_fast.log))"

timeout 2400 python __graft_entry__.py > runs/dryrun.log 2>&1
note "dryrun rc=$? ($(tail -1 runs/dryrun.log))"

note "phase-2 queue done"
