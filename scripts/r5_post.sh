#!/bin/bash
# Round-5 post-anneal chip queue.
#
# The Pallas conv kernel MEASURED SLOWER in isolation (c12p 11.2 ms vs XLA
# 9.07; b2p 12.9 vs 11.0) so its full-step A/B is moot — the flag ships as
# a measured refutation.  The step A/Bs below instead measure the
# folded-cotangent entry-conv backward (swapped into the default fold-w
# path by the time this runs) on the two headline configs.
set -u
cd /root/repo
log() { echo "$(date -u +%m-%d\ %H:%M:%S) $*" >> runs/post_status.txt; }

while ! grep -q "anneal queue done" runs/anneal_status.txt 2>/dev/null; do
  sleep 60
done
log "post queue start (pid $$)"

# parity-exact optimum (batch 2, G-remat, LPIPS taps resident): 7.22-7.23
# samples/s before the entry-bwd swap — the driver-scored headline config
VTS_BENCH_BATCH=2 VTS_BENCH_REMAT=on VTS_BENCH_LPIPSREMAT=off \
  timeout 2400 python bench.py > runs/bench_parity_entrybwd.log 2>&1
log "parity entry-bwd bench rc=$? ($(grep -o '{.*}' runs/bench_parity_entrybwd.log | tail -1))"

# fast lane (crop-768 batch-4): 15.86-16.05 before the swap
VTS_BENCH_LPIPSCROP=768 VTS_BENCH_BATCH=4 VTS_BENCH_REMAT=off \
  VTS_BENCH_LPIPSREMAT=off timeout 2400 python bench.py \
  > runs/bench_crop768_b4_entrybwd.log 2>&1
log "crop768 b4 entry-bwd bench rc=$? ($(grep -o '{.*}' runs/bench_crop768_b4_entrybwd.log | tail -1))"

log "post queue done"
