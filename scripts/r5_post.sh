#!/bin/bash
# Round-5 post-anneal chip queue: the --lpips_conv pallas A/B on the two
# headline configs.  Runs only after the anneal arm has drained the chip.
set -u
cd /root/repo
log() { echo "$(date -u +%m-%d\ %H:%M:%S) $*" >> runs/post_status.txt; }

while ! grep -q "anneal queue done" runs/anneal_status.txt 2>/dev/null; do
  sleep 60
done
log "post queue start (pid $$)"

# parity-exact optimum (batch 2, G-remat, LPIPS taps resident): 7.22-7.23
# samples/s on XLA convs — the driver-scored headline config
VTS_BENCH_LPIPSCONV=pallas VTS_BENCH_BATCH=2 VTS_BENCH_REMAT=on \
  VTS_BENCH_LPIPSREMAT=off timeout 2400 python bench.py \
  > runs/bench_parity_pallasconv.log 2>&1
log "parity pallas-conv bench rc=$? ($(grep -o '{.*}' runs/bench_parity_pallasconv.log | tail -1))"

# fast lane (crop-768 batch-4): 15.86-16.05 on XLA convs
VTS_BENCH_LPIPSCONV=pallas VTS_BENCH_LPIPSCROP=768 VTS_BENCH_BATCH=4 \
  VTS_BENCH_REMAT=off VTS_BENCH_LPIPSREMAT=off timeout 2400 python bench.py \
  > runs/bench_crop768_b4_pallasconv.log 2>&1
log "crop768 b4 pallas-conv bench rc=$? ($(grep -o '{.*}' runs/bench_crop768_b4_pallasconv.log | tail -1))"

log "post queue done"
