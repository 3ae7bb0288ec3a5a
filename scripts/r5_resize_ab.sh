#!/bin/bash
# Round-5 A/B: matmul-form D3 resize (commit da19ce1) vs the recorded
# pre-change numbers (parity 7.226 samples/s, crop768 b4 16.02, crop512 b4 20.10).
cd /root/repo
log() { echo "$(date -u +%m-%d\ %H:%M:%S) $*" >> runs/resize_ab_status.txt; }
log "resize A/B start (pid $$)"
timeout 2400 python bench.py > runs/bench_parity_mmresize.log 2>&1
log "parity bench rc=$? ($(grep -o '{.*}' runs/bench_parity_mmresize.log | tail -1))"
VTS_BENCH_LPIPSCROP=768 VTS_BENCH_BATCH=4 VTS_BENCH_REMAT=off VTS_BENCH_LPIPSREMAT=off \
  timeout 2400 python bench.py > runs/bench_crop768_b4_mmresize.log 2>&1
log "crop768 b4 rc=$? ($(grep -o '{.*}' runs/bench_crop768_b4_mmresize.log | tail -1))"
VTS_BENCH_LPIPSCROP=512 VTS_BENCH_BATCH=4 VTS_BENCH_REMAT=off VTS_BENCH_LPIPSREMAT=off \
  timeout 2400 python bench.py > runs/bench_crop512_b4_mmresize.log 2>&1
log "crop512 b4 rc=$? ($(grep -o '{.*}' runs/bench_crop512_b4_mmresize.log | tail -1))"
log "resize A/B done"
