#!/bin/bash
# Round-5 follow-up chip queue (runs after scripts/r5_resize_ab.sh exits).
#
# 1. Re-run the crop-768 batch-4 bench: the 08:02 A/B arm measured its
#    epoch-1 (warmup, no-D3) chunk at 21 s/step — an executable that cannot
#    contain the resize change (CLIP is not in the warmup graph) and whose
#    train-path twin ran at ~250 ms/step for 100 epochs inside the
#    sched_prod arm.  Warm persistent cache -> same executable;
#    reproducibility test.
# 2. Trace that epoch-1 chunk (VTS_PROF_EPOCH=1) to attribute the 21 s.
# 3. LPIPS isolated block probe (VERDICT r4 item 4) — the 06:49 attempt was
#    interrupted; generous timeout this time.
# 4. crop-512 batch-8 bench retry (06:47 attempt hit the 1200 s timeout
#    during compile).
cd /root/repo
log() { echo "$(date -u +%m-%d\ %H:%M:%S) $*" >> runs/followup_status.txt; }

# wait for the resize A/B to drain (status file gets a final "done" line)
while ! grep -q "resize A/B done" runs/resize_ab_status.txt 2>/dev/null; do
  sleep 30
done
log "follow-up start (pid $$)"

VTS_BENCH_LPIPSCROP=768 VTS_BENCH_BATCH=4 VTS_BENCH_REMAT=off \
  VTS_BENCH_LPIPSREMAT=off timeout 2400 python bench.py \
  > runs/bench_crop768_b4_rerun.log 2>&1
log "crop768 b4 rerun rc=$? ($(grep -o '{.*}' runs/bench_crop768_b4_rerun.log | tail -1))"

VTS_PROF_ABLATE="" VTS_PROF_CROP=768 VTS_PROF_BATCH=4 \
  VTS_PROF_REMAT=off VTS_PROF_LPIPSREMAT=off VTS_PROF_EPOCH=1 \
  VTS_PROF_SCAN=10 VTS_PROF_TOP=40 VTS_PROF_DIR=/tmp/vts_prof_b4e1 \
  timeout 1800 python scripts/profile_step.py > runs/prof_b4_crop768_e1.log 2>&1
log "epoch-1 trace rc=$?"

timeout 2400 python scripts/bench_lpips_blocks.py > runs/lpips_blocks.log 2>&1
log "lpips block probe rc=$?"

VTS_BENCH_LPIPSCROP=512 VTS_BENCH_BATCH=8 VTS_BENCH_REMAT=off \
  VTS_BENCH_LPIPSREMAT=off timeout 2400 python bench.py \
  > runs/bench_crop512_b8.log 2>&1
log "crop512 b8 rc=$? ($(grep -o '{.*}' runs/bench_crop512_b8.log | tail -1))"

log "follow-up done"
