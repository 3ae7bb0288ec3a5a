#!/bin/bash
# Round-5 anneal-arm chip queue.
#
# 1. Resize-fix A/B: crop-768/batch-4 bench with the one-matmul-per-axis
#    resize_mm (e9bbba6). The D3-phase trace pinned the old W-pass dot at
#    22.0 ms/step; prior bench 16.05 samples/s -> expect ~17+ if it lands.
# 2. The 405-epoch ANNEAL arm: phase 1 = crop-768/batch-4 no-remat (the
#    demoted fast lane, tactile-equivalent), switch at epoch 300 to the
#    parity-exact optimum (full-canvas, batch 2, G-remat on, LPIPS taps
#    resident). Tests whether a full-canvas tail recovers the ~13 dB image
#    PSNR gap the schedule A/B measured — i.e. whether the fast lane can be
#    promoted back to production via annealing.
# 3. Summary + best-checkpoint vts_tpu.test round-trip.
set -u
cd /root/repo
log() { echo "$(date -u +%m-%d\ %H:%M:%S) $*" >> runs/anneal_status.txt; }
DATAROOT="synthetic://learncheck?size=1800"
CK=/root/repo/runs/ck
RS=/root/repo/runs/rs

log "anneal queue start (pid $$)"

VTS_BENCH_LPIPSCROP=768 VTS_BENCH_BATCH=4 VTS_BENCH_REMAT=off \
  VTS_BENCH_LPIPSREMAT=off timeout 2400 python bench.py \
  > runs/bench_crop768_b4_resizefix.log 2>&1
log "resize-fix crop768 b4 bench rc=$? ($(grep -o '{.*}' runs/bench_crop768_b4_resizefix.log | tail -1))"

rm -rf "$CK/sched_anneal" "$RS/sched_anneal"
timeout 14400 python -m vts_tpu.train --model sinskit --name sched_anneal \
  --dataroot "$DATAROOT" --data_len 100 --cache_data_device \
  --dtype bfloat16 --batch_size 4 --lpips_crop 768 \
  --remat_g off --lpips_remat off \
  --anneal_epoch 300 \
  --anneal_set "lpips_crop=0,batch_size=2,remat_g=on,lpips_remat=off" \
  --print_freq 1000 --display_freq 5000 --save_latest_freq 5000 \
  --checkpoints_dir "$CK" --results_dir "$RS" \
  > runs/sched_anneal.log 2>&1
log "sched_anneal finished rc=$? (log tail: $(tail -2 runs/sched_anneal.log | head -1))"

python scripts/summarize_run.py runs/sched_anneal.log > runs/sched_anneal.summary.md 2>&1
log "anneal summary rc=$?"

timeout 3600 python -m vts_tpu.test --model sinskit --name sched_anneal --epoch best \
  --dataroot "$DATAROOT" --data_len 4 --num_test 4 --dtype bfloat16 \
  --checkpoints_dir "$CK" --results_dir "$RS" > runs/sched_anneal.test.log 2>&1
log "anneal best-checkpoint test round-trip rc=$?"

log "anneal queue done"
