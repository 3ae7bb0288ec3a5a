#!/bin/bash
# Round-5 late-session chip queue (runs after scripts/r5_followup.sh drains).
#
# 1. D3-phase trace of crop-768/batch-4 WITH the matmul resize (da19ce1):
#    the pre-resize trace (06:05) attributed 23.4 ms/step to the
#    jax.image.resize gathers at clip_vit.py:146, but the post-change bench
#    measured no wall win (16.02 -> 16.05) — this trace shows where the
#    23 ms actually went (eliminated-and-replaced vs misattributed).
# 2. Extended LPIPS block probe: b1 (folded block-1 as lpips runs it — pins
#    the block-1 share of `full` directly) and b2f (W-refolded block 2, the
#    one structural lever left for the sub-50%-MFU block; break-even needs
#    >=48% MFU on the lifted shapes).
cd /root/repo
log() { echo "$(date -u +%m-%d\ %H:%M:%S) $*" >> runs/next_status.txt; }

while ! grep -q "follow-up done" runs/followup_status.txt 2>/dev/null; do
  sleep 30
done
log "next queue start (pid $$)"

VTS_PROF_ABLATE="" VTS_PROF_CROP=768 VTS_PROF_BATCH=4 \
  VTS_PROF_REMAT=off VTS_PROF_LPIPSREMAT=off VTS_PROF_EPOCH=101 \
  VTS_PROF_SCAN=10 VTS_PROF_TOP=40 VTS_PROF_DIR=/tmp/vts_prof_b4d3mm \
  timeout 1800 python scripts/profile_step.py \
  > runs/prof_b4_crop768_d3_mmresize.log 2>&1
log "D3-phase mm-resize trace rc=$?"

VTS_LB_STAGES=b1,b1_fwd,b2f,b2f_fwd timeout 2400 \
  python scripts/bench_lpips_blocks.py > runs/lpips_blocks_b1_b2f.log 2>&1
log "b1/b2f probe rc=$?"

log "next queue done"
