#!/bin/bash
# Round-5 chip work queue (one real chip → strictly serial).
#
# Launched detached (setsid/nohup) so it survives the interactive session:
#   setsid nohup bash scripts/round5_queue.sh > runs/queue.log 2>&1 &
#   echo $! > /tmp/round5_queue.pid
#
# Sequence (VERDICT r4 items 1,2,3,4,6):
#   wait for sched_prod (405-epoch production arm, pid file /tmp/sched_prod.pid)
#   -> summarize + best-checkpoint round-trip through vts_tpu.test
#   -> relaunch sched_ctrl (405-epoch parity control; the first attempt died
#      with its parent session at epoch 14) and wait for it
#   -> summarize + round-trip ctrl
#   -> skitG parity re-bench (num_layer_style_code=1 default)
#   -> batch-4 crop-768 production-step device trace
#   -> isolated LPIPS block probe (parity-lane ceiling evidence)
#   -> 12-epoch crop-512 learncheck (quality characterization like r4's 768)
# Breadcrumbs land in runs/queue_status.txt after every step.
set -u
cd /root/repo
Q=runs/queue_status.txt
note() { echo "$(date '+%m-%d %H:%M:%S') $*" >> "$Q"; }

DATAROOT="synthetic://learncheck?size=1800"
CK=/root/repo/runs/ck
RS=/root/repo/runs/rs

wait_pid() {  # $1 pid
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
}

note "queue start (pid $$)"

# ---- 0. wait for the production arm --------------------------------------
if [ -f /tmp/sched_prod.pid ] && kill -0 "$(cat /tmp/sched_prod.pid)" 2>/dev/null; then
  note "waiting on sched_prod pid $(cat /tmp/sched_prod.pid)"
  wait_pid "$(cat /tmp/sched_prod.pid)"
fi
note "sched_prod finished (log tail: $(tail -2 runs/sched_prod.log | head -1))"

python scripts/summarize_run.py runs/sched_prod.log > runs/sched_prod.summary.md 2>&1
note "prod summary rc=$?"

timeout 3600 python -m vts_tpu.test --model sinskit --name sched_prod --epoch best \
  --dataroot "$DATAROOT" --data_len 4 --num_test 4 --dtype bfloat16 \
  --checkpoints_dir "$CK" --results_dir "$RS" > runs/sched_prod.test.log 2>&1
note "prod best-checkpoint test round-trip rc=$?"

# ---- 1. relaunch + wait for the parity control arm ------------------------
mv -f runs/sched_ctrl.log runs/sched_ctrl.dead_r5a.log 2>/dev/null
rm -rf "$CK/sched_ctrl" "$RS/sched_ctrl"
nohup python -m vts_tpu.train --model sinskit --name sched_ctrl \
  --dataroot "$DATAROOT" --data_len 100 \
  --dtype bfloat16 --device_sample_cache true \
  --print_freq 1000 --display_freq 5000 --save_latest_freq 5000 \
  --checkpoints_dir "$CK" --results_dir "$RS" \
  > runs/sched_ctrl.log 2>&1 &
CTRL_PID=$!
echo "$CTRL_PID" > /tmp/sched_ctrl.pid
note "sched_ctrl relaunched pid $CTRL_PID"
wait_pid "$CTRL_PID"
note "sched_ctrl finished (log tail: $(tail -2 runs/sched_ctrl.log | head -1))"

python scripts/summarize_run.py runs/sched_ctrl.log > runs/sched_ctrl.summary.md 2>&1
note "ctrl summary rc=$?"

timeout 3600 python -m vts_tpu.test --model sinskit --name sched_ctrl --epoch best \
  --dataroot "$DATAROOT" --data_len 4 --num_test 4 --dtype bfloat16 \
  --checkpoints_dir "$CK" --results_dir "$RS" > runs/sched_ctrl.test.log 2>&1
note "ctrl best-checkpoint test round-trip rc=$?"

# ---- 2. skitG parity re-bench (VERDICT item 3) ----------------------------
VTS_BENCH_MODEL=skit timeout 3600 python bench.py \
  > runs/bench_skit_parity.log 2>&1
note "skitG parity bench rc=$? ($(grep -o '{.*}' runs/bench_skit_parity.log | tail -1))"

# ---- 3. batch-4 crop-768 production-step trace (VERDICT item 2) -----------
VTS_PROF_ABLATE="" VTS_PROF_CROP=768 VTS_PROF_BATCH=4 \
  VTS_PROF_REMAT=off VTS_PROF_LPIPSREMAT=off VTS_PROF_EPOCH=101 \
  VTS_PROF_SCAN=10 VTS_PROF_TOP=40 VTS_PROF_DIR=/tmp/vts_prof_b4 \
  timeout 3600 python scripts/profile_step.py > runs/prof_b4_crop768.log 2>&1
note "batch-4 trace rc=$?"

# ---- 4. isolated LPIPS block probe (VERDICT item 4) ------------------------
timeout 3600 python scripts/bench_lpips_blocks.py > runs/lpips_blocks.log 2>&1
note "lpips block probe rc=$?"

# ---- 5. 12-epoch crop-512 learncheck (VERDICT item 6) ----------------------
timeout 3600 python -m vts_tpu.train --model sinskit --name lc512 \
  --dataroot "$DATAROOT" --data_len 100 --cache_data_device \
  --dtype bfloat16 --batch_size 4 --lpips_crop 512 \
  --remat_g off --lpips_remat off \
  --n_epochs 5 --n_epochs_decay 7 \
  --print_freq 1000 --display_freq 5000 --save_latest_freq 5000 \
  --checkpoints_dir "$CK" --results_dir "$RS" > runs/lc512.log 2>&1
note "crop-512 learncheck rc=$?"
python scripts/summarize_run.py runs/lc512.log 1,2,4,6,8,10,12 \
  > runs/lc512.summary.md 2>&1

note "queue done"
