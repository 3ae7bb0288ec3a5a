#!/bin/bash
# Round-5 chip work queue (one real chip → strictly serial), consolidated +
# DEADLINE-AWARE: the round ends ~03:49 UTC; every chip step checks the
# remaining budget first so nothing heavy is still running when the driver
# benches at round end.
#
# Launch detached so it survives the interactive session:
#   setsid nohup bash scripts/round5_queue.sh > runs/queue.log 2>&1 &
#
# Order (VERDICT r4 items 1,3,4,2,6):
#   wait sched_prod -> summarize + best-checkpoint vts_tpu.test round-trip
#   -> relaunch + wait sched_ctrl (405-epoch parity control) -> summarize+test
#   -> skitG parity re-bench -> LPIPS block probe -> batch-4 trace
#   -> crop-512 batch-4 bench -> 12-epoch crop-512 learncheck
#   -> crop-512 batch-8 bench -> fast pytest lane (CPU, deadline-exempt)
# Breadcrumbs land in runs/queue_status.txt after every step.
set -u
cd /root/repo
Q=runs/queue_status.txt
note() { echo "$(date '+%m-%d %H:%M:%S') $*" >> "$Q"; }

DEADLINE=${VTS_Q_DEADLINE:-1787210100}   # 2026-08-20 07:15 UTC (session end −40 min)
have_time() {  # $1 = estimated minutes for the step
  local need=$(( $1 * 60 ))
  local left=$(( DEADLINE - $(date +%s) ))
  if [ "$left" -lt "$need" ]; then
    note "SKIP (deadline): step '$2' needs ~$1 min, ${left}s left"
    return 1
  fi
  return 0
}

DATAROOT="synthetic://learncheck?size=1800"
CK=/root/repo/runs/ck
RS=/root/repo/runs/rs

wait_pid() { while kill -0 "$1" 2>/dev/null; do sleep 60; done; }

note "queue start (pid $$, deadline $(date -u -d @$DEADLINE '+%H:%M'))"

# ---- 0. launch-or-wait the production arm ---------------------------------
# Restart-safe: the 08-20 VM reboot killed the first prod run and wiped its
# logs, so the queue now owns the launch too.
if [ -f /tmp/sched_prod.pid ] && kill -0 "$(cat /tmp/sched_prod.pid)" 2>/dev/null; then
  note "waiting on sched_prod pid $(cat /tmp/sched_prod.pid)"
  wait_pid "$(cat /tmp/sched_prod.pid)"
elif ! grep -q "Training finished" runs/sched_prod.log 2>/dev/null; then
  if have_time 110 "sched_prod full schedule"; then
    rm -rf "$CK/sched_prod" "$RS/sched_prod"
    nohup python -m vts_tpu.train --model sinskit --name sched_prod \
      --dataroot "$DATAROOT" --data_len 100 --cache_data_device \
      --dtype bfloat16 --batch_size 4 --lpips_crop 768 \
      --remat_g off --lpips_remat off \
      --print_freq 1000 --display_freq 5000 --save_latest_freq 5000 \
      --checkpoints_dir "$CK" --results_dir "$RS" \
      > runs/sched_prod.log 2>&1 &
    PROD_PID=$!
    echo "$PROD_PID" > /tmp/sched_prod.pid
    note "sched_prod launched pid $PROD_PID"
    wait_pid "$PROD_PID"
  fi
fi
note "sched_prod finished (log tail: $(tail -2 runs/sched_prod.log | head -1))"

python scripts/summarize_run.py runs/sched_prod.log > runs/sched_prod.summary.md 2>&1
note "prod summary rc=$?"

timeout 3600 python -m vts_tpu.test --model sinskit --name sched_prod --epoch best \
  --dataroot "$DATAROOT" --data_len 4 --num_test 4 --dtype bfloat16 \
  --checkpoints_dir "$CK" --results_dir "$RS" > runs/sched_prod.test.log 2>&1
note "prod best-checkpoint test round-trip rc=$?"

# ---- 1. relaunch + wait for the parity control arm ------------------------
if have_time 150 "sched_ctrl full schedule"; then
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
fi

# ---- 2. skitG parity re-bench (VERDICT item 3) ----------------------------
if have_time 20 "skitG parity bench"; then
  VTS_BENCH_MODEL=skit timeout 1200 python bench.py \
    > runs/bench_skit_parity.log 2>&1
  note "skitG parity bench rc=$? ($(grep -o '{.*}' runs/bench_skit_parity.log | tail -1))"
fi

# ---- 3. batch-4 crop-768 production-step trace (VERDICT item 2) ------------
# cheap: sched_prod compiled this exact chunk graph → persistent-cache hit
if have_time 12 "batch-4 trace"; then
  VTS_PROF_ABLATE="" VTS_PROF_CROP=768 VTS_PROF_BATCH=4 \
    VTS_PROF_REMAT=off VTS_PROF_LPIPSREMAT=off VTS_PROF_EPOCH=101 \
    VTS_PROF_SCAN=10 VTS_PROF_TOP=40 VTS_PROF_DIR=/tmp/vts_prof_b4 \
    timeout 720 python scripts/profile_step.py > runs/prof_b4_crop768.log 2>&1
  note "batch-4 trace rc=$?"
fi

# ---- 4. isolated LPIPS block probe (VERDICT item 4) ------------------------
if have_time 14 "lpips block probe"; then
  timeout 840 python scripts/bench_lpips_blocks.py > runs/lpips_blocks.log 2>&1
  note "lpips block probe rc=$?"
fi

# ---- 5. crop-512 composed batch-4 bench (VERDICT item 6 / item 2 goal) ----
if have_time 20 "crop512 batch4 bench"; then
  VTS_BENCH_LPIPSCROP=512 VTS_BENCH_BATCH=4 VTS_BENCH_REMAT=off \
    VTS_BENCH_LPIPSREMAT=off timeout 1200 python bench.py \
    > runs/bench_crop512_b4.log 2>&1
  note "crop512 batch4 rc=$? ($(grep -o '{.*}' runs/bench_crop512_b4.log | tail -1))"
fi

# ---- 6. 12-epoch crop-512 learncheck (VERDICT item 6) ----------------------
if have_time 25 "crop-512 learncheck"; then
  timeout 1800 python -m vts_tpu.train --model sinskit --name lc512 \
    --dataroot "$DATAROOT" --data_len 100 --cache_data_device \
    --dtype bfloat16 --batch_size 4 --lpips_crop 512 \
    --remat_g off --lpips_remat off \
    --n_epochs 5 --n_epochs_decay 7 \
    --print_freq 1000 --display_freq 5000 --save_latest_freq 5000 \
    --checkpoints_dir "$CK" --results_dir "$RS" > runs/lc512.log 2>&1
  note "crop-512 learncheck rc=$?"
  python scripts/summarize_run.py runs/lc512.log 1,2,4,6,8,10,12 \
    > runs/lc512.summary.md 2>&1
fi

# ---- 7. crop-512 batch-8 bench (may OOM; tolerated) ------------------------
if have_time 18 "crop512 batch8 bench"; then
  VTS_BENCH_LPIPSCROP=512 VTS_BENCH_BATCH=8 VTS_BENCH_REMAT=off \
    VTS_BENCH_LPIPSREMAT=off timeout 1080 python bench.py \
    > runs/bench_crop512_b8.log 2>&1
  note "crop512 batch8 rc=$? ($(grep -o '{.*}' runs/bench_crop512_b8.log | tail -1))"
fi

note "chip work drained; running CPU validation lane"
timeout 2400 python -m pytest tests/ -q -m "not slow" \
  > runs/pytest_fast.log 2>&1
note "pytest fast lane rc=$? ($(tail -1 runs/pytest_fast.log))"

note "queue done"
