#!/usr/bin/env bash
# data_len=3 proof-of-concept run (the reference README's smoke convention).
set -euo pipefail
exec python -m vts_tpu.train --model sinskit --name smoke \
  --dataroot "synthetic://smoke?size=1800" --data_len 3 \
  --n_epochs 1 --n_epochs_decay 1 --print_freq 1 "$@"
