#!/usr/bin/env bash
# Train the flagship on all 20 TouchClothing garments, garment-parallel over
# the TPU mesh (reference: experiments/SingleG_AllMaterials_baseline_ours_launcher.py
# fanned 20 tmux panes over GPUs).
set -euo pipefail
METHOD="${1:-ours}"
shift || true
exec python -m vts_tpu.launch "$METHOD" launch --mode fleet "$@"
