#!/usr/bin/env bash
# Roll up per-material eval_metrics.pkl into one table
# (reference scripts/compile_eval_metrics_sinskitG.sh).
set -euo pipefail
exec python -m vts_tpu.utils.compile_metrics \
  --method-pattern '{material}_sinskitG_baseline_ours' --phase test --epoch best "$@"
