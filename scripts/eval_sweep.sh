#!/usr/bin/env bash
# Sweep checkpoints through generative evaluation (reference scripts/eval.sh:
# checkpoints 50..59 -> evaluate_gen). Usage:
#   scripts/eval_sweep.sh CKPT_DIR PREFIX [FIRST LAST] [extra flags...]
set -euo pipefail
DIR=$1; PREFIX=$2; FIRST=${3:-50}; LAST=${4:-59}; shift $(( $# > 4 ? 4 : $# ))
for i in $(seq "$FIRST" "$LAST"); do
  echo "=== evaluating ${PREFIX}_${i}.ckpt ==="
  python -m gstx.cli.evaluate_gen -mode vd_eval_val \
    -start_path "${DIR}/${PREFIX}_${i}.ckpt" \
    -save_name "performance_${i}.txt" "$@"
done
