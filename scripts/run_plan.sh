#!/usr/bin/env bash
# Fan out the paper's run plan (reference run_plan.sh equivalent).
# On TPU the run plan is sequential on one host — each k-fold run owns the
# whole chip/slice (SPMD inside the run via `spmd: true`), instead of the
# reference's one-process-per-GPU CUDA_VISIBLE_DEVICES fan-out.
set -euo pipefail
DATASETS=${DATASETS:-"blca brca ucec kirp"}
CONFIG=${CONFIG:-config/main.yml}
for ds in $DATASETS; do
    echo "=== run_plan: $ds ==="
    python -m healnet_tpu.cli.main --config_path "$CONFIG" --mode run_plan --dataset "$ds" \
        || echo "run_plan $ds failed; continuing"
done
