#!/usr/bin/env bash
# Multi-dataset launcher -- parity with the reference slurmjob.sh:
# train + eval each dataset through run_pipeline.py. Works standalone or
# under SLURM (sbatch scripts/run_all.sh).
#SBATCH --job-name=zero-tig-tpu
#SBATCH --time=24:00:00
set -euo pipefail

BASE_DATA_DIR="${BASE_DATA_DIR:-/data}"
EPOCHS="${EPOCHS:-5}"
DATASETS="${DATASETS:-RLV DID_1080 3_SDSD}"
PRETRAIN="${PRETRAIN:-}"
RAFT_WEIGHTS="${RAFT_WEIGHTS:-}"

cd "$(dirname "$0")/.."
ARGS=(--datasets $DATASETS --base_data_dir "$BASE_DATA_DIR" --epochs "$EPOCHS")
[ -n "$PRETRAIN" ] && ARGS+=(--model_pretrain "$PRETRAIN")
[ -n "$RAFT_WEIGHTS" ] && ARGS+=(--raft_weights "$RAFT_WEIGHTS")
exec python run_pipeline.py "${ARGS[@]}"
