#!/usr/bin/env bash
# GSPO RL on STGR-RL-36k (CLI contract mirrors the reference
# src/scripts/run_grpo_video.sh: max_prompt_length 16384, completion 768,
# beta 0.04, grad-norm 5, 4 generations; ZeRO-3 -> fsdp mesh axis).
set -euo pipefail

export WANDB_MODE=${WANDB_MODE:-offline}
export DECORD_EOF_RETRY_MAX=${DECORD_EOF_RETRY_MAX:-20480}

DATA_ROOT=${DATA_ROOT:?set DATA_ROOT to the dataset root}
MODEL_PATH=${MODEL_PATH:?set MODEL_PATH to the SFT checkpoint}
DATASET=${DATASET:-${DATA_ROOT}/annotations/STGR-RL-36k.json}
OUTPUT_DIR=${OUTPUT_DIR:-./checkpoints/gspo_video}

python -m open_o3_video_tpu.train.grpo_main \
    --model_name_or_path "${MODEL_PATH}" \
    --dataset_name "${DATASET}" \
    --data_root "${DATA_ROOT}" \
    --output_dir "${OUTPUT_DIR}" \
    --max_prompt_length 16384 \
    --max_completion_length 768 \
    --num_generations 4 \
    --beta 0.04 \
    --max_grad_norm 5 \
    --learning_rate 1e-6 \
    --max_pixels 401408 \
    --save_steps 500 \
    --logging_steps 1 \
    --report_to "${REPORT_TO:-wandb}" \
    "$@"
