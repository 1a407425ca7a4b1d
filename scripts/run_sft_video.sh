#!/usr/bin/env bash
# SFT cold-start on STGR-CoT-30k (CLI contract mirrors the reference
# src/scripts/run_sft_video.sh; torchrun/DeepSpeed replaced by the JAX mesh —
# one process drives all local TPU chips via fsdp sharding).
set -euo pipefail

export WANDB_MODE=${WANDB_MODE:-offline}
export DEBUG_MODE=${DEBUG_MODE:-false}

DATA_ROOT=${DATA_ROOT:?set DATA_ROOT to the dataset root}
MODEL_PATH=${MODEL_PATH:?set MODEL_PATH to Qwen2.5-VL-7B-Instruct}
DATASET=${DATASET:-${DATA_ROOT}/annotations/STGR-CoT-30k.json}
OUTPUT_DIR=${OUTPUT_DIR:-./checkpoints/sft_video}

python -m open_o3_video_tpu.train.sft_main \
    --model_name_or_path "${MODEL_PATH}" \
    --dataset_name "${DATASET}" \
    --data_root "${DATA_ROOT}" \
    --output_dir "${OUTPUT_DIR}" \
    --learning_rate 1e-6 \
    --num_train_epochs 1 \
    --save_steps 500 \
    --logging_steps 1 \
    --gradient_checkpointing \
    --bf16 \
    --report_to "${REPORT_TO:-wandb}" \
    "$@"
