#!/usr/bin/env bash
# Full evaluation suite (CLI contract mirrors the reference eval/scripts/eval_all.sh:
# V-STAR inference then the Qwen2.5-72B judge; other benchmarks available below).
set -euo pipefail

MODEL_PATH=${MODEL_PATH:?set MODEL_PATH to the evaluated checkpoint}
JUDGE_PATH=${JUDGE_PATH:-/path/to/Qwen2.5-72B-Instruct}
DATA_DIR=${DATA_DIR:?set DATA_DIR to the benchmark data root}
OUT_DIR=${OUT_DIR:-./eval_results}
mkdir -p "${OUT_DIR}"

# ---- V-STAR: inference then LLM-judge scoring -------------------------------
python -m open_o3_video_tpu.eval.cli vstar \
    --model_path "${MODEL_PATH}" \
    --anno "${DATA_DIR}/vstar/annotations.json" \
    --video_folder "${DATA_DIR}/vstar/videos" \
    --output "${OUT_DIR}/vstar_results.json" \
    --item_batch "${ITEM_BATCH:-4}"

# int8 judge: ~72 GB sharded over tensor=JUDGE_TP fits a v5e-8 (bf16's
# 144 GB cannot; the reference needs 4x80GB GPUs, eval_vstar.py:20-24).
python -m open_o3_video_tpu.eval.cli vstar-judge \
    --model_path "${JUDGE_PATH}" \
    --result_file "${OUT_DIR}/vstar_results.json" \
    --mesh_tensor "${JUDGE_TP:-8}" \
    --load_in_int8

# ---- Other benchmarks (enable as needed; N=1 majority voting defaults) ------
# python -m open_o3_video_tpu.eval.cli videomme \
#     --model_path "${MODEL_PATH}" --data_dir "${DATA_DIR}/videomme" \
#     --N 1 --vote majority_voting --output "${OUT_DIR}/videomme_results.json"
#
# python -m open_o3_video_tpu.eval.cli worldsense \
#     --model_path "${MODEL_PATH}" --data_dir "${DATA_DIR}/worldsense" \
#     --asr_dir "${DATA_DIR}/worldsense/asr" \
#     --N 1 --vote majority_voting --output "${OUT_DIR}/worldsense"
#
# python -m open_o3_video_tpu.eval.cli tvgbench \
#     --model_path "${MODEL_PATH}" --anno "${DATA_DIR}/tvgbench/annotations.json" \
#     --video_folder "${DATA_DIR}/tvgbench/videos" --output "${OUT_DIR}/tvgbench_results.json"
#
# python -m open_o3_video_tpu.eval.cli videommmu \
#     --model_path "${MODEL_PATH}" --data_dir "${DATA_DIR}/videommmu" \
#     --N 1 --vote majority_voting --output "${OUT_DIR}/videommmu_results.json"
