#!/usr/bin/env bash
# Download Apple FastVLM checkpoints (parity with reference
# scripts/download_fastvlm.sh:14-29: wget + unzip from ml-site.cdn-apple.com;
# default llava-fastvithd_0.5b_stage3, other sizes/stages listed commented).
#
# Point --model-id at the unzipped directory; the TPU loader converts the
# safetensors weights natively (vla_fastvlm_tpu/io/model_loader.py).
set -euo pipefail

DEST_DIR="${1:-checkpoints}"
BASE_URL="https://ml-site.cdn-apple.com/datasets/fastvlm"

MODELS=(
  "llava-fastvithd_0.5b_stage3"
  # "llava-fastvithd_0.5b_stage2"
  # "llava-fastvithd_1.5b_stage2"
  # "llava-fastvithd_1.5b_stage3"
  # "llava-fastvithd_7b_stage2"
  # "llava-fastvithd_7b_stage3"
)

mkdir -p "${DEST_DIR}"
for model in "${MODELS[@]}"; do
  zip_path="${DEST_DIR}/${model}.zip"
  if [[ -d "${DEST_DIR}/${model}" ]]; then
    echo "[download_fastvlm] ${model} already present, skipping."
    continue
  fi
  echo "[download_fastvlm] Fetching ${model}..."
  wget -q --show-progress -O "${zip_path}" "${BASE_URL}/${model}.zip"
  unzip -q "${zip_path}" -d "${DEST_DIR}"
  rm -f "${zip_path}"
done

echo "[download_fastvlm] Done. Use --model-id ${DEST_DIR}/<model> with scripts/train.py."
