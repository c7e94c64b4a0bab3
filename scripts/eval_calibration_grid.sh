#!/bin/bash
# Calibration-analysis sweep: one eval grid per checkpoint with raw score
# dumps + calibrated-threshold columns (VERDICT r4 item: diagnose the
# late-training operating-point drift of the 100k flagship run).
#
# Usage: eval_calibration_grid.sh <exp_dir> [<out_dir>] [<ds_root>]
#   writes <out_dir>/cal_eval_<step>.csv and <out_dir>/scores_<step>/
set -u
shopt -s nullglob
EXP=${1:?experiment dir}
OUT=${2:-docs/flag_cal}
DS=${3:-/tmp/hard_glyphs32}
cd "$(dirname "$0")/.."
mkdir -p "$OUT"
cks=("$EXP"/ckpts/model_*)
[ ${#cks[@]} -eq 0 ] && { echo "no checkpoints under $EXP/ckpts" >&2; exit 1; }
for ck in "${cks[@]}"; do
  name=$(basename "$ck")
  step=$((10#${name#model_}))
  csv=$(printf "%s/cal_eval_%08d.csv" "$OUT" "$step")
  [ -e "$csv" ] && { echo "have $csv"; continue; }
  echo "== step $step"
  python eval_gim_on_authentication.py --ds_root "$DS" --split val \
    --dataset_type omniglot --gim_exp_dir "$EXP" \
    --specific_model "$name" --csv_file_path "$csv" \
    --calibrate_q 0.95 \
    --dump_scores_dir "$(printf "%s/scores_%08d" "$OUT" "$step")" || exit 1
done
