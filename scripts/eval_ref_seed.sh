#!/bin/bash
# Evaluate a torch-reference head-to-head seed with the REFERENCE's own
# eval CLI (run via scripts/ref_shims), one grid per checkpoint step.
#
# Usage: eval_ref_seed.sh <exp_dir> <seed_label> <step...>
#   e.g. eval_ref_seed.sh /tmp/ref_hard_s6 6 400 800 1200 2000 2800 3600 4400 4800
set -u
shopt -s nullglob
EXP=${1:?ref experiment dir}; LABEL=${2:?seed label}; shift 2
DS=${DS:-/tmp/hard_glyphs32}
OUT=${OUT:-docs/hard_head_to_head}
IMG=${IMG:-16}
cd "$(dirname "$0")/.."
mkdir -p "$OUT"
for st in "$@"; do
  ck=$(printf "model_%08d.pt" "$st")
  if [ ! -e "$EXP/ckpts/$ck" ]; then
    ck=$(printf "model_%08d" "$st")
    [ -e "$EXP/ckpts/$ck" ] || { echo "skip step $st (no ckpt)"; continue; }
  fi
  csv=$(printf "%s/ref_hard_s%s_eval_%08d.csv" "$OUT" "$LABEL" "$st")
  [ -e "$csv" ] && { echo "have $csv"; continue; }
  echo "== ref seed $LABEL step $st"
  PYTHONPATH=/root/repo/scripts/ref_shims:/root/reference \
    nice -n 10 python /root/reference/authentication_eval/eval_gim_on_authentication.py \
    -d cpu --ds_root "$DS" --split val --dataset_type omniglot \
    --img_size "$IMG" --m 1 --n 5 --k 5 --num_workers 0 \
    --gim_exp_dir "$EXP" --specific_model "$ck" \
    --csv_file_path "$csv" || exit 1
done
