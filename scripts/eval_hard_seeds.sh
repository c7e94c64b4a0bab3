#!/bin/bash
# Eval-grid sweep for the hard-benchmark head-to-head seeds
# (docs/hard_head_to_head/): one standard authentication grid per
# (seed, checkpoint), CSV named for scripts/aggregate_head_to_head.py.
#
# Usage: eval_hard_seeds.sh <exp_root> <seed...>
#   <exp_root>/seed_<s>/ must be a standard experiment dir
#   (args.json + ckpts/model_*), e.g. written by
#   train_multiseed_gim_on_imgs.py.
set -u
ROOT=${1:?exp root}; shift
DS=${DS:-/tmp/hard_glyphs32}
OUT=${OUT:-docs/hard_head_to_head}
STEPS=${STEPS:-"400 800 1200 2000 4999"}
IMG=${IMG:-16}   # episode size must match the trained model (args.json)
cd "$(dirname "$0")/.."
for s in "$@"; do
  for st in $STEPS; do
    ck=$(printf "model_%08d" "$st")
    if [ ! -e "$ROOT/seed_$s/ckpts/$ck" ]; then
      echo "skip seed $s step $st (no $ck)"; continue
    fi
    csv=$(printf "%s/jax_hard_s%s_eval_%08d.csv" "$OUT" "$s" "$st")
    [ -e "$csv" ] && { echo "have $csv"; continue; }
    echo "== seed $s step $st"
    python eval_gim_on_authentication.py --ds_root "$DS" --split val \
      --dataset_type omniglot --img_size "$IMG" --gim_exp_dir "$ROOT/seed_$s" \
      --specific_model "$ck" --csv_file_path "$csv" || exit 1
  done
done
