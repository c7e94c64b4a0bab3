#!/bin/bash
# Eval grid over the hard-vox run's checkpoints (run sequentially; chip-bound).
set -u
OUT=/root/repo/docs/hardvox_run
mkdir -p "$OUT"
for step in 00002500 00005000 00007500 00010000 00012500 00014879; do
  csv="$OUT/eval_step${step}.csv"
  [ -s "$csv" ] && { echo "skip $step (exists)"; continue; }
  echo "=== eval step $step $(date) ==="
  timeout 3600 python /root/repo/eval_gim_on_authentication.py \
    --ds_root /tmp/hard_vox64 --dataset_type voxceleb2 \
    --img_size 64 --img_channels 3 --m 1 --n 5 --k 5 \
    --gim_exp_dir /tmp/hardvox_run --specific_model "model_${step}" \
    --csv_file_path "$csv" || echo "FAILED step $step"
done
echo "ALL DONE $(date)"
