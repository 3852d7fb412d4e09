#!/usr/bin/env bash
# Full-scale end-to-end run record (docs/RUNS.md; reference L8 analogue:
# Experimental_Results/ViIM_FCMF/ViIM-FCMF-notebook.ipynb).
#
# Executes the complete two-phase pipeline at REAL model scale — ResNet-152
# (stages 3,8,36,3) + 12-layer/3072-intermediate text encoder, 7 images + 4
# ROIs per sample — on the synthetic offline dataset, on the real TPU:
#   phase 1 IAOG pretrain (+ beam-decode generation eval)
#   -> encoder transfer -> phase 2 fine-tune (+ dev eval, test artifacts)
#   -> inference CLI on the resulting checkpoint.
#
# Usage: bash tools_dev/full_scale_run.sh [workdir]   (default /tmp/fullrun)
set -euo pipefail

WORK=${1:-/tmp/fullrun}
LOGS="$WORK/logs"
mkdir -p "$LOGS"

echo "=== [0/4] synthetic dataset at full text scale (12 layers) ==="
python tools_dev/make_synth_data.py "$WORK" 96 12

echo "=== [1/4] phase-1 IAOG pretraining (FCMFSeq2Seq, batch 16) ==="
# --feature_cache_dir (v4): stages share one on-disk frozen-CNN feature
# cache — stage 1 fills it, stages 2/4 prefill from it instead of
# re-decoding + re-extracting the same images (train/disk_feature_cache.py)
time python -m macsa_tpu.train.pretrain \
  --pretrained_data_dir "$WORK/data" --data_dir "$WORK/data" \
  --image_dir "$WORK/images" --output_dir "$WORK/out_pre" \
  --pretrained_hf_model "$WORK/tok" \
  --feature_cache_dir "$WORK/feat_cache" \
  --num_imgs 7 --num_rois 4 --alpha 1.0 --max_len_decoder 8 \
  --train_batch_size 16 --learning_rate 3e-5 --warmup_proportion 0.1 \
  --num_train_epochs 3 --seed 42 --log_every 1 --debug_decode_every 10 \
  --do_train --do_eval 2>&1 | tee "$LOGS/pretrain.log"

echo "=== [2/4] phase-2 fine-tune with IAOG encoder transfer ==="
time python -m macsa_tpu.train.finetune \
  --data_dir "$WORK/data" --image_dir "$WORK/images" \
  --output_dir "$WORK/out_ft" --pretrained_hf_model "$WORK/tok" \
  --pretrained_iaog_path "$WORK/out_pre/last" \
  --feature_cache_dir "$WORK/feat_cache" \
  --num_imgs 7 --num_rois 4 --alpha 1 \
  --train_batch_size 8 --eval_batch_size 8 \
  --encoder_learning_rate 7e-5 --classifier_head_learning_rate 7e-4 \
  --warmup_proportion 0.1 --num_train_epochs 3 --seed 42 --log_every 1 \
  --do_train --do_eval --do_test 2>&1 | tee "$LOGS/finetune.log"

echo "=== [3/4] test artifacts ==="
ls -la "$WORK/out_ft"
sed -n '1,40p' "$WORK/out_ft/test_results_fcmf.txt"

echo "=== [4/4] inference CLI on the trained checkpoint ==="
IMG=$(ls "$WORK/images" | head -1)
time python -m macsa_tpu.inference.cli \
  --checkpoint "$WORK/out_ft/best" --pretrained_hf_model "$WORK/tok" \
  --roi_csv "$WORK/data/roi_data.csv" \
  --text "khách sạn phòng đẹp sạch sẽ nhân viên thân thiện" \
  --image_list "$WORK/images/$IMG" \
  --output_file "$WORK/inference_out.json" 2>&1 | tee "$LOGS/inference.log"
cat "$WORK/inference_out.json"

echo "=== full-scale run complete; logs in $LOGS ==="
