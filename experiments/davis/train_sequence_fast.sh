#!/bin/bash
# Fast DAVIS recipe: the canonical optimization with pairs batched 8-wide.
#
# Pairs are independent samples of the same per-video objective, and a
# batch-B step optimizes EXACTLY the union objective of its B pairs (the
# loss is a mask-mass-weighted mean over all pixels of the batch —
# tests/test_batch_equivalence.py pins both the loss recombination and the
# gradient identity). Batching therefore changes MXU occupancy, not the
# math: measured on TPU v5e (round-5 knee scan, batches 1..16), batch 8 is
# the throughput knee at ~67 pairs/s vs ~34 at batch 1 — 2.0x pair
# throughput per chip; batch 16 is flat (66.6), so 8 is the recipe
# (RESULTS.md batch matrix).
#
# epoch_batches 250 x batch 8 = the canonical 2000 pair-visits per epoch
# (reference protocol: experiments/davis/train_sequence.sh 2000 x 1).
# Each batched step takes ONE Adam update where the canonical recipe takes
# eight smaller ones; at the reference's tiny depth lr (1e-6) the smoother
# batched gradient is if anything better conditioned, and the scene-flow
# head keeps the same effective step scale because Adam normalizes per
# coordinate. lr is therefore kept at the canonical values.
#
# Usage: ./experiments/davis/train_sequence_fast.sh <track_id> [extra flags...]

track=${1:-dog}
shift || true

python train.py \
    --net scene_flow_motion_field \
    --dataset davis_sequence \
    --track_id "${track}" \
    --log_time \
    --epoch_batches 250 \
    --epoch 20 \
    --lr 1e-6 \
    --html_logger \
    --vali_batches 150 \
    --batch_size 8 \
    --optim adam \
    --vis_batches_vali 4 \
    --vis_every_vali 1 \
    --vis_every_train 1 \
    --vis_batches_train 5 \
    --logdir './checkpoints/davis/sequence_fast/' \
    --suffix 'track_{track_id}_{loss_type}_wreg_{warm_reg}_acc_{acc_mul}_disp_{disp_mul}_flowmul_{flow_mul}_time_{time_dependent}_CNN_{use_cnn}_sf_{sf_mag_div}_mask_{use_motion_seg}_midas_{midas}' \
    --test_template './experiments/davis/test_cmd.txt' \
    --force_overwrite \
    --scene_lr_mul 1000 \
    --warm_sf 5 \
    --acc_mul 1 \
    --disp_mul 1 \
    --flow_mul 1 \
    --sf_mag_div 100 \
    --time_dependent \
    --gaps '1,2,4,6,8' \
    --midas \
    --use_disp \
    "$@"
