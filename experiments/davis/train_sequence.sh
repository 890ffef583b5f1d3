#!/bin/bash
# Canonical DAVIS per-video optimization recipe
# (reference: experiments/davis/train_sequence.sh — same hyperparameters).
# Usage: ./experiments/davis/train_sequence.sh <track_id> [extra flags...]

track=${1:-dog}
shift || true

python train.py \
    --net scene_flow_motion_field \
    --dataset davis_sequence \
    --track_id "${track}" \
    --log_time \
    --epoch_batches 2000 \
    --epoch 20 \
    --lr 1e-6 \
    --html_logger \
    --vali_batches 150 \
    --batch_size 1 \
    --optim adam \
    --vis_batches_vali 4 \
    --vis_every_vali 1 \
    --vis_every_train 1 \
    --vis_batches_train 5 \
    --logdir './checkpoints/davis/sequence/' \
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
