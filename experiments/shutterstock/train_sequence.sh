#!/bin/bash
# ShutterStock per-video optimization at full resolution with triangulation-
# calibrated camera scales (reference: experiments/shutterstock/*.sh).
# Usage: ./experiments/shutterstock/train_sequence.sh <track_id> [extra...]

track=${1:-0}
shift || true

python train.py \
    --net scene_flow_motion_field \
    --dataset shutterstock \
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
    --logdir './checkpoints/shutterstock/sequence/' \
    --suffix 'track_{track_id}_midas_{midas}' \
    --test_template './experiments/shutterstock/test_cmd.txt' \
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
