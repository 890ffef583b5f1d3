#!/usr/bin/env bash
# Fetch the pretrained depth checkpoints + example data the pipeline
# consumes (reference: scripts/download_data_and_depth_ckpt.sh:1-5 — same
# artifacts, same Google Drive IDs, same on-disk layout).
#
# Produces:
#   ./pretrained_depth_ckpt/midas_cpkt.pt
#       MiDaS v2 (ResNeXt101-32x8d-WSL + refinenet) torch state dict;
#       consumed by models/torch_port.py (env override: DVD_MIDAS_CKPT).
#   ./pretrained_depth_ckpt/best_depth_Ours_Bilinear_inc_3_net_G.pth
#       MannequinChallenge hourglass weights (env: DVD_HOURGLASS_CKPT).
#   ./datafiles/davis_processed/ and ./datafiles/shutterstock/
#       example packed tracks in the layout data/{davis_sequence,
#       shutterstock}.py read (frames_midas/*.npz +
#       sequences_select_pairs_midas/<track>/001/*.pt).
#
# Requires: gdown (pip install gdown) and network access. In air-gapped
# environments, place the artifacts at the paths above by any other means —
# train.py/test.py only care about the layout.
set -euo pipefail

echo -e "\e[91m Downloading depth checkpoints\e[39m"
gdown 'https://drive.google.com/uc?id=167YnhuCbWe51lnCAFY7lu_bxD2wx9EKb' -O - --quiet | tar xvf -

echo -e "\e[91m Downloading example data\e[39m"
gdown 'https://drive.google.com/uc?id=1Y7-Q2nBIuVmkFSQZkZjHJHpk3KjbFwaa' -O - --quiet | tar xvf -

echo "Layout check:"
ls -d pretrained_depth_ckpt datafiles 2>/dev/null || {
  echo "expected pretrained_depth_ckpt/ and datafiles/ in $(pwd)" >&2
  exit 1
}
