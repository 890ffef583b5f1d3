#!/usr/bin/env bash
# Fetch the triangulation artifacts the offline preprocessing stage 1
# consumes (reference: scripts/download_triangulation_files.sh — same
# artifacts, same Google Drive IDs).
#
# Produces ./datafiles/DAVIS/triangulation/ (per-frame camera poses +
# triangulated point clouds used for the metric scale calibration,
# preprocess/frames.py) and the shutterstock equivalent.
set -euo pipefail

echo -e "\e[91m Downloading DAVIS triangulation data\e[39m"
gdown 'https://drive.google.com/uc?id=1U07e9xtwYbBZPpJ2vfsLaXYMWATt4XyB' -O - --quiet | tar xvf -

echo -e "\e[91m Downloading shutterstock triangulation data\e[39m"
gdown 'https://drive.google.com/uc?id=1om58tVKujaq1Jo_ShpKc4sWVAWBoKY6U' -O - --quiet | tar xvf -
