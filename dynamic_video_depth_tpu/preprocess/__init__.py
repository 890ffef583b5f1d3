"""Offline preprocessing (reference: scripts/preprocess/{davis,shutterstock}):

stage 1 (``frames``): per-frame depth init + camera scale calibration,
stage 2 (``raft`` / ``flows``): optical flow + occlusion masks,
stage 3 (``pairs``): packed per-pair training batches.

All heavy compute (MiDaS inference, RAFT) runs on TPU through the same Flax
models as training.
"""
