#!/usr/bin/env bash
# Convert a Neural RGB-D sequence into KITTI layout for the mapping pipeline
set -e
SEQ=${1:-green_room}
python -m shine_mapping_tpu.data.rgbd_converter \
  --depth_img_folder data/neural_rgbd_data/${SEQ}/depth \
  --rgb_img_folder data/neural_rgbd_data/${SEQ}/images \
  --intrinsic_file data/neural_rgbd_data/${SEQ}/focal.txt \
  --pose_file data/neural_rgbd_data/${SEQ}/poses.txt \
  --output_root data/neural_rgbd_data/${SEQ}_kitti_format \
  --max_depth_m 5.0 --is_focal_file true --already_kitti_format_pose false
