#!/usr/bin/env bash
# KITTI odometry seq 00 subset (first 100 frames)
set -e
mkdir -p data && cd data
wget -O kitti_example.tar.gz -c https://uni-bonn.sciebo.de/s/KwOuBiPZi8vSz2O/download
tar -xvf kitti_example.tar.gz
rm kitti_example.tar.gz
