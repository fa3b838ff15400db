#!/usr/bin/env bash
# Neural RGB-D synthetic dataset
set -e
mkdir -p data && cd data
wget -O neural_rgbd_data.zip -c http://kaldir.vc.in.tum.de/neural_rgbd/neural_rgbd_data.zip
unzip neural_rgbd_data.zip -d neural_rgbd_data
rm neural_rgbd_data.zip
