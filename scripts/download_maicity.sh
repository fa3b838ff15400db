#!/usr/bin/env bash
# MaiCity synthetic LiDAR dataset (sequence 01) + GT point cloud
set -e
mkdir -p data && cd data
echo "Downloading MaiCity dataset..."
wget -c https://www.ipb.uni-bonn.de/html/projects/mai_city/mai_city.tar.gz
tar -xvf mai_city.tar.gz
echo "Downloading MaiCity ground-truth point cloud (from sequence 02)..."
(cd mai_city && wget -O gt_map_pc_mai.ply -c https://uni-bonn.sciebo.de/s/DAMWVCC1Kxkfkyz/download)
rm mai_city.tar.gz
