#!/usr/bin/env bash
# Newer College dataset quad example + GT
set -e
mkdir -p data && cd data
wget -O ncd_example.tar.gz -c https://uni-bonn.sciebo.de/s/3qvsT5PCSTrm4sT/download
tar -xvf ncd_example.tar.gz
rm ncd_example.tar.gz
