# TPU-host container for shine_mapping_tpu.
#
# Parity with the reference's Docker smoke flow (reference Dockerfile:39):
# fetch the 100-frame KITTI example and run the batch driver headless.
# On TPU VMs, pass the TPU runtime through (e.g. --privileged on GCE TPU VM
# images); on any other host the same image runs on CPU.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make wget tar && rm -rf /var/lib/apt/lists/*

# jax[tpu] resolves to the CPU wheel off-TPU; pin as needed for your fleet
RUN pip install --no-cache-dir "jax[tpu]" -f \
    https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    numpy scipy pyyaml pillow

WORKDIR /workspace
COPY . /workspace

# demo: download the KITTI example then run batch mapping headless
CMD bash scripts/download_kitti_example.sh && \
    python -m shine_mapping_tpu.cli.shine_batch config/kitti/docker_kitti_batch.yaml
