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

# Self-verifying smoke (no egress needed): generate the tiny synthetic
# city IN-CONTAINER, run the full batch driver headlessly through the real
# CLI (KITTI-format on-disk data incl. semantic labels), mesh, and eval —
# writes experiments/demo_tpu_kitti_scale_tiny.json (quality + timings)
# and the mesh .ply under the run dir.  This mirrors the reference's
# Docker CMD being its e2e smoke test (reference Dockerfile:39).
#
#   docker run --rm shine_mapping_tpu
#
# With network access, the reference-parity flow still works:
#   docker run --rm shine_mapping_tpu bash -c \
#     "bash scripts/download_kitti_example.sh && \
#      python -m shine_mapping_tpu.cli.shine_batch config/kitti/docker_kitti_batch.yaml"
CMD SHINE_CITY_TINY=1 python experiments/demo_tpu_kitti_scale.py && \
    cat experiments/demo_tpu_kitti_scale_tiny.json
