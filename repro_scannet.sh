#!/bin/bash
# Full ScanNet evaluation sweep (the reference's result-table protocol):
# per-scene SLAM + automatic end-of-run ATE; meshes via the TSDF tool.
set -e
for scene in scene0025 scene0059 scene0062 scene0103 scene0106 scene0126 scene0181 scene0207; do
  python run.py configs/ScanNet/${scene}.yaml "$@"
  python -m hpslam_tpu.tools.get_mesh_tsdf_fusion configs/ScanNet/${scene}.yaml --no_eval
done
