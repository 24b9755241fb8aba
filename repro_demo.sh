#!/bin/bash
# Reproduce the demo pipeline end-to-end on the synthetic sequence
# (equivalent role to the reference's repro_demo.sh cluster script, minus
# the SLURM wrapping): SLAM -> ATE -> TSDF mesh -> frustum culling.
set -e
OUT=${1:-output/Synthetic/demo}
python run.py configs/Synthetic/synth_room.yaml --output "$OUT"
python -m hpslam_tpu.tools.eval_ate configs/Synthetic/synth_room.yaml --output "$OUT"
python -m hpslam_tpu.tools.get_mesh_tsdf_fusion configs/Synthetic/synth_room.yaml \
  --output "$OUT" --voxel_size 0.02 --no_eval
python -m hpslam_tpu.tools.cull_mesh configs/Synthetic/synth_room.yaml \
  "$OUT/mesh/final_mesh.ply" --output "$OUT"
echo "demo artifacts under $OUT"
