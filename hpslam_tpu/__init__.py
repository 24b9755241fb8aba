"""hpslam_tpu — TPU-native Hierarchical Point-SLAM.

A brand-new JAX / XLA / Pallas re-design of guo-han/Hierarchical-Point-SLAM
(dense RGB-D SLAM on a hierarchical mid+fine neural point cloud).

Layer map (mirrors SURVEY.md §1 of the reference analysis):
  ops/       L0 math / geometry / sampling primitives + kNN kernels
  state.py   L1 scene representation (fixed-capacity hierarchical point store)
  models/    L2 neural decoders (NICER 4-MLP set, functional pytrees)
  renderer   L3 differentiable depth-guided volume renderer
  tracker/   L4 SLAM engines (jitted lax.scan optimizer loops)
  mapper
  slam.py    L5 orchestrator (single host loop; replaces the reference's
             two-process torch.multiprocessing design, see reference
             src/Point_SLAM.py:297-319)
  config.py  L6 config / CLI
  utils/     data layer + observability
  tools/     offline eval (ATE / recon / meshing)
  parallel/  multi-chip sharding (mesh + shard_map render/map steps)
  native/    first-party C++ runtime components (TSDF fusion, marching
             cubes, KD-tree, ICP) replacing Open3D
"""

__version__ = "0.1.0"
