#!/usr/bin/env python
"""CLI entry point (public surface parity with the reference run.py:
``python run.py configs/ScanNet/scene0059.yaml [--flags]``)."""
import os
import sys


def main():
    # honour JAX_PLATFORMS even though the axon sitecustomize registers the
    # TPU plugin unconditionally (its registration overrides the env var)
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    # persistent compilation cache: the big scan programs take minutes to
    # compile through the tunnelled TPU; cache them across runs
    cache_dir = os.environ.get("HPSLAM_JAX_CACHE",
                               os.path.expanduser("~/.hpslam_jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from hpslam_tpu import config as C

    parser = C.build_arg_parser()
    args = parser.parse_args()
    default = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "configs/point_slam.yaml")
    cfg = C.load_config(args.config, default)
    cfg = C.apply_args(cfg, args)

    # deterministic seeding (reference pins seed 1219 at every entry point;
    # here one PRNG key tree derives everything)
    import numpy as np
    np.random.seed(cfg.get("seed", 1219))

    from hpslam_tpu.slam import PointSLAM
    slam = PointSLAM(cfg, args)
    print(f"INFO: output folder is {slam.output}")
    results, summary = slam.run()
    print("summary:", summary)
    return 0


if __name__ == "__main__":
    sys.exit(main())
