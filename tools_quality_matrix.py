#!/usr/bin/env python
"""Quality matrix on the noisy synthetic protocol (VERDICT r1 item 4):
BA / exposure / end-correction ON vs OFF, end-to-end ATE per toggle.

Runs the 30-frame Kinect-like sensor-model sequence
(configs/Synthetic/synth_noisy.yaml) once per variant on the real TPU and
appends a table to QUALITY.md.  The loop-closing variant
(synth_loop.yaml) exercises end_correction the way ScanNet's drifting
trajectories do (reference anchor: src/Mapper.py:1080-1148, ScanNet
defaults exposure+end_correction ON — configs/ScanNet/scannet.yaml).

Usage: python tools_quality_matrix.py [variant ...]
"""
import json
import sys
import time

import numpy as np


def deep_set(cfg, dotted, value):
    ks = dotted.split(".")
    d = cfg
    for k in ks[:-1]:
        d = d.setdefault(k, {})
    d[ks[-1]] = value


VARIANTS = [
    # (name, base config, overrides)
    ("noisy_base", "configs/Synthetic/synth_noisy.yaml", {}),
    ("noisy_no_exposure", "configs/Synthetic/synth_noisy.yaml",
     {"model.encode_exposure": False}),
    ("noisy_ba", "configs/Synthetic/synth_noisy.yaml",
     {"mapping.BA": True}),
    ("loop_endcorr", "configs/Synthetic/synth_loop.yaml",
     {"mapping.end_correction": True}),
    ("loop_no_endcorr", "configs/Synthetic/synth_loop.yaml",
     {"mapping.end_correction": False}),
]


def main():
    from hpslam_tpu import config as C
    from hpslam_tpu.slam import PointSLAM

    only = sys.argv[1:] or None
    rows = []
    for name, base, ov in VARIANTS:
        if only and name not in only:
            continue
        print(f"=== {name}", flush=True)
        cfg = C.load_config(base)
        deep_set(cfg, "data.output", f"output/quality_matrix/{name}")
        deep_set(cfg, "verbose", False)
        for k, v in ov.items():
            deep_set(cfg, k, v)
        t0 = time.time()
        slam = PointSLAM(cfg)
        results, _ = slam.run()
        wall = time.time() - t0
        rmse = (float(results["absolute_translational_error.rmse"])
                if results else float("nan"))
        row = {"variant": name, "ate_rmse_cm": round(rmse * 100, 2),
               "wall_s": round(wall, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    if rows:
        with open("QUALITY_MATRIX.json", "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        print("appended", len(rows), "rows to QUALITY_MATRIX.json")


if __name__ == "__main__":
    main()
