#!/usr/bin/env python
"""Ablation harness (VERDICT r1 item 6): measure the ATE impact of the
TPU-design shortcuts on the synthetic sequence.

Variants:
  * baseline        — frozen per-stage tracker pixels/kNN (resample=1),
                      mapper pixel-kNN cache P=2000
  * resample2/4     — tracker re-draws pixels + re-searches 2x/4x per stage
                      (approaching the reference's per-iteration resampling,
                      Tracker.py:128-168)
  * cacheP500/P8000 — mapper per-frame cached-pixel pool size (the
                      reference samples from the whole image every
                      iteration, Mapper.py:698-751)

Writes ABLATIONS.md with the ATE table.
"""
import copy
import json
import os
import sys
import time


def run_variant(name: str, overrides: dict, seed: int | None = None):
    from hpslam_tpu import config as C
    from hpslam_tpu.slam import PointSLAM

    here = os.path.dirname(os.path.abspath(__file__))
    cfg = C.load_config(os.path.join(here, "configs/Synthetic/synth_tpu.yaml"),
                        os.path.join(here, "configs/point_slam.yaml"))
    cfg = copy.deepcopy(cfg)
    for path, v in overrides.items():
        node = cfg
        ks = path.split(".")
        for k in ks[:-1]:
            node = node.setdefault(k, {})
        node[ks[-1]] = v
    if seed is not None:
        cfg["seed"] = seed
        name = f"{name}_s{seed}"
    cfg["data"]["output"] = f"output/Synthetic/ablate_{name}"
    cfg["verbose"] = False
    t0 = time.perf_counter()
    slam = PointSLAM(cfg)
    print(f"  [cfg] tracker: resample={slam.tracker.resample_stages} "
          f"iters={slam.tracker.iters} "
          f"probe={slam.tracker.knn_probe}", flush=True)
    results, summary = slam.run()
    dt = time.perf_counter() - t0
    rmse = results["absolute_translational_error.rmse"] if results else None
    return {"name": name, "ate_rmse_m": rmse,
            "track_ms": summary["track_ms_mean"],
            "map_ms": summary["map_ms_mean"], "wall_s": dt}


def main():
    variants = [
        # NOTE "baseline" = the current product defaults (resample4 +
        # per-sub-chunk searches + dense cache + union8 + probe12)
        ("baseline", {}),
        ("resample1", {"tracking.resample_stages": 1}),
        ("resample2", {"tracking.resample_stages": 2}),
        ("resample4", {"tracking.resample_stages": 4}),
        # (batchknn_on / pool2 / pool4 rows removed round 5 with their
        # knobs — measurements recorded in ABLATIONS.md round 4)
        ("probe16", {"tracking.knn_probe": 16, "mapping.knn_probe": 16}),
        ("cacheP500", {"mapping.pixels_knn_cache": 500}),
        ("cacheP8000", {"mapping.pixels_knn_cache": 8000}),
        ("union8", {"mapping.union_size": 8}),
        ("union40", {"mapping.union_size": 40}),  # = S*k, no union drops
        # u below k=8: per-sample neighbour DROPPING, not just union
        # truncation — quality gate for the ~0.3-0.5 ms/iter perf win
        ("union4", {"mapping.union_size": 4}),
        ("union6", {"mapping.union_size": 6}),
        ("bf16", {"model.mm_bf16": True}),
        ("bf16_resample2", {"model.mm_bf16": True,
                            "tracking.resample_stages": 2}),
        # fused Pallas trunks are ON by default on TPU ('auto'); measure
        # the quality delta vs the XLA path
        ("fused_off", {"model.fused_mlp": False}),
        # tile-index probe count (recall 0.969/0.993/0.995 at 8/12/16 on
        # the wall fixture; searches are ~3.5x faster at probe=8)
        ("probe8", {"tracking.knn_probe": 8, "mapping.knn_probe": 8}),
        ("probe12", {"tracking.knn_probe": 12, "mapping.knn_probe": 12}),
        # ALL-SHORTCUTS-OFF (VERDICT r1 item 6): bound the COMBINED drift
        # of every TPU-design shortcut vs reference semantics — tracker
        # re-searches every 2 iterations, no union truncation (u = S*k),
        # 8x mapper pixel pool, exact iteration counts, probe=16, XLA
        # (unfused, f32) decoder path
        ("ref_semantics", {"mapping.pool_inside_thresh": False,
                           "tracking.resample_stages": 30,
                           "mapping.union_size": 40,
                           "mapping.pixels_knn_cache": 16000,
                           "mapping.exact_iter_counts": True,
                           "tracking.knn_probe": 16,
                           "mapping.knn_probe": 16,
                           "model.fused_mlp": False,
                           "model.mm_bf16": False}),
    ]
    args = sys.argv[1:]
    seeds = [None]
    if args and args[0].startswith("--seeds="):
        # multi-seed bands (VERDICT r02 item 3): each selected variant runs
        # once per seed; rows are tagged variant_sSEED and JSONL-logged to
        # ABLATION_SEEDS.jsonl for the band tables
        seeds = [int(s) for s in args[0].split("=", 1)[1].split(",")]
        args = args[1:]
    only = args if args else None
    rows = []
    for name, ov in variants:
        if only and name not in only:
            continue
        for seed in seeds:
            tag = name if seed is None else f"{name}_s{seed}"
            print(f"=== {tag}", flush=True)
            rows.append(run_variant(name, ov, seed=seed))
            print(json.dumps(rows[-1]), flush=True)
            if seed is not None:
                with open("ABLATION_SEEDS.jsonl", "a") as f:
                    f.write(json.dumps(rows[-1]) + "\n")

    mode = "a" if only else "w"
    with open("ABLATIONS.md", mode) as f:
        if mode == "w":  # filtered runs append rows only, no duplicate header
            f.write("# Ablations — TPU-design shortcuts vs reference "
                    "semantics\n\n")
            f.write("30-frame synthetic sequence (configs/Synthetic/synth_tpu"
                    ".yaml), one TPU v5e chip.  Produced by tools_ablate.py."
                    "\n\n")
            f.write("| variant | ATE RMSE (cm) | track ms | map ms |\n")
            f.write("|---|---|---|---|\n")
        for r in rows:
            ate = f"{100*r['ate_rmse_m']:.2f}" if r["ate_rmse_m"] else "fail"
            f.write(f"| {r['name']} | {ate} | {r['track_ms']:.0f} | "
                    f"{r['map_ms']:.0f} |\n")
    print("wrote ABLATIONS.md")
    return 0


if __name__ == "__main__":
    sys.exit(main())
