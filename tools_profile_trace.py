#!/usr/bin/env python
"""Op-level trace of one map_scan call (and optionally track_frame) on the
real TPU: jax.profiler trace -> parse trace events -> top ops by self time.

Usage: python tools_profile_trace.py [map|track]
"""
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

H, W = 460, 620
FX, FY, CX, CY = 577.59, 578.73, 308.9, 232.68
N_FINE = 300_000
CAP_FINE = 1 << 19
MAP_RAYS, WINDOW = 10_000, 20


def summarize(trace_dir):
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace file found under", trace_dir)
        return
    f = max(files, key=os.path.getmtime)
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    # find TPU op events: pid/tid named like XLA Ops / TensorFlow Op
    by_name = {}
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e.get("pid"), e.get("tid"))] = e["args"].get("name", "")
    for e in events:
        if e.get("ph") != "X":
            continue
        tname = names.get((e.get("pid"), e.get("tid")), "")
        if "XLA Ops" not in tname and "Ops" not in tname:
            continue
        n = e.get("name", "?")
        by_name.setdefault(n, [0.0, 0])
        by_name[n][0] += e.get("dur", 0) / 1e3  # ms
        by_name[n][1] += 1
    total = sum(v[0] for v in by_name.values())
    print(f"total device op time: {total:.2f} ms over {len(by_name)} op names")
    for n, (dur, cnt) in sorted(by_name.items(), key=lambda kv: -kv[1][0])[:40]:
        print(f"  {dur:9.3f} ms  x{cnt:<5d} {n[:110]}")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "map"
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.hpslam_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp
    _ = float(jnp.sum(jnp.ones((4,))))

    from hpslam_tpu.models import decoder as Dec
    from hpslam_tpu.ops import knn as K
    from hpslam_tpu.ops import optim as Opt
    from hpslam_tpu.renderer import RenderConfig
    from hpslam_tpu.mapper import (map_scan, build_pixel_union_cache,
                                   compact_scene, count_unique, unique_bucket,
                                   pack_union_cache)

    rng = np.random.default_rng(1219)
    mcfg = Dec.ModelConfig(encode_exposure=True, encode_rel_pos_in_col=False,
                           fused_mlp=which in ("map_fused", "map_comp"),
                           fused_composite=(which == "map_comp"))
    rcfg = RenderConfig(near_end_surface=0.96, far_end_surface=1.04,
                        sample_near_pcl=False)
    params = Dec.init_nicer(jax.random.PRNGKey(0), mcfg)

    pos = np.zeros((CAP_FINE, 3), np.float32)
    pts = rng.uniform(-3, 3, (N_FINE, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-3, -1, N_FINE)
    pos[:N_FINE] = pts
    geo = rng.normal(0, 0.1, (CAP_FINE, mcfg.c_dim)).astype(np.float32)
    col = rng.normal(0, 0.1, (CAP_FINE, mcfg.c_dim)).astype(np.float32)
    pos_j = jnp.asarray(pos)
    count = jnp.int32(N_FINE)

    depth = rng.uniform(0.5, 4.0, (H, W)).astype(np.float32)
    color = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    rq = np.full((H, W), 0.1, np.float32)
    pool = np.arange(H * W, dtype=np.int32)
    F = WINDOW
    colors = jnp.asarray(np.broadcast_to(color, (F, H, W, 3)).copy())
    depths = jnp.asarray(np.broadcast_to(depth, (F, H, W)).copy())
    c2ws = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (F, 1, 1)))
    pools = jnp.asarray(np.broadcast_to(pool, (F, H * W)).copy())
    pool_lens = jnp.asarray(np.full((F,), pool.size, np.int32))
    expo_stack = jnp.asarray(np.zeros((F, 8), np.float32))
    rq_stack = jnp.asarray(np.broadcast_to(rq, (F, H, W)).copy())
    index = K.build_tiles(pos_j, count)
    key = jax.random.PRNGKey(0)
    N_IT = 60

    cache_pix, uids, Wm, pmask, cache_const = build_pixel_union_cache(
        key, depths, c2ws, pools, pool_lens, rq_stack, index,
        jnp.int32(CAP_FINE), P=2000, S=5, k=8, u_max=8, H=H, W=W,
        fx=FX, fy=FY, cx=CX, cy=CY, near_surface=0.96, far_surface=1.04,
        min_nn=mcfg.min_nn_num, weighting=mcfg.weighting, colors=colors)
    U = unique_bucket(int(count_unique(uids)), CAP_FINE)
    uniq, uids_c, pos_c, geo_c, col_c = compact_scene(
        uids, pos_j, jnp.asarray(geo), jnp.asarray(col), U)
    packed = pack_union_cache(cache_const, Wm, pmask, uids_c)
    op = {"feat": jnp.concatenate([geo_c, col_c], 1),
          "dec": {"col_fine": jax.tree.map(jnp.copy, params["col_fine"])},
          "expo_feat": jnp.zeros((8,), jnp.float32)}
    ost = Opt.init(op)
    stage_ids = jnp.full((N_IT,), 1, jnp.int32)
    lr_table = jnp.tile(jnp.asarray([[0.005, 0.03, 0.005, 0.0]], jnp.float32),
                        (N_IT, 1))

    def go(op, ost):
        return map_scan(
            params, mcfg, rcfg, op, ost, key,
            colors, depths, c2ws, rq_stack,
            cache_pix, None, uids_c, expo_stack,
            pos_c, jnp.int32(U),
            stage_ids, lr_table, jnp.int32(F),
            level="fine", n_rays=MAP_RAYS, F_max=F, H=H, W=W,
            fx=FX, fy=FY, cx=CX, cy=CY,
            n_iters=N_IT, use_exposure=True,
            opt_color_dec=True, opt_geo_dec=False,
            w_color=0.1, use_union=True, cache_packed=packed, geo_iters=0)

    import jax.tree as jt
    if which.startswith("map"):
        o2, s2, losses = go(jt.map(jnp.copy, op), jt.map(jnp.copy, ost))
        _ = float(jnp.sum(losses))
        trace_dir = "/tmp/jax_trace_map"
        os.system(f"rm -rf {trace_dir}")
        with jax.profiler.trace(trace_dir):
            o2, s2, losses = go(jt.map(jnp.copy, op),
                                jt.map(jnp.copy, ost))
            _ = float(jnp.sum(losses))
        print(f"== map_scan {N_IT} color iters (divide by {N_IT})")
        summarize(trace_dir)
        return

    # ---- tracker trace: 20+20 iters, resample=1, prod pixel count
    from hpslam_tpu.tracker import track_frame
    N_MID, CAP_MID = 60_000, 1 << 17
    pos_m = np.zeros((CAP_MID, 3), np.float32)
    pos_m[:N_MID] = pts[:N_MID]
    geo_m = rng.normal(0, 0.1, (CAP_MID, mcfg.c_dim)).astype(np.float32)
    col_m = rng.normal(0, 0.1, (CAP_MID, mcfg.c_dim)).astype(np.float32)
    mid = (jnp.asarray(pos_m), jnp.int32(N_MID), jnp.asarray(geo_m),
           jnp.asarray(col_m))
    fine = (pos_j, count, jnp.asarray(geo), jnp.asarray(col))
    idx_m = K.build_tiles(mid[0], mid[1])
    cam = jnp.asarray(np.array([1, 0, 0, 0, 0.1, 0.05, 0.2], np.float32))
    pool_flat = jnp.asarray(pool)

    def go_track(k):
        return track_frame(
            params, mcfg, rcfg, cam, k,
            colors[0], depths[0], rq_stack[0], rq_stack[0],
            pool_flat, jnp.int32(pool.size),
            mid[0], mid[1], mid[2], mid[3], idx_m,
            fine[0], fine[1], fine[2], fine[3], index,
            jnp.zeros((8,), jnp.float32),
            pixels=5000, iters_mid=20, iters_fine=20,
            W=W, fx=FX, fy=FY, cx=CX, cy=CY, cam_lr=5e-4,
            separate_lr=False, use_exposure=True, w_color=0.5,
            use_color=True, handle_dynamic=True,
            resample_stages=int(os.environ.get("TRACE_RESAMPLE", "4")),
            knn_probe=12)

    out = go_track(jax.random.PRNGKey(0))
    _ = float(jnp.sum(out[0]))
    trace_dir = "/tmp/jax_trace_track"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        out = go_track(jax.random.PRNGKey(1))
        _ = float(jnp.sum(out[0]))
    print("== track_frame 40 iters (divide by 40); resample=%s batch=%s" % (os.environ.get("TRACE_RESAMPLE", "4"), os.environ.get("TRACE_BATCH", "0")))
    summarize(trace_dir)


main()
