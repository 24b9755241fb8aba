#!/usr/bin/env python
"""Per-phase budget of the headline bench (VERDICT r03 item 5 / r04 item 1).

Decomposes bench.py's two measured buckets (track_ms, map_ms) into
sub-stage costs AT THE EXACT BENCH OPERATING POINT, so "where did the
per-iteration wins go e2e" is answerable from one table:

  track: per-sub-stage fixed cost (neighbour search + dense cache build)
         vs per-iteration scan cost vs program base, derived from three
         e2e variants (resample 4 / 1 / iters=2) + standalone search
         timings;
  map:   union cache build | count_unique+compact+pack | map_scan |
         feature scatter-back | tile index rebuild, each timed as the
         product calls them, vs the run_map total (residual = host gap /
         dispatch tail).

Prints a markdown table for QUALITY.md.  Run on the real TPU.
"""
import dataclasses
import os
import sys
import time

import numpy as np

H, W = 460, 620
FX, FY, CX, CY = 577.59, 578.73, 308.9, 232.68
N_FINE, N_MID = 300_000, 60_000
CAP_FINE, CAP_MID = 1 << 19, 1 << 17
TRACK_PIXELS, TRACK_ITERS = 5000, 100
MAP_RAYS, MAP_ITERS, EVERY, WINDOW = 10_000, 600, 5, 20
P_CACHE = 2000


def t_ms(fn, *a, reps=3, **kw):
    import jax
    out = fn(*a, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(fn(*a, **kw))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import jax
    cache_dir = os.environ.get("HPSLAM_JAX_CACHE",
                               os.path.expanduser("~/.hpslam_jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp
    _ = float(jnp.sum(jnp.ones((4,))))

    from hpslam_tpu.models import decoder as Dec
    from hpslam_tpu.ops import knn as K
    from hpslam_tpu.ops import optim as Opt
    from hpslam_tpu.renderer import RenderConfig
    from hpslam_tpu.tracker import track_frame
    from hpslam_tpu.mapper import (map_scan, build_schedule,
                                   build_pixel_union_cache, compact_scene,
                                   count_unique, unique_bucket,
                                   pack_union_cache)

    rng = np.random.default_rng(1219)
    mcfg = Dec.ModelConfig(encode_exposure=True,
                           encode_rel_pos_in_col=False,
                           fused_mlp=True, fused_composite=True)
    rcfg = RenderConfig(near_end_surface=0.96, far_end_surface=1.04,
                        sample_near_pcl=False)
    params = Dec.init_nicer(jax.random.PRNGKey(0), mcfg)

    def level(n, cap):
        pos = np.zeros((cap, 3), np.float32)
        pts = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(-3, -1, n)
        pos[:n] = pts
        geo = rng.normal(0, 0.1, (cap, mcfg.c_dim)).astype(np.float32)
        col = rng.normal(0, 0.1, (cap, mcfg.c_dim)).astype(np.float32)
        return (jnp.asarray(pos), jnp.int32(n), jnp.asarray(geo),
                jnp.asarray(col))

    mid, fine = level(N_MID, CAP_MID), level(N_FINE, CAP_FINE)
    idx_mid = jax.block_until_ready(K.build_tiles(mid[0], mid[1]))
    idx_fine = jax.block_until_ready(K.build_tiles(fine[0], fine[1]))
    indexes = {"mid": idx_mid, "fine": idx_fine}

    depth = rng.uniform(0.5, 4.0, (H, W)).astype(np.float32)
    color = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    pool = np.arange(H * W, dtype=np.int32)
    cam = np.array([1, 0, 0, 0, 0.1, 0.05, 0.2], np.float32)
    expo = np.zeros((8,), np.float32)
    color_j, depth_j = jnp.asarray(color), jnp.asarray(depth)
    rqm_j = jnp.asarray(np.full((H, W), 0.5, np.float32))
    rqf_j = jnp.asarray(np.full((H, W), 0.1, np.float32))
    pool_j = jnp.asarray(pool)

    mcfg_tr = dataclasses.replace(mcfg, fused_mlp=False)

    def run_track(key, resample=4, iters=TRACK_ITERS):
        out = track_frame(
            params, mcfg_tr, rcfg, jnp.asarray(cam), key,
            color_j, depth_j, rqm_j, rqf_j,
            pool_j, jnp.int32(pool.size),
            mid[0], mid[1], mid[2], mid[3], idx_mid,
            fine[0], fine[1], fine[2], fine[3], idx_fine,
            jnp.asarray(expo),
            pixels=TRACK_PIXELS, iters_mid=iters // 2,
            iters_fine=iters - iters // 2, W=W,
            fx=FX, fy=FY, cx=CX, cy=CY, cam_lr=5e-4, separate_lr=False,
            use_exposure=True, w_color=0.5, use_color=True,
            handle_dynamic=True, resample_stages=resample, knn_probe=12)
        return out

    key = jax.random.PRNGKey(0)
    print("platform:", jax.devices()[0])
    print()
    do_track = os.environ.get("BUDGET_SKIP_TRACK", "0") != "1"
    if not do_track:
        print("(track section skipped via BUDGET_SKIP_TRACK)")
    print("## tracker budget (ScanNet op point: 100 it x 5000 px, r=4)")
    if do_track:
        A = t_ms(run_track, key, resample=4)
        B = t_ms(run_track, key, resample=1)
        C = t_ms(run_track, key, resample=1, iters=2)
    else:
        A = B = C = 0.0
    # A = 8f + 100c + base;  B = 2f + 100c + base;  C = 2f + 2c + base
    if do_track:
        f = (A - B) / 6.0
        c = (B - C) / 98.0
        base = C - 2 * f - 2 * c
        q = jnp.asarray(rng.uniform(-3, 3, (TRACK_PIXELS * 5, 3))
                        .astype(np.float32))
        s_fine = t_ms(K.knn_tiles, q, *idx_fine, k=8, probe=12, reps=5)
        s_mid = t_ms(K.knn_tiles, q, *idx_mid, k=8, probe=12, reps=5)
        print(f"| e2e r4 (prod) | {A:8.2f} ms |")
        print(f"| e2e r1        | {B:8.2f} ms |")
        print(f"| e2e r1 it=2   | {C:8.2f} ms |")
        print(f"| derived: per-sub-stage fixed (search+cache+thresh) "
              f"| {f:6.2f} ms x8 = {8*f:6.1f} |")
        print(f"| derived: per-iteration scan cost | {c:6.3f} ms x100 "
              f"= {100*c:6.1f} |")
        print(f"| derived: program base (dispatch+pool upload+fetch) "
              f"| {base:6.2f} ms |")
        print(f"| standalone knn_tiles 25k fine/mid | {s_fine:6.2f} / "
              f"{s_mid:6.2f} ms (x4 each = {4*(s_fine+s_mid):6.1f}) |")
    print()

    # ---- mapping budget
    F = WINDOW
    colors = jnp.asarray(np.broadcast_to(color, (F, H, W, 3)).copy())
    depths = jnp.asarray(np.broadcast_to(depth, (F, H, W)).copy())
    c2ws = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (F, 1, 1)))
    pools = jnp.asarray(np.broadcast_to(pool, (F, H * W)).copy())
    pool_lens = jnp.asarray(np.full((F,), pool.size, np.int32))
    expo_stack = jnp.asarray(np.zeros((F, 8), np.float32))
    rq_stack = {"mid": rqm_j[None].repeat(F, 0),
                "fine": rqf_j[None].repeat(F, 0)}
    schedules = build_schedule(MAP_ITERS, 0.5, 0.3, False, 200, {
        "stage": {s: {"decoders_lr": 0.005 if "color" in s else 0.001,
                      "geometry_mid_lr": 0.03 if "geometry" in s else 0.005,
                      "geometry_fine_lr": 0.03 if "geometry" in s else 0.005,
                      "color_lr": 0.0 if "geometry" in s else 0.005}
                  for s in ("geometry_mid", "color_mid", "geometry_fine",
                            "color_fine")},
        "init": {}})
    from jax.flatten_util import ravel_pytree

    print("## mapper budget (600 it x 10000 rays, window 20, per level)")
    level_arrays = {"mid": mid, "fine": fine}
    totals = {}
    for lvl in tuple(os.environ.get("BUDGET_LEVELS", "mid,fine").split(",")):
        stage_ids, lr_table = schedules[lvl]
        arr = level_arrays[lvl]

        def cache_build():
            return build_pixel_union_cache(
                key, depths, c2ws, pools, pool_lens, rq_stack[lvl],
                indexes[lvl], jnp.int32(arr[0].shape[0]),
                P=P_CACHE, S=5, k=8, u_max=8, H=H, W=W,
                fx=FX, fy=FY, cx=CX, cy=CY,
                near_surface=0.96, far_surface=1.04,
                min_nn=mcfg.min_nn_num, weighting=mcfg.weighting,
                colors=colors, knn_probe=12)

        tm_cache = t_ms(cache_build)
        cache_pix, uids, Wm, pmask, cache_const = cache_build()

        def compact_pack():
            U_ = unique_bucket(int(count_unique(uids)), arr[0].shape[0])
            uniq_, uid2, pos_c_, geo_c_, col_c_ = compact_scene(
                uids, arr[0], arr[2], arr[3], U_)
            packed_ = pack_union_cache(cache_const, Wm, pmask, uid2)
            return uniq_, uid2, pos_c_, geo_c_, col_c_, packed_, U_

        tm_cp = t_ms(lambda: compact_pack()[:6])
        uniq, uids_c, pos_c, geo_c, col_c, packed, U = compact_pack()

        def scan_only():
            # dec_flat rebuilt per call: map_scan DONATES opt_params, so a
            # hoisted flat vector would be a deleted buffer on the 2nd call
            dec_flat, _ = ravel_pytree(
                {f"col_{lvl}": params[f"col_{lvl}"]})
            op = {"feat": jnp.concatenate([geo_c, col_c], 1),
                  "dec_flat": dec_flat,
                  "expo_feat": jnp.asarray(expo)}
            ost = Opt.init(op)
            op, ost, losses = map_scan(
                params, mcfg, rcfg, op, ost, key,
                colors, depths, c2ws, rq_stack[lvl],
                cache_pix, None, uids_c, expo_stack,
                pos_c, jnp.int32(U),
                jnp.asarray(stage_ids), jnp.asarray(lr_table),
                jnp.int32(F),
                level=lvl, n_rays=MAP_RAYS, F_max=F, H=H, W=W,
                fx=FX, fy=FY, cx=CX, cy=CY,
                n_iters=int(stage_ids.size), use_exposure=True,
                opt_color_dec=True, opt_geo_dec=False, w_color=0.1,
                use_union=True, cache_packed=packed,
                geo_iters=int(np.sum(np.asarray(stage_ids) == 0)))
            return op, losses

        tm_scan = t_ms(lambda: scan_only()[1], reps=1)
        op, _ = scan_only()

        def writeback():
            Cd = mcfg.c_dim
            g = arr[2].at[uniq].set(op["feat"][:, :Cd], mode="drop")
            cc = arr[3].at[uniq].set(op["feat"][:, Cd:], mode="drop")
            return g, cc

        tm_wb = t_ms(writeback)
        tm_idx = t_ms(lambda: K.build_tiles(arr[0], arr[1]), reps=3)
        totals[lvl] = (tm_cache, tm_cp, tm_scan, tm_wb, tm_idx)
        it = int(np.asarray(stage_ids).size)
        print(f"| {lvl}: union cache build | {tm_cache:8.2f} ms |")
        print(f"| {lvl}: count+compact+pack | {tm_cp:8.2f} ms |")
        print(f"| {lvl}: map_scan ({it} it) | {tm_scan:8.2f} ms "
              f"({tm_scan/it:5.2f} ms/it) |")
        print(f"| {lvl}: feature writeback | {tm_wb:8.2f} ms |")
        print(f"| {lvl}: tile index rebuild | {tm_idx:8.2f} ms |")
    s = sum(sum(v) for v in totals.values())
    print(f"| sum of mapper parts | {s:8.2f} ms |")
    print()
    print("compare: bench.py run_map total (includes host glue between "
          "the above calls); bench map_ms minus this sum = host gap.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
