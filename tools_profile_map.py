#!/usr/bin/env python
"""Attribution microbench for the mapping iteration (map_scan step cost).

Times short map_scan runs under ablated configurations to attribute the
per-iteration cost: full step, geometry-only, no-Adam-moments, smaller
union, smaller compact table, fewer rays.  Run on the real TPU.
"""
import os
import time

import numpy as np

H, W = 460, 620
FX, FY, CX, CY = 577.59, 578.73, 308.9, 232.68
N_FINE = 300_000
CAP_FINE = 1 << 19
MAP_RAYS, WINDOW = 10_000, 20


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
    from hpslam_tpu.mapper import (map_scan, build_pixel_union_cache,
                                   compact_scene, count_unique, unique_bucket,
                                   pack_union_cache)

    rng = np.random.default_rng(1219)
    mcfg = Dec.ModelConfig(encode_exposure=True, encode_rel_pos_in_col=False)
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

    index = jax.block_until_ready(K.build_tiles(pos_j, count))
    key = jax.random.PRNGKey(0)

    P_CACHE = 2000
    N_IT = 60

    def run(tag, n_rays=MAP_RAYS, u_max=16, stage=1, use_exposure=True,
            opt_color_dec=True, U_override=None, n_iters=N_IT,
            w_color=0.1, bf16=False, fused=False, comp=False):
        mc = Dec.ModelConfig(encode_exposure=True,
                             encode_rel_pos_in_col=False,
                             mm_bf16=bf16, fused_mlp=fused,
                             fused_composite=comp)
        cache_pix, uids, Wm, pmask, cache_const = build_pixel_union_cache(
            key, depths, c2ws, pools, pool_lens, rq_stack,
            index, jnp.int32(CAP_FINE),
            P=P_CACHE, S=5, k=8, u_max=u_max, H=H, W=W,
            fx=FX, fy=FY, cx=CX, cy=CY,
            near_surface=0.96, far_surface=1.04,
            min_nn=mcfg.min_nn_num, weighting=mcfg.weighting,
            colors=colors)
        U = U_override or unique_bucket(int(count_unique(uids)), CAP_FINE)
        uniq, uids_c, pos_c, geo_c, col_c = compact_scene(
            uids, pos_j, jnp.asarray(geo), jnp.asarray(col), U)
        packed = pack_union_cache(cache_const, Wm, pmask, uids_c)
        # NOTE map_scan donates opt_params/opt_state — never put shared
        # arrays (params[...]) in op without copying.
        op = {"feat": jnp.concatenate([geo_c, col_c], 1)}
        if opt_color_dec:
            from jax.flatten_util import ravel_pytree
            dec_tree = {"col_fine": jax.tree.map(jnp.copy,
                                                 params["col_fine"])}
            op["dec_flat"], _ = ravel_pytree(dec_tree)
        if use_exposure:
            op["expo_feat"] = jnp.zeros((8,), jnp.float32)
        ost = Opt.init(op)
        stage_ids = jnp.full((n_iters,), stage, jnp.int32)
        lr_table = jnp.tile(jnp.asarray([[0.005, 0.03, 0.005, 0.0]],
                                        jnp.float32), (n_iters, 1))

        def go(op, ost):
            return map_scan(
                params, mc, rcfg, op, ost, key,
                colors, depths, c2ws, rq_stack,
                cache_pix, None, uids_c, expo_stack,
                pos_c, jnp.int32(U),
                stage_ids, lr_table, jnp.int32(F),
                level="fine", n_rays=n_rays, F_max=F, H=H, W=W,
                fx=FX, fy=FY, cx=CX, cy=CY,
                n_iters=n_iters, use_exposure=use_exposure,
                opt_color_dec=opt_color_dec, opt_geo_dec=False,
                w_color=w_color, use_union=True, cache_packed=packed,
                geo_iters=0 if stage else n_iters)

        # warmup/compile (donated args: rebuild)
        o2, s2, losses = go(jax.tree.map(jnp.copy, op),
                            jax.tree.map(jnp.copy, ost))
        jax.block_until_ready(losses)
        t0 = time.perf_counter()
        o2, s2, losses = go(op, ost)
        jax.block_until_ready(losses)
        dt = (time.perf_counter() - t0) * 1e3
        print(f"{tag:40s} U={U:7d} {dt/n_iters:7.3f} ms/iter "
              f"({dt:8.1f} ms / {n_iters} it)")
        return dt / n_iters

    print("platform:", jax.devices()[0])
    import sys
    variants = [
        ("full color stage (prod)", {}),
        ("geometry stage", dict(stage=0)),
        ("color u_max=8", dict(u_max=8)),
        ("geometry u_max=8", dict(stage=0, u_max=8)),
        ("color u8 U=65536", dict(u_max=8, U_override=65536)),
        ("color u8 no-dec-opt", dict(u_max=8, opt_color_dec=False)),
        ("color u8 no-expo", dict(u_max=8, use_exposure=False)),
        ("color u8 2500 rays", dict(u_max=8, n_rays=2500)),
        ("color u8 bf16", dict(u_max=8, bf16=True)),
        ("geometry u8 bf16", dict(stage=0, u_max=8, bf16=True)),
        ("color u8 bf16 no-dec-opt", dict(u_max=8, bf16=True, opt_color_dec=False)),
        ("color u8 fused", dict(u_max=8, fused=True)),
        ("geometry u8 fused", dict(stage=0, u_max=8, fused=True)),
        ("color u8 fused no-dec-opt", dict(u_max=8, fused=True, opt_color_dec=False)),
        ("color u8 comp", dict(u_max=8, fused=True, comp=True)),
        ("geometry u8 comp", dict(stage=0, u_max=8, fused=True, comp=True)),
        ("color u8 comp 2500 rays", dict(u_max=8, fused=True, comp=True,
                                         n_rays=2500)),
        ("color u8 comp 5000 rays", dict(u_max=8, fused=True, comp=True,
                                         n_rays=5000)),
        ("color u8 comp no-dec-opt", dict(u_max=8, fused=True, comp=True,
                                          opt_color_dec=False)),
        ("color u8 comp no-expo", dict(u_max=8, fused=True, comp=True,
                                       use_exposure=False)),
        ("color u8 comp U=8192", dict(u_max=8, fused=True, comp=True,
                                      U_override=8192)),
        ("color u4 comp", dict(u_max=4, fused=True, comp=True)),
        ("geometry u4 comp", dict(stage=0, u_max=4, fused=True, comp=True)),
        ("color u6 comp", dict(u_max=6, fused=True, comp=True)),
    ]
    only = sys.argv[1:] if len(sys.argv) > 1 else None
    for tag, kw in variants:
        if only and not any((o[1:] == tag if o.startswith("=") else o in tag) for o in only):
            continue
        try:
            run(tag, **kw)
        except Exception as e:
            print(f"{tag:40s} FAILED: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
