"""Pallas-fused NICER trunks vs the reference XLA path (values + grads)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpslam_tpu.models import decoder as Dec
from hpslam_tpu.ops import fused_mlp as FM


@pytest.fixture
def setup(rng):
    cfg = Dec.ModelConfig()
    params = Dec.init_nicer(jax.random.PRNGKey(3), cfg)
    n = 700  # not a multiple of the 512-row block (exercises padding)
    p = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    cg = jnp.asarray(rng.normal(0, 0.3, (n, cfg.c_dim)).astype(np.float32))
    cc = jnp.asarray(rng.normal(0, 0.3, (n, cfg.c_dim)).astype(np.float32))
    return cfg, params, p, cg, cc


def _ref_color(params, cfg, p, cg, cc, col_core):
    geo = params["geo_fine"]
    col = dict(params["col_fine"], core=col_core)
    occ = Dec.apply_geo(geo, cfg, p, cg)
    emb = Dec.fourier_features(p, col["B"], concat_cos=True)
    rgb = Dec._mlp_trunk(col["core"], cfg, emb, cc, Dec.softplus100)
    return occ, rgb


def test_fused_color_forward_matches(setup):
    cfg, params, p, cg, cc = setup
    geo_flat = tuple(FM.flatten_core(params["geo_fine"]["core"]))
    col_flat = tuple(FM.flatten_core(params["col_fine"]["core"]))
    occ_f, rgb_f = FM.nicer_fused_color(
        p, cg, cc, geo_flat, col_flat,
        (params["geo_fine"]["B"], params["col_fine"]["B"]),
        cfg.n_blocks, cfg.skip, True)
    occ_r, rgb_r = _ref_color(params, cfg, p, cg, cc,
                              params["col_fine"]["core"])
    np.testing.assert_allclose(np.asarray(occ_f), np.asarray(occ_r),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_r),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_fused_color_grads_match(setup):
    cfg, params, p, cg, cc = setup
    geo_flat = tuple(FM.flatten_core(params["geo_fine"]["core"]))
    col_core = params["col_fine"]["core"]
    Bs = (params["geo_fine"]["B"], params["col_fine"]["B"])

    def loss_fused(p_, cg_, cc_, core):
        col_flat = tuple(FM.flatten_core(core))
        occ, rgb = FM.nicer_fused_color(p_, cg_, cc_, geo_flat, col_flat,
                                        Bs, cfg.n_blocks, cfg.skip, True)
        return jnp.sum(jnp.sin(occ)) + jnp.sum(jnp.cos(rgb))

    def loss_ref(p_, cg_, cc_, core):
        occ, rgb = _ref_color(params, cfg, p_, cg_, cc_, core)
        return jnp.sum(jnp.sin(occ)) + jnp.sum(jnp.cos(rgb))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(p, cg, cc, col_core)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(p, cg, cc, col_core)
    for a, b, name in [(gf[0], gr[0], "dp"), (gf[1], gr[1], "dc_geo"),
                       (gf[2], gr[2], "dc_col")]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=name)
    fa = jax.tree.leaves(gf[3])
    fb = jax.tree.leaves(gr[3])
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4,
                                   err_msg="d col core")


def test_fused_geo_matches(setup):
    cfg, params, p, cg, cc = setup
    geo_flat = tuple(FM.flatten_core(params["geo_fine"]["core"]))
    Bg = params["geo_fine"]["B"]

    def loss_fused(p_, cg_):
        occ = FM.nicer_fused_geo(p_, cg_, geo_flat, Bg, cfg.n_blocks,
                                 cfg.skip, True)
        return jnp.sum(jnp.sin(occ))

    def loss_ref(p_, cg_):
        occ = Dec.apply_geo(params["geo_fine"], cfg, p_, cg_)
        return jnp.sum(jnp.sin(occ))

    np.testing.assert_allclose(float(loss_fused(p, cg)),
                               float(loss_ref(p, cg)), rtol=1e-5)
    gf = jax.grad(loss_fused, argnums=(0, 1))(p, cg)
    gr = jax.grad(loss_ref, argnums=(0, 1))(p, cg)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]),
                               rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_map_scan_fused_matches_unfused(rng):
    """The union-path mapping scan with fused trunks must track the XLA
    path's loss trajectory (same schedule, same PRNG)."""
    import dataclasses as dc
    from tests.test_engines import small_cfg, wall_level
    from hpslam_tpu.mapper import (build_pixel_union_cache,
                                   pack_union_cache, map_scan)
    from hpslam_tpu.ops import knn as K
    from hpslam_tpu.ops import optim as Opt
    from hpslam_tpu import renderer as R

    mcfg = small_cfg()
    rcfg = R.RenderConfig(sample_near_pcl=False,
                          near_end_surface=0.96, far_end_surface=1.04)
    params = Dec.init_nicer(jax.random.PRNGKey(0), mcfg)
    pos, count, geo, col = wall_level(rng)
    H, W, F = 24, 32, 2
    fx = fy = 20.0
    cx, cy = 15.5, 11.5
    jj, ii = np.mgrid[0:H, 0:W]
    dirs = np.stack([(ii - cx) / fx, -(jj - cy) / fy,
                     -np.ones_like(ii, float)], -1)
    depth = (2.0 / -dirs[..., 2]).astype(np.float32)
    color_img = rng.uniform(0.2, 0.8, (H, W, 3)).astype(np.float32)
    colors = jnp.asarray(np.broadcast_to(color_img, (F, H, W, 3)).copy())
    depths = jnp.asarray(np.broadcast_to(depth, (F, H, W)).copy())
    c2ws = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (F, 1, 1)))
    rq = jnp.asarray(np.full((F, H, W), 0.4, np.float32))
    pools = jnp.asarray(np.broadcast_to(
        np.arange(H * W, dtype=np.int32), (F, H * W)).copy())
    pool_lens = jnp.asarray(np.full((F,), H * W, np.int32))
    expo = jnp.asarray(np.zeros((F, 8), np.float32))
    idx = K.build_tiles(pos, count)
    S_, k_ = rcfg.N_surface, mcfg.nn_num
    key = jax.random.PRNGKey(7)

    def run(fused: bool):
        mc = dc.replace(mcfg, fused_mlp=fused)
        op = {"feat": jnp.concatenate([geo, col], 1)}
        ost = Opt.init(op)
        cp, uids, Wm, pm, cconst = build_pixel_union_cache(
            key, depths, c2ws, pools, pool_lens, rq, idx,
            jnp.int32(pos.shape[0]), P=128, S=S_, k=k_, u_max=S_ * k_,
            H=H, W=W, fx=fx, fy=fy, cx=cx, cy=cy,
            near_surface=0.96, far_surface=1.04,
            min_nn=mcfg.min_nn_num, weighting=mcfg.weighting,
            colors=colors)
        packed = pack_union_cache(cconst, Wm, pm, uids)
        n_it = 4
        stage_ids = jnp.asarray([0, 0, 1, 1], jnp.int32)
        lr_table = jnp.tile(jnp.asarray([[0.0, 0.03, 0.005, 0.0]],
                                        jnp.float32), (n_it, 1))
        op, ost2, losses = map_scan(
            params, mc, rcfg, op, ost, key,
            colors, depths, c2ws, rq,
            cp, None, uids, expo,
            pos, count,
            stage_ids, lr_table, jnp.int32(depths.shape[0]),
            level="fine", n_rays=64, F_max=depths.shape[0], H=H, W=W,
            fx=fx, fy=fy, cx=cx, cy=cy,
            n_iters=n_it, use_exposure=False,
            opt_color_dec=False, opt_geo_dec=False, w_color=0.1,
            use_union=True, cache_packed=packed)
        return np.asarray(losses), np.asarray(op["feat"])

    l_ref, f_ref = run(False)
    l_fus, f_fus = run(True)
    # production fused kernels use single-pass bf16 matmuls (TPU default
    # for the XLA path too); on CPU the reference path is f32, so compare
    # at bf16-trajectory tolerance.  A handful of features see Adam
    # sign-flips on noise-level gradients (each worth ~lr per step), so
    # the table comparison is quantile-based.
    np.testing.assert_allclose(l_fus, l_ref, rtol=3e-3, atol=3e-3)
    diff = np.abs(f_fus - f_ref)
    assert np.quantile(diff, 0.99) < 5e-3, np.quantile(diff, 0.99)
    assert diff.max() < 0.2, diff.max()


@pytest.mark.slow
def test_comp_fwd_bwd_matches_reference(rng):
    """In-kernel compositor helpers vs ops.composite.raw2outputs (+ its
    autodiff) including the -100 no-neighbour forcing."""
    from hpslam_tpu.ops import composite as Co

    n, S = 257, 5
    occ = jnp.asarray(rng.normal(0, 3, (n, S)).astype(np.float32))
    rgb = jnp.asarray(rng.uniform(0, 1, (n, S, 3)).astype(np.float32))
    z = jnp.asarray(rng.uniform(1.9, 2.1, (n, S)).astype(np.float32))
    pm = jnp.asarray(rng.uniform(0, 1, (n, S)) > 0.2)
    coef = 0.1

    def ref(occ, rgb):
        occf = jnp.where(pm, occ, -100.0)
        raw = jnp.concatenate([rgb, occf[..., None]], -1)
        d, v, c, _ = Co.raw2outputs(raw, z, jnp.zeros((n, 3)),
                                    occupancy=True, coef=coef)
        return d, v, c

    d_r, v_r, c_r = ref(occ, rgb)
    d_f, v_f, c_f, res = FM._comp_fwd(occ, rgb, z, pm, coef)
    np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_r), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_r), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_r), rtol=1e-5,
                               atol=1e-6)

    dD = jnp.asarray(rng.normal(0, 1, (n,)).astype(np.float32))
    dV = jnp.asarray(rng.normal(0, 1, (n,)).astype(np.float32))
    dC = jnp.asarray(rng.normal(0, 1, (n, 3)).astype(np.float32))

    def scalar(occ, rgb):
        d, v, c = ref(occ, rgb)
        return jnp.sum(d * dD) + jnp.sum(v * dV) + jnp.sum(c * dC)

    g_occ_r, g_rgb_r = jax.grad(scalar, argnums=(0, 1))(occ, rgb)
    g_occ_f, g_rgb_f = FM._comp_bwd(res, z, rgb, pm, coef, dD, dV, dC)
    np.testing.assert_allclose(np.asarray(g_occ_f), np.asarray(g_occ_r),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_rgb_f), np.asarray(g_rgb_r),
                               rtol=2e-4, atol=1e-5)


@pytest.mark.slow
def test_fused_composite_matches_chain(rng):
    """nicer_fused_composite (trunks + compositor in one kernel pair) vs
    the separate fused trunks + ops.composite chain: values and all
    gradients (c_geo, c_col, colour core)."""
    from hpslam_tpu.ops import composite as Co

    cfg = Dec.ModelConfig()
    params = Dec.init_nicer(jax.random.PRNGKey(3), cfg)
    n_r, S = 48, 5
    n = n_r * S
    p = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    cg = jnp.asarray(rng.normal(0, 0.3, (n, cfg.c_dim)).astype(np.float32))
    cc = jnp.asarray(rng.normal(0, 0.3, (n, cfg.c_dim)).astype(np.float32))
    z = jnp.asarray(rng.uniform(1.9, 2.1, (n_r, S)).astype(np.float32))
    pm = jnp.asarray((rng.uniform(0, 1, (n_r, S)) > 0.2)
                     .astype(np.float32))
    geo_flat = tuple(FM.flatten_core(params["geo_fine"]["core"]))
    Bs = (params["geo_fine"]["B"], params["col_fine"]["B"])
    coef = 0.1

    def chain(cg_, cc_, core):
        col_flat = tuple(FM.flatten_core(core))
        occ, rgb = FM.nicer_fused_color(p, cg_, cc_, geo_flat, col_flat,
                                        Bs, cfg.n_blocks, cfg.skip, True)
        occf = jnp.where(pm.reshape(-1) > 0.5, occ, -100.0)
        raw = jnp.concatenate([rgb, occf[:, None]], -1).reshape(n_r, S, 4)
        d, v, c, _ = Co.raw2outputs(raw, z, jnp.zeros((n_r, 3)),
                                    occupancy=True, coef=coef)
        return d, v, c

    def fused(cg_, cc_, core):
        col_flat = tuple(FM.flatten_core(core))
        return FM.nicer_fused_composite(
            cg_, cc_, p, z, pm, geo_flat, col_flat, Bs,
            cfg.n_blocks, cfg.skip, True, S, coef)

    core0 = params["col_fine"]["core"]
    d_r, v_r, c_r = chain(cg, cc, core0)
    d_f, v_f, c_f = fused(cg, cc, core0)
    np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_r),
                               rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_r),
                               rtol=2e-4, atol=2e-4)

    dD = jnp.asarray(rng.normal(0, 1, (n_r,)).astype(np.float32))
    dC = jnp.asarray(rng.normal(0, 1, (n_r, 3)).astype(np.float32))

    def loss_of(f):
        def go(cg_, cc_, core):
            d, v, c = f(cg_, cc_, core)
            # unc is stop-gradded in both engines; test d + c paths
            return jnp.sum(d * dD) + jnp.sum(c * dC)
        return go

    g_r = jax.grad(loss_of(chain), argnums=(0, 1, 2))(cg, cc, core0)
    g_f = jax.grad(loss_of(fused), argnums=(0, 1, 2))(cg, cc, core0)
    np.testing.assert_allclose(np.asarray(g_f[0]), np.asarray(g_r[0]),
                               rtol=3e-3, atol=3e-4, err_msg="dc_geo")
    np.testing.assert_allclose(np.asarray(g_f[1]), np.asarray(g_r[1]),
                               rtol=3e-3, atol=3e-4, err_msg="dc_col")
    for a, b in zip(jax.tree.leaves(g_f[2]), jax.tree.leaves(g_r[2])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-3, atol=3e-4,
                                   err_msg="d col core")


@pytest.mark.slow
@pytest.mark.parametrize("expo_dec", [False, True],
                         ids=["plain", "expo+decopt"])
def test_map_scan_fused_composite_matches(rng, expo_dec):
    """map_scan with fused_composite must track the fused-trunks-only
    trajectory (same schedule/PRNG; both use bf16-pass matmuls)."""
    import dataclasses as dc
    from tests.test_engines import small_cfg, wall_level
    from hpslam_tpu.mapper import (build_pixel_union_cache,
                                   pack_union_cache, map_scan)
    from hpslam_tpu.ops import knn as K
    from hpslam_tpu.ops import optim as Opt
    from hpslam_tpu import renderer as R

    mcfg = small_cfg()
    if expo_dec:
        mcfg = dc.replace(mcfg, encode_exposure=True)
    rcfg = R.RenderConfig(sample_near_pcl=False,
                          near_end_surface=0.96, far_end_surface=1.04)
    params = Dec.init_nicer(jax.random.PRNGKey(0), mcfg)
    pos, count, geo, col = wall_level(rng)
    H, W, F = 24, 32, 2
    fx = fy = 20.0
    cx, cy = 15.5, 11.5
    jj, ii = np.mgrid[0:H, 0:W]
    dirs = np.stack([(ii - cx) / fx, -(jj - cy) / fy,
                     -np.ones_like(ii, float)], -1)
    depth = (2.0 / -dirs[..., 2]).astype(np.float32)
    color_img = rng.uniform(0.2, 0.8, (H, W, 3)).astype(np.float32)
    colors = jnp.asarray(np.broadcast_to(color_img, (F, H, W, 3)).copy())
    depths = jnp.asarray(np.broadcast_to(depth, (F, H, W)).copy())
    c2ws = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (F, 1, 1)))
    rq = jnp.asarray(np.full((F, H, W), 0.4, np.float32))
    pools = jnp.asarray(np.broadcast_to(
        np.arange(H * W, dtype=np.int32), (F, H * W)).copy())
    pool_lens = jnp.asarray(np.full((F,), H * W, np.int32))
    expo = jnp.asarray(np.zeros((F, 8), np.float32))
    idx = K.build_tiles(pos, count)
    S_, k_ = rcfg.N_surface, mcfg.nn_num
    key = jax.random.PRNGKey(7)

    def run(comp: bool):
        mc = dc.replace(mcfg, fused_mlp=True, fused_composite=comp)
        op = {"feat": jnp.concatenate([geo, col], 1)}
        if expo_dec:
            from jax.flatten_util import ravel_pytree
            op["dec_flat"], _ = ravel_pytree(
                {"col_fine": jax.tree.map(jnp.copy, params["col_fine"])})
            op["expo_feat"] = jnp.zeros((8,), jnp.float32)
        ost = Opt.init(op)
        cp, uids, Wm, pm, cconst = build_pixel_union_cache(
            key, depths, c2ws, pools, pool_lens, rq, idx,
            jnp.int32(pos.shape[0]), P=128, S=S_, k=k_, u_max=S_ * k_,
            H=H, W=W, fx=fx, fy=fy, cx=cx, cy=cy,
            near_surface=0.96, far_surface=1.04,
            min_nn=mcfg.min_nn_num, weighting=mcfg.weighting,
            colors=colors)
        packed = pack_union_cache(cconst, Wm, pm, uids)
        n_it = 4
        stage_ids = jnp.asarray([0, 0, 1, 1], jnp.int32)
        dec_lr = 0.005 if expo_dec else 0.0
        lr_table = jnp.tile(jnp.asarray([[dec_lr, 0.03, 0.005, 0.0]],
                                        jnp.float32), (n_it, 1))
        op, _, losses = map_scan(
            params, mc, rcfg, op, ost, key,
            colors, depths, c2ws, rq,
            cp, None, uids, expo,
            pos, count,
            stage_ids, lr_table, jnp.int32(F),
            level="fine", n_rays=64, F_max=F, H=H, W=W,
            fx=fx, fy=fy, cx=cx, cy=cy,
            n_iters=n_it, use_exposure=expo_dec,
            opt_color_dec=expo_dec, opt_geo_dec=False, w_color=0.1,
            use_union=True, cache_packed=packed, geo_iters=2)
        extra = (np.asarray(op["dec_flat"]) if expo_dec
                 else np.zeros(()))
        return np.asarray(losses), np.asarray(op["feat"]), extra

    l_ref, f_ref, d_ref = run(False)
    l_cmp, f_cmp, d_cmp = run(True)
    np.testing.assert_allclose(l_cmp, l_ref, rtol=3e-3, atol=3e-3)
    diff = np.abs(f_cmp - f_ref)
    assert np.quantile(diff, 0.99) < 5e-3, np.quantile(diff, 0.99)
    if expo_dec:
        # colour-decoder weights must move identically-ish under the
        # in-kernel wgrads (exposure affine + core weight cotangents)
        assert np.any(d_ref != np.asarray(jax.flatten_util.ravel_pytree(
            {"col_fine": params["col_fine"]})[0]))
        np.testing.assert_allclose(d_cmp, d_ref, rtol=5e-3, atol=5e-4)
