import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpslam_tpu import renderer as R
from hpslam_tpu.models import decoder as Dec


def build_wall_scene(rng, n_cap=4096, c_dim=8):
    """Dense point wall at z=-2 with small features."""
    xs, ys = np.meshgrid(np.linspace(-1.5, 1.5, 60), np.linspace(-1.2, 1.2, 48))
    pts = np.stack([xs.ravel(), ys.ravel(), np.full(xs.size, -2.0)], -1)
    pos = np.zeros((n_cap, 3), np.float32)
    pos[: pts.shape[0]] = pts
    count = pts.shape[0]
    geo = rng.normal(0, 0.1, (n_cap, c_dim)).astype(np.float32)
    col = rng.normal(0, 0.1, (n_cap, c_dim)).astype(np.float32)
    return jnp.asarray(pos), jnp.int32(count), jnp.asarray(geo), jnp.asarray(col)


@pytest.mark.slow
def test_render_rays_shapes_and_validity(rng):
    mcfg = Dec.ModelConfig(c_dim=8, geo_embed=16, col_embed=8, rel_embed=4,
                           hidden_geo=16, hidden_col=32)
    rcfg = R.RenderConfig(sample_near_pcl=False)
    params = Dec.init_nicer(jax.random.PRNGKey(0), mcfg)
    pos, count, geo, col = build_wall_scene(rng)

    N = 33
    rays_o = jnp.zeros((N, 3))
    dx = jnp.linspace(-0.3, 0.3, N)
    rays_d = jnp.stack([dx, jnp.zeros(N), -jnp.ones(N)], -1)
    gt_depth = 2.0 / -rays_d[:, 2] * jnp.ones(N)
    # one zero-depth ray
    gt_depth = gt_depth.at[0].set(0.0)
    rq = jnp.full((N,), 0.3)

    for stage in ["color_mid", "geometry_fine"]:
        d, u, c, vmask = R.render_rays(
            params, mcfg, rcfg, stage, rays_o, rays_d, gt_depth,
            pos, count, geo, col, rq)
        assert d.shape == (N,) and u.shape == (N,) and c.shape == (N, 3)
        assert vmask.shape == (N,)
        # zero-depth ray's depth forced to 0 when sample_near_pcl off
        assert float(d[0]) == 0.0
        # valid rays have depth near the wall depth band
        dd = np.asarray(d)[1:]
        gt = np.asarray(gt_depth)[1:]
        assert np.all(dd > 0.9 * gt) and np.all(dd < 1.1 * gt)
        assert bool(np.asarray(vmask)[1:].all())


@pytest.mark.slow
def test_render_feature_gradients(rng):
    mcfg = Dec.ModelConfig(c_dim=8, geo_embed=16, col_embed=8, rel_embed=4,
                           hidden_geo=16, hidden_col=32)
    rcfg = R.RenderConfig(sample_near_pcl=False)
    params = Dec.init_nicer(jax.random.PRNGKey(0), mcfg)
    pos, count, geo, col = build_wall_scene(rng)
    N = 16
    rays_o = jnp.zeros((N, 3))
    rays_d = jnp.stack([jnp.linspace(-0.2, 0.2, N), jnp.zeros(N), -jnp.ones(N)], -1)
    gt_depth = 2.0 * jnp.ones(N)
    rq = jnp.full((N,), 0.3)

    def loss(feats):
        d, u, c, m = R.render_rays(params, mcfg, rcfg, "color_fine",
                                   rays_o, rays_d, gt_depth,
                                   pos, count, feats["g"], feats["c"], rq)
        return jnp.sum(jnp.abs(gt_depth - d)) + jnp.sum(jnp.abs(c))

    g = jax.grad(loss)({"g": geo, "c": col})
    assert np.isfinite(np.asarray(g["g"])).all()
    assert float(jnp.abs(g["g"]).sum()) > 0
    assert float(jnp.abs(g["c"]).sum()) > 0


def test_sample_near_pcl_z(rng):
    pos, count, _, _ = build_wall_scene(rng)
    N = 5
    rays_o = jnp.zeros((N, 3))
    rays_d = jnp.stack([jnp.linspace(-0.1, 0.1, N), jnp.zeros(N), -jnp.ones(N)], -1)
    z, invalid = R.sample_near_pcl_z(rays_o, rays_d, 0.3, 5.0, 5, pos, count,
                                     jnp.full((N,), 0.3))
    assert z.shape == (N, 5)
    assert not bool(np.asarray(invalid).any())
    # samples should straddle the wall at depth ~2
    assert np.all(np.asarray(z)[:, 0] <= 2.1) and np.all(np.asarray(z)[:, -1] >= 1.9)


@pytest.mark.slow
def test_eval_points(rng):
    mcfg = Dec.ModelConfig(c_dim=8, geo_embed=16, col_embed=8, rel_embed=4,
                           hidden_geo=16, hidden_col=32)
    params = Dec.init_nicer(jax.random.PRNGKey(0), mcfg)
    pos, count, geo, col = build_wall_scene(rng)
    p = jnp.array([[0.0, 0.0, -2.0], [0.0, 0.0, 5.0]])
    occ, rgb, mask = R.eval_points(params, mcfg, p, pos, count, geo, col,
                                   jnp.full((2,), 0.3))
    assert bool(mask[0]) and not bool(mask[1])


def test_dense_cache_equivalence(rng):
    """Tracker dense-cache path == gather path: same render outputs and the
    SAME pose-side gradients (gradients flow through the recomputed
    distances in both; the dense path merely hoists the frozen-neighbour
    row gathers out of the loop).  Fast tier covers the production
    'color_fine' stage (both decoders); the geometry-only stage is the
    slow-marked twin below (each stage costs ~18 s of CPU grad tracing)."""
    _dense_cache_equivalence_check(rng, ["color_fine"])


@pytest.mark.slow
def test_dense_cache_equivalence_geometry(rng):
    _dense_cache_equivalence_check(rng, ["geometry_mid"])


def _dense_cache_equivalence_check(rng, stages):
    from hpslam_tpu.ops import knn as K

    mcfg = Dec.ModelConfig(c_dim=8, geo_embed=16, col_embed=8, rel_embed=4,
                           hidden_geo=16, hidden_col=32)
    rcfg = R.RenderConfig(sample_near_pcl=False)
    params = Dec.init_nicer(jax.random.PRNGKey(0), mcfg)
    pos, count, geo, col = build_wall_scene(rng)
    cat = jnp.concatenate([geo, col], axis=1)

    N = 17
    dx = jnp.linspace(-0.25, 0.25, N)
    rays_d = jnp.stack([dx, jnp.zeros(N), -jnp.ones(N)], -1)
    gt_depth = 2.0 / -rays_d[:, 2] * jnp.ones(N)
    rq = jnp.full((N,), 0.3)
    S = rcfg.N_surface

    def render(o_z, use_dense, stage):
        rays_o = jnp.stack([jnp.zeros(N), jnp.zeros(N),
                            jnp.full((N,), o_z)], -1)
        from hpslam_tpu.ops import sampling as Samp
        z = Samp.surface_z_vals(gt_depth, S, rcfg.near_end_surface,
                                rcfg.far_end_surface, rcfg.fix_interval)
        p = (rays_o[:, None] + rays_d[:, None] * z[..., None]).reshape(-1, 3)
        D, I = K.knn_auto(jax.lax.stop_gradient(p), pos, count, k=rcfg.nn_num)
        dense = None
        if use_dense:
            cap = pos.shape[0]
            I2 = jnp.where(D >= K.BIG, cap, I)
            safe = jnp.minimum(I2, cap - 1)
            valid = (I2 < cap)[..., None]
            cpos = jnp.where(valid, pos[safe], 1e6)
            cfs = jnp.where(valid, cat[safe], 0.0)
            dense = (cpos, cfs)
        d, u, c, vm = R.render_rays(
            params, mcfg, rcfg, stage, rays_o, rays_d, gt_depth,
            pos, count, geo, col, rq, is_tracker=True,
            knn_cache=(D, I), cat_feats=cat, dec_wgrads=False,
            dense_cache=dense)
        return d, u, c, vm

    for stage in stages:
        ref = render(0.0, False, stage)
        new = render(0.0, True, stage)
        for a, b in zip(ref, new):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)

        def loss(o_z, use_dense):
            d, u, c, _ = render(o_z, use_dense, stage)
            return (jnp.sum(jnp.abs(gt_depth - d) / jnp.sqrt(u + 1e-10))
                    + 0.5 * jnp.sum(jnp.abs(c)))

        g_ref = jax.grad(loss)(0.01, False)
        g_new = jax.grad(loss)(0.01, True)
        np.testing.assert_allclose(float(g_ref), float(g_new),
                                   rtol=1e-5, atol=1e-7)
