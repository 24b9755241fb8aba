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
