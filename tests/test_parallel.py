import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpslam_tpu.parallel.mesh import make_mesh
from hpslam_tpu.parallel.knn_tp import make_tp_knn
from hpslam_tpu.ops import knn as K


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_tp_knn_matches_single_chip(rng):
    mesh = make_mesh(8, tp=8, dp=1)
    tp_knn = make_tp_knn(mesh, k=8)
    N_cap, count, Q = 1024, 900, 100
    pts = rng.uniform(-2, 2, (N_cap, 3)).astype(np.float32)
    q = rng.uniform(-2, 2, (Q, 3)).astype(np.float32)

    from jax.sharding import NamedSharding, PartitionSpec as P
    pts_sh = jax.device_put(jnp.asarray(pts), NamedSharding(mesh, P("tp")))
    D_tp, I_tp = tp_knn(jnp.asarray(q), pts_sh, jnp.int32(count))
    D_ref, I_ref = K.knn(jnp.asarray(q), jnp.asarray(pts), jnp.int32(count))
    np.testing.assert_allclose(np.asarray(D_tp), np.asarray(D_ref), atol=1e-5)
    same = np.asarray(I_tp) == np.asarray(I_ref)
    ties = np.isclose(np.asarray(D_tp), np.asarray(D_ref), atol=1e-6)
    assert np.all(same | ties)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_entry_compiles():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "graft_entry2",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out[0])).all()


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_dp_map_step_matches_single_device(rng):
    """The dp-sharded mapping step must compute the SAME update as one
    device: ray sharding only changes where per-ray work runs; XLA's
    gradient all-reduce restores the full-batch gradient."""
    from hpslam_tpu.models import decoder as Dec
    from hpslam_tpu.ops import optim as Opt
    from hpslam_tpu.renderer import RenderConfig, render_rays
    from hpslam_tpu.parallel.sharded import make_dp_map_step

    mcfg = Dec.ModelConfig(c_dim=8, geo_embed=16, col_embed=8,
                           hidden_geo=16, hidden_col=32)
    rcfg = RenderConfig(sample_near_pcl=False)
    params = Dec.init_nicer(jax.random.PRNGKey(0), mcfg)

    n_cap, n_pts = 512, 400
    pos = np.zeros((n_cap, 3), np.float32)
    pos[:n_pts] = rng.uniform(-1, 1, (n_pts, 3))
    pos[:n_pts, 2] = -2.0
    geo = rng.normal(0, 0.1, (n_cap, 8)).astype(np.float32)
    col = rng.normal(0, 0.1, (n_cap, 8)).astype(np.float32)

    R = 64  # divisible by 8 devices
    dirs = rng.uniform(-0.4, 0.4, (R, 3)).astype(np.float32)
    dirs[:, 2] = -1.0
    rays_o = np.zeros((R, 3), np.float32)
    gt_depth = np.full((R,), 2.0, np.float32)
    gt_color = rng.uniform(0, 1, (R, 3)).astype(np.float32)
    rq = np.full((R,), 0.6, np.float32)

    args = (jnp.asarray(rays_o), jnp.asarray(dirs), jnp.asarray(gt_depth),
            jnp.asarray(gt_color), jnp.asarray(pos), jnp.int32(n_pts),
            jnp.asarray(rq))

    # single-device reference update (same math as make_dp_map_step)
    feats0 = {"geo": jnp.asarray(geo), "col": jnp.asarray(col)}
    ost0 = Opt.init(feats0)

    def loss_fn(feats):
        depth, unc, color, vmask = render_rays(
            params, mcfg, rcfg, "color_fine", args[0], args[1], args[2],
            args[4], args[5], feats["geo"], feats["col"], args[6])
        mask = (args[2] > 0) & vmask & jnp.isfinite(depth)
        loss = jnp.sum(jnp.where(mask, jnp.abs(args[2] - depth), 0.0))
        return loss + 0.1 * jnp.sum(
            jnp.where(mask[:, None], jnp.abs(args[3] - color), 0.0))

    l_ref, g_ref = jax.value_and_grad(loss_fn)(feats0)
    feats_ref, _ = Opt.update(g_ref, ost0, feats0, 0.03)

    # dp step over an 8-device mesh
    from hpslam_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(8, tp=1, dp=8)
    step = make_dp_map_step(mesh, mcfg, rcfg, "color_fine", lr=0.03,
                            w_color=0.1)
    feats_dp, _, l_dp = step(params,
                             {"geo": jnp.asarray(geo),
                              "col": jnp.asarray(col)},
                             Opt.init(feats0), *args)
    np.testing.assert_allclose(float(l_dp), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(feats_dp["geo"]),
                               np.asarray(feats_ref["geo"]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(feats_dp["col"]),
                               np.asarray(feats_ref["col"]),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_dp_track_step_matches_single_device(rng):
    """Pose gradient over dp-sharded rays == single-device pose gradient."""
    from hpslam_tpu.models import decoder as Dec
    from hpslam_tpu.ops import optim as Opt
    from hpslam_tpu.ops import geometry as G
    from hpslam_tpu.renderer import RenderConfig, render_rays
    from hpslam_tpu.parallel.sharded import make_dp_track_step
    from hpslam_tpu.parallel.mesh import make_mesh

    mcfg = Dec.ModelConfig(c_dim=8, geo_embed=16, col_embed=8,
                           hidden_geo=16, hidden_col=32)
    rcfg = RenderConfig(sample_near_pcl=False)
    params = Dec.init_nicer(jax.random.PRNGKey(0), mcfg)

    n_cap, n_pts = 512, 400
    pos = np.zeros((n_cap, 3), np.float32)
    pos[:n_pts] = rng.uniform(-1, 1, (n_pts, 3))
    pos[:n_pts, 2] = -2.0
    geo = rng.normal(0, 0.1, (n_cap, 8)).astype(np.float32)
    col = rng.normal(0, 0.1, (n_cap, 8)).astype(np.float32)

    R = 64
    fx = fy = 20.0
    cx = cy = 12.0
    i = rng.uniform(2, 22, (R,)).astype(np.float32)
    j = rng.uniform(2, 22, (R,)).astype(np.float32)
    gt_depth = np.full((R,), 2.0, np.float32)
    gt_color = rng.uniform(0, 1, (R, 3)).astype(np.float32)
    rq = np.full((R,), 0.6, np.float32)
    cam0 = jnp.asarray(np.array([1, 0, 0, 0, 0.02, -0.01, 0.03],
                                np.float32))
    intr = jnp.asarray(np.array([fx, fy, cx, cy], np.float32))

    def loss_fn(cam):
        c2w = G.get_camera_from_tensor(cam)
        rays_o, rays_d = G.get_rays_from_uv(jnp.asarray(i), jnp.asarray(j),
                                            c2w, fx, fy, cx, cy)
        depth, unc, color, _ = render_rays(
            params, mcfg, rcfg, "color_fine", rays_o, rays_d,
            jnp.asarray(gt_depth), jnp.asarray(pos), jnp.int32(n_pts),
            jnp.asarray(geo), jnp.asarray(col), jnp.asarray(rq),
            is_tracker=True)
        unc = jax.lax.stop_gradient(unc)
        mask = (jnp.asarray(gt_depth) > 0) & jnp.isfinite(depth)
        tmp = jnp.abs(jnp.asarray(gt_depth) - depth) / jnp.sqrt(unc + 1e-10)
        loss = jnp.sum(jnp.where(mask, jnp.clip(tmp, 0, 1e3), 0.0))
        return loss + 0.5 * jnp.sum(
            jnp.where(mask[:, None],
                      jnp.abs(jnp.asarray(gt_color) - color), 0.0))

    l_ref, g_ref = jax.value_and_grad(loss_fn)(cam0)
    ost = Opt.init(cam0)
    cam_ref, _ = Opt.update(g_ref, ost, cam0, 0.002)

    mesh = make_mesh(8, tp=1, dp=8)
    step = make_dp_track_step(mesh, mcfg, rcfg, "color_fine",
                              cam_lr=0.002, w_color=0.5)
    cam_dp, _, l_dp = step(params, cam0, Opt.init(cam0),
                           jnp.asarray(i), jnp.asarray(j),
                           jnp.asarray(gt_depth), jnp.asarray(gt_color),
                           jnp.asarray(pos), jnp.int32(n_pts),
                           jnp.asarray(geo), jnp.asarray(col),
                           jnp.asarray(rq), intr)
    np.testing.assert_allclose(float(l_dp), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(cam_dp), np.asarray(cam_ref),
                               rtol=1e-5, atol=1e-7)
