import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpslam_tpu import state as St
from hpslam_tpu.models import decoder as Dec
from hpslam_tpu.ops import knn as K


def small_cfg():
    return Dec.ModelConfig(c_dim=8, geo_embed=16, col_embed=8, rel_embed=4,
                           hidden_geo=16, hidden_col=32)


@pytest.mark.slow
def test_decoder_shapes_and_grad(rng):
    cfg = small_cfg()
    params = Dec.init_nicer(jax.random.PRNGKey(0), cfg)
    N_cap, count, Q = 256, 200, 40
    pos = jnp.asarray(rng.uniform(-1, 1, (N_cap, 3)).astype(np.float32))
    geo = jnp.asarray(rng.normal(0, 0.1, (N_cap, 8)).astype(np.float32))
    col = jnp.asarray(rng.normal(0, 0.1, (N_cap, 8)).astype(np.float32))
    p = jnp.asarray(rng.uniform(-1, 1, (Q, 3)).astype(np.float32))
    D, I = K.knn(p, pos, jnp.int32(count), k=8)
    rq = jnp.full((Q,), 0.5)

    for stage in ["geometry_mid", "color_mid", "geometry_fine", "color_fine"]:
        raw, vmask, pmask = Dec.eval_stage(
            params, cfg, stage, p, D, I, geo, col, pos, rq, n_pts_per_ray=5)
        assert raw.shape == (Q, 4)
        assert vmask.shape == (Q // 5,)
        assert pmask.shape == (Q,)
        if stage.startswith("geometry"):
            assert np.allclose(np.asarray(raw[:, :3]), 0.0)
        else:
            rgb = np.asarray(raw[:, :3])
            assert (rgb >= 0).all() and (rgb <= 1).all()  # sigmoid output

    # gradients flow into features through a colour stage
    def loss(feats):
        raw, _, _ = Dec.eval_stage(params, cfg, "color_fine", p, D, I,
                                   feats["g"], feats["c"], pos, rq, 5)
        return jnp.sum(raw ** 2)
    g = jax.grad(loss)({"g": geo, "c": col})
    assert float(jnp.abs(g["g"]).sum()) > 0
    assert float(jnp.abs(g["c"]).sum()) > 0


@pytest.mark.slow
def test_exposure_affine():
    cfg = Dec.ModelConfig(encode_exposure=True)
    params = Dec.init_color_decoder(jax.random.PRNGKey(1), cfg)
    rot, trans = Dec.exposure_affine(params, jnp.zeros(8))
    assert rot.shape == (3, 3) and trans.shape == (3,)


def test_softplus100_matches_torch_semantics():
    import torch
    x = np.linspace(-1, 1, 101).astype(np.float32)
    ours = np.asarray(Dec.softplus100(jnp.asarray(x)))
    ref = torch.nn.Softplus(beta=100)(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_add_points_semantics(rng):
    cfg = {
        "model": {"c_dim": 8},
        "pointcloud": {
            "nn_num": 8, "N_add": 3, "near_end_surface": 0.96,
            "far_end_surface": 1.04, "radius_add": 0.04, "radius_min": 0.02,
            "radius_query": 0.08,
            "radius_hierarchy": {"fine": {}, "mid": {}},
        },
    }
    npc = St.NeuralPointCloud(cfg, initial_capacity=256)
    B = 16
    rays_o = np.zeros((B, 3), np.float32)
    rays_d = np.tile(np.array([[0, 0, -1.0]], np.float32), (B, 1))
    rays_d[:, 0] = np.linspace(-0.5, 0.5, B)
    depth = np.full((B,), 2.0, np.float32)
    color = np.full((B, 3), 0.5, np.float32)
    r = np.full((B,), 0.01, np.float32)

    n1 = npc.add_neural_points(rays_o, rays_d, depth, color, "fine",
                               dynamic_radius=r)
    assert n1 == B  # empty cloud: all locations accepted
    assert npc.pts_num()["fine"] == B * 3
    # re-adding the same rays with a generous radius: all rejected
    n2 = npc.add_neural_points(rays_o, rays_d, depth, color, "fine",
                               dynamic_radius=np.full((B,), 0.5, np.float32))
    assert n2 == 0
    assert npc.pts_num()["fine"] == B * 3
    # points lie in [0.96d, 1.04d] along the rays
    pos = np.asarray(npc.cloud_pos("fine"))[: B * 3]
    t = -pos[:, 2]  # rays have dz=-1 (unnormalised); z = t * dz
    assert (t >= 0.96 * 2.0 - 1e-5).all() and (t <= 1.04 * 2.0 + 1e-5).all()
    # input cloud recorded once per call
    assert len(npc.input_pos()) == 2 * B


def test_capacity_growth(rng):
    cfg = {
        "model": {"c_dim": 4},
        "pointcloud": {
            "nn_num": 8, "N_add": 3, "near_end_surface": 0.96,
            "far_end_surface": 1.04, "radius_add": 0.04, "radius_min": 0.02,
            "radius_query": 0.08, "radius_hierarchy": {"fine": {}},
        },
    }
    npc = St.NeuralPointCloud(cfg, initial_capacity=64)
    B = 64
    rays_o = np.zeros((B, 3), np.float32)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 1
    depth = np.full((B,), 2.0, np.float32)
    color = np.zeros((B, 3), np.float32)
    npc.add_neural_points(rays_o, d, depth, color, "fine",
                          dynamic_radius=np.full((B,), 1e-4, np.float32))
    assert npc.pts_num()["fine"] == B * 3
    assert npc.levels["fine"].capacity >= B * 3
