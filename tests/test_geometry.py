import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpslam_tpu.ops import geometry as G


def random_rotation(rng):
    # QR-based uniform-ish rotation
    A = rng.normal(size=(3, 3))
    Q, R = np.linalg.qr(A)
    Q *= np.sign(np.diag(R))
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


def test_quat_roundtrip(rng):
    for _ in range(50):
        R = random_rotation(rng)
        q = G.rotation2quad(jnp.asarray(R))
        R2 = G.quad2rotation(q)[0]
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)


def test_quat_matches_scipy(rng):
    from scipy.spatial.transform import Rotation
    for _ in range(20):
        R = random_rotation(rng)
        q = np.asarray(G.rotation2quad(jnp.asarray(R)))
        q_ref = np.roll(Rotation.from_matrix(R).as_quat(), 1)  # wxyz
        if q_ref[0] < 0:
            q_ref = -q_ref
        np.testing.assert_allclose(q, q_ref, atol=1e-6)


def test_camera_tensor_roundtrip(rng):
    R = random_rotation(rng)
    t = rng.normal(size=3)
    RT = np.concatenate([R, t[:, None]], axis=1)
    vec = G.get_tensor_from_camera(jnp.asarray(RT))
    RT2 = G.get_camera_from_tensor(vec)
    np.testing.assert_allclose(np.asarray(RT2), RT, atol=1e-5)
    # Tquad ordering
    vec_tq = G.get_tensor_from_camera(jnp.asarray(RT), Tquad=True)
    np.testing.assert_allclose(np.asarray(vec_tq[:3]), t, atol=1e-6)


def test_quad2rotation_grad():
    # pose gradients must flow (tracker requirement)
    def f(q):
        return jnp.sum(G.quad2rotation(q) ** 2)
    g = jax.grad(f)(jnp.array([0.9, 0.1, 0.2, 0.3]))
    assert np.all(np.isfinite(np.asarray(g)))


def test_rays_consistency():
    c2w = jnp.eye(4)
    H, W, fx, fy, cx, cy = 8, 10, 5.0, 5.0, 4.5, 3.5
    ro, rd = G.get_rays(H, W, fx, fy, cx, cy, c2w)
    assert ro.shape == (H, W, 3) and rd.shape == (H, W, 3)
    # center pixel ray points along -z
    np.testing.assert_allclose(
        np.asarray(rd[3, 4]), [(4 - 4.5) / 5.0, -(3 - 3.5) / 5.0, -1.0], atol=1e-6)
    # uv version agrees
    i = jnp.array([4.0]); j = jnp.array([3.0])
    ro2, rd2 = G.get_rays_from_uv(i, j, c2w, fx, fy, cx, cy)
    np.testing.assert_allclose(np.asarray(rd2[0]), np.asarray(rd[3, 4]), atol=1e-6)


def test_project_unproject_roundtrip(rng):
    fx, fy, cx, cy = 100.0, 110.0, 32.0, 24.0
    R = random_rotation(rng)
    t = rng.normal(size=3)
    c2w = np.eye(4); c2w[:3, :3] = R; c2w[:3, 3] = t
    i = jnp.array([10.0, 50.0]); j = jnp.array([5.0, 40.0])
    ro, rd = G.get_rays_from_uv(i, j, jnp.asarray(c2w), fx, fy, cx, cy)
    depth = jnp.array([2.0, 3.0])
    pts = ro + rd * depth[:, None]
    w2c = jnp.asarray(np.linalg.inv(c2w))
    uv, z = G.project_points(pts, w2c, fx, fy, cx, cy)
    np.testing.assert_allclose(np.asarray(uv[:, 0]), np.asarray(i), atol=1e-3)
    np.testing.assert_allclose(np.asarray(uv[:, 1]), np.asarray(j), atol=1e-3)
    np.testing.assert_allclose(np.asarray(-z), np.asarray(depth), atol=1e-4)


def test_cart2sph():
    xyz = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    sph = np.asarray(G.cart2sph(xyz))
    np.testing.assert_allclose(sph[0], [0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(sph[1], [np.pi / 2, 0.0], atol=1e-6)


def test_np_pose_helpers_match_jnp(rng):
    import jax.numpy as jnp
    for _ in range(10):
        R = random_rotation(rng)
        t = rng.normal(size=3)
        RT = np.concatenate([R, t[:, None]], axis=1)
        v_np = G.get_tensor_from_camera_np(RT)
        v_j = np.asarray(G.get_tensor_from_camera(jnp.asarray(RT)))
        if v_j[0] < 0:
            v_j = np.concatenate([-v_j[:4], v_j[4:]])
        if v_np[0] < 0:
            v_np = np.concatenate([-v_np[:4], v_np[4:]])
        np.testing.assert_allclose(v_np, v_j, atol=1e-5)
        RT_np = G.get_camera_from_tensor_np(v_np)
        RT_j = np.asarray(G.get_camera_from_tensor(jnp.asarray(v_np)))
        np.testing.assert_allclose(RT_np, RT_j, atol=1e-5)
