"""Camera / ray / rigid-transform primitives (reference: src/common.py).

All functions are pure jnp and differentiable where the reference's torch
counterparts are (quaternion->rotation supports pose gradients, matching
reference src/common.py:304-346).  Convention notes:

* Camera model matches the reference exactly: pixel (i, j) = (column, row),
  ray direction in camera frame is ((i-cx)/fx, -(j-cy)/fy, -1) -- i.e. the
  OpenGL-style -z forward frame the reference datasets are converted into
  (src/common.py:103-119, src/utils/datasets.py:213-215).
* Camera tensors are 7-vectors [qw qx qy qz tx ty tz]
  (src/common.py:357-382 stores quaternion first, wxyz order).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def as_intrinsics_matrix(intrinsics) -> np.ndarray:
    """(fx, fy, cx, cy) -> 3x3 K matrix (reference src/common.py:40-50)."""
    fx, fy, cx, cy = intrinsics
    K = np.eye(3)
    K[0, 0] = fx
    K[1, 1] = fy
    K[0, 2] = cx
    K[1, 2] = cy
    return K


def get_rays_from_uv(i, j, c2w, fx, fy, cx, cy):
    """Rays through pixel centers (i=cols, j=rows); c2w is (3|4)x4.

    Reference: src/common.py:103-119.  Returns (rays_o [N,3], rays_d [N,3]).
    """
    i = jnp.asarray(i, jnp.float32)
    j = jnp.asarray(j, jnp.float32)
    dirs = jnp.stack(
        [(i - cx) / fx, -(j - cy) / fy, -jnp.ones_like(i)], axis=-1
    )  # (N, 3) camera-frame dirs
    # HIGHEST precision: TPU f32 matmuls default to bf16 passes, which is
    # far too coarse for ray directions feeding metric depth losses.
    rays_d = jnp.matmul(dirs, c2w[:3, :3].T, precision=jax.lax.Precision.HIGHEST)
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def get_rays(H, W, fx, fy, cx, cy, c2w, crop_edge: int = 0):
    """Full-image ray grid (reference src/common.py:431-448).

    Returns rays_o, rays_d of shape (H-2e, W-2e, 3).
    """
    e = crop_edge
    j, i = jnp.meshgrid(
        jnp.arange(e, H - e, dtype=jnp.float32),
        jnp.arange(e, W - e, dtype=jnp.float32),
        indexing="ij",
    )
    dirs = jnp.stack([(i - cx) / fx, -(j - cy) / fy, -jnp.ones_like(i)], -1)
    rays_d = jnp.matmul(dirs, c2w[:3, :3].T, precision=jax.lax.Precision.HIGHEST)
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def quad2rotation(quad: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalising quaternion (wxyz) -> rotation matrix, batched.

    Differentiable; matches reference src/common.py:304-327 (which divides by
    the squared norm, so non-unit quaternions are handled identically).
    """
    quad = jnp.atleast_2d(quad)
    qr, qi, qj, qk = quad[:, 0], quad[:, 1], quad[:, 2], quad[:, 3]
    two_s = 2.0 / jnp.sum(quad * quad, axis=-1)
    r00 = 1 - two_s * (qj**2 + qk**2)
    r01 = two_s * (qi * qj - qk * qr)
    r02 = two_s * (qi * qk + qj * qr)
    r10 = two_s * (qi * qj + qk * qr)
    r11 = 1 - two_s * (qi**2 + qk**2)
    r12 = two_s * (qj * qk - qi * qr)
    r20 = two_s * (qi * qk - qj * qr)
    r21 = two_s * (qj * qk + qi * qr)
    r22 = 1 - two_s * (qi**2 + qj**2)
    rot = jnp.stack(
        [
            jnp.stack([r00, r01, r02], -1),
            jnp.stack([r10, r11, r12], -1),
            jnp.stack([r20, r21, r22], -1),
        ],
        axis=-2,
    )
    return rot


def rotation2quad(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion wxyz (Shepperd's method, branch-free).

    Host-side equivalent of the reference's scipy round-trip
    (src/common.py:357-382).  Works on (..., 3, 3).
    """
    R = jnp.asarray(R)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate constructions; pick the numerically best
    qw0 = jnp.sqrt(jnp.clip(1 + tr, 1e-12)) / 2
    q0 = jnp.stack(
        [qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)],
        -1,
    )
    qx1 = jnp.sqrt(jnp.clip(1 + m00 - m11 - m22, 1e-12)) / 2
    q1 = jnp.stack(
        [(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1)],
        -1,
    )
    qy2 = jnp.sqrt(jnp.clip(1 - m00 + m11 - m22, 1e-12)) / 2
    q2 = jnp.stack(
        [(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2)],
        -1,
    )
    qz3 = jnp.sqrt(jnp.clip(1 - m00 - m11 + m22, 1e-12)) / 2
    q3 = jnp.stack(
        [(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3],
        -1,
    )
    cand = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    scores = jnp.stack([tr, m00, m11, m22], -1)
    best = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: qw >= 0 (scipy returns either; sign is gauge)
    q = jnp.where(q[..., :1] < 0, -q, q)
    return q


def get_camera_from_tensor(t: jnp.ndarray) -> jnp.ndarray:
    """7-vector [q, T] -> 3x4 (or batched Nx3x4) c2w (src/common.py:330-346)."""
    single = t.ndim == 1
    t = jnp.atleast_2d(t)
    quad, T = t[:, :4], t[:, 4:]
    R = quad2rotation(quad)
    RT = jnp.concatenate([R, T[:, :, None]], axis=2)
    return RT[0] if single else RT


def get_tensor_from_camera(RT, Tquad: bool = False) -> jnp.ndarray:
    """3x4 / 4x4 c2w -> 7-vector [q, T] (or [T, q] if Tquad).

    Reference: src/common.py:357-382.
    """
    RT = jnp.asarray(RT)
    R, T = RT[:3, :3], RT[:3, 3]
    quad = rotation2quad(R)
    if Tquad:
        return jnp.concatenate([T, quad], axis=0)
    return jnp.concatenate([quad, T], axis=0)


def c2w_to_44(c2w34: jnp.ndarray) -> jnp.ndarray:
    """Append the homogeneous bottom row to a 3x4 pose."""
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=c2w34.dtype)
    return jnp.concatenate([c2w34, bottom], axis=0)


def transform_points(T44: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 rigid transform to (N,3) points."""
    return jnp.matmul(pts, T44[:3, :3].T, precision=jax.lax.Precision.HIGHEST) + T44[:3, 3]


def project_points(points, w2c, fx, fy, cx, cy, flip_x: bool = True):
    """World points -> pixel coords (u, v) and camera-frame z.

    Mirrors the reference's frustum projections (src/Mapper.py:166-250): the
    camera looks down -z, and the x axis is negated before applying K
    (`cam_cord[:, 0] *= -1`).  Returns (uv [N,2], z [N]) with z < 0 in front.
    """
    cam = jnp.matmul(points, w2c[:3, :3].T,
                     precision=jax.lax.Precision.HIGHEST) + w2c[:3, 3]
    x = -cam[..., 0] if flip_x else cam[..., 0]
    y = cam[..., 1]
    z = cam[..., 2]
    denom = z + 1e-5
    u = (fx * x + cx * denom) / denom
    v = (fy * y + cy * denom) / denom
    return jnp.stack([u, v], -1), z


# ---------------------------------------------------------------------------
# numpy twins of the pose conversions for HOST-side per-frame bookkeeping.
# Eager jnp ops cost a device round-trip each (~100 ms through the tunnelled
# TPU); the host loop must never touch the device for scalar pose math.
# Agreement with the jnp versions is unit-tested.

def quad2rotation_np(quad: np.ndarray) -> np.ndarray:
    quad = np.atleast_2d(np.asarray(quad, np.float64))
    qr, qi, qj, qk = quad[:, 0], quad[:, 1], quad[:, 2], quad[:, 3]
    two_s = 2.0 / np.sum(quad * quad, axis=-1)
    rot = np.empty((quad.shape[0], 3, 3))
    rot[:, 0, 0] = 1 - two_s * (qj**2 + qk**2)
    rot[:, 0, 1] = two_s * (qi * qj - qk * qr)
    rot[:, 0, 2] = two_s * (qi * qk + qj * qr)
    rot[:, 1, 0] = two_s * (qi * qj + qk * qr)
    rot[:, 1, 1] = 1 - two_s * (qi**2 + qk**2)
    rot[:, 1, 2] = two_s * (qj * qk - qi * qr)
    rot[:, 2, 0] = two_s * (qi * qk - qj * qr)
    rot[:, 2, 1] = two_s * (qj * qk + qi * qr)
    rot[:, 2, 2] = 1 - two_s * (qi**2 + qj**2)
    return rot


def rotation2quad_np(R: np.ndarray) -> np.ndarray:
    from scipy.spatial.transform import Rotation
    q = Rotation.from_matrix(np.asarray(R, np.float64)).as_quat()
    q = np.roll(q, 1, axis=-1)  # xyzw -> wxyz
    if q.ndim == 1 and q[0] < 0:
        q = -q
    elif q.ndim == 2:
        q = np.where(q[:, :1] < 0, -q, q)
    return q


def get_tensor_from_camera_np(RT, Tquad: bool = False) -> np.ndarray:
    RT = np.asarray(RT)
    quad = rotation2quad_np(RT[:3, :3])
    T = RT[:3, 3]
    out = np.concatenate([T, quad]) if Tquad else np.concatenate([quad, T])
    return out.astype(np.float32)


def get_camera_from_tensor_np(t: np.ndarray) -> np.ndarray:
    t = np.asarray(t)
    R = quad2rotation_np(t[:4])[0]
    return np.concatenate([R, t[4:, None]], axis=1).astype(np.float32)


def cart2sph(xyz: jnp.ndarray) -> jnp.ndarray:
    """Unit normals -> (inclination, azimuth) (reference neural_point.py:181-188)."""
    xy = xyz[:, 0] ** 2 + xyz[:, 1] ** 2
    theta = jnp.arctan2(jnp.sqrt(xy), xyz[:, 2])
    phi = jnp.arctan2(xyz[:, 1], xyz[:, 0])
    return jnp.stack([theta, phi], -1)


def masked_psnr(img1, img2, mask):
    """PSNR over masked pixels (reference src/common.py:485-489)."""
    mse = jnp.mean((img1[mask] - img2[mask]) ** 2)
    return jnp.where(mse == 0, 100.0, -10.0 * jnp.log10(mse))
