import jax.numpy as jnp
import numpy as np

from hpslam_tpu.ops.composite import raw2outputs


def naive_composite(raw, z_vals, coef=0.1):
    """Direct port of the reference math for oracle checking
    (src/common.py:385-428, occupancy branch)."""
    def sigmoid(x):
        return 1.0 / (1.0 + np.exp(-x))
    alpha = sigmoid(coef * raw[..., -1])
    N, S = alpha.shape
    weights = np.zeros_like(alpha)
    for i in range(N):
        trans = 1.0
        for s in range(S):
            weights[i, s] = alpha[i, s] * trans
            trans *= (1.0 - alpha[i, s] + 1e-10)
    wsum = weights.sum(-1) + 1e-10
    rgb = (weights[..., None] * raw[..., :3]).sum(-2) / wsum[..., None]
    depth = (weights * z_vals).sum(-1) / wsum
    var = (weights * (z_vals - depth[..., None]) ** 2).sum(-1)
    return depth, var, rgb, weights


def test_matches_naive(rng):
    N, S = 16, 5
    raw = rng.normal(size=(N, S, 4)).astype(np.float32) * 10
    z = np.sort(rng.uniform(0.5, 3.0, size=(N, S)).astype(np.float32), axis=-1)
    rays_d = rng.normal(size=(N, 3)).astype(np.float32)
    d, v, c, w = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rays_d))
    d0, v0, c0, w0 = naive_composite(raw, z)
    np.testing.assert_allclose(np.asarray(d), d0, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), v0, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), c0, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), w0, rtol=1e-3, atol=1e-5)


def test_opaque_surface():
    # one huge-occupancy sample should dominate depth
    z = jnp.array([[1.0, 1.5, 2.0, 2.5, 3.0]])
    raw = jnp.zeros((1, 5, 4)).at[0, 2, 3].set(1000.0).at[:, :, 3].add(
        jnp.array([-1000.0, -1000.0, 2000.0, -1000.0, -1000.0]))
    d, v, c, w = raw2outputs(raw, z, jnp.array([[0.0, 0.0, -1.0]]))
    assert abs(float(d[0]) - 2.0) < 1e-4
    assert float(v[0]) < 1e-6
