"""Pixel / ray-depth samplers (reference src/common.py:122-301, Renderer z-vals).

Static-shape design notes (vs the reference):

* The reference samples ``n`` uniform pixels then boolean-filters away
  zero-depth ones (src/common.py:236-258), giving a variable-length batch.
  Under XLA we instead sample ``n`` indices from a host-precomputed pool of
  valid pixels (same conditional distribution, full batch utilisation) and
  carry masks for any residual filtering (depth_limit, outlier masks).
* All samplers take an explicit ``jax.random`` key — the reference's global
  seed-1219 discipline (src/common.py:31-37) becomes key-splitting.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_indices(key, pool: jnp.ndarray, n: int) -> jnp.ndarray:
    """Sample n flat pixel indices (with replacement) from a pool.

    Matches the reference's `torch.randint` pixel selection
    (src/common.py:122-137) restricted to valid pixels.
    """
    choice = jax.random.randint(key, (n,), 0, pool.shape[0])
    return pool[choice]


def flat_to_ij(flat_idx: jnp.ndarray, W: int):
    """Flat index -> (i=col, j=row) matching reference (j, i) image indexing."""
    j = flat_idx // W
    i = flat_idx % W
    return i, j


def surface_z_vals(gt_depth, n_surface: int, near_end_surface: float,
                   far_end_surface: float, fix_interval: bool = False):
    """Depth-guided z values in [near*d, far*d] (Renderer.py:163-189).

    gt_depth: (N,) positive depths.  Returns (N, n_surface).
    """
    t = jnp.linspace(0.0, 1.0, n_surface)
    d = gt_depth[..., None]
    if fix_interval:
        intervals = jnp.linspace(-0.04, 0.04, n_surface)[None, :]
        return d + intervals
    return near_end_surface * d * (1.0 - t) + far_end_surface * d * t


def uniform_z_vals(n_rays: int, n_surface: int, near: float, far):
    """Fallback z values for zero-depth rays when sample_near_pcl is off
    (Renderer.py:207-208)."""
    z = jnp.linspace(near, far, n_surface)
    return jnp.broadcast_to(z, (n_rays, n_surface))


def sample_pdf(key, bins, weights, n_samples: int, det: bool = False):
    """Inverse-CDF hierarchical sampling (reference src/common.py:53-92).

    Unused on the hot path (N_importance=0 in every config) but kept for API
    parity.  bins: (B, M+1), weights: (B, M).  Returns (B, n_samples).
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # (B, M+1)

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,))

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_g0 = jnp.take_along_axis(cdf, below, -1)
    cdf_g1 = jnp.take_along_axis(cdf, above, -1)
    bins_g0 = jnp.take_along_axis(bins, below, -1)
    bins_g1 = jnp.take_along_axis(bins, above, -1)

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)


def far_bound_from_depth(gt_depth_batch):
    """Per-batch far bound: min(5*mean(d), max(1.2*d)) (Renderer.py:132-137)."""
    return jnp.minimum(5.0 * jnp.mean(gt_depth_batch), jnp.max(gt_depth_batch * 1.2))
