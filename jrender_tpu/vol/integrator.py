"""Stratified/importance sampling and alpha-compositing (pure JAX).

Reference: jrender_vol/integrator/{sample.py:6-57, integrator.py:5-40}.
Randomness is explicit: pass a jax.random key (None = deterministic).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample(N_rays, N_samples, lindisp, perturb, near, far, key=None):
    """Stratified z values [N_rays, N_samples]."""
    t_vals = jnp.linspace(0.0, 1.0, N_samples)
    if not lindisp:
        z_vals = near * (1.0 - t_vals) + far * t_vals
    else:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    z_vals = jnp.broadcast_to(z_vals, (N_rays, N_samples))

    if perturb > 0.0 and key is not None:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
        lower = jnp.concatenate([z_vals[..., :1], mids], -1)
        t_rand = jax.random.uniform(key, z_vals.shape)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals


def sample_pdf(bins, weights, N_samples, det=False, key=None):
    """Inverse-CDF importance sampling (sample.py:28-57)."""
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)

    if det or key is None:
        u = jnp.linspace(0.0, 1.0, N_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (N_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (N_samples,))

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side='right'))(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_b = jnp.take_along_axis(cdf, below, -1)
    cdf_a = jnp.take_along_axis(cdf, above, -1)
    bins_b = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[-1] - 1), -1)
    bins_a = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[-1] - 1), -1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


def integrator(raw, z_vals, rays_d, raw_noise_std=0.0, white_bkgd=False, key=None):
    """Alpha-composite raw (rgb, sigma) predictions along rays.

    raw: [N_rays, N_samples, 4].  Returns (rgb_map, disp_map, acc_map,
    weights, depth_map) exactly like integrator.py:5-40.
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.broadcast_to(jnp.float32(1e10), dists[..., :1].shape)], -1)
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = jax.nn.sigmoid(raw[..., :3])
    noise = 0.0
    if raw_noise_std > 0.0 and key is not None:
        noise = jax.random.normal(key, raw[..., 3].shape) * raw_noise_std
    alpha = 1.0 - jnp.exp(-jax.nn.relu(raw[..., 3] + noise) * dists)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1),
        -1)[..., :-1]
    weights = alpha * trans
    rgb_map = jnp.sum(weights[..., None] * rgb, -2)

    depth_map = jnp.sum(weights * z_vals, -1)
    acc_map = jnp.sum(weights, -1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / jnp.maximum(acc_map, 1e-10))

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return rgb_map, disp_map, acc_map, weights, depth_map
