"""Pinhole camera ray generation + NDC warp (pure JAX).

Reference: jrender_vol/camera/pinhole.py:6-43.  Note the volume stack's
ray convention negates x/y (pinhole.py:11) unlike nerf_helper's get_rays.
"""
from __future__ import annotations

import jax.numpy as jnp


def pinhole_get_rays(H: int, W: int, focal, c2w, intrinsic=None):
    """Rays for a full image; returns (rays_o [H,W,3], rays_d [H,W,3])."""
    i, j = jnp.meshgrid(jnp.linspace(0, W - 1, W), jnp.linspace(0, H - 1, H),
                        indexing='xy')
    if intrinsic is None:
        dirs = jnp.stack([-(i - W * 0.5) / focal, -(j - H * 0.5) / focal,
                          jnp.ones_like(i)], -1)
    else:
        ii = i + 0.5
        jj = j + 0.5
        dirs = jnp.stack([ii, jj, jnp.ones_like(i)], -1)
        dirs = jnp.sum(dirs[..., None, :] * intrinsic[:3, :3], -1)
    rays_d = jnp.sum(dirs[..., None, :] * c2w[:3, :3], -1)
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def get_rays(H: int, W: int, focal, c2w, intrinsic=None):
    """nerf_helper-convention rays (positive x/y; utils.py:148-163)."""
    i, j = jnp.meshgrid(jnp.linspace(0, W - 1, W), jnp.linspace(0, H - 1, H),
                        indexing='xy')
    if intrinsic is None:
        dirs = jnp.stack([(i - W * 0.5) / focal, (j - H * 0.5) / focal,
                          jnp.ones_like(i)], -1)
    else:
        ii = i + 0.5
        jj = j + 0.5
        dirs = jnp.stack([ii, jj, jnp.ones_like(i)], -1)
        dirs = jnp.sum(dirs[..., None, :] * intrinsic[:3, :3], -1)
    rays_d = jnp.sum(dirs[..., None, :] * c2w[:3, :3], -1)
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def ndc_rays(H, W, focal, near, rays_o, rays_d):
    """Warp rays into NDC space for forward-facing (LLFF) scenes."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * focal)) * (rays_d[..., 0] / rays_d[..., 2] -
                                       rays_o[..., 0] / rays_o[..., 2])
    d1 = -1.0 / (H / (2.0 * focal)) * (rays_d[..., 1] / rays_d[..., 2] -
                                       rays_o[..., 1] / rays_o[..., 2])
    d2 = -2.0 * near / rays_o[..., 2]

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)
