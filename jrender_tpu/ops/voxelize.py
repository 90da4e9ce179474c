"""Mesh voxelization (pure JAX).

Reference: jrender/renderer/utils/voxelization.py:5-57 + cuda/voxelization.py:
  * sub1: per-(x,y) column scan of each axis projection -> surface voxels
  * sub2: vertex cells
  * sub3/sub4: exterior flood fill to a fixpoint; interior = ~visible

Scatter-max replaces atomic writes; the flood fill is a lax.while_loop on
a 6-neighbor dilation (deterministic, converges in <= 3*vs iterations).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _sub1_axis(faces, vs):
    """Surface fill for one axis orientation; faces [B,F,3,3] permuted so
    the scan plane is (coord0, coord1) and depth is coord2.

    Mirrors voxelize_sub1_kernel (cuda/voxelization.py:31-86): for each
    integer grid point (y, x) inside the projected triangle, fill the cell
    at the interpolated depth plus its (y-1, x-1) neighbors."""
    B, F = faces.shape[:2]
    g = jnp.arange(vs, dtype=jnp.float32)
    X, Y = jnp.meshgrid(g, g, indexing='xy')          # [vs,vs]: y = fast dim
    # pairwise per (grid point, face)
    f = faces.reshape(B, F, 9)
    y1d = f[..., 3] - f[..., 0]
    x1d = f[..., 4] - f[..., 1]
    z1d = f[..., 5] - f[..., 2]
    y2d = f[..., 6] - f[..., 0]
    x2d = f[..., 7] - f[..., 1]
    z2d = f[..., 8] - f[..., 2]
    det = x1d * y2d - x2d * y1d                        # [B,F]

    def per_batch(fb):
        (y1d, x1d, z1d, y2d, x2d, z2d, det, f0, f1, f2) = fb
        ypd = Y[..., None] - f0                        # [vs,vs,F]
        xpd = X[..., None] - f1
        det_safe = jnp.where(det == 0, 1.0, det)
        t1 = (y2d * xpd - x2d * ypd) / det_safe
        t2 = (-y1d * xpd + x1d * ypd) / det_safe
        ok = (det != 0) & (t1 >= 0) & (t2 >= 0) & (t1 + t2 <= 1)
        zi = jnp.floor(t1 * z1d + t2 * z2d + f2).astype(jnp.int32)
        yi = Y.astype(jnp.int32)[..., None]
        xi = X.astype(jnp.int32)[..., None]

        vox = jnp.zeros((vs, vs, vs), jnp.int32)
        for dy, dx in ((0, 0), (-1, 0), (0, -1), (-1, -1)):
            yy = yi + dy
            xx = xi + dx
            valid = ok & (yy >= 0) & (yy < vs) & (xx >= 0) & (xx < vs) & \
                (zi >= 0) & (zi < vs)
            lin = jnp.where(valid,
                            (yy * vs + xx) * vs + jnp.clip(zi, 0, vs - 1),
                            vs * vs * vs)
            vox = vox.reshape(-1).at[lin.reshape(-1)].max(
                valid.reshape(-1).astype(jnp.int32), mode='drop').reshape(vs, vs, vs)
        return vox

    return jax.vmap(per_batch)((y1d, x1d, z1d, y2d, x2d, z2d, det,
                                f[..., 0], f[..., 1], f[..., 2]))


def voxelize_sub1(faces, size, dim):
    if dim == 0:
        fperm = faces[:, :, :, jnp.array([2, 1, 0])]
    elif dim == 1:
        fperm = faces[:, :, :, jnp.array([0, 2, 1])]
    else:
        fperm = faces
    res = _sub1_axis(fperm, size)
    if dim == 0:
        return jnp.transpose(res, (0, 3, 2, 1))
    if dim == 1:
        return jnp.transpose(res, (0, 1, 3, 2))
    return res


def voxelize_sub2(faces, size):
    """Mark cells containing vertices (cuda/voxelization.py:138-162)."""
    B, F = faces.shape[:2]
    vs = size
    v = jnp.floor(faces).astype(jnp.int32)             # [B,F,3,3] (y,x,z)
    yi, xi, zi = v[..., 0], v[..., 1], v[..., 2]
    ok = ((yi >= 0) & (yi < vs) & (xi >= 0) & (xi < vs) & (zi >= 0) & (zi < vs))
    lin = jnp.where(ok, (yi * vs + xi) * vs + jnp.clip(zi, 0, vs - 1), vs ** 3)

    def per_batch(lin_b, ok_b):
        vox = jnp.zeros((vs * vs * vs,), jnp.int32)
        return vox.at[lin_b.reshape(-1)].max(ok_b.reshape(-1).astype(jnp.int32),
                                             mode='drop').reshape(vs, vs, vs)

    return jax.vmap(per_batch)(lin, ok)


def _flood_exterior(voxels):
    """sub3+sub4: visible = exterior empty cells, flood-filled to fixpoint."""
    B, vs = voxels.shape[0], voxels.shape[1]
    empty = voxels == 0
    border = jnp.zeros((vs, vs, vs), bool)
    border = border.at[0].set(True).at[-1].set(True)
    border = border.at[:, 0].set(True).at[:, -1].set(True)
    border = border.at[:, :, 0].set(True).at[:, :, -1].set(True)
    visible = empty & border[None]

    def dilate(vis):
        p = jnp.pad(vis, ((0, 0), (1, 1), (1, 1), (1, 1)))
        n = (p[:, :-2, 1:-1, 1:-1] | p[:, 2:, 1:-1, 1:-1] |
             p[:, 1:-1, :-2, 1:-1] | p[:, 1:-1, 2:, 1:-1] |
             p[:, 1:-1, 1:-1, :-2] | p[:, 1:-1, 1:-1, 2:])
        return vis | (empty & n)

    def cond(state):
        vis, prev = state
        return jnp.sum(vis) != prev

    def body(state):
        vis, _ = state
        return dilate(vis), jnp.sum(vis)

    visible, _ = jax.lax.while_loop(cond, body, (visible, jnp.int32(-1)))
    return 1 - visible.astype(jnp.int32)


def voxelization(faces, size, normalize=False):
    """Full mesh -> solid voxel grid (voxelization.py:41-57)."""
    faces = jnp.asarray(faces, jnp.float32)
    if not normalize:
        faces = faces * size
    v0 = voxelize_sub1(faces, size, 0)
    v1 = voxelize_sub1(faces, size, 1)
    v2 = voxelize_sub1(faces, size, 2)
    v3 = voxelize_sub2(faces, size)
    voxels = ((v0 + v1 + v2 + v3) > 0).astype(jnp.int32)
    return _flood_exterior(voxels)
