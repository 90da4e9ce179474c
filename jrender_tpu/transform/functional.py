"""Camera / projection transforms (pure JAX).

Functional equivalents of the reference transforms:
  * look_at      -- jrender/renderer/transform/look_at.py:3
  * look         -- jrender/renderer/transform/look.py:3
  * perspective  -- jrender/renderer/transform/perspective.py:4
  * orthogonal   -- jrender/renderer/transform/orthogonal.py:3
  * projection   -- jrender/renderer/transform/projection.py:3 (OpenCV distortion)

All functions take/return float32 ``[B, N, 3]`` vertex arrays and are
jit/vmap/grad friendly (no data-dependent control flow).
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..utils.math import normalize


def _as_batched_vec3(x, batch_size: int) -> jnp.ndarray:
    v = jnp.asarray(x, jnp.float32)
    if v.ndim == 1:
        v = jnp.broadcast_to(v, (batch_size, 3))
    return v


def look_at(vertices: jnp.ndarray, eye, at=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0)) -> jnp.ndarray:
    """Rotate/translate vertices into a camera frame looking from ``eye`` to ``at``.

    Reference: jrender/renderer/transform/look_at.py:3-41.
    """
    if vertices.ndim != 3:
        raise ValueError('vertices must have shape [B, N, 3]')
    bs = vertices.shape[0]
    eye = _as_batched_vec3(list(eye) if isinstance(eye, tuple) else eye, bs)
    at = _as_batched_vec3(at, bs)
    up = _as_batched_vec3(up, bs)

    z_axis = normalize(at - eye, eps=1e-5)
    x_axis = normalize(jnp.cross(up, z_axis), eps=1e-5)
    y_axis = normalize(jnp.cross(z_axis, x_axis), eps=1e-5)
    # rows of r are the new basis: [B, 3, 3]
    r = jnp.stack([x_axis, y_axis, z_axis], axis=1)

    if eye.ndim == 2:
        eye = eye[:, None, :]
    return jnp.matmul(vertices - eye, jnp.swapaxes(r, 1, 2))


def look(vertices: jnp.ndarray, eye, direction=(0.0, 0.0, 1.0), up=(0.0, 1.0, 0.0),
         coordinate: str = 'right') -> jnp.ndarray:
    """Camera frame from an explicit viewing direction.

    Reference: jrender/renderer/transform/look.py:3-55.
    """
    if vertices.ndim != 3:
        raise ValueError('vertices must have shape [B, N, 3]')
    bs = vertices.shape[0]
    direction = jnp.asarray(direction, jnp.float32)
    up_v = jnp.asarray(up if up is not None else (0.0, 1.0, 0.0), jnp.float32)

    z_axis = normalize(direction, axis=0 if direction.ndim == 1 else -1, eps=1e-5)
    up_v = normalize(up_v, axis=0 if up_v.ndim == 1 else -1, eps=1e-5)

    eye = _as_batched_vec3(list(eye) if isinstance(eye, tuple) else eye, bs)
    z_axis = _as_batched_vec3(z_axis, bs)
    up_v = _as_batched_vec3(up_v, bs)

    if coordinate == 'right':
        x_axis = normalize(jnp.cross(up_v, z_axis), eps=1e-5)
        y_axis = normalize(jnp.cross(z_axis, x_axis), eps=1e-5)
    elif coordinate == 'left':
        x_axis = normalize(jnp.cross(z_axis, up_v), eps=1e-5)
        y_axis = normalize(jnp.cross(x_axis, z_axis), eps=1e-5)
    else:
        raise ValueError("coordinate must be 'right' or 'left'")

    r = jnp.stack([x_axis, y_axis, z_axis], axis=1)
    if eye.ndim == 2:
        eye = eye[:, None, :]
    return jnp.matmul(vertices - eye, jnp.swapaxes(r, 1, 2))


def perspective(vertices: jnp.ndarray, angle: float = 30.0) -> jnp.ndarray:
    """Perspective divide with field-of-view half-angle in degrees.

    Reference: jrender/renderer/transform/perspective.py:4-17.
    """
    if vertices.ndim != 3:
        raise ValueError('vertices must have shape [B, N, 3]')
    width = jnp.tan(jnp.asarray(angle, jnp.float32) / 180.0 * math.pi)
    z = vertices[..., 2]
    x = vertices[..., 0] / z / width
    y = vertices[..., 1] / z / width
    return jnp.stack([x, y, z], axis=-1)


def orthogonal(vertices: jnp.ndarray, scale) -> jnp.ndarray:
    """Orthogonal projection; reference jrender/renderer/transform/orthogonal.py:3-15."""
    if vertices.ndim != 3:
        raise ValueError('vertices must have shape [B, N, 3]')
    z = vertices[..., 2]
    x = vertices[..., 0] * scale
    y = vertices[..., 1] * scale
    return jnp.stack([x, y, z], axis=-1)


def projection(vertices: jnp.ndarray, K, R, t, dist_coeffs=None, orig_size: int = 512,
               eps: float = 1e-9) -> jnp.ndarray:
    """Full calibrated-camera projection with OpenCV radial/tangential distortion.

    Reference: jrender/renderer/transform/projection.py:3-48.
    K: [B,3,3], R: [B,3,3], t: [B,1,3], dist_coeffs: [B,5] (k1,k2,p1,p2,k3).
    Returns [u, v, z] with u,v in [-1, 1].
    """
    K = jnp.asarray(K, jnp.float32)
    R = jnp.asarray(R, jnp.float32)
    t = jnp.asarray(t, jnp.float32)
    if dist_coeffs is None:
        dist_coeffs = jnp.zeros((K.shape[0], 5), jnp.float32)
    dist_coeffs = jnp.asarray(dist_coeffs, jnp.float32)

    # The reference uses R[0]'s transpose for every batch element
    # (projection.py:18) -- reproduce that exactly.
    vertices = jnp.matmul(vertices, jnp.swapaxes(R, 1, 2)[0]) + t
    x, y, z = vertices[..., 0], vertices[..., 1], vertices[..., 2]
    x_ = x / (z + eps)
    y_ = y / (z + eps)

    k1 = dist_coeffs[:, None, 0]
    k2 = dist_coeffs[:, None, 1]
    p1 = dist_coeffs[:, None, 2]
    p2 = dist_coeffs[:, None, 3]
    k3 = dist_coeffs[:, None, 4]

    x_2, y_2 = x_ * x_, y_ * y_
    r2 = x_2 + y_2
    r4 = r2 * r2
    r6 = r4 * r2
    tmp = k1 * r2 + k2 * r4 + k3 * r6 + 1.0
    x__ = x_ * tmp + 2 * p1 * x_ * y_ + p2 * (r2 + 2 * x_2)
    y__ = y_ * tmp + p1 * (r2 + 2 * y_2) + 2 * p2 * x_ * y_

    pts = jnp.stack([x__, y__, jnp.ones_like(z)], axis=-1)
    pts = jnp.matmul(pts, jnp.swapaxes(K, 1, 2)[0])
    u, v = pts[..., 0], pts[..., 1]
    v = orig_size - v
    u = 2 * (u - orig_size / 2.0) / orig_size
    v = 2 * (v - orig_size / 2.0) / orig_size
    return jnp.stack([u, v, z], axis=-1)
