"""Transform module objects mirroring the reference API.

Reference: jrender/renderer/transform/transform.py:11-135.

These are thin stateful wrappers over the functional transforms; all
tensor math is pure JAX so the whole pipeline stays jit-traceable when
invoked inside a jitted function.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from . import functional as F
from ..utils.angles import get_points_from_angles


class Projection:
    def __init__(self, K, R, t, dist_coeffs=None, orig_size=512):
        self.K = jnp.asarray(K, jnp.float32)
        self.R = jnp.asarray(R, jnp.float32)
        self.t = jnp.asarray(t, jnp.float32)
        if dist_coeffs is None:
            dist_coeffs = jnp.zeros((self.K.shape[0], 5), jnp.float32)
        self.dist_coeffs = jnp.asarray(dist_coeffs, jnp.float32)
        self.orig_size = orig_size
        self._eye = None

    def __call__(self, vertices):
        return F.projection(vertices, self.K, self.R, self.t, self.dist_coeffs, self.orig_size)


class LookAt:
    def __init__(self, perspective=True, viewing_angle=30, viewing_scale=1.0, eye=None):
        self.perspective = perspective
        self.viewing_angle = viewing_angle
        self.viewing_scale = viewing_scale
        if eye is None:
            eye = [0, 0, -(1.0 / math.tan(math.radians(viewing_angle)) + 1)]
        self._eye = eye

    def __call__(self, vertices):
        vertices = F.look_at(vertices, self._eye)
        if self.perspective:
            return F.perspective(vertices, angle=self.viewing_angle)
        return F.orthogonal(vertices, scale=self.viewing_scale)


class Look:
    def __init__(self, camera_direction=(0, 0, 1), perspective=True, viewing_angle=30,
                 viewing_scale=1.0, eye=None, up=(0, 1, 0), coordinate='right'):
        self.perspective = perspective
        self.viewing_angle = viewing_angle
        self.viewing_scale = viewing_scale
        self.camera_direction = camera_direction
        self.up = up
        self.coordinate = coordinate
        if eye is None:
            eye = [0, 0, -(1.0 / math.tan(math.radians(viewing_angle)) + 1)]
        self._eye = eye

    def __call__(self, vertices):
        vertices = F.look(vertices, self._eye, self.camera_direction, up=self.up,
                          coordinate=self.coordinate)
        if self.perspective:
            return F.perspective(vertices, angle=self.viewing_angle)
        return F.orthogonal(vertices, scale=self.viewing_scale)


class Transform:
    """Camera transform facade; reference transform.py:83-135."""

    def __init__(self, camera_mode='projection', K=None, R=None, t=None, dist_coeffs=None,
                 orig_size=512, perspective=True, viewing_angle=30, viewing_scale=1.0,
                 eye=None, camera_direction=(0, 0, 1), up=(0, 1, 0), coordinate='right'):
        self.camera_mode = camera_mode
        if camera_mode == 'projection':
            self.transformer = Projection(K, R, t, dist_coeffs, orig_size)
        elif camera_mode == 'look':
            self.transformer = Look(camera_direction, perspective, viewing_angle,
                                    viewing_scale, eye, up, coordinate)
        elif camera_mode == 'look_at':
            self.transformer = LookAt(perspective, viewing_angle, viewing_scale, eye)
        else:
            raise ValueError('Camera mode has to be one of projection, look or look_at')
        self.eye = eye
        self.camera_direction = camera_direction
        self.viewing_angle = viewing_angle
        self.up = up
        self.coordinate = coordinate

    def __call__(self, mesh):
        mesh.vertices = self.transformer(mesh.vertices)
        return mesh

    def tranpos(self, pos):
        # (sic) name kept for API parity with the reference
        return self.transformer(pos)

    def set_eyes_from_angles(self, distances, elevations, azimuths):
        if self.camera_mode not in ('look', 'look_at'):
            raise ValueError('Projection does not need to set eyes')
        self.transformer._eye = get_points_from_angles(distances, elevations, azimuths)

    def set_eyes(self, eyes):
        if self.camera_mode not in ('look', 'look_at'):
            raise ValueError('Projection does not need to set eyes')
        self.transformer._eye = eyes

    def view_transform(self, vertices):
        if self.camera_mode == 'look_at':
            return F.look_at(vertices, self.eyes)
        if self.camera_mode == 'look':
            return F.look(vertices, self.eyes, self.camera_direction, up=self.up,
                          coordinate=self.coordinate)
        return vertices

    def projection_transform(self, vertices):
        return F.perspective(vertices, self.viewing_angle)

    @property
    def eyes(self):
        return self.transformer._eye
