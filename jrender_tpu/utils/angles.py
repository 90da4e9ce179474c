"""Camera-eye placement from spherical angles.

Mirrors the behaviour of the reference
``jrender/renderer/utils/get_points_from_angles.py:4-23``.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def get_points_from_angles(distance, elevation, azimuth, degrees: bool = True):
    """Spherical (distance, elevation, azimuth) -> cartesian eye position.

    Scalars return a plain tuple (cheap host path); arrays return a
    ``[..., 3]`` jnp array (batched camera rigs).
    """
    if isinstance(distance, (int, float)) and isinstance(elevation, (int, float)) \
            and isinstance(azimuth, (int, float)):
        if degrees:
            elevation = math.radians(elevation)
            azimuth = math.radians(azimuth)
        return (
            distance * math.cos(elevation) * math.sin(azimuth),
            distance * math.sin(elevation),
            -distance * math.cos(elevation) * math.cos(azimuth),
        )
    distance = jnp.asarray(distance, jnp.float32)
    elevation = jnp.asarray(elevation, jnp.float32)
    azimuth = jnp.asarray(azimuth, jnp.float32)
    if degrees:
        elevation = jnp.deg2rad(elevation)
        azimuth = jnp.deg2rad(azimuth)
    return jnp.stack(
        [
            distance * jnp.cos(elevation) * jnp.sin(azimuth),
            distance * jnp.sin(elevation),
            -distance * jnp.cos(elevation) * jnp.cos(azimuth),
        ],
        axis=-1,
    )
