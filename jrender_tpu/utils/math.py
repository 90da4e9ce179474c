"""Small vector-math helpers shared across the framework.

Semantics follow the reference renderer's conventions
(jrender/renderer/transform/look_at.py:27-29 normalize eps behaviour):
``normalize`` divides by ``max(||x||, eps)`` like ``jt.normalize``.
"""
from __future__ import annotations

import jax.numpy as jnp


def normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize along ``axis`` with a clamped denominator.

    Matches torch/jittor ``normalize``: x / max(||x||_2, eps).
    """
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def dot(a: jnp.ndarray, b: jnp.ndarray, axis: int = -1, keepdims: bool = False) -> jnp.ndarray:
    return jnp.sum(a * b, axis=axis, keepdims=keepdims)


def cross(a: jnp.ndarray, b: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return jnp.cross(a, b, axis=axis)
