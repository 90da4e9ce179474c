"""Multi-device soft rasterization.

Pixel-band data parallelism via shard_map: each device rasterizes a
horizontal band of the output image against the full (replicated) face
set — the forward needs NO cross-device communication (SURVEY.md §5:
the softmax depth aggregation is pixel-local), and backward gradients
for faces/textures are psum-reduced over the band axis.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops.softras import jax_impl
from ..ops.softras.params import SoftRasParams


def soft_rasterize_sharded(face_vertices, textures, p: SoftRasParams, mesh: Mesh):
    """Forward rasterization with rows sharded over the mesh's 'data' axis.

    Returns soft_colors [B,4,H,W] (sharded over H).  Each device computes
    its rows with the jnp backend over its slice of the pixel grid.
    """
    n_rows = mesh.shape['data']
    is_ = p.image_size
    assert is_ % n_rows == 0
    B, F = face_vertices.shape[:2]
    face = face_vertices.reshape(B, F, 9)

    xp, yp = jax_impl.pixel_grid(is_)
    xp = xp.reshape(is_, is_)
    yp = yp.reshape(is_, is_)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P('data'), P('data')),
        out_specs=P(None, None, 'data'))
    def band(face_b, tex_b, xp_b, yp_b):
        def one(fb, tb):
            sc, _, _ = jax_impl.forward_single(fb, tb, p, xp_b.reshape(-1),
                                               yp_b.reshape(-1))
            return sc.T.reshape(4, xp_b.shape[0], is_)

        return jax.vmap(one)(face_b, tex_b)

    return band(face, textures, xp, yp)
