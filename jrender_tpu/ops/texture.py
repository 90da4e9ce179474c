"""Texture baking / sampling ops (pure JAX; XLA fuses the gathers).

Replaces the reference CUDA kernels:
  * _load_textures_for_softras -- jrender/io/utils/load_textures.py:3-101
  * _load_textures_for_n3mr    -- load_textures.py:103-247 (wrap modes)
  * create_texture_image       -- jrender/io/utils/create_texture_image.py:3
  * bump->normal               -- _load_obj_for_softras.py:9-15
  * create_TBN                 -- jrender/Scene/objects/utils/create_TBN.py:6-28

All are embarrassingly parallel per-texel gathers: on TPU these are
single fused XLA programs; no custom kernel is needed (they run once
at load time, not in the training loop).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.math import normalize

WRAPPING = {'REPEAT': 0, 'MIRRORED_REPEAT': 1, 'CLAMP_TO_EDGE': 2, 'CLAMP_TO_BORDER': 3}


def _bilinear_fetch(image, pos_x, pos_y):
    """Bilinear sample with truncation + clamped neighbors (matches the
    CUDA (int) casts; indices clamped so out-of-range UB becomes edge)."""
    H, W = image.shape[0], image.shape[1]
    x0 = jnp.clip(pos_x.astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(pos_y.astype(jnp.int32), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    wx1 = pos_x - x0.astype(pos_x.dtype)
    wx0 = 1.0 - wx1
    wy1 = pos_y - y0.astype(pos_y.dtype)
    wy0 = 1.0 - wy1
    c = (image[y0, x0] * (wx0 * wy0)[..., None] +
         image[y1, x0] * (wx0 * wy1)[..., None] +
         image[y0, x1] * (wx1 * wy0)[..., None] +
         image[y1, x1] * (wx1 * wy1)[..., None])
    return c


def _surface_texel_barycentric(texture_res: int):
    """Barycentric centers of the R x R triangular half-grid texels."""
    R = texture_res
    idx = jnp.arange(R * R)
    w_y = (idx % (R * R)) // R
    w_x = idx % R
    low = w_x + w_y < R
    w0 = jnp.where(low, (w_x + 1.0 / 3.0) / R, ((R - 1.0 - w_x) + 2.0 / 3.0) / R)
    w1 = jnp.where(low, (w_y + 1.0 / 3.0) / R, ((R - 1.0 - w_y) + 2.0 / 3.0) / R)
    w2 = 1.0 - w0 - w1
    return jnp.stack([w0, w1, w2], axis=-1)  # [R*R, 3]


@functools.partial(jax.jit, static_argnums=())
def load_textures_softras(image, face_texcoords, textures, is_update):
    """Bake a UV image into per-face-texel colors.

    image [H,W,3] (already vertically flipped by the caller, like the
    reference), face_texcoords [F,3,2] in [0,1] UV, textures [F,T,3]
    initial values, is_update [F] int mask.
    """
    F, T = textures.shape[:2]
    R = int(np.sqrt(T))
    w = _surface_texel_barycentric(R)                      # [T,3]
    H, W = image.shape[:2]
    uv = jnp.einsum('tk,fkc->ftc', w, face_texcoords)      # [F,T,2]
    pos_x = uv[..., 0] * (W - 1)
    pos_y = uv[..., 1] * (H - 1)
    c = _bilinear_fetch(image, pos_x, pos_y)               # [F,T,3]
    upd = (is_update != 0)[:, None, None]
    return jnp.where(upd, c, textures)


def _wrap_uv(uv, mode: int):
    if mode == WRAPPING['REPEAT']:
        return jnp.mod(uv, 1.0)
    if mode == WRAPPING['MIRRORED_REPEAT']:
        m2 = jnp.mod(uv, 2.0)
        return jnp.where(m2 < 1, jnp.mod(uv, 1.0), 1.0 - jnp.mod(uv, 1.0))
    if mode == WRAPPING['CLAMP_TO_EDGE']:
        return jnp.clip(uv, 0.0, 1.0)
    return uv  # CLAMP_TO_BORDER handled by zeroing after fetch


@functools.partial(jax.jit, static_argnums=(4, 5))
def load_textures_n3mr(image, face_texcoords, textures, is_update,
                       texture_wrapping: int = 0, use_bilinear: bool = True):
    """Bake a UV image into [F,ts,ts,ts,3] volumetric per-face textures.

    Matches load_textures.py:103-247 incl. wrap modes.
    """
    F, ts = textures.shape[0], textures.shape[1]
    idx = jnp.arange(ts ** 3)
    dim0 = ((idx // (ts * ts)) % ts) / (ts - 1.0)
    dim1 = ((idx // ts) % ts) / (ts - 1.0)
    dim2 = (idx % ts) / (ts - 1.0)
    s = dim0 + dim1 + dim2
    scale = jnp.where(s > 0, 1.0 / jnp.maximum(s, 1e-30), 1.0)
    d = jnp.stack([dim0, dim1, dim2], -1) * scale[:, None]  # [ts^3,3]

    uv = _wrap_uv(face_texcoords, texture_wrapping)         # [F,3,2]
    H, W = image.shape[:2]
    pos = jnp.einsum('tk,fkc->ftc', d, uv)                  # [F,ts^3,2]
    pos_x = pos[..., 0] * (W - 1)
    pos_y = pos[..., 1] * (H - 1)
    if use_bilinear:
        c = _bilinear_fetch(image, pos_x, pos_y)
    else:
        xi = jnp.clip(jnp.round(pos_x).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(jnp.round(pos_y).astype(jnp.int32), 0, H - 1)
        c = image[yi, xi]
    if texture_wrapping == WRAPPING['CLAMP_TO_BORDER']:
        c = jnp.zeros_like(c)
    c = c.reshape(F, ts, ts, ts, 3)
    upd = (is_update != 0)[:, None, None, None, None]
    return jnp.where(upd, c, textures)


def create_texture_image(textures, texture_res_out: int = 16):
    """Pack per-face textures into a tiled atlas image + per-face UVs.

    Reference: jrender/io/save_obj.py:7-29 + create_texture_image.py:3.
    textures [F, R*R, 3]; returns (image [Ht,Wt,3] np, vertices_uv [F,3,2] np).
    """
    textures = jnp.asarray(textures)
    num_faces, T = textures.shape[:2]
    R = int(np.sqrt(T))
    tile_width = int((num_faces - 1.0) ** 0.5) + 1
    tile_height = int((num_faces - 1.0) / tile_width) + 1
    tr = texture_res_out

    verts = np.zeros((num_faces, 3, 2), np.float32)
    face_nums = np.arange(num_faces)
    column = face_nums % tile_width
    row = face_nums // tile_width
    verts[:, 0, 0] = column * tr + tr / 2.0
    verts[:, 0, 1] = row * tr + 1
    verts[:, 1, 0] = column * tr + 1
    verts[:, 1, 1] = (row + 1) * tr - 2
    verts[:, 2, 0] = (column + 1) * tr - 2
    verts[:, 2, 1] = (row + 1) * tr - 2

    Ht, Wt = tile_height * tr, tile_width * tr
    ys, xs = jnp.meshgrid(jnp.arange(Ht), jnp.arange(Wt), indexing='ij')
    # NOTE: the reference kernel computes fn = (x/tr) + (y/tr)*tile_width
    # via variables named row/column swapped (create_texture_image.py:27-29);
    # semantics preserved here.
    fn = xs // tr + (ys // tr) * tile_width
    fn_safe = jnp.clip(fn, 0, num_faces - 1)
    vj = jnp.asarray(verts)[fn_safe]                        # [Ht,Wt,3,2]
    p0, p1, p2 = vj[..., 0, :], vj[..., 1, :], vj[..., 2, :]
    eps = 1e-5
    inv = jnp.stack([
        p1[..., 1] - p2[..., 1], p2[..., 0] - p1[..., 0],
        p1[..., 0] * p2[..., 1] - p2[..., 0] * p1[..., 1],
        p2[..., 1] - p0[..., 1], p0[..., 0] - p2[..., 0],
        p2[..., 0] * p0[..., 1] - p0[..., 0] * p2[..., 1],
        p0[..., 1] - p1[..., 1], p1[..., 0] - p0[..., 0],
        p0[..., 0] * p1[..., 1] - p1[..., 0] * p0[..., 1],
    ], -1)
    det = (p2[..., 0] * (p0[..., 1] - p1[..., 1]) + p0[..., 0] * (p1[..., 1] - p2[..., 1]) +
           p1[..., 0] * (p2[..., 1] - p0[..., 1]))
    inv = inv / (det + eps)[..., None]
    inv = inv.reshape(inv.shape[:-1] + (3, 3))
    x = xs.astype(jnp.float32)
    y = ys.astype(jnp.float32)
    w = inv[..., 0] * x[..., None] + inv[..., 1] * y[..., None] + inv[..., 2]
    w = jnp.clip(w, 0.0, 1.0)
    w = w / (jnp.sum(w, -1, keepdims=True) + eps)
    w_x = (w[..., 0] * R).astype(jnp.int32)
    w_y = (w[..., 1] * R).astype(jnp.int32)
    low = (w[..., 0] + w[..., 1]) * R - w_x - w_y <= 1
    wxc = jnp.clip(w_x, 0, R - 1)
    wyc = jnp.clip(w_y, 0, R - 1)
    tidx = jnp.where(low, wyc * R + wxc,
                     jnp.clip(R - 1 - w_y, 0, R - 1) * R + jnp.clip(R - 1 - w_x, 0, R - 1))
    img = textures[fn_safe, tidx]
    img = jnp.where((fn < num_faces)[..., None], img, 1.0)
    image = np.asarray(img)

    verts[:, :, 0] /= (Wt - 1)
    verts[:, :, 1] /= (Ht - 1)
    image = image[::-1]
    return image, verts


def bump_to_normal(bump_image: np.ndarray) -> np.ndarray:
    """Bump (height) map -> normal map via central differences.

    Reference: _load_obj_for_softras.py:9-15.
    """
    h = bump_image
    xy = np.full((h.shape[0] - 2, h.shape[1] - 2), 6, np.float32)
    n = -np.stack((h[1:-1, :-2] - h[1:-1, 2:],
                   h[:-2, 1:-1] - h[2:, 1:-1],
                   -xy), axis=2)
    n = n / np.maximum(np.linalg.norm(n, axis=2, keepdims=True), 1e-5)
    return (n + 1.0) / 2.0


def create_TBN(face_texcoords, face_wcoords):
    """Per-face tangent/bitangent/normal frame [F,3,3] (rows T,B,N).

    Reference: jrender/Scene/objects/utils/create_TBN.py:6-28.
    """
    e1 = face_wcoords[:, 0] - face_wcoords[:, 1]
    e2 = face_wcoords[:, 0] - face_wcoords[:, 2]
    n = normalize(jnp.cross(e1, e2), axis=-1, eps=1e-12)[:, None, :]
    u1 = face_texcoords[:, 0, 0] - face_texcoords[:, 1, 0]
    v1 = face_texcoords[:, 0, 1] - face_texcoords[:, 1, 1]
    u2 = face_texcoords[:, 0, 0] - face_texcoords[:, 2, 0]
    v2 = face_texcoords[:, 0, 1] - face_texcoords[:, 2, 1]
    denom = (1.0 / (u1 * v2 - u2 * v1))[:, None, None]
    inverse = jnp.stack([jnp.stack([v2, -v1], 1), jnp.stack([-u2, u1], 1)], 1)
    e = jnp.stack([e1, e2], 1)
    TB = denom * jnp.matmul(inverse, e)
    T = TB[:, 0:1, :]
    T = T - jnp.sum(T * n, -1, keepdims=True) * n
    T = normalize(T, axis=-1)
    B = normalize(jnp.cross(n, T), axis=-1)
    return jnp.concatenate([T, B, n], axis=1)
