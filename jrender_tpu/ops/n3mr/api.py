"""N3MR public API with custom VJP.

Mirrors jrender/renderer/dr/n3mr/n3mr.py:189-346 (rasterize_rgbad/
rasterize/rasterize_silhouettes/rasterize_depth) and rasterizer.py's
N3mrRasterizer module.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from . import impl

DEFAULT_IMAGE_SIZE = 256
DEFAULT_ANTI_ALIASING = True
DEFAULT_NEAR = 0.1
DEFAULT_FAR = 100
DEFAULT_EPS = 1e-4
DEFAULT_BACKGROUND_COLOR = (0, 0, 0)


@dataclasses.dataclass(frozen=True)
class N3mrParams:
    image_size: int
    near: float
    far: float
    eps: float
    background_color: tuple
    return_rgb: bool
    return_alpha: bool
    return_depth: bool


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _rasterize_core(faces, textures, p: N3mrParams):
    out, _ = _forward(faces, textures, p)
    return out


_BACKEND = 'auto'   # 'auto' | 'pallas' | 'jax'


def set_backend(name: str):
    """Select the z-buffer implementation ('auto' uses Pallas on tileable
    image sizes, the pure-XLA scan otherwise)."""
    global _BACKEND
    assert name in ('auto', 'pallas', 'jax')
    _BACKEND = name


def _forward(faces, textures, p: N3mrParams):
    B = faces.shape[0]
    is_ = p.image_size
    face9 = faces.reshape(B, -1, 9)

    from ..softras.pallas_impl import _pf_tile_for
    use_pallas = _BACKEND == 'pallas' or (
        _BACKEND == 'auto' and _pf_tile_for(is_) > 0)
    rgb = zc = texrow = None
    if use_pallas:
        from . import pallas_impl
        ts = textures.shape[2]
        n_tex = ts ** 3 * 3
        sel_tex = (p.return_rgb and n_tex <= pallas_impl.MAX_TEX_SEL)
        fi, wt, dp, finv, zc, texrow = pallas_impl.forward_sel_pallas(
            face9, textures.reshape(B, -1, n_tex) if sel_tex else None,
            is_, p.near, p.far)
        if p.return_rgb and texrow is not None:
            rgb = jax.vmap(lambda tr_, a, b, c, d: impl.trilinear_rgb_from_rows(
                tr_, a, b, c, d, ts, p.eps))(texrow, fi, wt, dp, zc)
    else:
        fi, wt, dp, finv = jax.vmap(
            lambda f: impl.forward_maps_single(f, is_, p.near, p.far))(face9)

    if p.return_rgb:
        if rgb is None:
            rgb, zc = jax.vmap(
                lambda f, t, a, b, c: impl.trilinear_rgb_from_maps(
                    f, t, a, b, c, p.eps)
            )(face9, textures, fi, wt, dp)
        bg = jnp.asarray(p.background_color, jnp.float32)
        mask = (fi >= 0).astype(jnp.float32)[..., None]
        rgb = rgb * mask + (1 - mask) * bg
    else:
        rgb = jnp.zeros((B, is_, is_, 3))
        if zc is None:
            f_safe = jnp.maximum(fi, 0)
            zc = jax.vmap(lambda f, i: f[:, 2::3][i])(face9, f_safe)

    alpha = (fi >= 0).astype(jnp.float32)
    out = (rgb, alpha, dp)
    saved = impl.N3mrMaps(face_index=fi, weight=wt, depth=dp, face_inv=finv,
                          zcorn=zc, rgb=rgb, alpha=alpha)
    return out, saved


def _core_fwd(faces, textures, p: N3mrParams):
    out, saved = _forward(faces, textures, p)
    return out, (faces, textures, saved)


def _core_bwd(p: N3mrParams, res, gout):
    faces, textures, m = res
    g_rgb, g_alpha, g_depth = gout
    B = faces.shape[0]
    is_ = p.image_size
    face9 = faces.reshape(B, -1, 9)

    grad_faces = jnp.zeros_like(face9)
    if p.return_rgb or p.return_alpha:
        from . import banded_bwd
        # static python loop over batch: the TPU path is a Pallas call
        # with scalar prefetch, which jax.vmap cannot batch
        gpix = jnp.stack([
            banded_bwd.backward_pixel_map_banded(
                face9[b], m.face_index[b], m.rgb[b], m.alpha[b],
                g_rgb[b], g_alpha[b], is_, p.eps, p.return_rgb,
                p.return_alpha)
            for b in range(B)])
        grad_faces = grad_faces + gpix

    if p.return_rgb:
        from . import pallas_impl
        ts = textures.shape[2]
        if pallas_impl._is_tpu() and pallas_impl._pf_tile_for(is_) and \
                1 < ts <= 2:
            # tiled winner-onehot x tap-matrix kernel: replaces the
            # [is^2, ts^3*3] per-pixel segment scatter (~17 ms at 1024^2)
            grad_tex = pallas_impl.backward_textures_pallas(
                face9, m.face_index, m.weight, m.depth,
                tuple(textures.shape[1:]), is_, p.eps,
                zcorn=m.zcorn, grad_rgb=g_rgb)
        else:
            grad_tex = jax.vmap(
                lambda fi, wt, dpv, zc, gr: impl.backward_textures_single(
                    textures.shape[1:], fi, wt, dpv, zc, gr, p.eps)
            )(m.face_index, m.weight, m.depth, m.zcorn, g_rgb)
    else:
        grad_tex = jnp.zeros_like(textures)

    if p.return_depth:
        gdep = jax.vmap(lambda f, fi, finv, wt, dpv, zc, gd: impl.backward_depth_single(
            f, fi, finv, wt, dpv, zc, gd)
        )(face9, m.face_index, m.face_inv, m.weight, m.depth, m.zcorn, g_depth)
        grad_faces = grad_faces + gdep

    return grad_faces.reshape(faces.shape), grad_tex


_rasterize_core.defvjp(_core_fwd, _core_bwd)


def vertices_to_faces(vertices, faces):
    """[B,V,3],[B,F,3] -> [B,F,3,3] (rasterizer.py:9-24)."""
    assert vertices.ndim == 3 and faces.ndim == 3
    # barrier: batched gathers over two compile-time constants miscompile
    # on the TPU backend (see structures.mesh.face_vertices)
    vertices, faces = jax.lax.optimization_barrier((vertices, faces))
    return jax.vmap(lambda v, f: v[f])(vertices, faces)


def pool2x(x):
    B, H, W = x.shape[:3]
    if x.ndim == 3:
        return x.reshape(B, H // 2, 2, W // 2, 2).mean(axis=(2, 4))
    C = x.shape[-1]
    return x.reshape(B, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))


def rasterize_rgbad(faces, textures=None, image_size=DEFAULT_IMAGE_SIZE,
                    anti_aliasing=DEFAULT_ANTI_ALIASING, near=DEFAULT_NEAR,
                    far=DEFAULT_FAR, eps=DEFAULT_EPS,
                    background_color=DEFAULT_BACKGROUND_COLOR,
                    return_rgb=True, return_alpha=True, return_depth=True):
    """Returns dict(rgb [B,3,H,W], alpha [B,H,W], depth [B,H,W])."""
    size = image_size * 2 if anti_aliasing else image_size
    p = N3mrParams(image_size=size, near=float(near), far=float(far),
                   eps=float(eps),
                   background_color=tuple(background_color) if background_color
                   is not None else (0.0, 0.0, 0.0),
                   return_rgb=return_rgb, return_alpha=return_alpha,
                   return_depth=return_depth)
    faces = jnp.asarray(faces, jnp.float32)
    if textures is None:
        B, F = faces.shape[:2]
        textures = jnp.zeros((B, F, 1, 1, 1, 3), jnp.float32)
    textures = jnp.asarray(textures, jnp.float32)

    rgb, alpha, depth = _rasterize_core(faces, textures, p)

    # vertical flip (n3mr.py:247-253), then AA resolve
    rgb = jnp.transpose(rgb, (0, 3, 1, 2))[:, :, ::-1, :]
    alpha = alpha[:, ::-1, :]
    depth = depth[:, ::-1, :]
    if anti_aliasing:
        B, C, H, W = rgb.shape
        rgb = rgb.reshape(B, C, H // 2, 2, W // 2, 2).mean(axis=(3, 5))
        alpha = pool2x(alpha)
        depth = pool2x(depth)
    return {'rgb': rgb if return_rgb else None,
            'alpha': alpha if return_alpha else None,
            'depth': depth if return_depth else None}


def rasterize(faces, textures, image_size=DEFAULT_IMAGE_SIZE,
              anti_aliasing=DEFAULT_ANTI_ALIASING, near=DEFAULT_NEAR,
              far=DEFAULT_FAR, eps=DEFAULT_EPS,
              background_color=DEFAULT_BACKGROUND_COLOR):
    return rasterize_rgbad(faces, textures, image_size, anti_aliasing, near,
                           far, eps, background_color, True, False, False)['rgb']


def rasterize_silhouettes(faces, image_size=DEFAULT_IMAGE_SIZE,
                          anti_aliasing=DEFAULT_ANTI_ALIASING,
                          near=DEFAULT_NEAR, far=DEFAULT_FAR, eps=DEFAULT_EPS):
    return rasterize_rgbad(faces, None, image_size, anti_aliasing, near, far,
                           eps, None, False, True, False)['alpha']


def rasterize_depth(faces, image_size=DEFAULT_IMAGE_SIZE,
                    anti_aliasing=DEFAULT_ANTI_ALIASING, near=DEFAULT_NEAR,
                    far=DEFAULT_FAR, eps=DEFAULT_EPS):
    return rasterize_rgbad(faces, None, image_size, anti_aliasing, near, far,
                           eps, None, False, False, True)['depth']


class N3mrRasterizer:
    """Module facade (rasterizer.py:26-120)."""

    def __init__(self, image_size=256, anti_aliasing=True,
                 background_color=(0, 0, 0), fill_back=True, near=0.1, far=100):
        self.image_size = image_size
        self.anti_aliasing = anti_aliasing
        self.background_color = background_color
        self.fill_back = fill_back
        self.near = near
        self.far = far
        self.rasterizer_eps = 1e-3
        # API-parity attrs touched by Renderer.set_*:
        self.sigma_val = None
        self.gamma_val = None
        self.texture_type = 'surface'

    def __call__(self, mesh, mode=None):
        vertices, faces, textures = mesh.vertices, mesh.faces, mesh.textures
        if mode is None:
            return self.render(vertices, faces, textures)
        if mode == 'rgb':
            return self.render_rgb(vertices, faces, textures)
        if mode == 'silhouettes':
            return self.render_silhouettes(vertices, faces)
        if mode == 'depth':
            return self.render_depth(vertices, faces)
        raise ValueError("mode should be one of None, 'silhouettes' or 'depth'")

    def _fill_back_faces(self, faces):
        return jnp.concatenate([faces, faces[:, :, ::-1]], axis=1)

    def render_silhouettes(self, vertices, faces):
        if self.fill_back:
            faces = self._fill_back_faces(faces)
        fv = vertices_to_faces(vertices, faces)
        return rasterize_silhouettes(fv, self.image_size, self.anti_aliasing)

    def render_depth(self, vertices, faces):
        if self.fill_back:
            faces = jax.lax.stop_gradient(self._fill_back_faces(faces))
        fv = vertices_to_faces(vertices, faces)
        return rasterize_depth(fv, self.image_size, self.anti_aliasing)

    def render_rgb(self, vertices, faces, textures):
        if self.fill_back:
            faces = jax.lax.stop_gradient(self._fill_back_faces(faces))
            textures = jnp.concatenate(
                [textures, jnp.transpose(textures, (0, 1, 4, 3, 2, 5))], axis=1)
        fv = vertices_to_faces(vertices, faces)
        return rasterize(fv, textures, self.image_size, self.anti_aliasing,
                         self.near, self.far, self.rasterizer_eps,
                         self.background_color)

    def render(self, vertices, faces, textures):
        if self.fill_back:
            faces = jax.lax.stop_gradient(self._fill_back_faces(faces))
            textures = jnp.concatenate(
                [textures, jnp.transpose(textures, (0, 1, 4, 3, 2, 5))], axis=1)
        fv = vertices_to_faces(vertices, faces)
        out = rasterize_rgbad(fv, textures, self.image_size, self.anti_aliasing,
                              self.near, self.far, self.rasterizer_eps,
                              self.background_color)
        return out['rgb'], out['depth'], out['alpha']
