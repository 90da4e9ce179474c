"""Public SoftRas entry point with custom VJP.

Equivalent of the reference ``soft_rasterize``
(jrender/renderer/dr/softras/soft_rasterize.py:136-148); the custom
backward replicates ``SoftRasterizeFunction.grad`` (:105-133).

Backend selection: 'jax' is the vectorized XLA implementation (runs
anywhere); 'pallas' uses hand-written TPU kernels for the hot pair-loop.
'auto' picks pallas on TPU, jax elsewhere.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from . import jax_impl
from .params import SoftRasParams, make_params

_BACKEND_OVERRIDE = None


def set_backend(name):
    """Force a backend ('jax' | 'pallas' | None for auto)."""
    global _BACKEND_OVERRIDE
    _BACKEND_OVERRIDE = name


def _resolve_backend(backend: str) -> str:
    if _BACKEND_OVERRIDE is not None:
        return _BACKEND_OVERRIDE
    if backend != 'auto':
        return backend
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = 'cpu'
    return 'pallas' if platform in ('tpu', 'axon') else 'jax'


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _soft_rasterize_core(face_vertices, textures, p: SoftRasParams, backend: str):
    out, _, _ = _forward(face_vertices, textures, p, backend)
    return out


def _pallas_route(p: SoftRasParams, F: int, for_grad: bool = True) -> str:
    """'dir' | 'pxt' | 'pxg' | 'px_f' | 'f_px' | 'jax'.  dir (binning-
    free, whole face table VMEM-resident, dir_impl.py) serves small
    meshes (F <= JR_DIR_MAX); pxt (tile-block-aligned work items with
    kernel-resident combine, pxt_impl.py) is the fast default above
    that; pxg is its predecessor (XLA segment combine); px_f is the
    per-tile-chunk layout kept for pixel-band sharding; f_px the legacy
    wide-tile layout.  The dir/pxt/pxg/px_f kernels implement the
    reference top-K gradient truncation (threshold pass); f_px does
    not, so for non-tileable image sizes a *binding* grad_mode='topk'
    (F > K) is honestly dispatched to the oracle instead of silently
    dropping the policy."""
    from . import dir_impl, pallas_impl, pxg_impl
    if pallas_impl.LAYOUT == 'pxt' and F <= dir_impl.dir_max_faces() \
            and dir_impl._dir_tile(p.image_size):
        return 'dir'
    if pallas_impl.LAYOUT == 'pxt' and pxg_impl._pxg_tile_for(p.image_size):
        return 'pxt'
    if pallas_impl.LAYOUT in ('pxt', 'pxg') and \
            pxg_impl._pxg_tile_for(p.image_size):
        return 'pxg'
    if pallas_impl.LAYOUT in ('pxt', 'pxg', 'px_f') and \
            pallas_impl._pf_tile_for(p.image_size):
        return 'px_f'
    if for_grad and p.grad_mode == 'topk' and p.max_faces_id < F:
        return 'jax'
    return 'f_px'


def _forward(face_vertices, textures, p: SoftRasParams, backend: str,
             for_grad: bool = False):
    if backend == 'pallas':
        from . import pallas_impl
        route = _pallas_route(p, face_vertices.shape[1], for_grad)
        if route == 'dir':
            from . import dir_impl
            with_thr = (for_grad and p.grad_mode == 'topk'
                        and p.max_faces_id < face_vertices.shape[1])
            return dir_impl.soft_rasterize_fwd_dir(
                face_vertices, textures, p, with_thr)
        if route == 'pxt':
            from . import pxt_impl
            with_thr = (for_grad and p.grad_mode == 'topk'
                        and p.max_faces_id < face_vertices.shape[1])
            return pxt_impl.soft_rasterize_fwd_pxt(
                face_vertices, textures, p, with_thr)
        if route == 'pxg':
            from . import pxg_impl
            with_thr = (for_grad and p.grad_mode == 'topk'
                        and p.max_faces_id < face_vertices.shape[1])
            return pxg_impl.soft_rasterize_fwd_pxg(
                face_vertices, textures, p, with_thr)
        if route == 'px_f':
            # the grad-path forward also emits the top-K gradient
            # threshold map (bisected in-kernel); the plain forward skips
            # that work entirely
            with_thr = (for_grad and p.grad_mode == 'topk'
                        and p.max_faces_id < face_vertices.shape[1])
            return pallas_impl.soft_rasterize_fwd_pallas_pf(
                face_vertices, textures, p, with_thr)
        if route == 'f_px':
            return pallas_impl.soft_rasterize_fwd_pallas(face_vertices, textures, p)
    return jax_impl.soft_rasterize_fwd_jax(face_vertices, textures, p)


def _backward(face_vertices, textures, soft_colors, aggrs, faces_id, g,
              p: SoftRasParams, backend: str):
    if backend == 'pallas':
        from . import pallas_impl
        route = _pallas_route(p, face_vertices.shape[1])
        if route == 'dir':
            from . import dir_impl
            return dir_impl.soft_rasterize_bwd_dir(
                face_vertices, textures, soft_colors, aggrs, faces_id, g, p)
        if route == 'pxt':
            from . import pxt_impl
            return pxt_impl.soft_rasterize_bwd_pxt(
                face_vertices, textures, soft_colors, aggrs, faces_id, g, p)
        if route == 'pxg':
            from . import pxg_impl
            return pxg_impl.soft_rasterize_bwd_pxg(
                face_vertices, textures, soft_colors, aggrs, faces_id, g, p)
        if route == 'px_f':
            return pallas_impl.soft_rasterize_bwd_pallas_pf(
                face_vertices, textures, soft_colors, aggrs, faces_id, g, p)
        if route == 'f_px':
            return pallas_impl.soft_rasterize_bwd_pallas(
                face_vertices, textures, soft_colors, aggrs, faces_id, g, p)
    return jax_impl.soft_rasterize_bwd_jax(
        face_vertices, textures, soft_colors, aggrs, faces_id, g, p)


def _core_fwd(face_vertices, textures, p: SoftRasParams, backend: str):
    if backend == 'pallas':
        from . import pallas_impl
        route = _pallas_route(p, face_vertices.shape[1], True)
        if route == 'dir':
            # share the face-table prep between fwd and bwd (residual)
            from . import dir_impl
            with_thr = (p.grad_mode == 'topk'
                        and p.max_faces_id < face_vertices.shape[1])
            prep = dir_impl.prep_dir(face_vertices, textures, p)
            out, aggrs, aux = dir_impl.soft_rasterize_fwd_dir(
                face_vertices, textures, p, with_thr, prep=prep)
            return out, (face_vertices, textures, out, aggrs, aux,
                         None, None, None, prep)
        if route == 'pxt':
            # share the binning/gather prep between fwd and bwd (residual)
            from . import pxt_impl
            with_thr = (p.grad_mode == 'topk'
                        and p.max_faces_id < face_vertices.shape[1])
            prep = pxt_impl.prep_pxt(face_vertices, textures, p)
            out, aggrs, aux = pxt_impl.soft_rasterize_fwd_pxt(
                face_vertices, textures, p, with_thr, prep=prep)
            return out, (face_vertices, textures, out, aggrs, aux,
                         None, None, prep, None)
        if route == 'pxg':
            # share the binning/gather prep between fwd and bwd (residual)
            from . import pxg_impl
            with_thr = (p.grad_mode == 'topk'
                        and p.max_faces_id < face_vertices.shape[1])
            prep = pxg_impl.prep_pxg(face_vertices, textures, p)
            out, aggrs, aux = pxg_impl.soft_rasterize_fwd_pxg(
                face_vertices, textures, p, with_thr, prep=prep)
            return out, (face_vertices, textures, out, aggrs, aux,
                         None, prep, None, None)
        if route == 'px_f':
            # share the binning/gather prep between fwd and bwd: it is a
            # pure function of (face_vertices, textures) and costs a sort
            # + large gathers — running it once per frame, not twice
            with_thr = (p.grad_mode == 'topk'
                        and p.max_faces_id < face_vertices.shape[1])
            prep = pallas_impl.prep_pf(face_vertices, textures, p)
            out, aggrs, aux = pallas_impl.soft_rasterize_fwd_pallas_pf(
                face_vertices, textures, p, with_thr, prep=prep)
            return out, (face_vertices, textures, out, aggrs, aux, prep,
                         None, None, None)
    out, aggrs, faces_id = _forward(face_vertices, textures, p, backend,
                                    for_grad=True)
    return out, (face_vertices, textures, out, aggrs, faces_id, None, None,
                 None, None)


def _core_bwd(p: SoftRasParams, backend: str, res, g):
    (face_vertices, textures, out, aggrs, faces_id, prep_pf, prep_pxg,
     prep_pxt, prep_dir) = res
    if prep_dir is not None:
        from . import dir_impl
        return dir_impl.soft_rasterize_bwd_dir(
            face_vertices, textures, out, aggrs, faces_id, g, p,
            prep=prep_dir)
    if prep_pxt is not None:
        from . import pxt_impl
        return pxt_impl.soft_rasterize_bwd_pxt(
            face_vertices, textures, out, aggrs, faces_id, g, p,
            prep=prep_pxt)
    if prep_pxg is not None:
        from . import pxg_impl
        return pxg_impl.soft_rasterize_bwd_pxg(
            face_vertices, textures, out, aggrs, faces_id, g, p,
            prep=prep_pxg)
    if prep_pf is not None:
        from . import pallas_impl
        return pallas_impl.soft_rasterize_bwd_pallas_pf(
            face_vertices, textures, out, aggrs, faces_id, g, p,
            prep=prep_pf)
    gf, gt = _backward(face_vertices, textures, out, aggrs, faces_id, g, p, backend)
    return gf, gt


_soft_rasterize_core.defvjp(_core_fwd, _core_bwd)


def soft_rasterize(face_vertices, textures, image_size=256,
                   background_color=(0, 0, 0), near=1, far=100,
                   fill_back=True, eps=1e-3,
                   sigma_val=1e-5, dist_func='euclidean', dist_eps=1e-4,
                   gamma_val=1e-4, aggr_func_rgb='softmax', aggr_func_alpha='prod',
                   texture_type='surface', bin_size=0, max_elems_per_bin=0,
                   max_faces_per_pixel_for_grad=16, backend='auto',
                   grad_mode='topk'):
    """Differentiable soft rasterization; returns images [B, 4, H, W].

    ``face_vertices``: [B, F, 3, 3] (or [B, F, 9]); ``textures``:
    [B, F, T, 3] (surface) or [B, F, 3, 3] (vertex colors per corner).
    ``bin_size`` / ``max_elems_per_bin`` are accepted for API parity;
    the TPU backend tiles the screen automatically.
    """
    p = make_params(image_size=image_size, background_color=background_color,
                    near=near, far=far, fill_back=fill_back, eps=eps,
                    sigma_val=sigma_val, dist_func=dist_func, dist_eps=dist_eps,
                    gamma_val=gamma_val, aggr_func_rgb=aggr_func_rgb,
                    aggr_func_alpha=aggr_func_alpha, texture_type=texture_type,
                    max_faces_per_pixel_for_grad=max_faces_per_pixel_for_grad,
                    grad_mode=grad_mode)
    face_vertices = jnp.asarray(face_vertices, jnp.float32)
    textures = jnp.asarray(textures, jnp.float32)
    B, F = face_vertices.shape[:2]
    face_vertices = face_vertices.reshape(B, F, 9)
    if texture_type == 'vertex':
        textures = textures.reshape(B, F, 3, 3)
    resolved = _resolve_backend(backend)
    return _soft_rasterize_core(face_vertices, textures, p, resolved)


def soft_rasterize_with_aux(face_vertices, textures, p: SoftRasParams,
                            backend='auto'):
    """Non-differentiable forward returning (colors, aggrs_info, faces_id)."""
    face_vertices = jnp.asarray(face_vertices, jnp.float32)
    B, F = face_vertices.shape[:2]
    face_vertices = face_vertices.reshape(B, F, 9)
    textures = jnp.asarray(textures, jnp.float32)
    return _forward(face_vertices, textures, p, _resolve_backend(backend))
