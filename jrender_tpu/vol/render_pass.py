"""Top-level volume render pass (pure JAX).

Reference: jrender_vol/renderPass/render.py:7-89.

TPU-first: ray chunking uses ``jax.lax.map`` over padded fixed-size
chunks so the whole render is one compiled program (the reference's
Python loop re-dispatches per chunk); under jit the chunks pipeline
on-device with no host round-trips.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .camera import pinhole_get_rays, ndc_rays
from .ray_marching import render_rays


def batchify_rays(rays_flat, chunk=1024 * 32, key=None, **kwargs):
    """Render rays in fixed-size chunks via lax.map (padded)."""
    N = rays_flat.shape[0]
    if N <= chunk:
        return render_rays(rays_flat, key=key, **kwargs)
    n_chunks = (N + chunk - 1) // chunk
    pad = n_chunks * chunk - N
    rays_p = jnp.concatenate([rays_flat, rays_flat[:1].repeat(pad, 0)], 0) \
        if pad else rays_flat
    rays_c = rays_p.reshape(n_chunks, chunk, rays_p.shape[-1])
    if key is not None:
        keys = jax.random.split(key, n_chunks)
    else:
        keys = jnp.zeros((n_chunks, 2), jnp.uint32)

    def one(args):
        rc, kc = args
        k = None if key is None else kc
        return render_rays(rc, key=k, **kwargs)

    out = jax.lax.map(one, (rays_c, keys))
    out = {k: v.reshape((-1,) + v.shape[2:])[:N] for k, v in out.items()}
    return out


def render(H, W, focal, chunk=1024 * 32, rays=None, c2w=None, intrinsic=None,
           ndc=True, near=0.0, far=1.0, use_viewdirs=False, c2w_staticcam=None,
           key=None, **kwargs):
    """Render rays or a full image; mirrors renderPass/render.py:24-89.

    Returns [rgb_map, disp_map, acc_map, extras_dict].
    """
    if c2w is not None:
        rays_o, rays_d = pinhole_get_rays(H, W, focal, c2w, intrinsic)
    else:
        rays_o, rays_d = rays

    if use_viewdirs:
        viewdirs = rays_d
        if c2w_staticcam is not None:
            assert intrinsic is None
            rays_o, rays_d = pinhole_get_rays(H, W, focal, c2w_staticcam)
        viewdirs = viewdirs / jnp.linalg.norm(viewdirs, axis=-1, keepdims=True)
        viewdirs = viewdirs.reshape(-1, 3).astype(jnp.float32)

    sh = rays_d.shape
    if ndc:
        rays_o, rays_d = ndc_rays(H, W, focal, 1.0, rays_o, rays_d)

    rays_o = rays_o.reshape(-1, 3).astype(jnp.float32)
    rays_d = rays_d.reshape(-1, 3).astype(jnp.float32)

    near_v = near * jnp.ones_like(rays_d[..., :1])
    far_v = far * jnp.ones_like(rays_d[..., :1])
    rays_cat = jnp.concatenate([rays_o, rays_d, near_v, far_v], -1)
    if use_viewdirs:
        rays_cat = jnp.concatenate([rays_cat, viewdirs], -1)

    all_ret = batchify_rays(rays_cat, chunk, key=key, **kwargs)
    all_ret = {k: v.reshape(tuple(sh[:-1]) + tuple(v.shape[1:]))
               for k, v in all_ret.items()}

    k_extract = ['rgb_map', 'disp_map', 'acc_map']
    ret_list = [all_ret[k] for k in k_extract]
    ret_dict = {k: all_ret[k] for k in all_ret if k not in k_extract}
    return ret_list + [ret_dict]
