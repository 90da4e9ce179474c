"""Multi-device soft rasterization.

Pixel-band data parallelism via shard_map: each device rasterizes a
horizontal band of the output image against the full (replicated) face
set through the SAME binned Pallas kernels as the single-chip path
(the default pxt tile-block layout when the image tiles to 16px, else
px_f)
(ops.softras.pallas_impl with a tile-row band restriction) — the forward
needs NO cross-device communication (SURVEY.md §5: the softmax depth
aggregation is pixel-local), and backward face/texture gradients are
psum-reduced over the band axis (XLA lowers this to a reduce-scatter +
all-gather over ICI when beneficial).

On non-TPU meshes (tests: 8 virtual CPU devices) each band falls back to
the jnp oracle, keeping the communication structure identical.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.softras import jax_impl
from ..ops.softras.params import SoftRasParams


def _band_uses_pallas() -> bool:
    """Pallas band kernels on real TPUs; JR_FORCE_PALLAS_BANDS=1 runs
    them in interpret mode on the CPU mesh so the band index math
    (ty0/ty_band) and psum glue are exercised multi-device in CI."""
    import os
    if os.environ.get('JR_FORCE_PALLAS_BANDS', '0') == '1':
        return True
    try:
        return jax.devices()[0].platform in ('tpu', 'axon')
    except Exception:
        return False


def _band_fwd_oracle(face, tex, p, xp_b, yp_b, is_):
    def one(fb, tb):
        sc, _, _ = jax_impl.forward_single(fb, tb, p, xp_b.reshape(-1),
                                           yp_b.reshape(-1))
        return sc.T.reshape(4, xp_b.shape[0], is_)
    return jax.vmap(one)(face, tex)


def soft_rasterize_sharded(face_vertices, textures, p: SoftRasParams,
                           mesh: Mesh, axis: str = 'data'):
    """Forward-only band rasterization (rows sharded over `axis`)."""
    return soft_rasterize_sharded_vjp(face_vertices, textures, p, mesh, axis)


def soft_rasterize_sharded_vjp(face_vertices, textures, p: SoftRasParams,
                               mesh: Mesh, axis: str = 'data'):
    """Differentiable sharded rasterization.

    Returns soft_colors [B, 4, H, W] with H sharded over `axis`; grads
    w.r.t. face_vertices and textures are psum'd over the bands, so the
    result is identical to the single-device rasterize (the reference's
    jt.mpi data parallelism, made explicit)."""
    n_dev = mesh.shape[axis]
    is_ = p.image_size
    B, F = face_vertices.shape[:2]
    face = face_vertices.reshape(B, F, 9)
    use_pallas = _band_uses_pallas()

    use_pxt = False
    if use_pallas:
        from ..ops.softras import pallas_impl as PI
        from ..ops.softras import pxg_impl, pxt_impl
        use_pxt = (PI.LAYOUT == 'pxt'
                   and pxg_impl._pxg_tile_for(is_) > 0
                   and (is_ // pxg_impl._pxg_tile_for(is_)) % n_dev == 0)
        t = pxg_impl._pxg_tile_for(is_) if use_pxt else PI._pf_tile_for(is_)
        TY = is_ // t
        assert TY % n_dev == 0, 'tile rows must divide over devices'
        TYB = TY // n_dev
    else:
        assert is_ % n_dev == 0
        xp, yp = jax_impl.pixel_grid(is_)
        xp = xp.reshape(is_, is_)
        yp = yp.reshape(is_, is_)

    @functools.partial(jax.custom_vjp, nondiff_argnums=())
    def _sharded(face_r, tex_r):
        # primal (no grad requested): skip the top-K threshold pass —
        # the truncation only affects gradients
        out, _ = _run_fwd(face_r, tex_r, False)
        return out

    def _band_fwd(face_b, tex_b, with_thr):
        from ..ops.softras import pallas_impl as PI
        ty0 = jax.lax.axis_index(axis).astype(jnp.int32) * TYB
        if use_pxt:
            from ..ops.softras import pxt_impl
            out, aggrs, aux = pxt_impl.soft_rasterize_fwd_pxt(
                face_b, tex_b, p, with_thr, None, ty0, TYB)
        else:
            out, aggrs, aux = PI.soft_rasterize_fwd_pallas_pf(
                face_b, tex_b, p, with_thr, ty0, TYB)
        return out, (aggrs, aux)

    def _sharded_fwd(face_r, tex_r):
        return _run_fwd(face_r, tex_r,
                        p.grad_mode == 'topk' and p.max_faces_id < F)

    def _run_fwd(face_r, tex_r, with_thr):
        if use_pallas:
            # check_vma=False: the band restriction slices replicated
            # tile tables with the device-varying ty0 — a mixed-vma
            # dynamic_slice the checker cannot type yet (JAX suggests
            # exactly this workaround in its error).  The oracle paths
            # below run with the checker ON.
            @functools.partial(
                shard_map, mesh=mesh, in_specs=(P(), P()),
                out_specs=(P(None, None, axis), (P(None, None, axis),
                                                 P(None, None, axis))),
                check_vma=False)
            def run(fb, tb):
                return _band_fwd(fb, tb, with_thr)
            out, res = run(face_r, tex_r)
        else:
            @functools.partial(
                shard_map, mesh=mesh,
                in_specs=(P(), P(), P(axis), P(axis)),
                out_specs=P(None, None, axis))
            def run(fb, tb, xp_b, yp_b):
                return _band_fwd_oracle(fb, tb, p, xp_b, yp_b, is_)
            out = run(face_r, tex_r, xp, yp)
            res = None
        return out, (face_r, tex_r, out, res)

    def _sharded_bwd(saved, g):
        face_r, tex_r, out, res = saved
        if use_pallas:
            aggrs, aux = res

            @functools.partial(
                shard_map, mesh=mesh,
                in_specs=(P(), P(), P(None, None, axis), P(None, None, axis),
                          P(None, None, axis), P(None, None, axis)),
                out_specs=(P(), P()), check_vma=False)
            def run_bwd(fb, tb, sc_b, ag_b, aux_b, g_b):
                from ..ops.softras import pallas_impl as PI
                ty0 = jax.lax.axis_index(axis).astype(jnp.int32) * TYB
                if use_pxt:
                    from ..ops.softras import pxt_impl
                    gf, gt = pxt_impl.soft_rasterize_bwd_pxt(
                        fb, tb, sc_b, ag_b, aux_b, g_b, p, None, ty0, TYB)
                else:
                    gf, gt = PI.soft_rasterize_bwd_pallas_pf(
                        fb, tb, sc_b, ag_b, aux_b, g_b, p, ty0, TYB)
                return (jax.lax.psum(gf, axis), jax.lax.psum(gt, axis))
            return run_bwd(face_r, tex_r, out, aggrs, aux, g)

        # oracle fallback: band-local jnp backward + psum
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(None, None, axis)),
            out_specs=(P(), P()))
        def run_bwd(fb, tb, xp_b, yp_b, g_b):
            def one(f1, t1, g1):
                sc, ag, fid = jax_impl.forward_single(
                    f1, t1, p, xp_b.reshape(-1), yp_b.reshape(-1))
                return jax_impl.backward_single(
                    f1, t1, sc, ag, fid, g1.reshape(4, -1).T, p,
                    xp_b.reshape(-1), yp_b.reshape(-1))
            gf, gt = jax.vmap(one)(fb, tb, g_b)
            return (jax.lax.psum(gf, axis), jax.lax.psum(gt, axis))
        return run_bwd(face_r, tex_r, xp, yp, g)

    _sharded.defvjp(_sharded_fwd, _sharded_bwd)
    return _sharded(face, textures)
