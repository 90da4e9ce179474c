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


def band_row_src(image_size: int, n_dev: int, tile: int):
    """Pixel-row source indices of the strided-band layout.

    Device d owns tile rows d, d+n, d+2n, ... (round-robin); the
    concatenated per-device bands therefore hold image row
    ``src[i]`` at strided row ``i``.  Returns (src, inv) with
    ``strided[i] == image[src[i]]`` and ``image[j] == strided[inv[j]]``."""
    import numpy as np
    TY = image_size // tile
    TYB = TY // n_dev
    src = np.concatenate([
        np.arange(tile) + (d + k * n_dev) * tile
        for d in range(n_dev) for k in range(TYB)])
    inv = np.argsort(src)
    return src, inv


def soft_rasterize_sharded(face_vertices, textures, p: SoftRasParams,
                           mesh: Mesh, axis: str = 'data',
                           band_mode: str = 'stride'):
    """Forward-only band rasterization (rows sharded over `axis`)."""
    return soft_rasterize_sharded_vjp(face_vertices, textures, p, mesh, axis,
                                      band_mode)


def soft_rasterize_sharded_vjp(face_vertices, textures, p: SoftRasParams,
                               mesh: Mesh, axis: str = 'data',
                               band_mode: str = 'stride'):
    """Differentiable sharded rasterization.

    Returns soft_colors [B, 4, H, W] with H sharded over `axis`; grads
    w.r.t. face_vertices and textures are psum'd over the bands, so the
    result is identical to the single-device rasterize (the reference's
    jt.mpi data parallelism, made explicit).

    band_mode='stride' (default) assigns tile rows round-robin over
    devices (row ty -> device ty % n) instead of contiguous bands —
    band face counts vary ~1.6x across the bench images, so contiguous
    bands bound scaling efficiency at ~63% for single-band hotspots
    while striding flattens the per-device demand
    (docs/SCALING_ANALYSIS.md).  The device bands come back
    row-interleaved; this wrapper re-orders them OUTSIDE the shard_map
    (one [H]-gather whose reshard cost is ~16 MB at 1024^2, vs the ms-
    scale compute win), so the returned image is identical to
    band_mode='contig'.  'contig' keeps the round-4 contiguous bands."""
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
        # stride mode rides the pxt band path only (px_f keeps contig)
        strided = band_mode == 'stride' and use_pxt and n_dev > 1
    else:
        assert is_ % n_dev == 0
        t = 16 if is_ % 16 == 0 and (is_ // 16) % n_dev == 0 else 0
        strided = band_mode == 'stride' and t > 0 and n_dev > 1
        xp, yp = jax_impl.pixel_grid(is_)
        xp = xp.reshape(is_, is_)
        yp = yp.reshape(is_, is_)
        if strided:
            src_o, _ = band_row_src(is_, n_dev, t)
            xp = xp[src_o]
            yp = yp[src_o]

    if strided:
        src_np, inv_np = band_row_src(is_, n_dev, t)
        src = jnp.asarray(src_np)
        inv = jnp.asarray(inv_np)

    def _unstride(img):
        return jnp.take(img, inv, axis=2) if strided else img

    @functools.partial(jax.custom_vjp, nondiff_argnums=())
    def _sharded(face_r, tex_r):
        # primal (no grad requested): skip the top-K threshold pass —
        # the truncation only affects gradients
        out, _ = _run_fwd(face_r, tex_r, False)
        return _unstride(out)

    def _band_fwd(face_b, tex_b, with_thr):
        from ..ops.softras import pallas_impl as PI
        di = jax.lax.axis_index(axis).astype(jnp.int32)
        if use_pxt:
            from ..ops.softras import pxt_impl
            if strided:
                out, aggrs, aux = pxt_impl.soft_rasterize_fwd_pxt(
                    face_b, tex_b, p, with_thr, None, di, TYB, None, n_dev)
            else:
                out, aggrs, aux = pxt_impl.soft_rasterize_fwd_pxt(
                    face_b, tex_b, p, with_thr, None, di * TYB, TYB)
        else:
            out, aggrs, aux = PI.soft_rasterize_fwd_pallas_pf(
                face_b, tex_b, p, with_thr, di * TYB, TYB)
        return out, (aggrs, aux)

    def _sharded_fwd(face_r, tex_r):
        out, saved = _run_fwd(face_r, tex_r,
                              p.grad_mode == 'topk' and p.max_faces_id < F)
        return _unstride(out), saved

    def _run_fwd(face_r, tex_r, with_thr):
        if use_pallas:
            # check_vma=False: the band restriction slices replicated
            # tile tables with the device-varying ty0 — a mixed-vma
            # dynamic_slice the checker cannot type yet (JAX suggests
            # exactly this workaround in its error).  Re-tested on jax
            # 0.9.0 (r5): with vma threaded into the pallas out_shapes
            # the checker still rejects the dynamic_slice itself
            # ("varying manual axes must match ... open an issue /
            # pass check_vma=False").  The oracle paths below run with
            # the checker ON.
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
        if strided:
            g = jnp.take(g, src, axis=2)   # image order -> band layout
        if use_pallas:
            aggrs, aux = res

            @functools.partial(
                shard_map, mesh=mesh,
                in_specs=(P(), P(), P(None, None, axis), P(None, None, axis),
                          P(None, None, axis), P(None, None, axis)),
                out_specs=(P(), P()), check_vma=False)
            def run_bwd(fb, tb, sc_b, ag_b, aux_b, g_b):
                from ..ops.softras import pallas_impl as PI
                di = jax.lax.axis_index(axis).astype(jnp.int32)
                if use_pxt:
                    from ..ops.softras import pxt_impl
                    if strided:
                        gf, gt = pxt_impl.soft_rasterize_bwd_pxt(
                            fb, tb, sc_b, ag_b, aux_b, g_b, p, None, di,
                            TYB, None, n_dev)
                    else:
                        gf, gt = pxt_impl.soft_rasterize_bwd_pxt(
                            fb, tb, sc_b, ag_b, aux_b, g_b, p, None,
                            di * TYB, TYB)
                else:
                    gf, gt = PI.soft_rasterize_bwd_pallas_pf(
                        fb, tb, sc_b, ag_b, aux_b, g_b, p, di * TYB, TYB)
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
