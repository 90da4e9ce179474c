"""N3MR (Neural 3D Mesh Renderer, Kato 2018) — pure JAX implementation.

Reference kernels (jrender/renderer/dr/n3mr/cuda/rasterize.py):
  * forward_face_index_map (:5-215): per-face bbox scan + atomicCAS
    z-buffer -> here a per-pixel argmin over faces (deterministic: lowest
    face index wins depth ties, where the CUDA lock race was arbitrary).
  * forward_texture_sampling (:219-338): trilinear blend over the 2^3
    corners of the [ts,ts,ts] per-face texture volume.
  * backward_pixel_map (:342-660): NMR finite-difference edge gradients;
    reformulated from face-serial edge walks into vectorized
    (face-chunk, edge, axis) plane sweeps with identical math.
  * backward_textures (:660-694): segment-sum replaces atomicAdd.
  * backward_depth_map (:729-788): analytic depth gradients.

Images here are in the rasterizer's native orientation; the public
rasterize_rgbad applies the vertical flip + AA resolve like the
reference wrapper (n3mr.py:189-264).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class N3mrMaps(NamedTuple):
    """Saved forward maps.  face_inv is FLAT [B,H,W,9]: a trailing (3,3)
    would be tiled to (8,128) by the TPU layout engine (56x padding at
    1024²+); consumers reshape locally inside fusions where it's free."""
    face_index: jnp.ndarray     # [B,H,W] int32, -1 empty
    weight: jnp.ndarray         # [B,H,W,3]
    depth: jnp.ndarray          # [B,H,W]
    face_inv: jnp.ndarray       # [B,H,W,9]
    zcorn: jnp.ndarray          # [B,H,W,3] winner-face corner depths
    rgb: jnp.ndarray            # [B,H,W,3]
    alpha: jnp.ndarray          # [B,H,W]


def _face_frontside_n3mr(face):
    """n3mr draws faces where the reference kernel does NOT return early
    (rasterize.py:63)."""
    return ~((face[..., 7] - face[..., 1]) * (face[..., 3] - face[..., 0]) <
             (face[..., 4] - face[..., 1]) * (face[..., 6] - face[..., 0]))


def _pixel_space(face, is_):
    """p = 0.5*(v*is + is - 1) for x,y (rasterize.py:68-72)."""
    return 0.5 * (face * is_ + is_ - 1)


def _face_inv_pixel(face, is_):
    """Pixel-space inverse barycentric matrix [...,3,3] (rasterize.py:75-87).

    No determinant clamp (reference divides directly)."""
    px = _pixel_space(face[..., 0::3], is_)
    py = _pixel_space(face[..., 1::3], is_)
    x0, x1, x2 = px[..., 0], px[..., 1], px[..., 2]
    y0, y1, y2 = py[..., 0], py[..., 1], py[..., 2]
    inv = jnp.stack([
        y1 - y2, x2 - x1, x1 * y2 - x2 * y1,
        y2 - y0, x0 - x2, x2 * y0 - x0 * y2,
        y0 - y1, x1 - x0, x0 * y1 - x1 * y0,
    ], -1)
    det = x2 * (y0 - y1) + x0 * (y1 - y2) + x1 * (y2 - y0)
    inv = inv / det[..., None]
    return inv.reshape(inv.shape[:-1] + (3, 3))


def forward_maps_single(face, is_, near, far, face_chunk=512):
    """Z-buffer rasterization for one batch element.

    face: [F,9] NDC.  Returns (face_index [H,W], weight [H,W,3],
    depth [H,W], face_inv_map [H,W,3,3])."""
    F = face.shape[0]
    inv = _face_inv_pixel(face, is_)                       # [F,3,3]
    front = _face_frontside_n3mr(face)                     # [F]

    xi = jnp.arange(is_, dtype=jnp.float32)
    yi = jnp.arange(is_, dtype=jnp.float32)
    XI, YI = jnp.meshgrid(xi, yi, indexing='xy')           # [H,W] row=y
    XI = XI.reshape(-1)
    YI = YI.reshape(-1)
    xp = (2.0 * XI + 1 - is_) / is_
    yp = (2.0 * YI + 1 - is_) / is_

    n_chunks = (F + face_chunk - 1) // face_chunk
    Fp = n_chunks * face_chunk
    pad = Fp - F
    face_p = jnp.pad(face, ((0, pad), (0, 0)))
    inv_p = jnp.pad(inv, ((0, pad), (0, 0), (0, 0)))
    front_p = jnp.pad(front, (0, pad))

    # Bound the [pixel_block, face_chunk, 3] intermediates to ~200MB: at
    # 1024² an unblocked pass would materialize [1M, 512, 3] f32 (6GB).
    P = is_ * is_
    pblk = max(min(P, (1 << 24) // face_chunk), 256)
    n_pblk = (P + pblk - 1) // pblk

    fcs = face_p.reshape(n_chunks, face_chunk, 9)
    invs = inv_p.reshape(n_chunks, face_chunk, 3, 3)
    fronts = front_p.reshape(n_chunks, face_chunk)
    f0s = jnp.arange(n_chunks, dtype=jnp.int32) * face_chunk

    def run_block(blk):
        xp_b, yp_b, XI_b, YI_b = blk                       # [pblk]

        def chunk_body(carry, inputs):
            best_z, best_f, best_w = carry
            fc, invc, frontc, f0 = inputs                  # [C,9],[C,3,3],[C]
            x0, y0 = fc[:, 0], fc[:, 1]
            x1, y1 = fc[:, 3], fc[:, 4]
            x2, y2 = fc[:, 6], fc[:, 7]
            # inside test in NDC with strict comparisons (rasterize.py:113-116)
            e0 = (yp_b[:, None] - y0) * (x1 - x0) < (xp_b[:, None] - x0) * (y1 - y0)
            e1 = (yp_b[:, None] - y1) * (x2 - x1) < (xp_b[:, None] - x1) * (y2 - y1)
            e2 = (yp_b[:, None] - y2) * (x0 - x2) < (xp_b[:, None] - x2) * (y0 - y2)
            inside = ~(e0 | e1 | e2) & frontc[None, :]

            # w at integer pixel coords (rasterize.py:121-133)
            w = (invc[None, :, :, 0] * XI_b[:, None, None] +
                 invc[None, :, :, 1] * YI_b[:, None, None] + invc[None, :, :, 2])
            w = jnp.clip(w, 0.0, 1.0)
            w = w / jnp.sum(w, -1, keepdims=True)
            zp = 1.0 / (w[..., 0] / fc[None, :, 2] + w[..., 1] / fc[None, :, 5] +
                        w[..., 2] / fc[None, :, 8])
            ok = inside & (zp > near) & (zp < far)
            zkey = jnp.where(ok, zp, jnp.inf)

            arg = jnp.argmin(zkey, axis=1)                 # first min = lowest idx
            zmin = jnp.take_along_axis(zkey, arg[:, None], 1)[:, 0]
            wmin = jnp.take_along_axis(w, arg[:, None, None], 1)[:, 0]
            upd = zmin < best_z
            best_w = jnp.where(upd[:, None], wmin, best_w)
            best_f = jnp.where(upd, arg + f0, best_f)
            best_z = jnp.where(upd, zmin, best_z)
            return (best_z, best_f, best_w), None

        init = (jnp.full((xp_b.shape[0],), jnp.inf),
                jnp.full((xp_b.shape[0],), -1, jnp.int32),
                jnp.zeros((xp_b.shape[0], 3)))
        (bz, bf, bw), _ = jax.lax.scan(chunk_body, init, (fcs, invs, fronts, f0s))
        return bz, bf, bw

    Pp = n_pblk * pblk
    def pb(a):
        return jnp.pad(a, (0, Pp - P)).reshape(n_pblk, pblk)
    if n_pblk == 1:
        best_z, best_f, best_w = run_block((xp, yp, XI, YI))
    else:
        bz, bf, bw = jax.lax.map(run_block, (pb(xp), pb(yp), pb(XI), pb(YI)))
        best_z = bz.reshape(Pp)[:P]
        best_f = bf.reshape(Pp)[:P]
        best_w = bw.reshape(Pp, 3)[:P]

    has = best_f >= 0
    depth = jnp.where(has, best_z, far)
    face_index = jnp.where(has, best_f, -1)
    f_safe = jnp.maximum(best_f, 0)
    inv9 = inv.reshape(F, 9)
    face_inv_map = jnp.where(has[:, None], inv9[f_safe], 0.0)
    weight = jnp.where(has[:, None], best_w, 0.0)
    return (face_index.reshape(is_, is_), weight.reshape(is_, is_, 3),
            depth.reshape(is_, is_), face_inv_map.reshape(is_, is_, 9))


def texture_sampling_single(face, tex, face_index, weight, depth, eps):
    """Trilinear volumetric texture fetch (rasterize.py:228-298).

    tex: [F,ts,ts,ts,3].  Returns (rgb [H,W,3], samp_idx [H,W,8],
    samp_w [H,W,8])."""
    ts = tex.shape[1]
    H, W = face_index.shape
    fi = face_index.reshape(-1)
    has = fi >= 0
    f_safe = jnp.maximum(fi, 0)
    fc = face[f_safe]                                      # [P,9]
    wt = weight.reshape(-1, 3)
    dp = depth.reshape(-1)

    zs = fc[:, 2::3]                                       # [P,3]
    tif = wt * (ts - 1) * (dp[:, None] / zs)
    tif = jnp.clip(tif, 0.0, ts - 1 - eps)
    lo = tif.astype(jnp.int32)
    frac = tif - lo

    texf = tex.reshape(tex.shape[0], -1, 3)
    rgb = jnp.zeros((fi.shape[0], 3))
    samp_idx = []
    samp_w = []
    for pn in range(8):
        wgt = jnp.ones_like(dp)
        idx3 = []
        for k in range(3):
            if (pn >> k) % 2 == 0:
                wgt = wgt * (1.0 - frac[:, k])
                idx3.append(lo[:, k])
            else:
                wgt = wgt * frac[:, k]
                idx3.append(lo[:, k] + 1)
        isc = idx3[0] * ts * ts + idx3[1] * ts + idx3[2]
        rgb = rgb + wgt[:, None] * texf[f_safe, isc]
        samp_idx.append(isc)
        samp_w.append(wgt)
    samp_idx = jnp.stack(samp_idx, -1)
    samp_w = jnp.stack(samp_w, -1)
    rgb = jnp.where(has[:, None], rgb, 0.0)
    samp_idx = jnp.where(has[:, None], samp_idx, 0)
    samp_w = jnp.where(has[:, None], samp_w, 0.0)
    return (rgb.reshape(H, W, 3), samp_idx.reshape(H, W, 8),
            samp_w.reshape(H, W, 8))


def sampling_tif(weight, depth, zcorn, ts, eps):
    """Volumetric texture-index fractions [P,3] (rasterize.py:252-257)."""
    tif = weight * (ts - 1) * (depth[:, None] / zcorn)
    return jnp.clip(tif, 0.0, ts - 1 - eps)


def tent_weights(tif, ts):
    """Per-axis tent weights, 3 x [P, ts]: w_i = max(0, 1-|tif_a - i|).

    Algebraically identical to the reference's 8-corner trilinear taps
    (rasterize.py:259-298): weight (1-frac) lands on floor(tif), frac on
    floor(tif)+1, zero elsewhere — but needs no gathers, so the whole
    trilinear fetch becomes three dense contractions (TPU-friendly).
    Kept strictly 2-D: [P, ts, ...] trailing dims would get (8,128)-tiled
    by the layout engine."""
    grid = jnp.arange(ts, dtype=tif.dtype)[None, :]
    return [jnp.maximum(0.0, 1.0 - jnp.abs(tif[:, a:a + 1] - grid))
            for a in range(3)]


def trilinear_rgb_from_maps(face, tex, face_index, weight, depth, eps):
    """Texture fetch from z-buffer maps — TPU-native reformulation.

    One contiguous per-pixel row gather of the winning face's texture
    volume, then a factorized tent-weight contraction (no per-tap
    gathers, unlike the reference's 8 scattered fetches,
    rasterize.py:259-298).  tex: [F,ts,ts,ts,3].
    Returns (rgb [H,W,3], zcorn [H,W,3])."""
    ts = tex.shape[1]
    H, W = face_index.shape
    F = tex.shape[0]
    texf = tex.reshape(F, ts * ts * ts * 3)
    fi = face_index.reshape(-1)
    has = fi >= 0
    f_safe = jnp.maximum(fi, 0)
    zs = face[:, 2::3][f_safe]                              # [P,3] row gather
    if ts == 1:
        rgb = texf[f_safe]
    else:
        wt = weight.reshape(-1, 3)
        dp = depth.reshape(-1)
        tif = sampling_tif(wt, dp, zs, ts, eps)             # [P,3]
        # everything stays 2-D [P, C]: 3-D intermediates with small
        # trailing dims get (8,128)-tiled by the layout engine and blow
        # memory ~50x at megapixel sizes
        texrow = texf[f_safe]                               # [P, ts^3*3]
        tw = tent_weights(tif, ts)                          # 3 x [P,ts]
        c1 = ts * ts * 3
        t1 = sum(tw[0][:, i:i + 1] * texrow[:, i * c1:(i + 1) * c1]
                 for i in range(ts))                        # [P, ts^2*3]
        c2 = ts * 3
        t2 = sum(tw[1][:, j:j + 1] * t1[:, j * c2:(j + 1) * c2]
                 for j in range(ts))                        # [P, ts*3]
        rgb = sum(tw[2][:, k:k + 1] * t2[:, k * 3:(k + 1) * 3]
                  for k in range(ts))                       # [P, 3]
    rgb = jnp.where(has[:, None], rgb, 0.0)
    zcorn = jnp.where(has[:, None], zs, 1.0)
    return rgb.reshape(H, W, 3), zcorn.reshape(H, W, 3)


def trilinear_rgb_from_rows(texrow, face_index, weight, depth, zcorn, ts, eps):
    """Trilinear fetch when the winner's texture row was already selected
    in-kernel (pallas_impl.forward_sel_pallas) — zero gathers, pure
    elementwise tent-weight contraction.  texrow: [H,W,ts^3*3]."""
    H, W = face_index.shape
    has = (face_index >= 0).reshape(-1)
    texr = texrow.reshape(-1, ts * ts * ts * 3)
    if ts == 1:
        rgb = texr
    else:
        wt = weight.reshape(-1, 3)
        dp = depth.reshape(-1)
        zs = zcorn.reshape(-1, 3)
        tif = sampling_tif(wt, dp, zs, ts, eps)             # [P,3]
        tw = tent_weights(tif, ts)                          # 3 x [P,ts]
        c1 = ts * ts * 3
        t1 = sum(tw[0][:, i:i + 1] * texr[:, i * c1:(i + 1) * c1]
                 for i in range(ts))
        c2 = ts * 3
        t2 = sum(tw[1][:, j:j + 1] * t1[:, j * c2:(j + 1) * c2]
                 for j in range(ts))
        rgb = sum(tw[2][:, k:k + 1] * t2[:, k * 3:(k + 1) * 3]
                  for k in range(ts))
    rgb = jnp.where(has[:, None], rgb, 0.0)
    return rgb.reshape(H, W, 3)


def backward_textures_single(tex_shape, face_index, weight, depth, zcorn,
                             grad_rgb, eps):
    """Deterministic segment-sum texture gradient (rasterize.py:660-694).

    Recomputes the reference's 8 trilinear taps from the saved maps
    (instead of replaying stored sampling indices/weights) and
    segment-sums them — the atomicAdd replacement."""
    F, ts = tex_shape[0], tex_shape[1]
    fi = face_index.reshape(-1)
    has = fi >= 0
    f_safe = jnp.maximum(fi, 0)
    g = grad_rgb.reshape(-1, 3)
    T3 = ts * ts * ts
    if ts == 1:
        seg = jnp.where(has, f_safe, F)
        out = jax.ops.segment_sum(jnp.where(has[:, None], g, 0.0), seg,
                                  num_segments=F + 1)[:-1]
        return out.reshape(F, ts, ts, ts, 3)
    tif = sampling_tif(weight.reshape(-1, 3), depth.reshape(-1),
                       zcorn.reshape(-1, 3), ts, eps)      # [P,3]
    # factorized tent outer product, built 2-D with lane repeat/tile
    # (equivalent to the reference's 8 taps; see tent_weights)
    tw = tent_weights(tif, ts)                              # 3 x [P,ts]
    w01 = jnp.repeat(tw[0], ts, axis=1) * jnp.tile(tw[1], (1, ts))   # [P,ts^2]
    w012 = jnp.repeat(w01, ts, axis=1) * jnp.tile(tw[2], (1, ts * ts))
    rows = jnp.repeat(w012, 3, axis=1) * jnp.tile(g, (1, T3))        # [P,T3*3]
    rows = jnp.where(has[:, None], rows, 0.0)
    seg = jnp.where(has, f_safe, F)
    out = jax.ops.segment_sum(rows, seg, num_segments=F + 1)[:-1]
    return out.reshape(F, ts, ts, ts, 3)


def backward_depth_single(face, face_index, face_inv_map, weight, depth,
                          zcorn, grad_depth):
    """Analytic depth gradients (rasterize.py:729-788).

    All inputs are per-pixel maps (no face gathers: the winner's corner
    depths were saved in the forward)."""
    F = face.shape[0]
    is_ = face_index.shape[0]
    fi = face_index.reshape(-1)
    has = fi >= 0
    f_safe = jnp.maximum(fi, 0)
    inv = face_inv_map.reshape(-1, 3, 3)
    wt = weight.reshape(-1, 3)
    dp = depth.reshape(-1)
    gd = jnp.where(has, grad_depth.reshape(-1), 0.0)
    d2 = dp * dp

    zs = zcorn.reshape(-1, 3)
    gz = gd[:, None] * wt * d2[:, None] / (zs * zs)         # [P,3]

    tmp = -jnp.sum(inv / zs[:, :, None], axis=1)            # [P,3] over l
    gxy = -gd[:, None, None] * tmp[:, None, :2] * wt[:, :, None] \
        * d2[:, None, None] * is_ / 2.0                     # [P,3(corner),2]

    gv = jnp.concatenate([gxy, gz[..., None]], -1)          # [P,3,3]
    gv = jnp.where(has[:, None, None], gv, 0.0)
    grad_face = jax.ops.segment_sum(gv.reshape(-1, 9),
                                    jnp.where(has, f_safe, F),
                                    num_segments=F + 1)[:-1]
    return grad_face


def backward_pixel_map_single(face, face_index, rgb_map, alpha_map,
                              grad_rgb, grad_alpha, is_, eps,
                              return_rgb, return_alpha, face_chunk=None):
    """NMR edge gradients, vectorized plane sweep (rasterize.py:342-660).

    For each (edge, axis) combination (6 static cases) the reference walks
    the edge along d0 and scans a d1 range; here every (face, d0, d1)
    triple is evaluated in one masked [Fc, is, is] computation, chunked
    over faces, with identical arithmetic.
    """
    F = face.shape[0]
    P = is_ * is_
    if face_chunk is None:
        # the 6 unrolled (edge, axis) cases keep ~20 [Fc, is, is] f32
        # buffers live; bound Fc*is² to ~4M elements (device OOMs under
        # lax.scan double-buffering otherwise at 1024²)
        face_chunk = max(1, min(16, (1 << 22) // P))
    front = _face_frontside_n3mr(face)

    alpha_flat = alpha_map.reshape(-1) if return_alpha else None
    ga_flat = grad_alpha.reshape(-1) if return_alpha else None
    rgb_flat = rgb_map.reshape(-1, 3) if return_rgb else None
    gr_flat = grad_rgb.reshape(-1, 3) if return_rgb else None
    fi_flat = face_index.reshape(-1)

    pp_all = _pixel_space(face.reshape(F, 3, 3)[:, :, :2], is_)  # [F,3,2]

    d0v = jnp.arange(is_, dtype=jnp.float32)                 # [is]
    d1v = jnp.arange(is_, dtype=jnp.float32)                 # [is]

    n_chunks = (F + face_chunk - 1) // face_chunk
    Fp = n_chunks * face_chunk
    pads = ((0, Fp - F), (0, 0), (0, 0))
    pp_pad = jnp.pad(pp_all, pads)
    front_pad = jnp.pad(front, (0, Fp - F))
    fid_pad = jnp.arange(Fp, dtype=jnp.int32)

    def grads_for_chunk(args):
        pp, frontc, fids = args                              # [Fc,3,2],[Fc],[Fc]
        Fc = pp.shape[0]
        grad = jnp.zeros((Fc, 3, 3))

        for edge_num in range(3):
            pi = [(edge_num + n) % 3 for n in range(3)]
            for axis in range(2):
                # scan coords: s[num] = pp[pi[num]][(dim+axis)%2]
                p00 = pp[:, pi[0], axis % 2]
                p01 = pp[:, pi[0], (1 + axis) % 2]
                p10 = pp[:, pi[1], axis % 2]
                p11 = pp[:, pi[1], (1 + axis) % 2]
                p20 = pp[:, pi[2], axis % 2]
                p21 = pp[:, pi[2], (1 + axis) % 2]
                direction = jnp.where(p00 < p10, -1, 1) * (1 if axis == 0 else -1)

                d0_from = jnp.maximum(jnp.ceil(jnp.minimum(p00, p10)), 0.0)
                d0_to = jnp.minimum(jnp.maximum(p00, p10), is_ - 1.0)
                d0_ok = (d0v[None, :] >= d0_from[:, None]) & \
                        (d0v[None, :] <= d0_to[:, None]) & frontc[:, None]

                slope = (p11 - p01) / (p10 - p00)
                d1_cross = slope[:, None] * (d0v[None, :] - p00[:, None]) + p01[:, None]
                d1_in = jnp.where(direction[:, None] > 0, jnp.floor(d1_cross),
                                  jnp.ceil(d1_cross)).astype(jnp.int32)
                d1_out = d1_in + direction[:, None].astype(jnp.int32)
                bd_ok = d0_ok & (d1_in >= 0) & (d1_in < is_) & \
                    (d1_out >= 0) & (d1_out < is_)

                d0i = jnp.broadcast_to(d0v[None, :].astype(jnp.int32), d1_in.shape)
                if axis == 0:
                    idx_in = d1_in * is_ + d0i
                    idx_out = d1_out * is_ + d0i
                else:
                    idx_in = d0i * is_ + d1_in
                    idx_out = d0i * is_ + d1_out
                idx_in = jnp.clip(idx_in, 0, P - 1)
                idx_out = jnp.clip(idx_out, 0, P - 1)

                is_in_fn = bd_ok & (fi_flat[idx_in] == fids[:, None])

                # -- shared per-(face,d0,d1) pieces --------------------------
                ddiff = d1v[None, None, :] - d1_cross[:, :, None]   # [Fc,is,is]

                def dist_terms(diff_grad, active):
                    """Accumulate the two endpoint contributions."""
                    upd = jnp.zeros((Fc, 3, 3))
                    m = active & (diff_grad > 0)
                    base = (p10 - p00)[:, None, None] * ddiff * 2.0 / is_
                    # endpoint pi[0]: dist = base / (p1x - d0)
                    den1 = (p10[:, None] - d0v[None, :])[..., None]
                    ok1 = m & (jnp.abs(den1) > 0)
                    dist1 = base / jnp.where(ok1, den1, 1.0)
                    dist1 = jnp.where(dist1 > 0, dist1 + eps, dist1 - eps)
                    c1 = jnp.sum(jnp.where(ok1, diff_grad / dist1, 0.0), axis=(1, 2))
                    # endpoint pi[1]: dist = base / (d0 - p0x)
                    den2 = (d0v[None, :] - p00[:, None])[..., None]
                    ok2 = m & (jnp.abs(den2) > 0)
                    dist2 = base / jnp.where(ok2, den2, 1.0)
                    dist2 = jnp.where(dist2 > 0, dist2 + eps, dist2 - eps)
                    c2 = jnp.sum(jnp.where(ok2, diff_grad / dist2, 0.0), axis=(1, 2))
                    upd = upd.at[:, pi[0], 1 - axis].add(-c1)
                    upd = upd.at[:, pi[1], 1 - axis].add(-c2)
                    return upd

                def maps_at(d1_idx_int):
                    """Gather map values at (d0, d1) for this axis layout."""
                    if axis == 0:
                        lin = d1_idx_int[None, None, :] * is_ + \
                            d0i[:, :, None] * 0 + d0v[None, :, None].astype(jnp.int32)
                    else:
                        lin = d0v[None, :, None].astype(jnp.int32) * is_ + \
                            d1_idx_int[None, None, :]
                    return jnp.clip(lin, 0, P - 1)

                d1_ints = jnp.arange(is_, dtype=jnp.int32)
                lin_all = maps_at(d1_ints)                   # [1,is,is] or bc

                # -- OUT branch ---------------------------------------------
                d1_limit_out = jnp.where(direction > 0, is_ - 1, 0)[:, None]
                lo = jnp.maximum(jnp.minimum(d1_out, d1_limit_out), 0)
                hi = jnp.minimum(jnp.maximum(d1_out, d1_limit_out), is_ - 1)
                in_range_out = (d1_ints[None, None, :] >= lo[:, :, None]) & \
                    (d1_ints[None, None, :] <= hi[:, :, None]) & \
                    is_in_fn[:, :, None]

                diff_out = jnp.zeros((Fc, is_, is_))
                if return_alpha:
                    a_in = alpha_flat[idx_in]                # [Fc,is]
                    diff_out += (alpha_flat[lin_all] - a_in[:, :, None]) * \
                        ga_flat[lin_all]
                if return_rgb:
                    r_in = rgb_flat[idx_in]                  # [Fc,is,3]
                    diff_out += jnp.sum(
                        (rgb_flat[lin_all] - r_in[:, :, None, :]) * gr_flat[lin_all], -1)
                grad = grad + dist_terms(diff_out, in_range_out)

                # -- IN branch ----------------------------------------------
                between = (d0v[None, :] - p00[:, None]) * (d0v[None, :] - p20[:, None]) < 0
                slope_a = (p21 - p01) / (p20 - p00)
                cross_a = slope_a[:, None] * (d0v[None, :] - p00[:, None]) + p01[:, None]
                slope_b = (p11 - p21) / (p10 - p20)
                cross_b = slope_b[:, None] * (d0v[None, :] - p20[:, None]) + p21[:, None]
                d0_cross2 = jnp.where(between, cross_a, cross_b)
                d1_limit_in = jnp.where(direction[:, None] > 0,
                                        jnp.ceil(d0_cross2),
                                        jnp.floor(d0_cross2)).astype(jnp.int32)
                lo2 = jnp.maximum(jnp.minimum(d1_in, d1_limit_in), 0)
                hi2 = jnp.minimum(jnp.maximum(d1_in, d1_limit_in), is_ - 1)
                own = fi_flat[lin_all] == fids[:, None, None]
                in_range_in = (d1_ints[None, None, :] >= lo2[:, :, None]) & \
                    (d1_ints[None, None, :] <= hi2[:, :, None]) & \
                    bd_ok[:, :, None] & own

                diff_in = jnp.zeros((Fc, is_, is_))
                if return_alpha:
                    a_out = alpha_flat[idx_out]
                    diff_in += (alpha_flat[lin_all] - a_out[:, :, None]) * \
                        ga_flat[lin_all]
                if return_rgb:
                    r_out = rgb_flat[idx_out]
                    diff_in += jnp.sum(
                        (rgb_flat[lin_all] - r_out[:, :, None, :]) * gr_flat[lin_all], -1)
                grad = grad + dist_terms(diff_in, in_range_in)

        return grad

    pps = pp_pad.reshape(n_chunks, face_chunk, 3, 2)
    fronts = front_pad.reshape(n_chunks, face_chunk)
    fids = fid_pad.reshape(n_chunks, face_chunk)
    grads = jax.lax.map(grads_for_chunk, (pps, fronts, fids))
    grads = grads.reshape(Fp, 3, 3)[:F]
    # zero xy-only? reference writes all 9 but z column is never touched here
    return grads.reshape(F, 9)
