"""SoftRas Pallas TPU kernels (the hot path).

Design (SURVEY.md §7 mapping of the reference CUDA kernels):
  * XLA pre-pass: face preprocess (face_inv/sym/obt, frontside) as fused
    vectorized ops + deterministic face->tile binning (binning.py) that
    replaces the reference's shared-memory-bitmask coarse stage
    (soft_rasterize_coarse_to_fine.py:32-273).
  * Forward fine kernel: grid (B, TY, TX, face-chunks); each pixel tile
    [th, tw] lives in VMEM scratch accumulators while face chunks stream
    through; depth aggregation is the same associative online softmax the
    reference uses (soft_rasterize.py:399-419) so chunking is exact.
  * Backward fine kernel: same pairing, gradients reduced over the pixel
    tile per (tile, face-slot) and segment-summed in XLA — deterministic
    replacement for atomicAdd (soft_rasterize.py:1349-1358).  The Pallas
    backward is the *untruncated* gradient (the reference's legacy
    backward_soft_rasterize_naive:523 semantics) — no top-K cutoff.

All pairwise math operates on [FB, th, tw] component arrays (tw=128
lanes); texture colors are accumulated with a masked sweep over the
R^2 texel grid.
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import geometry as G
from .binning import (build_tile_lists, build_tile_lists_compact,
                      build_work_list, gather_tile_data, gather_work_ids,
                      report_overflow)
from .params import SoftRasParams

BIG_DEPTH = 10000000.0
SENTINEL = 1e9  # padded faces get this coordinate -> border check kills them

# default tiling (tuned for v5e VMEM; th*tw pixels per tile, FB faces/chunk)
TILE_H = 16
TILE_W = 128
FACE_BLOCK = 32
# 'pxt' (tile-block-aligned grouped lanes with kernel-resident per-tile
# combine — pxt_impl.py) is the fast default; 'pxg' (grouped lanes with
# the XLA segment combine) is its predecessor; 'px_f' (pixels on
# sublanes, one tile's faces across all lanes) is kept for pixel-band
# sharding; 'f_px' is the legacy wide-tile layout
LAYOUT = os.environ.get('JR_LAYOUT', 'pxt')


def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ('tpu', 'axon')
    except Exception:
        return False


def _safe_div(a, b, eps=1e-30):
    b_safe = jnp.where(jnp.abs(b) < eps, jnp.where(b < 0, -eps, eps), b)
    return a / b_safe


def _sel3(sel, a0, a1, a2):
    """Select among 3 arrays by int index array sel (0/1/2)."""
    return jnp.where(sel == 0, a0, jnp.where(sel == 1, a1, a2))


ABLATE = os.environ.get('JR_ABLATE', '')


def _euclid_kernel(w, fx, fy, sym9, obt, xp, yp, with_t=True):
    """Component-wise euclidean_p2f_distance (soft_rasterize.py:57-147).

    Shares the three along-edge projection coordinates t0_k between the
    inside (unclamped argmin) and outside (clamped, corner-casework)
    branches; distances use dx = fx[k1] + t0*(fx[k]-fx[k1]) - (w . fx).

    Returns (sign, dis_x, dis_y, t) with t a 3-tuple of offsets (tau - w);
    t is None when with_t=False (forward pass — only gradients need it)."""
    inside = ((w[0] > 0) & (w[1] > 0) & (w[2] > 0) &
              (w[0] < 1) & (w[1] < 1) & (w[2] < 1))

    wfx = w[0] * fx[0] + w[1] * fx[1] + w[2] * fx[2]
    wfy = w[0] * fy[0] + w[1] * fy[1] + w[2] * fy[2]

    # along-edge coordinate for each edge (k, k+1).  den is PER-FACE
    # (sym9 components are per-face), so divide once per face and
    # multiply per pair — VPU divides are ~10x a multiply.
    t0 = []
    for k in range(3):
        k1 = (k + 1) % 3
        a = [sym9[3 * k + j] - sym9[3 * k1 + j] for j in range(3)]
        num = w[0] * a[0] + w[1] * a[1] + w[2] * a[2] - a[k1]
        den = a[k] - a[k1]
        t0.append(num * _safe_div(1.0, den))

    # ---- inside: argmin over the 3 unclamped edge projections -------------
    dxs, dys, ds = [], [], []
    for k in range(3):
        k1 = (k + 1) % 3
        dx = fx[k1] + t0[k] * (fx[k] - fx[k1]) - wfx
        dy = fy[k1] + t0[k] * (fy[k] - fy[k1]) - wfy
        dxs.append(dx)
        dys.append(dy)
        ds.append(dx * dx + dy * dy)
    kmin = jnp.where(ds[1] < ds[0],
                     jnp.where(ds[2] < ds[1], 2, 1),
                     jnp.where(ds[2] < ds[0], 2, 0))

    if ABLATE == 'euclid_min':
        # TIMING ABLATION: skip casework/selection; wrong results
        sgn = jnp.where(inside, 1.0, -1.0)
        tt = (t0[0], t0[1], t0[2]) if with_t else None
        return sgn, dxs[0], dys[0], tt

    # ---- outside: corner-region casework for edge choice ------------------
    w0n, w1n, w2n = (w[0] <= 0), (w[1] <= 0), (w[2] <= 0)

    def corner_shift(base, other):
        return ((xp - fx[base]) * (fx[other] - fx[base]) +
                (yp - fy[base]) * (fy[other] - fy[base])) > 0

    c1 = w1n & w2n
    c2 = w2n & w0n & ~c1
    c3 = w0n & w1n & ~c1 & ~c2
    rest = ~(c1 | c2 | c3)
    e1 = rest & w0n
    e2 = rest & ~w0n & w1n
    e3 = rest & ~w0n & ~w1n & w2n

    v0_sel = jnp.zeros_like(w[0], jnp.int32)
    v0_sel = jnp.where(c1, jnp.where((obt[0] == 1) & corner_shift(0, 2), 2, 0), v0_sel)
    v0_sel = jnp.where(c2, jnp.where((obt[1] == 1) & corner_shift(1, 0), 0, 1), v0_sel)
    v0_sel = jnp.where(c3, jnp.where((obt[2] == 1) & corner_shift(2, 1), 1, 2), v0_sel)
    v0_sel = jnp.where(e1, 1, v0_sel)
    v0_sel = jnp.where(e2, 2, v0_sel)
    v0_sel = jnp.where(e3, 0, v0_sel)

    # ---- unify: one selected edge per pair --------------------------------
    ksel = jnp.where(inside, kmin, v0_sel)
    t0s = _sel3(ksel, t0[0], t0[1], t0[2])
    # clamp order matches the CUDA code: tau0 = clip(t0), tau1 = clip(1 - t0)
    tau0 = jnp.where(inside, t0s, jnp.clip(t0s, 0.0, 1.0))
    tau1 = jnp.where(inside, 1.0 - t0s, jnp.clip(1.0 - t0s, 0.0, 1.0))

    fxk = _sel3(ksel, fx[0], fx[1], fx[2])
    fxk1 = _sel3(ksel, fx[1], fx[2], fx[0])
    fyk = _sel3(ksel, fy[0], fy[1], fy[2])
    fyk1 = _sel3(ksel, fy[1], fy[2], fy[0])
    dis_x = tau0 * fxk + tau1 * fxk1 - wfx
    dis_y = tau0 * fyk + tau1 * fyk1 - wfy

    # offsets t = tau - w with tau's nonzeros at components ksel, ksel+1
    t = None
    if with_t:
        t = tuple(jnp.where(ksel == c, tau0,
                            jnp.where(ksel == (c + 2) % 3, tau1, 0.0)) - w[c]
                  for c in range(3))

    sign = jnp.where(inside, 1.0, -1.0)
    return sign, dis_x, dis_y, t


def _pair_terms_kernel(face, inv, sym, obt, xp, yp, p: SoftRasParams,
                       layout='f_px', for_grad=True, need_inside=True):
    """Forward per-pair quantities; face/inv/sym/obt: [FB, C] blocks.

    layout 'f_px': pair arrays [FB, th, tw] (faces on sublanes, pixel
    columns on lanes); layout 'px_f': pair arrays [ph, pw, FB] (pixels on
    sublanes, FACES on lanes -- the lane-efficient layout for small
    faces, since a face's bbox rarely spans a 128-pixel-wide tile).

    for_grad=False skips the edge-offset tuple ``t`` (only the backward
    distance chains read it); need_inside=False skips the non-strict
    inside test (only the hard-rgb winner path reads it).  Each saves
    ~10-15 full [pair] VPU passes in the instruction-bound kernel."""
    if layout == 'f_px':
        # face/inv/sym/obt: [FB, C]; pair arrays [FB, th, tw]
        def comp(a, i):
            return a[:, i][:, None, None]
        xpb = xp[None, :, :]
        ypb = yp[None, :, :]
    elif layout == 'pxg':
        # grouped-lane layout: xp/yp arrive pre-flattened [T2, FB] with
        # PER-LANE pixel coordinates (each lane group renders its own
        # tile); face data [C, FB] rows broadcast against them directly
        def comp(a, i):
            return a[i:i + 1, :]
        xpb = xp
        ypb = yp
    else:
        # face/inv/sym/obt pre-transposed to [C, FB]; pair arrays
        # [ph, pw, FB] -- row slices stay 2-D (Mosaic: no 1-D vectors)
        def comp(a, i):
            return a[i:i + 1, :][None]
        xpb = xp[..., None]
        ypb = yp[..., None]

    fx = (comp(face, 0), comp(face, 3), comp(face, 6))
    fy = (comp(face, 1), comp(face, 4), comp(face, 7))
    fz = (comp(face, 2), comp(face, 5), comp(face, 8))

    w = tuple(comp(inv, 3 * k + 0) * xpb + comp(inv, 3 * k + 1) * ypb +
              comp(inv, 3 * k + 2) for k in range(3))

    thr = p.threshold
    sq = math.sqrt(thr)
    xmax = jnp.maximum(jnp.maximum(fx[0], fx[1]), fx[2])
    xmin = jnp.minimum(jnp.minimum(fx[0], fx[1]), fx[2])
    ymax = jnp.maximum(jnp.maximum(fy[0], fy[1]), fy[2])
    ymin = jnp.minimum(jnp.minimum(fy[0], fy[1]), fy[2])
    not_border = ~((xpb > xmax + sq) | (xpb < xmin - sq) |
                   (ypb > ymax + sq) | (ypb < ymin - sq))

    sign = dis_x = dis_y = None
    t = None
    if p.dist_func_id == 0:
        inside = ((w[0] >= 0) & (w[0] <= 1) & (w[1] >= 0) & (w[1] <= 1) &
                  (w[2] >= 0) & (w[2] <= 1))
        sf = inside.astype(jnp.float32)
        dist_valid = inside
    elif p.dist_func_id == 1:
        mn = jnp.minimum(jnp.minimum(w[0], w[1]), w[2])
        dis = jnp.where(mn > 0, mn * mn, -(mn * mn))
        dist_valid = ~(-dis >= thr)
        sf = jax.nn.sigmoid(dis / p.sigma_val)
        t = w
    else:
        sym9 = [comp(sym, j) for j in range(9)]
        obt3 = [comp(obt, j) for j in range(3)]
        sign, dis_x, dis_y, t = _euclid_kernel(w, fx, fy, sym9, obt3,
                                               xpb, ypb, with_t=for_grad)
        dis = dis_x * dis_x + dis_y * dis_y
        dist_valid = ~((sign < 0) & (dis >= thr))
        sf = jax.nn.sigmoid(sign * dis / p.sigma_val)

    alpha_valid = not_border & dist_valid

    wc = [jnp.clip(w[k], 0.0, 1.0) for k in range(3)]
    wsum = jnp.maximum(wc[0] + wc[1] + wc[2], 1e-5)
    # wc feeds the DISCONTINUOUS texel selector: keep exact division so
    # rounding matches the oracle/reference bit-for-bit
    wc = [c / wsum for c in wc]
    # reciprocal z per FACE (FB divides) instead of per pair (FB*th*tw);
    # zp only feeds continuous paths (softmax weights), ulp shifts are fine
    invz = tuple(1.0 / z for z in fz)
    zp = 1.0 / (wc[0] * invz[0] + wc[1] * invz[1] + wc[2] * invz[2])
    z_valid = (zp >= p.near) & (zp <= p.far)
    tk_valid = alpha_valid & z_valid

    inside_w = None
    if need_inside:
        inside_w = ((w[0] >= 0) & (w[0] <= 1) & (w[1] >= 0) & (w[1] <= 1) &
                    (w[2] >= 0) & (w[2] <= 1))

    return dict(w=w, wc=wc, sf=sf, zp=zp, alpha_valid=alpha_valid,
                not_border=not_border,
                tk_valid=tk_valid, inside=inside_w, sign=sign,
                dis_x=dis_x, dis_y=dis_y, t=t, fz=fz, invz=invz)


def _surface_tex_idx(wc, R: int):
    w_x = jnp.minimum(wc[0] * R, float(R - 1)).astype(jnp.int32)
    w_y = jnp.minimum(wc[1] * R, float(R - 1)).astype(jnp.int32)
    low = (wc[0] + wc[1]) * R - w_x.astype(jnp.float32) - w_y.astype(jnp.float32) <= 1
    return jnp.where(low, w_y * R + w_x, (R - 1 - w_y) * R + (R - 1 - w_x))


def _pair_colors(tex, terms, p: SoftRasParams, T: int, perspective=True,
                 layout='f_px'):
    """Per-pair rgb colors (3-tuple of pair arrays).  tex: [FB, T*3]."""
    if layout == 'f_px':
        def bt(a, i):
            return a[:, i][:, None, None]
    elif layout == 'pxg':
        def bt(a, i):
            return a[i:i + 1, :]
    else:
        def bt(a, i):
            return a[i:i + 1, :][None]
    wc = terms['wc']
    if p.texture_type_id == 0:
        R = int(math.sqrt(T))
        idx = _surface_tex_idx(wc, R)
        cols = []
        for k in range(3):
            acc = jnp.zeros_like(wc[0])
            for ti in range(T):
                sel = (idx == ti).astype(jnp.float32)
                acc = acc + sel * bt(tex, ti * 3 + k)
            cols.append(acc)
        return tuple(cols)
    # vertex colors: tex [FB, 9] (f_px) / [9, FB] (px_f) per-corner rgb
    invz = terms['invz']
    zp = terms['zp']
    cols = []
    for k in range(3):
        if perspective:
            c = (wc[0] * invz[0] * bt(tex, k) +
                 wc[1] * invz[1] * bt(tex, 3 + k) +
                 wc[2] * invz[2] * bt(tex, 6 + k)) * zp
        else:
            c = (wc[0] * bt(tex, k) +
                 wc[1] * bt(tex, 3 + k) +
                 wc[2] * bt(tex, 6 + k))
        cols.append(c)
    return tuple(cols)


def _make_fwd_kernel(p: SoftRasParams, T: int, F_total: int, th: int, tw: int):
    is_ = p.image_size
    bg = p.background_color

    def kernel(b_s, ty_s, tx_s, first_s, last_s, act_s,
               ids_ref, face_ref, inv_ref, sym_ref, obt_ref, front_ref, tex_ref,
               out_ref, aggrs_ref,
               acc_num, acc_sum, acc_max, acc_alpha, acc_dmin, acc_did):
        i = pl.program_id(0)
        ty = ty_s[i]
        tx = tx_s[i]

        @pl.when(first_s[i] == 1)
        def _init():
            acc_max[:] = jnp.full((th, tw), p.eps, jnp.float32)
            acc_sum[:] = jnp.ones((th, tw), jnp.float32)
            for k in range(3):
                acc_num[k] = jnp.full((th, tw), bg[k], jnp.float32)
            if p.alpha_func_id == 2:
                acc_alpha[:] = jnp.ones((th, tw), jnp.float32)
            else:
                acc_alpha[:] = jnp.zeros((th, tw), jnp.float32)
            acc_dmin[:] = jnp.full((th, tw), BIG_DEPTH, jnp.float32)
            acc_did[:] = jnp.full((th, tw), -1, jnp.int32)

        # skip all pair math on padding items (they carry no real faces)
        @pl.when(act_s[i] == 1)
        def _merge():
            rows = (ty * th + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)).astype(jnp.float32)
            cols = (tx * tw + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)).astype(jnp.float32)
            xp = (2.0 * cols + 1.0 - is_) / is_
            yp = (is_ - 1.0 - 2.0 * rows) / is_

            face = face_ref[0]
            inv = inv_ref[0]
            sym = sym_ref[0]
            obt = obt_ref[0]
            front = front_ref[0]                # [FB,1] f32 (1=frontside)
            tex = tex_ref[0]
            ids = ids_ref[0]                    # [FB,1] int32

            terms = _pair_terms_kernel(face, inv, sym, obt, xp, yp, p)
            sf = terms['sf']
            zp = terms['zp']
            alpha_valid = terms['alpha_valid']
            tk_valid = terms['tk_valid']

            # ---- alpha merge ---------------------------------------------------
            sf_a = jnp.where(alpha_valid, sf, 0.0)
            if p.alpha_func_id == 0:
                acc_alpha[:] = jnp.maximum(
                    acc_alpha[:], jnp.max((alpha_valid & (sf > 0.5)).astype(jnp.float32), 0))
            elif p.alpha_func_id == 1:
                acc_alpha[:] = acc_alpha[:] + jnp.sum(sf_a, axis=0)
            else:
                # prod(1-sf) via pairwise tree multiply (Mosaic has no
                # reduce_prod; log1p/exp would cost a transcendental/pair)
                x = 1.0 - sf_a
                while x.shape[0] > 1:
                    h = x.shape[0] // 2
                    x = x[:h] * x[h:]
                acc_alpha[:] = acc_alpha[:] * x[0]

            side_ok = front[:, 0][:, None, None] > 0.5 if not p.fill_back else None

            if p.rgb_func_id == 1:
                rgb_valid = tk_valid if p.fill_back else (tk_valid & side_ok)
                zpn = (p.far - zp) / (p.far - p.near)
                zpn_m = jnp.where(rgb_valid, zpn, -jnp.inf)
                M_blk = jnp.max(zpn_m, axis=0)
                M_new = jnp.maximum(acc_max[:], M_blk)
                rescale = jnp.exp((acc_max[:] - M_new) / p.gamma_val)
                expz = jnp.where(rgb_valid,
                                 jnp.exp((zpn - M_new[None]) / p.gamma_val) * sf, 0.0)
                acc_sum[:] = acc_sum[:] * rescale + jnp.sum(expz, axis=0)
                colors = _pair_colors(tex, terms, p, T, perspective=True)
                for k in range(3):
                    acc_num[k] = acc_num[k] * rescale + jnp.sum(expz * colors[k], axis=0)
                acc_max[:] = M_new
            elif p.rgb_func_id == 0:
                hard_valid = tk_valid & terms['inside'] if p.fill_back else (
                    tk_valid & terms['inside'] & side_ok)
                zkey = jnp.where(hard_valid, zp, BIG_DEPTH)
                blk_min = jnp.min(zkey, axis=0)                       # [th,tw]
                blk_arg = jnp.argmin(zkey, axis=0)                    # first-min wins
                onehot = (jax.lax.broadcasted_iota(jnp.int32, zkey.shape, 0) ==
                          blk_arg[None]).astype(jnp.float32)
                colors = _pair_colors(tex, terms, p, T, perspective=True)
                id_sel = jnp.sum(onehot * ids[:, 0][:, None, None].astype(jnp.float32), 0)
                upd = blk_min < acc_dmin[:]
                for k in range(3):
                    c_sel = jnp.sum(onehot * colors[k], axis=0)
                    acc_num[k] = jnp.where(upd, c_sel, acc_num[k])
                acc_did[:] = jnp.where(upd, id_sel.astype(jnp.int32), acc_did[:])
                acc_dmin[:] = jnp.where(upd, blk_min, acc_dmin[:])

        # ---- finalize ------------------------------------------------------
        @pl.when(last_s[i] == 1)
        def _fin():
            if p.alpha_func_id == 0:
                alpha = acc_alpha[:]
            elif p.alpha_func_id == 1:
                alpha = acc_alpha[:] / F_total
            else:
                alpha = 1.0 - acc_alpha[:]
            if p.rgb_func_id == 1:
                # acc_sum already carries the background term: it was
                # initialized to 1 = exp((eps - eps)/gamma) and rescaled
                # with every max update, matching soft_rasterize.py:294.
                ssum = acc_sum[:]
                for k in range(3):
                    out_ref[0, k] = acc_num[k] / ssum
                aggrs_ref[0, 0] = ssum
                aggrs_ref[0, 1] = acc_max[:]
            elif p.rgb_func_id == 0:
                for k in range(3):
                    out_ref[0, k] = acc_num[k]
                aggrs_ref[0, 0] = acc_dmin[:]
                aggrs_ref[0, 1] = acc_did[:].astype(jnp.float32)
            else:
                for k in range(3):
                    out_ref[0, k] = jnp.full((th, tw), bg[k], jnp.float32)
                aggrs_ref[0, 0] = jnp.zeros((th, tw), jnp.float32)
                aggrs_ref[0, 1] = jnp.zeros((th, tw), jnp.float32)
            out_ref[0, 3] = alpha

    return kernel


def _make_bwd_kernel(p: SoftRasParams, T: int, F_total: int, th: int, tw: int):
    """Backward fine kernel: one grid step = one (tile, face-chunk) work item.

    Emits per-slot gradients [FB, 9 + T*3]; XLA segment-sums them into
    [B,F,...] afterwards (deterministic atomicAdd replacement).
    Math mirrors backward_soft_rasterize_cuda_kernel (:1177-1360) without
    the top-K truncation (legacy naive-backward semantics)."""
    is_ = p.image_size

    def kernel(b_s, ty_s, tx_s, first_s, last_s, act_s,
               ids_ref, face_ref, inv_ref, sym_ref, obt_ref, front_ref, tex_ref,
               sc_ref, ag_ref, go_ref,
               gface_ref, gtex_ref):
        i = pl.program_id(0)
        ty = ty_s[i]
        tx = tx_s[i]

        # padding items: their gradient rows are segment-dropped downstream,
        # so skip all pair math (they are ~2/3 of the static work bound)
        @pl.when(act_s[i] == 1)
        def _body():
            _bwd_body(p, T, F_total, th, tw, i, ty, tx,
                      ids_ref, face_ref, inv_ref, sym_ref, obt_ref, tex_ref,
                      sc_ref, ag_ref, go_ref, gface_ref, gtex_ref)

    return kernel


def _bwd_body(p, T, F_total, th, tw, i, ty, tx,
              ids_ref, face_ref, inv_ref, sym_ref, obt_ref, tex_ref,
              sc_ref, ag_ref, go_ref, gface_ref, gtex_ref):
        is_ = p.image_size
        rows = (ty * th + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)).astype(jnp.float32)
        cols = (tx * tw + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)).astype(jnp.float32)
        xp = (2.0 * cols + 1.0 - is_) / is_
        yp = (is_ - 1.0 - 2.0 * rows) / is_

        face = face_ref[0]
        inv = inv_ref[0]
        sym = sym_ref[0]
        obt = obt_ref[0]
        tex = tex_ref[0]
        ids = ids_ref[0]                    # [FB,1] int32

        terms = _pair_terms_kernel(face, inv, sym, obt, xp, yp, p)
        sf_fwd = terms['sf']
        zp = terms['zp']
        wc = terms['wc']
        w = terms['w']
        fz = terms['fz']

        # backward uses sf=1 for hard dist (:1259)
        sf = jnp.ones_like(sf_fwd) if p.dist_func_id == 0 else sf_fwd

        # pair validity: mirrors the pairs that enter the forward's face-id
        # buffer (border + dist-threshold + z-range, soft_rasterize.py:316-369)
        valid = (ids[:, 0] >= 0)[:, None, None] & terms['tk_valid']
        vf = valid.astype(jnp.float32)

        g_rgb = [go_ref[0, k] for k in range(3)]         # [th,tw]
        g_alpha = go_ref[0, 3]
        out_rgb = [sc_ref[0, k] for k in range(3)]
        out_alpha = sc_ref[0, 3]

        # ---- alpha channel chain (:1281-1291) -----------------------------
        if p.alpha_func_id == 0:
            C_grad_xy = jnp.zeros_like(sf)
        elif p.alpha_func_id == 1:
            C_grad_xy = jnp.broadcast_to(g_alpha[None] / F_total, sf.shape)
        else:
            C_grad_xy = g_alpha[None] * (1.0 - out_alpha[None]) / \
                jnp.maximum(1.0 - sf, 1e-6)

        gz = [jnp.zeros_like(sf) for _ in range(3)]
        tex_grads = None
        if p.rgb_func_id == 1:
            softmax_sum = ag_ref[0, 0][None]
            softmax_max = ag_ref[0, 1][None]
            zpn = (p.far - zp) / (p.far - p.near)
            # mask INSIDE the exponent: invalid pairs can have zpn >> M
            # (e.g. near-empty pixels where M == eps) and exp would overflow
            # to inf before the validity mask could zero it (inf*0 = NaN)
            e_arg = jnp.where(valid, (zpn - softmax_max) / p.gamma_val, -1e30)
            zp_softmax = sf * jnp.exp(e_arg) / softmax_sum

            colors = _pair_colors(tex, terms, p, T, perspective=False)
            C_grad_xyz = (g_rgb[0][None] * (colors[0] - out_rgb[0][None]) +
                          g_rgb[1][None] * (colors[1] - out_rgb[1][None]) +
                          g_rgb[2][None] * (colors[2] - out_rgb[2][None])) * zp_softmax
            C_grad_xy = C_grad_xy + C_grad_xyz / jnp.maximum(sf, 1e-30)

            C_grad_z = C_grad_xyz / p.gamma_val / (p.near - p.far) * zp * zp
            invz = terms['invz']
            for k in range(3):
                gz[k] = C_grad_z * wc[k] * (invz[k] * invz[k])

            tex_coef = zp_softmax                                  # [FB,th,tw]
        elif p.rgb_func_id == 0:
            fidx_min = ag_ref[0, 1][None]                          # float ids
            is_win = vf * (jnp.abs(ids[:, 0][:, None, None].astype(jnp.float32) -
                                   fidx_min) < 0.5)
            tex_coef = is_win
        else:
            tex_coef = jnp.zeros_like(sf)

        def red(x):
            # [FB, th, tw] -> [FB, 1] staying 2-D for Mosaic layout inference
            return jnp.sum(jnp.sum(x, axis=2), axis=1, keepdims=True)

        # ---- texture gradients -------------------------------------------
        if p.texture_type_id == 0:
            R = int(math.sqrt(T))
            idx = _surface_tex_idx(wc, R)
            gk = [tex_coef * g_rgb[k][None] for k in range(3)]
            for ti in range(T):
                sel = (idx == ti).astype(jnp.float32)
                for k in range(3):
                    gtex_ref[0, :, ti * 3 + k:ti * 3 + k + 1] = red(sel * gk[k])
        else:
            for ci in range(3):
                coef = tex_coef * wc[ci]
                for k in range(3):
                    gtex_ref[0, :, ci * 3 + k:ci * 3 + k + 1] = red(coef * g_rgb[k][None])

        # ---- sigmoid/distance chain to vertex positions -------------------
        C_grad_xy = C_grad_xy * sf * (1.0 - sf) / p.sigma_val
        C_grad_xy = C_grad_xy * vf

        gx = [jnp.zeros_like(sf) for _ in range(3)]
        gy = [jnp.zeros_like(sf) for _ in range(3)]
        if p.dist_func_id == 1:
            t = terms['t']  # == w
            pmin = jnp.where(t[0] > t[1],
                             jnp.where(t[1] > t[2], 2, 1),
                             jnp.where(t[0] > t[2], 2, 0))
            mn = jnp.minimum(jnp.minimum(w[0], w[1]), w[2])
            dis_abs = mn * mn
            scale = 2.0 * jnp.sqrt(dis_abs)
            C = C_grad_xy * scale
            for l in range(2):
                inv_p = jnp.where(pmin == 0, inv[:, 0 + l][:, None, None],
                                  jnp.where(pmin == 1, inv[:, 3 + l][:, None, None],
                                            inv[:, 6 + l][:, None, None]))
                for k in range(3):
                    gv = -inv_p * w[k] * C
                    if l == 0:
                        gx[k] = gv
                    else:
                        gy[k] = gv
        elif p.dist_func_id == 2:
            sign = terms['sign']
            # mask at the source: sentinel faces can carry inf through the
            # safe-div chain and 0*inf would poison the reduction with NaN
            dis_x = jnp.where(valid, terms['dis_x'], 0.0)
            dis_y = jnp.where(valid, terms['dis_y'], 0.0)
            t = terms['t']
            C2 = 2.0 * sign * C_grad_xy
            for k in range(3):
                tau = jnp.where(valid, t[k] + w[k], 0.0)
                gx[k] = C2 * tau * dis_x
                gy[k] = C2 * tau * dis_y
        # hard dist: sf==1 -> sigmoid grad 0 -> gx/gy stay 0

        for k in range(3):
            gface_ref[0, :, 3 * k:3 * k + 1] = red(gx[k])
            gface_ref[0, :, 3 * k + 1:3 * k + 2] = red(gy[k])
            gface_ref[0, :, 3 * k + 2:3 * k + 3] = red(jnp.where(valid, gz[k], 0.0))


@functools.partial(jax.jit, static_argnums=(6,))
def soft_rasterize_bwd_pallas(face_vertices, textures, soft_colors, aggrs_info,
                              tile_ids, grad_soft_colors, p: SoftRasParams):
    """Backward pass; returns (grad_face_vertices, grad_textures)."""
    B, F = face_vertices.shape[:2]
    th, tw = TILE_H, min(TILE_W, p.image_size)
    is_ = p.image_size
    cap = _tile_cap(F)
    TY, TX = is_ // th, is_ // tw
    w_cap = _work_cap(F, TY * TX, B)

    (ids, g_face, g_inv, g_sym, g_obt, g_front, g_tex,
     out_b, out_ty, out_tx, first, last, active, lists, T) = _prep_work_data(
        face_vertices, textures, p, cap, th, tw, w_cap)

    FB = FACE_BLOCK
    kernel = _make_bwd_kernel(p, T, F, th, tw)

    def in_spec(c):
        return pl.BlockSpec((1, FB, c),
                            lambda i, b_s, ty_s, tx_s, fi_s, la_s, ac_s: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def px_spec(c):
        return pl.BlockSpec((1, c, th, tw),
                            lambda i, b_s, ty_s, tx_s, fi_s, la_s, ac_s: (b_s[i], 0, ty_s[i], tx_s[i]),
                            memory_space=pltpu.VMEM)

    out_specs = [
        pl.BlockSpec((1, FB, 9), lambda i, b_s, ty_s, tx_s, fi_s, la_s, ac_s: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, FB, T * 3), lambda i, b_s, ty_s, tx_s, fi_s, la_s, ac_s: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((w_cap, FB, 9), jnp.float32),
        jax.ShapeDtypeStruct((w_cap, FB, T * 3), jnp.float32),
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(w_cap,),
        in_specs=[in_spec(1), in_spec(9), in_spec(9), in_spec(9), in_spec(3),
                  in_spec(1), in_spec(g_tex.shape[-1]),
                  px_spec(4), px_spec(2), px_spec(4)],
        out_specs=out_specs,
        scratch_shapes=[],
    )

    gface_slots, gtex_slots = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
        interpret=not _is_tpu(),
    )(out_b, out_ty, out_tx, first, last, active, ids, g_face, g_inv, g_sym,
      g_obt, g_front, g_tex, soft_colors, aggrs_info, grad_soft_colors)

    # deterministic scatter: segment-sum slots into per-face gradients
    ids_w = ids[..., 0]                                          # [W, FB]
    NT = TY * TX
    # batch of each work item (recompute like _prep_work_data)
    seg_b = out_b[:, None]
    seg = jnp.where(ids_w >= 0, seg_b * F + ids_w, B * F)
    gf = jax.ops.segment_sum(gface_slots.reshape(-1, 9), seg.reshape(-1),
                             num_segments=B * F + 1)[:-1]
    gt = jax.ops.segment_sum(gtex_slots.reshape(-1, T * 3), seg.reshape(-1),
                             num_segments=B * F + 1)[:-1]
    return (gf.reshape(face_vertices.shape),
            gt.reshape(textures.shape))


def _tile_cap(F: int, default: int = 4096) -> int:
    cap = min(F, default)
    # round to a multiple of FACE_BLOCK
    return max(FACE_BLOCK, (cap + FACE_BLOCK - 1) // FACE_BLOCK * FACE_BLOCK)


def _work_cap(F: int, n_tiles: int, B: int) -> int:
    """Static bound on total work items (see binning.build_work_list).

    Every tile emits >= 1 item; busy tiles emit ceil(count/FB).  A face
    whose bbox spans t tiles contributes t list entries; small faces span
    1-4 tiles, so 8x average is a generous skew margin."""
    est = B * n_tiles + (8 * F * B) // FACE_BLOCK
    return max(64, est)


def _prep_work_data(face_vertices, textures, p: SoftRasParams, cap, th, tw, w_cap):
    """XLA pre-pass: preprocess faces, bin, build the work list, and gather
    per-work-item face data [W, FB, C]."""
    B, F = face_vertices.shape[:2]
    face = face_vertices.reshape(B, F, 9)
    T = textures.shape[2] if p.texture_type_id == 0 else 3
    tex = textures.reshape(B, F, T * 3)

    face_inv, face_sym, face_obt = G.face_info_preprocess(face)
    front = G.check_face_frontside(face).astype(jnp.float32)[..., None]

    is_ = p.image_size
    TY, TX = is_ // th, is_ // tw
    NT = TY * TX
    lists = build_tile_lists(face, is_, th, tw, cap, p.threshold)

    work = build_work_list(lists.counts, cap, FACE_BLOCK, w_cap)
    report_overflow(lists.counts, cap, work.num_items, w_cap,
                    where=f'softras f_px {is_}px')
    W = w_cap
    # padding items replay the last real tile (never write -> harmless)
    total = work.num_items
    last_real = jnp.maximum(total - 1, 0)
    in_range = jnp.arange(W, dtype=jnp.int32) < total
    tile = jnp.where(in_range, work.tile, work.tile[last_real])
    chunk = jnp.where(in_range, work.chunk, 0)
    first = jnp.where(in_range, work.first, 0)
    last = jnp.where(in_range, work.last, 0)

    # slice face-id chunks per work item: [W, FB]
    ids_flat = lists.ids.reshape(B * NT * cap)
    slot = tile[:, None] * cap + chunk[:, None] * FACE_BLOCK + \
        jnp.arange(FACE_BLOCK, dtype=jnp.int32)[None, :]
    ids_w = ids_flat[slot]                                        # [W, FB]
    # padding items must not contribute pairs (backward segment-sums every
    # work item's gradient block; a replayed chunk would double-count)
    ids_w = jnp.where(in_range[:, None], ids_w, -1)

    b_of = tile // NT
    fid_safe = jnp.maximum(ids_w, 0)
    gidx = b_of[:, None] * F + fid_safe                           # [W, FB]

    def g(a):
        return a.reshape((B * F,) + a.shape[2:])[gidx]

    g_face = jnp.where((ids_w < 0)[..., None], SENTINEL, g(face))
    g_inv, g_sym, g_obt, g_front, g_tex = g(face_inv), g(face_sym), g(face_obt), \
        g(front), g(tex)

    t_in_b = tile - b_of * NT
    out_b = b_of
    out_ty = t_in_b // TX
    out_tx = t_in_b - out_ty * TX
    active = in_range.astype(jnp.int32)

    return (ids_w[..., None].astype(jnp.int32), g_face, g_inv, g_sym, g_obt,
            g_front, g_tex, out_b, out_ty, out_tx, first, last, active, lists, T)


@functools.partial(jax.jit, static_argnums=(2,))
def soft_rasterize_fwd_pallas(face_vertices, textures, p: SoftRasParams):
    """Forward pass; returns (soft_colors [B,4,H,W], aggrs [B,2,H,W],
    tile_ids [B,NT,cap]) — tile_ids doubles as the backward's face lists."""
    B, F = face_vertices.shape[:2]
    th, tw = TILE_H, min(TILE_W, p.image_size)
    is_ = p.image_size
    assert is_ % th == 0 and is_ % tw == 0, 'image_size must tile evenly'
    cap = _tile_cap(F)
    TY, TX = is_ // th, is_ // tw
    w_cap = _work_cap(F, TY * TX, B)

    (ids, g_face, g_inv, g_sym, g_obt, g_front, g_tex,
     out_b, out_ty, out_tx, first, last, active, lists, T) = _prep_work_data(
        face_vertices, textures, p, cap, th, tw, w_cap)

    FB = FACE_BLOCK
    kernel = _make_fwd_kernel(p, T, F, th, tw)

    # index maps receive (i, *scalar_prefetch_refs)
    def in_spec(c):
        return pl.BlockSpec((1, FB, c),
                            lambda i, b_s, ty_s, tx_s, fi_s, la_s, ac_s: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    out_specs = [
        pl.BlockSpec((1, 4, th, tw),
                     lambda i, b_s, ty_s, tx_s, fi_s, la_s, ac_s: (b_s[i], 0, ty_s[i], tx_s[i]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, th, tw),
                     lambda i, b_s, ty_s, tx_s, fi_s, la_s, ac_s: (b_s[i], 0, ty_s[i], tx_s[i]),
                     memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((B, 4, is_, is_), jnp.float32),
        jax.ShapeDtypeStruct((B, 2, is_, is_), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((3, th, tw), jnp.float32),   # acc_num
        pltpu.VMEM((th, tw), jnp.float32),      # acc_sum
        pltpu.VMEM((th, tw), jnp.float32),      # acc_max
        pltpu.VMEM((th, tw), jnp.float32),      # acc_alpha
        pltpu.VMEM((th, tw), jnp.float32),      # acc_dmin
        pltpu.VMEM((th, tw), jnp.int32),        # acc_did
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(w_cap,),
        in_specs=[in_spec(1), in_spec(9), in_spec(9), in_spec(9), in_spec(3),
                  in_spec(1), in_spec(g_tex.shape[-1])],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )

    out, aggrs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
        interpret=not _is_tpu(),
    )(out_b, out_ty, out_tx, first, last, active, ids, g_face, g_inv, g_sym,
      g_obt, g_front, g_tex)

    return out, aggrs, lists.ids


# ===========================================================================
# 'px_f' layout: pixels on sublanes (small square tiles), FACES on lanes.
#
# With FB=128 faces across the 128 lanes and an 8x8-pixel tile, a face
# chunk only touches tiles its bboxes overlap -- for meshes of small
# faces this cuts the (face, pixel) pair count ~4x vs the [FB, th, 128]
# layout where a ~17px-wide bbox pays for a 128-pixel-wide tile.
# Uncovered tiles get no work items at all; their pixels are filled with
# background by an XLA select after the kernel.
# ===========================================================================

PF_TILE = int(os.environ.get('JR_PF_TILE', '32'))  # preferred pixel tile edge
PF_FB = 128          # faces per chunk == lane count

# MXU precision for the px_f contractions (experiment knob):
# parity tests pass at 'high' (bf16x3 ~ f32 accuracy); 'highest' is bf16x6.
_PRECISIONS = {'default': jax.lax.Precision.DEFAULT,
               'high': jax.lax.Precision.HIGH,
               'highest': jax.lax.Precision.HIGHEST}
PF_PRECISION = _PRECISIONS[os.environ.get('JR_PRECISION', 'highest')]


def _bin_mt_for(F: int) -> int:
    """Max (tile,face) pairs emitted per face for the compact binner.

    Large meshes are made of small faces: a face whose inflated bbox fits
    within one tile edge spans at most 2x2 tiles, so mt=4 quarters the
    sort length (the dominant binning cost).  Bigger faces spill to the
    glist (capped, reported via gdrop).  Small meshes get a GENEROUS span
    (their pair arrays are tiny either way): a non-empty glist costs one
    work chunk on every tile — ~NT extra chunks of kernel work — so for
    a 300-face mesh whose faces legitimately span ~20 tiles at 1024px,
    mt=32 keeps them in the cheap sorted-run path."""
    env = os.environ.get('JR_BIN_MT')
    if env:
        return int(env)
    from .binning import CL_MT
    if F > 8192:
        return 4
    if F <= 1024:
        return 2 * CL_MT
    return CL_MT


def _pf_tile_for(image_size: int) -> int:
    for t in (PF_TILE, 16, 8):
        if image_size % t == 0:
            return t
    return 0


def _thr_bisect_bounds(near: float, far: float):
    """Static int32 bisection range for positive-float depth values.

    Positive IEEE-754 floats compare like their bit patterns, so the
    K-th smallest zp in (near, far] is found by integer bisection on
    bitcast values — exact in ceil(log2(bits(far)-bits(near))) steps."""
    import struct
    lo = struct.unpack('<i', struct.pack('<f', float(near)))[0]
    hi = struct.unpack('<i', struct.pack('<f', float(far)))[0]
    iters = max(1, int(hi - lo).bit_length())
    return lo, hi, iters


# forward output channel layout ([B, NT, FWD_C, t*t] rows)
FWD_C = 8           # r, g, b, alpha, aggr0, aggr1, cnt, thr
THR_INT_MAX = 2 ** 31 - 1


def _make_fwd_kernel_pf(p: SoftRasParams, T: int, F_total: int,
                        with_thr: bool = False, n_ch: int = 16):
    """px_f forward kernel, flat pair layout.

    Pair arrays live as [t*t, FB] (free reshape of the blocked
    [ph, pw, FB] form); every sum-over-faces and sum-over-pixels rides
    the MXU as a dot_general instead of a 7-pass lane reduction, and the
    surface-texture sweep becomes T masked-weight matmuls against the
    per-face texel rows (the ones row of each matmul accumulates the
    softmax denominator for free, since the texel index partitions
    [0, T)).

    with_thr: additionally emits the reference top-K gradient threshold
    (soft_rasterize.py:369-385) — the K-th smallest candidate depth per
    pixel — by storing candidate depths per chunk in a VMEM slab and
    bisecting their bit patterns with MXU-counted ranks at the last
    chunk.  Depth ties at the threshold all pass (same as round-1's
    sorted-insert pass; the CUDA heap kept the first encountered)."""
    is_ = p.image_size
    bg = p.background_color
    ph = pw = _pf_tile_for(is_)
    T2 = ph * pw
    FB = PF_FB
    K = p.max_faces_id
    HIP = PF_PRECISION

    def dot11_cnt(a, b):
        # counting contraction: inputs are exactly-representable small
        # integers / 0-1 masks, so the single-pass bf16 MXU mode is EXACT
        # (bf16 holds integers <= 256; accumulation is f32)
        return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                   precision=jax.lax.Precision.DEFAULT,
                                   preferred_element_type=jnp.float32)

    def kernel(b_s, ty_s, tx_s, ch_s, first_s, last_s, act_s, lim_s, ty0_s,
               ids_ref, face_ref, inv_ref, sym_ref, obt_ref, front_ref,
               tex_ref, out_ref, *scratch):
        if with_thr:
            acc_blo, acc_bhi, slab = scratch[-3:]
            scratch = scratch[:-3]
        acc_ns, acc_max, acc_alpha, acc_cnt, acc_hard = scratch
        i = pl.program_id(0)
        ty = ty_s[i]
        tx = tx_s[i]

        @pl.when(first_s[i] == 1)
        def _init():
            # (concatenate, not .at[]: Pallas TPU cannot lower scatter)
            # acc_ns is PIXEL-major [T2, 4] (r,g,b,softmax-denominator):
            # color accumulation is pure-VPU lane reductions (exact f32;
            # round 2's per-texel MXU dots at HIGHEST cost ~10 ms/frame)
            acc_ns[:] = jnp.concatenate(
                [jnp.full((T2, 1), bg[0], jnp.float32),
                 jnp.full((T2, 1), bg[1], jnp.float32),
                 jnp.full((T2, 1), bg[2], jnp.float32),
                 jnp.ones((T2, 1), jnp.float32)], axis=1)
            acc_max[:] = jnp.full((T2, 1), p.eps, jnp.float32)
            if p.alpha_func_id == 2:
                acc_alpha[:] = jnp.ones((T2, 1), jnp.float32)
            else:
                acc_alpha[:] = jnp.zeros((T2, 1), jnp.float32)
            acc_cnt[:] = jnp.zeros((T2, 1), jnp.float32)
            acc_hard[:] = jnp.concatenate(
                [jnp.zeros((T2, 3), jnp.float32),
                 jnp.full((T2, 1), BIG_DEPTH, jnp.float32),
                 jnp.full((T2, 1), -1.0, jnp.float32),
                 jnp.zeros((T2, 3), jnp.float32)], axis=1)
            if with_thr:
                acc_blo[:] = jnp.full((T2, 1), THR_INT_MAX, jnp.int32)
                acc_bhi[:] = jnp.zeros((T2, 1), jnp.int32)

        @pl.when(act_s[i] == 1)
        def _merge():
            rows = (ty * ph + jax.lax.broadcasted_iota(jnp.int32, (ph, pw), 0)
                    ).astype(jnp.float32)
            cols = (tx * pw + jax.lax.broadcasted_iota(jnp.int32, (ph, pw), 1)
                    ).astype(jnp.float32)
            xp = (2.0 * cols + 1.0 - is_) / is_
            yp = (is_ - 1.0 - 2.0 * rows) / is_

            face = face_ref[0]
            inv = inv_ref[0]
            sym = sym_ref[0]
            obt = obt_ref[0]
            front = front_ref[0]                   # [1, FB]
            tex = tex_ref[0]                       # [T*3, FB]
            ids = ids_ref[0]                       # [1, FB]

            terms = _pair_terms_kernel(face, inv, sym, obt, xp, yp, p,
                                       layout='px_f', for_grad=False,
                                       need_inside=(p.rgb_func_id == 0))

            def fl(a):
                return a.reshape(T2, FB) if a is not None else None

            sf = fl(terms['sf'])                   # [T2, FB]
            zp = fl(terms['zp'])
            alpha_valid = fl(terms['alpha_valid'])
            tk_valid = fl(terms['tk_valid'])
            ids_row = ids[0:1, :]                  # [1, FB]
            ones_row = jnp.ones((1, FB), jnp.float32)

            # per-pixel candidate count (reference q_size)
            cand = tk_valid & (ids_row >= 0)
            acc_cnt[:] = acc_cnt[:] + jnp.sum(cand.astype(jnp.float32),
                                              axis=-1, keepdims=True)

            if with_thr:
                zk_int = jnp.where(
                    cand, jax.lax.bitcast_convert_type(zp, jnp.int32),
                    THR_INT_MAX)
                slab[ch_s[i]] = zk_int
                # track the per-pixel candidate bit range: the bisection
                # then starts from [min, max] bits instead of
                # [bits(near), bits(far)] — typically 1/3 fewer rounds
                acc_blo[:] = jnp.minimum(
                    acc_blo[:], jnp.min(zk_int, axis=-1, keepdims=True))
                acc_bhi[:] = jnp.maximum(
                    acc_bhi[:],
                    jnp.max(jnp.where(cand, zk_int, 0), axis=-1,
                            keepdims=True))

            sf_a = jnp.where(alpha_valid, sf, 0.0)
            if p.alpha_func_id == 0:
                acc_alpha[:] = jnp.maximum(
                    acc_alpha[:],
                    jnp.max((alpha_valid & (sf > 0.5)).astype(jnp.float32),
                            -1, keepdims=True))
            elif p.alpha_func_id == 1:
                acc_alpha[:] = acc_alpha[:] + jnp.sum(sf_a, axis=-1,
                                                      keepdims=True)
            else:
                x = 1.0 - sf_a
                while x.shape[-1] > 1:
                    h = x.shape[-1] // 2
                    x = x[..., :h] * x[..., h:]
                acc_alpha[:] = acc_alpha[:] * x

            side_ok = (front > 0.5) if not p.fill_back else None  # [1,FB]

            if p.rgb_func_id == 1:
                rgb_valid = tk_valid if p.fill_back else (tk_valid & side_ok)
                zpn = (p.far - zp) / (p.far - p.near)
                zpn_m = jnp.where(rgb_valid, zpn, -jnp.inf)
                M_blk = jnp.max(zpn_m, axis=-1, keepdims=True)     # [T2,1]
                M_new = jnp.maximum(acc_max[:], M_blk)
                rescale = jnp.exp((acc_max[:] - M_new) / p.gamma_val)
                expz = jnp.where(rgb_valid,
                                 jnp.exp((zpn - M_new) / p.gamma_val) * sf,
                                 0.0)
                # per-pair colors on the VPU (select-chain for surface
                # texels), then pure lane reductions — exact f32, no MXU
                colors = _pair_colors(tex, terms, p, T, perspective=True,
                                      layout='px_f')
                delta = jnp.concatenate(
                    [jnp.sum(expz * fl(colors[0]), -1, keepdims=True),
                     jnp.sum(expz * fl(colors[1]), -1, keepdims=True),
                     jnp.sum(expz * fl(colors[2]), -1, keepdims=True),
                     jnp.sum(expz, -1, keepdims=True)], axis=1)    # [T2,4]
                acc_ns[:] = acc_ns[:] * rescale + delta
                acc_max[:] = M_new
            elif p.rgb_func_id == 0:
                inside = fl(terms['inside'])
                hard_valid = tk_valid & inside if p.fill_back else (
                    tk_valid & inside & side_ok)
                zkey = jnp.where(hard_valid, zp, BIG_DEPTH)
                blk_min = jnp.min(zkey, axis=-1, keepdims=True)    # [T2,1]
                idsf = ids_row.astype(jnp.float32)                 # [1,FB]
                tied = (zkey == blk_min) & hard_valid
                id_sel = jnp.min(jnp.where(tied, idsf, jnp.float32(2 ** 30)),
                                 axis=-1, keepdims=True)
                onehot = (tied & (idsf == id_sel)).astype(jnp.float32)
                colors = _pair_colors(tex, terms, p, T, perspective=True,
                                      layout='px_f')
                upd = (blk_min < acc_hard[:, 3:4]) & (blk_min < BIG_DEPTH)
                hard = acc_hard[:]
                cols = []
                for k in range(3):
                    c_sel = jnp.sum(onehot * fl(colors[k]), -1, keepdims=True)
                    cols.append(jnp.where(upd, c_sel, hard[:, k:k + 1]))
                cols.append(jnp.where(upd, blk_min, hard[:, 3:4]))
                cols.append(jnp.where(upd, id_sel, hard[:, 4:5]))
                acc_hard[:] = jnp.concatenate(cols + [hard[:, 5:8]], axis=1)

        @pl.when(last_s[i] == 1)
        def _fin():
            # out block is [1, 1, T2, FWD_C]: pixels on sublanes, channels
            # on lanes — every accumulator writes as a column, transposes
            # happen once in XLA after the kernel (free in a fusion)
            if p.alpha_func_id == 0:
                alpha = acc_alpha[:]
            elif p.alpha_func_id == 1:
                alpha = acc_alpha[:] / F_total
            else:
                alpha = 1.0 - acc_alpha[:]
            if p.rgb_func_id == 1:
                accT = acc_ns[:]                                   # [T2,4]
                ssum = accT[:, 3:4]
                out_ref[0, 0, :, 0:3] = accT[:, 0:3] / ssum
                out_ref[0, 0, :, 4:5] = ssum
                out_ref[0, 0, :, 5:6] = acc_max[:]
            elif p.rgb_func_id == 0:
                out_ref[0, 0, :, 0:3] = acc_hard[:, 0:3]
                out_ref[0, 0, :, 4:5] = acc_hard[:, 3:4]
                out_ref[0, 0, :, 5:6] = acc_hard[:, 4:5]
            else:
                out_ref[0, 0, :, 0:3] = jnp.concatenate(
                    [jnp.full((T2, 1), bg[k], jnp.float32) for k in range(3)],
                    axis=1)
                out_ref[0, 0, :, 4:6] = jnp.zeros((T2, 2), jnp.float32)
            out_ref[0, 0, :, 3:4] = alpha
            out_ref[0, 0, :, 6:7] = acc_cnt[:]

            if with_thr:
                # exact K-th smallest candidate depth by integer
                # bisection with MXU-counted ranks over the per-pixel
                # [min, max] candidate-bit bounds; when a pixel has < K
                # candidates hi converges to its max candidate bits —
                # behaviorally equivalent (every candidate passes).
                # Tiles where NO pixel exceeds K candidates skip the whole
                # bisection: thr = far passes every valid face (z_valid
                # already enforces zp <= far).
                ones_row = jnp.ones((1, FB), jnp.float32)
                nch = ch_s[i] + 1
                kf = jnp.float32(K)
                need = jnp.max(acc_cnt[:]) > kf

                @pl.when(need)
                def _bisect():
                    def cond(lh):
                        lo, hi = lh
                        return jnp.any(lo < hi)

                    def outer(lh):
                        lo, hi = lh
                        mid = lo + ((hi - lo) >> 1)                # [T2,1]

                        def inner(c, acc):
                            m = (slab[c] <= mid).astype(jnp.float32)
                            return acc + dot11_cnt(m, ones_row)
                        cnt = jax.lax.fori_loop(
                            0, nch, inner, jnp.zeros((T2, 1), jnp.float32))
                        ge = cnt >= kf
                        return (jnp.where(ge, lo, mid + 1),
                                jnp.where(ge, mid, hi))

                    # invariant: count(<= lo-1) < K <= count(<= hi);
                    # the tracked [min, max] candidate bits satisfy it and
                    # start far narrower than [bits(near), bits(far)].
                    # min() guards lo <= hi on candidate-free pixels.
                    _, hi = jax.lax.while_loop(
                        cond, outer,
                        (jnp.minimum(acc_blo[:] - 1, acc_bhi[:]),
                         acc_bhi[:]))
                    thr = jax.lax.bitcast_convert_type(hi, jnp.float32)
                    out_ref[0, 0, :, 7:8] = thr

                @pl.when(jnp.logical_not(need))
                def _nothr():
                    out_ref[0, 0, :, 7:8] = jnp.full((T2, 1), p.far,
                                                     jnp.float32)
            else:
                out_ref[0, 0, :, 7:8] = jnp.zeros((T2, 1), jnp.float32)

    return kernel


def _make_bwd_kernel_pf(p: SoftRasParams, T: int, F_total: int,
                        use_thr: bool = False):
    """px_f backward kernel, flat pair layout + MXU contractions.

    Pixel-map data arrives as one [BWD_PC, t*t] row matrix per tile
    (channels: out r/g/b/alpha, softmax sum/max, grad r/g/b/alpha, thr).
    Every sum-over-pixels (face and texture gradients) is a dot_general
    against the pair arrays; the surface-texture gradient contracts the
    3-row grad matrix with the per-texel masked coefficients, and the
    color term needed for the softmax chain is built per texel as a
    rank-3 outer-product matmul (g3 x texel rows) instead of a 25-way
    select of full color planes."""
    is_ = p.image_size
    ph = pw = _pf_tile_for(is_)
    T2 = ph * pw
    FB = PF_FB
    HIP = PF_PRECISION

    def dot_px(a_cols, x):
        # contract pixels (sublanes of BOTH): [T2, M] x [T2, FB] -> [M, FB]
        # — the columnar form needs no cross-lane transpose of a_cols
        return jax.lax.dot_general(a_cols, x, (((0,), (0,)), ((), ())),
                                   precision=HIP,
                                   preferred_element_type=jnp.float32)

    def dot_k(g3, tex3):
        # outer over pixels/faces: [T2, 3] x [3, FB] -> [T2, FB]
        return jax.lax.dot_general(g3, tex3, (((1,), (0,)), ((), ())),
                                   precision=HIP,
                                   preferred_element_type=jnp.float32)

    def kernel(b_s, ty_s, tx_s, ch_s, first_s, last_s, act_s, lim_s, ty0_s,
               ids_ref, face_ref, inv_ref, sym_ref, obt_ref, front_ref,
               tex_ref, px_ref, gface_ref, gtex_ref):
        i = pl.program_id(0)
        ty = ty_s[i]
        tx = tx_s[i]

        @pl.when(act_s[i] == 1)
        def _body():
            rows = (ty * ph + jax.lax.broadcasted_iota(jnp.int32, (ph, pw), 0)
                    ).astype(jnp.float32)
            cols = (tx * pw + jax.lax.broadcasted_iota(jnp.int32, (ph, pw), 1)
                    ).astype(jnp.float32)
            xp = (2.0 * cols + 1.0 - is_) / is_
            yp = (is_ - 1.0 - 2.0 * rows) / is_

            face = face_ref[0]
            inv = inv_ref[0]
            sym = sym_ref[0]
            obt = obt_ref[0]
            tex = tex_ref[0]                        # [T*3, FB]
            ids = ids_ref[0]                        # [1, FB]
            px = px_ref[0, 0]                       # [T2, BWD_PC]

            def col(j):
                return px[:, j:j + 1]                              # [T2,1]

            terms = _pair_terms_kernel(face, inv, sym, obt, xp, yp, p,
                                       layout='px_f', need_inside=False)

            def fl(a):
                return a.reshape(T2, FB)

            sf_fwd = fl(terms['sf'])
            zp = fl(terms['zp'])
            wc = [fl(c) for c in terms['wc']]
            w = [fl(c) for c in terms['w']]
            ids_row = ids[0:1, :]
            ones_col = jnp.ones((T2, 1), jnp.float32)

            sf = jnp.ones_like(sf_fwd) if p.dist_func_id == 0 else sf_fwd
            valid = (ids_row >= 0) & fl(terms['tk_valid'])
            if use_thr:
                # reference top-K policy: only the K nearest candidate
                # faces per pixel receive gradients (soft_rasterize.py:
                # 369-385 selection, :1233+ buffer-bounded loop)
                valid = valid & (zp <= col(10))
            vf = valid.astype(jnp.float32)

            g3 = px[:, 6:9]                                        # [T2,3]
            g_alpha = col(9)
            out_alpha = col(3)

            if p.alpha_func_id == 0:
                C_grad_xy = jnp.zeros_like(sf)
            elif p.alpha_func_id == 1:
                C_grad_xy = jnp.broadcast_to(g_alpha / F_total, sf.shape)
            else:
                C_grad_xy = g_alpha * (1.0 - out_alpha) / \
                    jnp.maximum(1.0 - sf, 1e-6)

            gz = [None, None, None]
            if p.rgb_func_id == 1:
                softmax_sum = col(4)
                softmax_max = col(5)
                zpn = (p.far - zp) / (p.far - p.near)
                e_arg = jnp.where(valid, (zpn - softmax_max) / p.gamma_val,
                                  -1e30)
                zp_softmax = sf * jnp.exp(e_arg) / softmax_sum

                # S = sum_k g_k * colors_k per pair, via per-texel
                # outer-product matmuls (colors never materialize)
                if p.texture_type_id == 0:
                    R = int(math.sqrt(T))
                    idx = _surface_tex_idx(wc, R)
                    S = jnp.zeros_like(sf)
                    # fused texel sweep: one (idx == ti) mask feeds BOTH the
                    # S outer-product and this texel's gradient contraction
                    for ti in range(T):
                        m_ti = idx == ti
                        P_ti = dot_k(g3, tex[ti * 3:ti * 3 + 3, :])
                        S = S + jnp.where(m_ti, P_ti, 0.0)
                        w_ti = jnp.where(m_ti, zp_softmax, 0.0)
                        gtex_ref[0, ti * 3:ti * 3 + 3, :] = dot_px(g3, w_ti)
                else:
                    S = jnp.zeros_like(sf)
                    for c in range(3):
                        S = S + wc[c] * dot_k(g3, tex[3 * c:3 * c + 3, :])
                # sum_k g_k * out_k
                GO = col(6) * col(0) + col(7) * col(1) + col(8) * col(2)
                C_grad_xyz = (S - GO) * zp_softmax
                C_grad_xy = C_grad_xy + C_grad_xyz / jnp.maximum(sf, 1e-30)

                C_grad_z = C_grad_xyz / p.gamma_val / (p.near - p.far) * zp * zp
                invz = [v.reshape(1, FB) for v in terms['invz']]
                for k in range(3):
                    gz[k] = C_grad_z * wc[k] * (invz[k] * invz[k])
                tex_coef = None if p.texture_type_id == 0 else zp_softmax
            elif p.rgb_func_id == 0:
                fidx_min = col(5)
                is_win = vf * (jnp.abs(ids_row.astype(jnp.float32) - fidx_min)
                               < 0.5)
                tex_coef = is_win
            else:
                tex_coef = jnp.zeros_like(sf)

            # texture gradients (surface softmax already emitted them in the
            # fused sweep above: tex_coef is None then)
            if tex_coef is not None:
                if p.texture_type_id == 0:
                    R = int(math.sqrt(T))
                    idx = _surface_tex_idx(wc, R)
                    for ti in range(T):
                        w_ti = jnp.where(idx == ti, tex_coef, 0.0)
                        gtex_ref[0, ti * 3:ti * 3 + 3, :] = dot_px(g3, w_ti)
                else:
                    for ci in range(3):
                        w_ci = tex_coef * wc[ci]
                        gtex_ref[0, ci * 3:ci * 3 + 3, :] = dot_px(g3, w_ci)

            C_grad_xy = C_grad_xy * sf * (1.0 - sf) / p.sigma_val
            C_grad_xy = C_grad_xy * vf

            gx = [None, None, None]
            gy = [None, None, None]
            if p.dist_func_id == 1:
                t = [fl(c) for c in terms['t']]
                pmin = jnp.where(t[0] > t[1],
                                 jnp.where(t[1] > t[2], 2, 1),
                                 jnp.where(t[0] > t[2], 2, 0))
                mn = jnp.minimum(jnp.minimum(w[0], w[1]), w[2])
                scale = 2.0 * jnp.sqrt(mn * mn)
                C = C_grad_xy * scale
                for l in range(2):
                    inv_p = jnp.where(
                        pmin == 0, inv[0 + l:1 + l, :],
                        jnp.where(pmin == 1, inv[3 + l:4 + l, :],
                                  inv[6 + l:7 + l, :]))
                    for k in range(3):
                        gv = -inv_p * w[k] * C
                        if l == 0:
                            gx[k] = gv
                        else:
                            gy[k] = gv
            elif p.dist_func_id == 2:
                sign = fl(terms['sign'])
                dis_x = jnp.where(valid, fl(terms['dis_x']), 0.0)
                dis_y = jnp.where(valid, fl(terms['dis_y']), 0.0)
                t = [fl(c) for c in terms['t']]
                C2 = 2.0 * sign * C_grad_xy
                for k in range(3):
                    tau = jnp.where(valid, t[k] + w[k], 0.0)
                    gx[k] = C2 * tau * dis_x
                    gy[k] = C2 * tau * dis_y
            else:
                z = jnp.zeros_like(sf)
                gx = [z, z, z]
                gy = [z, z, z]

            for k in range(3):
                gzk = jnp.where(valid, gz[k], 0.0) if gz[k] is not None \
                    else jnp.zeros_like(sf)
                gface_ref[0, 3 * k:3 * k + 1, :] = dot_px(ones_col, gx[k])
                gface_ref[0, 3 * k + 1:3 * k + 2, :] = dot_px(ones_col, gy[k])
                gface_ref[0, 3 * k + 2:3 * k + 3, :] = dot_px(ones_col, gzk)

    return kernel


def _work_gather_pf(lists, counts, cap, w_cap, B, F, NT, TX, arrays):
    """Work-list expansion shared by the fwd/bwd and threshold kernels.

    lists: CompactLists.  counts: [B, NT] per-tile face counts to expand
    (may be a masked copy of lists.counts — tiles with count 0 emit no
    work).  arrays: per-face [B, F, C] tensors to gather per chunk; the
    FIRST one (the face coordinates) gets SENTINEL masking on padded
    lanes.  Returns (prefetch scalars, ids_w [W,1,FB], gathered [W,C,FB]
    tensors)."""
    FB = PF_FB
    work = build_work_list(counts, cap, FB, w_cap, skip_empty=True)

    total = work.num_items
    last_real = jnp.maximum(total - 1, 0)
    in_range = jnp.arange(w_cap, dtype=jnp.int32) < total
    tile = jnp.where(in_range, work.tile, work.tile[last_real])
    chunk = jnp.where(in_range, work.chunk, 0)
    first = jnp.where(in_range, work.first, 0)
    last = jnp.where(in_range, work.last, 0)

    ids_w = gather_work_ids(lists, tile, chunk, FB, cap)
    ids_w = jnp.where(in_range[:, None], ids_w, -1)

    b_of = tile // NT
    fid_safe = jnp.maximum(ids_w, 0)
    gidx = b_of[:, None] * F + fid_safe

    # ONE fused row gather: concatenating the per-face arrays first makes
    # each gathered row ~C_tot*4 bytes instead of 6 thin gathers (row
    # gathers are latency-bound on TPU; wide rows amortize)
    widths = [a.shape[2] for a in arrays]
    fused = jnp.concatenate(arrays, axis=2).reshape(B * F, -1)
    gall = fused[gidx]                                           # [W,FB,Ct]

    def tr(a):
        # [W, FB, C] -> [W, C, FB]: lanes carry faces inside the kernel
        return jnp.swapaxes(a, 1, 2)

    gathered = []
    off = 0
    for j, c in enumerate(widths):
        part = gall[..., off:off + c]
        if j == 0:
            part = jnp.where((ids_w < 0)[..., None], SENTINEL, part)
        gathered.append(tr(part))
        off += c

    t_in_b = tile - b_of * NT
    out_ty = t_in_b // TX
    out_tx = t_in_b - out_ty * TX
    active = in_range.astype(jnp.int32)
    # `lim` (= num_items) drives a DYNAMIC grid size on TPU: only the
    # real work items execute, so the generous static w_cap bound costs
    # nothing at runtime.  Clamped to w_cap: an unclamped grid on
    # binning overflow would run steps past the prefetch arrays' static
    # length (advisor r3 finding) — clamped, overflow degrades to the
    # reported drop it is supposed to be.
    lim = jnp.minimum(jnp.maximum(total, 1), w_cap).reshape(1)
    scalars = (b_of, out_ty, out_tx, chunk, first, last, active, lim)
    return scalars, ids_w[:, None, :].astype(jnp.int32), gathered, total


def _prep_work_data_pf(face_vertices, textures, p: SoftRasParams, cap, w_cap,
                       band=None):
    """Pre-pass for the px_f layout: 8x8-pixel tiles, empty tiles skipped.

    band: optional (ty0, TY_band) — restrict work to the TY_band tile
    rows starting at traced row ty0 (pixel-band sharding: each device
    runs this pre-pass on the full replicated face set but only emits
    work items for its own band; out_ty scalars become band-local)."""
    B, F = face_vertices.shape[:2]
    face = face_vertices.reshape(B, F, 9)
    T = textures.shape[2] if p.texture_type_id == 0 else 3
    tex = textures.reshape(B, F, T * 3)

    face_inv, face_sym, face_obt = G.face_info_preprocess(face)
    front = G.check_face_frontside(face).astype(jnp.float32)[..., None]

    is_ = p.image_size
    t = _pf_tile_for(is_)
    TY = TX = is_ // t
    NT = TY * TX
    lists = build_tile_lists_compact(face, is_, t, t, p.threshold,
                                     _bin_mt_for(F))
    counts = lists.counts
    if band is not None:
        ty0, TY_band = band
        tile_ty = jnp.arange(NT, dtype=jnp.int32)[None, :] // TX
        in_band = (tile_ty >= ty0) & (tile_ty < ty0 + TY_band)
        counts = jnp.where(in_band, counts, 0)
    scalars, ids_w, gathered, total = _work_gather_pf(
        lists, counts, cap, w_cap, B, F, NT, TX,
        (face, face_inv, face_sym, face_obt, front, tex))
    # pixel coords in the kernel need the GLOBAL tile row; only the
    # output-block row is band-local, so ty0 rides a 9th prefetch scalar
    # that the out/px index maps subtract (a band-local ty here rendered
    # every band > 0 at the wrong pixels)
    ty0_arr = (jnp.zeros((1,), jnp.int32) if band is None
               else jnp.asarray(ty0, jnp.int32).reshape(1))
    scalars = scalars + (ty0_arr,)
    report_overflow(counts, cap, total, w_cap,
                    where=f'softras px_f {is_}px')
    # big faces dropped past the glist cap are missing from EVERY tile
    report_overflow(lists.gdrop[:, None], 0, where=f'softras px_f {is_}px glist')
    g_face, g_inv, g_sym, g_obt, g_front, g_tex = gathered
    if band is None:
        covered = (counts > 0).reshape(B, TY, TX)
    else:
        covered = jax.vmap(lambda c: jax.lax.dynamic_slice(
            c.reshape(TY, TX), (ty0, 0), (TY_band, TX)))(counts > 0)
    return (ids_w, g_face, g_inv, g_sym, g_obt, g_front, g_tex,
            scalars, lists, covered, T)


def _pf_caps(F: int, image_size: int, ty_band: int | None):
    """Static (tile_edge, cap, w_cap) shared by prep/fwd/bwd."""
    t = _pf_tile_for(image_size)
    TY = TX = image_size // t
    TYB = ty_band if ty_band is not None else TY
    cap = max(PF_FB, min(F, 2048))
    cap = (cap + PF_FB - 1) // PF_FB * PF_FB
    return t, cap, _work_cap_pf(F, TYB * TX, B=1)


@functools.partial(jax.jit, static_argnums=(2, 4))
def prep_pf(face_vertices, textures, p: SoftRasParams, ty0=None,
            ty_band: int | None = None):
    """Shared work-list prep for the px_f forward AND backward.

    The custom_vjp (api._core_fwd) saves this as a residual so the
    binning sort + face-data gather run ONCE per fwd+bwd frame instead
    of twice.  Returns (ids, g_face, g_inv, g_sym, g_obt, g_front,
    g_tex, scalars, covered) — all arrays, jit-boundary safe."""
    B, F = face_vertices.shape[:2]
    t, cap, w_cap_1 = _pf_caps(F, p.image_size, ty_band)
    TY = TX = p.image_size // t
    TYB = ty_band if ty_band is not None else TY
    band = None if ty0 is None else (ty0, TYB)
    w_cap = _work_cap_pf(F, TYB * TX, B)
    out = _prep_work_data_pf(face_vertices, textures, p, cap, w_cap, band)
    # drop `lists` (internal) and T (static; recomputed from shapes)
    return out[:8] + (out[9],)


def _work_cap_pf(F: int, n_tiles: int, B: int) -> int:
    """Static bound on total px_f work items.

    Must DOMINATE the true demand — build_work_list drops chunks past it
    and under jit the overflow report cannot warn eagerly.  Two terms:
      * B*n_tiles floor: a non-empty glist (big faces, prepended to every
        tile) forces >= 1 chunk on EVERY tile even if its sorted run is
        empty (CL_GBIG <= PF_FB, so exactly one).
      * sorted-run chunks: <= mt pairs per face (mt <= CL_MT) plus one
        ceil-rounding chunk per covered tile (n_tiles//4 margin).
    """
    from .binning import CL_GBIG
    assert CL_GBIG <= PF_FB, 'glist floor sized as one chunk per tile'
    mt = _bin_mt_for(F)
    est = B * (n_tiles + (mt * F) // PF_FB + n_tiles // 4) + 64
    return max(64, est)


def _scal9_spec(c, FB):
    return pl.BlockSpec(
        (1, c, FB),
        lambda i, b_s, ty_s, tx_s, ch_s, fi_s, la_s, ac_s, li_s, t0_s:
        (i, 0, 0),
        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnums=(2, 3, 5, 7))
def soft_rasterize_fwd_pallas_pf(face_vertices, textures, p: SoftRasParams,
                                 with_thr: bool = False, ty0=None,
                                 ty_band: int | None = None, prep=None,
                                 vma=None):
    """Returns (out [B,4,H,W], aggrs [B,2,H,W], aux [B,2,H,W]).

    aux[:, 0] is the per-pixel candidate count (reference q_size);
    aux[:, 1] is the top-K gradient threshold map when with_thr (the
    K-th smallest candidate depth; bits(far) when under K candidates).

    ty0/ty_band: optional pixel-band restriction (sharded rendering) —
    only the ty_band tile rows starting at traced tile-row ty0 are
    rasterized and H becomes ty_band * tile."""
    B, F = face_vertices.shape[:2]
    is_ = p.image_size
    t = _pf_tile_for(is_)
    assert t > 0
    TY = TX = is_ // t
    T2 = t * t
    TYB = ty_band if ty_band is not None else TY
    cap = max(PF_FB, min(F, 2048))
    cap = (cap + PF_FB - 1) // PF_FB * PF_FB
    w_cap = _work_cap_pf(F, TYB * TX, B)

    if prep is None:
        prep = prep_pf(face_vertices, textures, p, ty0, ty_band)
    (ids, g_face, g_inv, g_sym, g_obt, g_front, g_tex,
     scalars, covered) = prep
    T = textures.shape[2] if p.texture_type_id == 0 else 3

    FB = PF_FB
    n_ch = cap // FB
    kernel = _make_fwd_kernel_pf(p, T, F, with_thr=with_thr, n_ch=n_ch)

    NT = TYB * TX
    out_spec = pl.BlockSpec(
        (1, 1, T2, FWD_C),
        lambda i, b_s, ty_s, tx_s, ch_s, fi_s, la_s, ac_s, li_s, t0_s:
        (b_s[i], (ty_s[i] - t0_s[0]) * TX + tx_s[i], 0, 0),
        memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((T2, 4), jnp.float32),       # acc_ns (rgb + softmax sum)
        pltpu.VMEM((T2, 1), jnp.float32),       # acc_max
        pltpu.VMEM((T2, 1), jnp.float32),       # acc_alpha
        pltpu.VMEM((T2, 1), jnp.float32),       # acc_cnt
        pltpu.VMEM((T2, 8), jnp.float32),       # acc_hard (rgb, dmin, id)
    ]
    if with_thr:
        scratch.append(pltpu.VMEM((T2, 1), jnp.int32))   # acc_blo
        scratch.append(pltpu.VMEM((T2, 1), jnp.int32))   # acc_bhi
        scratch.append(pltpu.VMEM((n_ch, T2, FB), jnp.int32))

    # dynamic grid: execute only the real work items (Mosaic supports
    # traced grid bounds; the interpreter used on CPU does not)
    n_steps = (scalars[7][0] if os.environ.get('JR_DYN_GRID', '1') == '1' else w_cap) if _is_tpu() else w_cap
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(n_steps,),
        in_specs=[_scal9_spec(1, FB), _scal9_spec(9, FB), _scal9_spec(9, FB),
                  _scal9_spec(9, FB), _scal9_spec(3, FB), _scal9_spec(1, FB),
                  _scal9_spec(g_tex.shape[-1], FB)],
        out_specs=[out_spec],
        scratch_shapes=scratch,
    )

    (rows_t,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, NT, T2, FWD_C), jnp.float32,
                                        vma=vma)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
        interpret=not _is_tpu(),
    )(*scalars, ids, g_face, g_inv, g_sym, g_obt, g_front, g_tex)

    full = rows_t.reshape(B, TYB, TX, t, t, FWD_C) \
        .transpose(0, 5, 1, 3, 2, 4).reshape(B, FWD_C, TYB * t, is_)
    out = full[:, 0:4]
    aggrs = full[:, 4:6]
    # uncovered tiles were never visited -> fill with the empty-pixel values
    mask = jnp.repeat(jnp.repeat(covered, t, axis=1), t, axis=2)[:, None]
    bg = jnp.asarray(p.background_color + (0.0,), jnp.float32)
    if p.alpha_func_id == 2:
        bg = bg.at[3].set(0.0)
    out = jnp.where(mask, out, bg[None, :, None, None])
    if p.rgb_func_id == 1:
        ag_init = jnp.asarray([1.0, p.eps], jnp.float32)
    else:
        ag_init = jnp.asarray([BIG_DEPTH, -1.0], jnp.float32)
    aggrs = jnp.where(mask, aggrs, ag_init[None, :, None, None])
    cnt = jnp.where(mask[:, 0], full[:, 6], 0.0)
    thr = jnp.where(mask[:, 0], full[:, 7], BIG_DEPTH) if with_thr \
        else jnp.full_like(cnt, BIG_DEPTH)
    return out, aggrs, jnp.stack([cnt, thr], axis=1)


BWD_PC = 11   # out r/g/b/a | softmax sum/max | grad r/g/b/a | thr


@functools.partial(jax.jit, static_argnums=(6, 8, 10))
def soft_rasterize_bwd_pallas_pf(face_vertices, textures, soft_colors,
                                 aggrs_info, aux, grad_soft_colors,
                                 p: SoftRasParams, ty0=None,
                                 ty_band: int | None = None, prep=None,
                                 vma=None):
    """aux is the forward's [B,2,H,W] (candidate count, top-K threshold).

    ty0/ty_band: optional pixel-band restriction — the pixel maps are
    band-local [B, C, ty_band*tile, W] and the returned face/texture
    gradients cover only this band's pixels (caller psums over bands)."""
    B, F = face_vertices.shape[:2]
    is_ = p.image_size
    t = _pf_tile_for(is_)
    TY = TX = is_ // t
    T2 = t * t
    TYB = ty_band if ty_band is not None else TY
    band = None if ty0 is None else (ty0, TYB)
    cap = max(PF_FB, min(F, 2048))
    cap = (cap + PF_FB - 1) // PF_FB * PF_FB
    w_cap = _work_cap_pf(F, TYB * TX, B)

    if prep is None:
        prep = prep_pf(face_vertices, textures, p, ty0, ty_band)
    (ids, g_face, g_inv, g_sym, g_obt, g_front, g_tex,
     scalars, covered) = prep
    T = textures.shape[2] if p.texture_type_id == 0 else 3
    out_b, active = scalars[0], scalars[6]

    FB = PF_FB
    # reference top-K gradient truncation: the forward already emitted the
    # exact per-pixel threshold (aux[:,1]); the kernel masks zp <= thr
    use_thr = p.grad_mode == 'topk' and p.max_faces_id < F
    kernel = _make_bwd_kernel_pf(p, T, F, use_thr=use_thr)

    NT = TYB * TX

    # one [t*t, BWD_PC] pixel-major matrix per tile (see kernel channel
    # map) — pixels on sublanes so the kernel reads columns, no transposes
    px = jnp.concatenate([soft_colors, aggrs_info, grad_soft_colors,
                          aux[:, 1:2]], axis=1)
    px = px.reshape(B, BWD_PC, TYB, t, TX, t).transpose(0, 2, 4, 3, 5, 1) \
        .reshape(B, NT, T2, BWD_PC)
    px_spec = pl.BlockSpec(
        (1, 1, T2, BWD_PC),
        lambda i, b_s, ty_s, tx_s, ch_s, fi_s, la_s, ac_s, li_s, t0_s:
        (b_s[i], (ty_s[i] - t0_s[0]) * TX + tx_s[i], 0, 0),
        memory_space=pltpu.VMEM)

    out_specs = [
        pl.BlockSpec((1, 9, FB),
                     lambda i, b_s, ty_s, tx_s, ch_s, fi_s, la_s, ac_s,
                     li_s, t0_s: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T * 3, FB),
                     lambda i, b_s, ty_s, tx_s, ch_s, fi_s, la_s, ac_s,
                     li_s, t0_s: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((w_cap, 9, FB), jnp.float32, vma=vma),
        jax.ShapeDtypeStruct((w_cap, T * 3, FB), jnp.float32, vma=vma),
    ]

    n_steps = (scalars[7][0] if os.environ.get('JR_DYN_GRID', '1') == '1' else w_cap) if _is_tpu() else w_cap
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(n_steps,),
        in_specs=[_scal9_spec(1, FB), _scal9_spec(9, FB), _scal9_spec(9, FB),
                  _scal9_spec(9, FB), _scal9_spec(3, FB), _scal9_spec(1, FB),
                  _scal9_spec(g_tex.shape[-1], FB), px_spec],
        out_specs=out_specs,
        scratch_shapes=[],
    )

    gface_slots, gtex_slots = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
        interpret=not _is_tpu(),
    )(*scalars, ids, g_face, g_inv, g_sym, g_obt, g_front, g_tex, px)

    ids_w = ids[:, 0, :]                                         # [W, FB]
    seg = jnp.where(ids_w >= 0, out_b[:, None] * F + ids_w, B * F)
    gface_t = jnp.transpose(gface_slots, (0, 2, 1))              # [W, FB, 9]
    gtex_t = jnp.transpose(gtex_slots, (0, 2, 1))                # [W, FB, T*3]
    # padding/inactive items hold garbage VMEM: zero them before the sum
    act = (active > 0)[:, None, None]
    gface_t = jnp.where(act, gface_t, 0.0)
    gtex_t = jnp.where(act, gtex_t, 0.0)
    gf = jax.ops.segment_sum(gface_t.reshape(-1, 9), seg.reshape(-1),
                             num_segments=B * F + 1)[:-1]
    gt = jax.ops.segment_sum(gtex_t.reshape(-1, T * 3), seg.reshape(-1),
                             num_segments=B * F + 1)[:-1]
    return (gf.reshape(face_vertices.shape), gt.reshape(textures.shape))
