"""SoftRas Pallas TPU kernels — grouped-lane ('pxg') layout.

The px_f layout (pallas_impl.py) gives every face chunk a full 128-lane
work item per tile, so a tile with 10 candidate faces still pays 128
lanes x tile pixels of pair math.  Measured on the reference benchmark
meshes (README.md:63-69 rows) that wastes 85-95% of all pair slots:
134M/133M/169M slots for the 288/3.3k/39k-face meshes where only
9M/16M/49M are needed at 8-lane granularity.

This layout fixes the waste by letting every 8-lane GROUP of a work
item carry faces of a DIFFERENT tile:

  * pair block [T2, 128]: pixels of a 16x16 tile on sublanes, 16 groups
    of 8 faces on lanes.  Pixel coordinates are per-lane (each lane
    group rasterizes its own tile), so _pair_terms_kernel runs unchanged.
  * per-tile face lists are padded to a multiple of 8 (not 128); groups
    are packed 16 per work item in tile-sorted order.
  * the kernel emits PER-GROUP partial aggregates (online-softmax
    [M, S, num_rgb], alpha, candidate count, hard-z winner) — one
    [T2, 128] output row per item (8 channels x 16 groups).
  * partials are combined per tile in XLA with segment_{max,sum,min}
    over the sorted group->tile keys (measured ~0.07 ms for the largest
    mesh).  Online-softmax merge is associative, so chunking stays exact.

The reference top-K gradient threshold (soft_rasterize.py:369-385) is
computed OUTSIDE the main kernel: the forward optionally emits each
pair's candidate depth bits ([Wg, T2, 8] int32) and the K-th smallest
per pixel is found by integer bisection in XLA (segment-summed rank
counts per round, bounds narrowed to the per-pixel candidate bit range).
The main forward no longer pays the in-kernel slab + bisection that cost
~25 ms/frame in the px_f layout.

Backward: same grouped pairing; per-tile pixel maps (colors, softmax
stats, upstream grads) are gathered per group as [T2, 11*16] rows and
broadcast group->lanes with an exact HIGHEST-precision 0/1 expansion
dot.  Face/texture gradient slots per lane are segment-summed by face
id exactly as in the px_f backward (deterministic atomicAdd
replacement, soft_rasterize.py:1349-1358).
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
from .binning import (CL_GBIG, build_tile_lists_compact, gather_work_ids,
                      report_overflow)
from .params import SoftRasParams
from .pallas_impl import (BIG_DEPTH, SENTINEL, _is_tpu, _pair_colors,
                          _pair_terms_kernel, _surface_tex_idx)

G8 = 8            # lanes per face group
GPI = 16          # groups per work item (G8 * GPI = 128 lanes)
FB = G8 * GPI
PXG_TILE = int(os.environ.get('JR_PXG_TILE', '16'))
HIP = jax.lax.Precision.HIGHEST   # exact for f32 (bf16x6 recovers f32)

FWD_CH = 8        # output channels per group (see kernel layout)
THR_INT_MAX = 2 ** 31 - 1


def _env_knobs():
    """Debug/test env knobs read at TRACE time by prep/caps helpers.
    jax.jit keys its cache on shapes + static args only, so a knob
    change mid-process would silently reuse executables compiled with
    the old value (advisor r4) — _knob_jit folds this tuple into the
    cache key instead."""
    return (os.environ.get('JR_PXT_TPI'), os.environ.get('JR_PXG_MT'),
            os.environ.get('JR_BIN_MT'), os.environ.get('JR_DYN_GRID', '1'),
            os.environ.get('JR_DIR_MAX'), os.environ.get('JR_DIR_TILE'),
            os.environ.get('JR_DIR_SORT', '1'))


def _knob_jit(static_argnums):
    """jax.jit whose executable cache additionally keys on _env_knobs():
    one independent jit cache per knob combination."""
    def deco(fn):
        @functools.lru_cache(maxsize=None)
        def _for_knobs(knobs):
            return functools.partial(
                jax.jit, static_argnums=static_argnums)(fn)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            return _for_knobs(_env_knobs())(*args, **kwargs)
        return wrapper
    return deco


def _pxg_tile_for(image_size: int) -> int:
    for t in (PXG_TILE, 16, 8):
        if t and image_size % t == 0:
            return t
    return 0


def _mt_pxg(F: int) -> int:
    """Tile-span emit cap per face (pairs sorted = F * mt keys).

    Small meshes have big faces (hundreds of pixels) spanning many 16px
    tiles — give them a generous span so they stay in the cheap sorted
    path; large meshes are small faces spanning ~2x2 tiles."""
    env = os.environ.get('JR_PXG_MT')
    if env:
        return int(env)
    if F <= 512:
        return 128
    if F <= 8192:
        return 48
    # a ~14px inflated bbox spans up to 3x4 16px tiles (the 39k bench
    # mesh measures span <= 12; mt=8 pushed 4.5k faces into the capped
    # glist and silently dropped most of them)
    return 12


def _glist_slack(F: int, n_tiles: int) -> int:
    """Group slack for glist faces: with binning's exact per-tile
    distribution each glist face contributes one entry to EVERY tile its
    bbox overlaps (advisor r3: the old 2*CL_GBIG reserve under-counted).
    Budget an average overlap of 32 tiles per big face; scenes beyond
    that degrade to a reported drop (the dynamic grid is clamped)."""
    return min(CL_GBIG, F) * min(n_tiles, 32) // G8 + 2 * CL_GBIG


def _wg_cap_pxg(F: int, n_tiles: int, B: int) -> int:
    """Static bound on 8-lane groups: sorted-run groups (<= mt pairs per
    face / 8, +1 ceil-rounding group per tile) plus glist slack."""
    mt = _mt_pxg(F)
    est = B * ((F * mt) // G8 + n_tiles + _glist_slack(F, n_tiles))
    est = max(GPI, est)
    return (est + GPI - 1) // GPI * GPI


def _pxg_caps(F: int, image_size: int):
    t = _pxg_tile_for(image_size)
    NT = (image_size // t) ** 2
    cap = max(G8, min(F, 2048))
    cap = (cap + G8 - 1) // G8 * G8
    return t, cap, _wg_cap_pxg(F, NT, 1)


@_knob_jit((2,))
def prep_pxg(face_vertices, textures, p: SoftRasParams):
    """Binning + per-lane gather shared by the pxg forward and backward.

    Returns (ids, g_face, g_inv, g_sym, g_obt, g_front, g_tex, xy, seg,
    counts, lim):
      ids     [W, 1, 128] i32  per-lane face ids (-1 = padding)
      g_*     [W, C, 128] f32  per-lane face data rows
      xy      [W, 2, 128] f32  per-lane tile-base NDC coords
      seg     [Wg] i32         group -> flat tile key (B*NT = dropped)
      counts  [B, NT] i32      true per-tile demand (covered mask)
      lim     [1] i32          true number of work items (dynamic grid)
    """
    B, F = face_vertices.shape[:2]
    face = face_vertices.reshape(B, F, 9)
    T = textures.shape[2] if p.texture_type_id == 0 else 3
    tex = textures.reshape(B, F, T * 3)
    is_ = p.image_size
    t, cap, wg_cap1 = _pxg_caps(F, is_)
    TY = TX = is_ // t
    NT = TY * TX
    wg_cap = _wg_cap_pxg(F, NT, B)
    w_cap = wg_cap // GPI

    face_inv, face_sym, face_obt = G.face_info_preprocess(face)
    front = G.check_face_frontside(face).astype(jnp.float32)[..., None]

    lists = build_tile_lists_compact(face, is_, t, t, p.threshold,
                                     _mt_pxg(F))
    counts = lists.counts

    # group list without build_work_list's dense [NT, cap/8] scatter
    # (~15 ms at fb=8) or a searchsorted (whose binary-search while loop
    # cost ~7 ms): scatter each non-empty tile's id at its first group
    # slot, then a cummax fills tile ids forward across its group run
    ng = (jnp.minimum(counts.reshape(-1), cap) + G8 - 1) // G8   # [B*NT]
    offs0 = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                             jnp.cumsum(ng)[:-1].astype(jnp.int32)])
    total_g = (offs0[-1] + ng[-1]).astype(jnp.int32)
    tids = jnp.arange(B * NT, dtype=jnp.int32)
    starts_at = jnp.where(ng > 0, offs0, wg_cap)                 # OOB drop
    tile_seed = jnp.zeros((wg_cap,), jnp.int32).at[starts_at].max(
        tids, mode='drop')
    tile_g = jax.lax.cummax(tile_seed)
    garange = jnp.arange(wg_cap, dtype=jnp.int32)
    in_range = garange < total_g
    tile_g = jnp.where(in_range, tile_g, 0)
    chunk_g = jnp.where(in_range, garange - offs0[tile_g], 0)

    ids_g = gather_work_ids(lists, tile_g, chunk_g, G8, cap)     # [Wg, 8]
    ids_g = jnp.where(in_range[:, None], ids_g, -1)

    b_of = tile_g // NT
    fid_safe = jnp.maximum(ids_g, 0)
    gidx = b_of[:, None] * F + fid_safe

    widths = [9, 9, 9, 3, 1, T * 3]
    fused = jnp.concatenate(
        [face, face_inv, face_sym, face_obt, front, tex],
        axis=2).reshape(B * F, -1)
    gall = fused[gidx]                                           # [Wg,8,Ct]
    gall = gall.reshape(w_cap, FB, -1)
    ids_lane = ids_g.reshape(w_cap, FB)
    gathered = []
    off = 0
    for j, c in enumerate(widths):
        part = gall[..., off:off + c]
        if j == 0:
            part = jnp.where((ids_lane < 0)[..., None], SENTINEL, part)
        gathered.append(jnp.swapaxes(part, 1, 2))                # [W,C,128]
        off += c
    g_face, g_inv, g_sym, g_obt, g_front, g_tex = gathered

    # per-lane tile-base NDC coords.  The kernel adds 2*dx/is_ per
    # pixel; for power-of-two image sizes both terms are exact dyadic
    # values and match the oracle's single-expression (2c+1-is)/is
    # centers bit-for-bit.  For non-power-of-two sizes a 1-ulp shift
    # can flip knife-edge border/texel predicates (advisor r3) — the
    # parity suites' boundary-fraction tolerance covers exactly this.
    tloc = tile_g - b_of * NT
    gty = (tloc // TX).astype(jnp.float32)
    gtx = (tloc - (tloc // TX) * TX).astype(jnp.float32)
    xb = (2.0 * gtx * t + 1.0 - is_) / is_                       # [Wg]
    yb = (is_ - 1.0 - 2.0 * gty * t) / is_
    xy = jnp.stack([
        jnp.repeat(xb.reshape(w_cap, GPI), G8, axis=1),
        jnp.repeat(yb.reshape(w_cap, GPI), G8, axis=1)], axis=1)  # [W,2,128]

    seg = jnp.where(in_range, tile_g, B * NT)
    # clamp to the static cap: an unclamped dynamic grid on binning
    # overflow would run steps past w_cap and index the prefetch arrays
    # out of bounds (advisor r3 finding) — clamping degrades overflow to
    # the reported drop it is supposed to be
    lim = jnp.minimum(jnp.maximum((total_g + GPI - 1) // GPI, 1),
                      w_cap).reshape(1)

    report_overflow(counts, cap, total_g, wg_cap,
                    where=f'softras pxg {is_}px')
    report_overflow(lists.gdrop[:, None], 0,
                    where=f'softras pxg {is_}px glist')
    return (ids_lane[:, None, :].astype(jnp.int32), g_face, g_inv, g_sym,
            g_obt, g_front, g_tex, xy, seg, counts, lim)


# ---------------------------------------------------------------------------
# in-kernel group primitives
# ---------------------------------------------------------------------------

def _lane_pos():
    return jax.lax.broadcasted_iota(jnp.int32, (1, FB), 1) % G8


def _group_mat():
    """[128, 16] f32 0/1 matrix: lane -> its group column."""
    il = jax.lax.broadcasted_iota(jnp.int32, (FB, GPI), 0)
    ig = jax.lax.broadcasted_iota(jnp.int32, (FB, GPI), 1)
    return (il // G8 == ig).astype(jnp.float32)


def _expand_mat():
    """[16, 128] f32 0/1 matrix: group row -> its 8 lanes."""
    ig = jax.lax.broadcasted_iota(jnp.int32, (GPI, FB), 0)
    il = jax.lax.broadcasted_iota(jnp.int32, (GPI, FB), 1)
    return (il // G8 == ig).astype(jnp.float32)


def _dot_g(x, gm, precision=HIP):
    """Sum x's lanes within each group: [T2, 128] -> [T2, 16].

    HIGHEST precision with a 0/1 matrix is an EXACT f32 grouped sum
    (bf16x6 splits recover f32 operands; accumulation is f32)."""
    return jax.lax.dot_general(x, gm, (((1,), (0,)), ((), ())),
                               precision=precision,
                               preferred_element_type=jnp.float32)


def _group_allreduce(x, op, fill):
    """In-group (8 consecutive lanes) all-reduce; every lane ends with
    the group result.  log-step butterfly on masked lane rolls."""
    pos = _lane_pos()
    for s in (1, 2, 4):
        r = pltpu.roll(x, s, 1)
        lft = pltpu.roll(x, FB - s, 1)
        x = op(x, jnp.where(pos >= s, r, fill))
        x = op(x, jnp.where(pos < G8 - s, lft, fill))
    return x


def _group_prefix_prod(x):
    pos = _lane_pos()
    for s in (1, 2, 4):
        r = pltpu.roll(x, s, 1)
        x = x * jnp.where(pos >= s, r, 1.0)
    return x


def _first_lane_extract(x, gm):
    """Per-group scalar (equal across the group's lanes) -> [T2, 16]."""
    pos = _lane_pos()
    return _dot_g(jnp.where(pos == 0, x, 0.0), gm)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _make_fwd_kernel_pxg(p: SoftRasParams, T: int, emit_depth: bool):
    """Emits per-group partial aggregates, one [T2, 128] row per item.

    Channel layout (lane = ch*16 + group):
      softmax rgb: [num_r, num_g, num_b, S, M, alpha, cnt, 0]
      hard rgb:    [r, g, b, dmin, win_id, alpha, cnt, 0]
    emit_depth additionally writes each pair's candidate depth bits
    ([T2, 128] int32 per item, THR_INT_MAX on non-candidates) for the
    XLA top-K threshold bisection."""
    is_ = p.image_size
    t = _pxg_tile_for(is_)
    T2 = t * t

    def kernel(lim_s, ids_ref, face_ref, inv_ref, sym_ref, obt_ref,
               front_ref, tex_ref, xy_ref, *refs):
        if emit_depth:
            out_ref, zk_ref = refs
        else:
            (out_ref,) = refs
        face = face_ref[0]
        inv = inv_ref[0]
        sym = sym_ref[0]
        obt = obt_ref[0]
        front = front_ref[0]                     # [1, FB]
        tex = tex_ref[0]                         # [T*3, FB]
        ids = ids_ref[0]                         # [1, FB]
        xb = xy_ref[0, 0:1, :]                   # [1, FB]
        yb = xy_ref[0, 1:2, :]

        sofs = jax.lax.broadcasted_iota(jnp.int32, (T2, 1), 0)
        xp = xb + (2.0 * (sofs % t).astype(jnp.float32)) / is_
        yp = yb - (2.0 * (sofs // t).astype(jnp.float32)) / is_

        terms = _pair_terms_kernel(face, inv, sym, obt, xp, yp, p,
                                   layout='pxg', for_grad=False,
                                   need_inside=(p.rgb_func_id == 0))
        sf = terms['sf']                         # [T2, FB]
        zp = terms['zp']
        alpha_valid = terms['alpha_valid']
        tk_valid = terms['tk_valid']
        gm = _group_mat()

        cand = tk_valid & (ids >= 0)
        cnt16 = _dot_g(cand.astype(jnp.float32), gm,
                       precision=jax.lax.Precision.DEFAULT)

        if emit_depth:
            zk_ref[0] = jnp.where(
                cand, jax.lax.bitcast_convert_type(zp, jnp.int32),
                THR_INT_MAX)

        sf_a = jnp.where(alpha_valid, sf, 0.0)
        if p.alpha_func_id == 0:
            m = (alpha_valid & (sf > 0.5)).astype(jnp.float32)
            a16 = jnp.minimum(
                _dot_g(m, gm, precision=jax.lax.Precision.DEFAULT), 1.0)
        elif p.alpha_func_id == 1:
            a16 = _dot_g(sf_a, gm)
        else:
            pos = _lane_pos()
            px_ = _group_prefix_prod(1.0 - sf_a)
            a16 = _dot_g(jnp.where(pos == G8 - 1, px_, 0.0), gm)

        side_ok = (front > 0.5) if not p.fill_back else None

        zero16 = jnp.zeros((T2, GPI), jnp.float32)
        if p.rgb_func_id == 1:
            rgb_valid = tk_valid if p.fill_back else (tk_valid & side_ok)
            zpn = (p.far - zp) / (p.far - p.near)
            zpn_m = jnp.where(rgb_valid, zpn, -1e30)
            M_lane = _group_allreduce(zpn_m, jnp.maximum, -1e30)
            expz = jnp.where(rgb_valid,
                             jnp.exp((zpn - M_lane) / p.gamma_val) * sf, 0.0)
            colors = _pair_colors(tex, terms, p, T, perspective=True,
                                  layout='pxg')
            out_ref[0] = jnp.concatenate(
                [_dot_g(expz * colors[0], gm),
                 _dot_g(expz * colors[1], gm),
                 _dot_g(expz * colors[2], gm),
                 _dot_g(expz, gm),
                 _first_lane_extract(M_lane, gm),
                 a16, cnt16, zero16], axis=1)
        elif p.rgb_func_id == 0:
            inside = terms['inside']
            hard_valid = tk_valid & inside & (ids >= 0) if p.fill_back \
                else (tk_valid & inside & side_ok & (ids >= 0))
            zkey = jnp.where(hard_valid, zp, BIG_DEPTH)
            dmin_lane = _group_allreduce(zkey, jnp.minimum, BIG_DEPTH)
            idsf = ids.astype(jnp.float32)
            tied = (zkey == dmin_lane) & hard_valid
            idk = jnp.where(tied, idsf, jnp.float32(2 ** 30))
            idsel = _group_allreduce(idk, jnp.minimum, jnp.float32(2 ** 30))
            onehot = (tied & (idsf == idsel)).astype(jnp.float32)
            colors = _pair_colors(tex, terms, p, T, perspective=True,
                                  layout='pxg')
            out_ref[0] = jnp.concatenate(
                [_dot_g(onehot * colors[0], gm),
                 _dot_g(onehot * colors[1], gm),
                 _dot_g(onehot * colors[2], gm),
                 _first_lane_extract(dmin_lane, gm),
                 _first_lane_extract(
                     jnp.where(idsel > jnp.float32(2 ** 29), -1.0, idsel),
                     gm),
                 a16, cnt16, zero16], axis=1)
        else:
            out_ref[0] = jnp.concatenate(
                [zero16, zero16, zero16, zero16, zero16, a16, cnt16, zero16],
                axis=1)

    return kernel


def _in_specs_pxg(T: int, with_px: bool = False, T2: int = 0):
    def spec(c):
        return pl.BlockSpec((1, c, FB), lambda i, lim_s: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    specs = [spec(1), spec(9), spec(9), spec(9), spec(3), spec(1),
             spec(T * 3), spec(2)]
    if with_px:
        specs.append(pl.BlockSpec((1, T2, 11 * GPI),
                                  lambda i, lim_s: (i, 0, 0),
                                  memory_space=pltpu.VMEM))
    return specs


def _grid_steps(lim, w_cap):
    if _is_tpu() and os.environ.get('JR_DYN_GRID', '1') == '1':
        return lim[0]
    return w_cap


# ---------------------------------------------------------------------------
# XLA combine
# ---------------------------------------------------------------------------

def _combine_pxg(rows, seg, counts, p: SoftRasParams, B, NT, F_total):
    """Per-tile merge of per-group partials; returns (out, aggrs, cnt)
    as [B, NT, T2, c] tile rows (image assembly is the caller's)."""
    w_cap = rows.shape[0]
    T2 = rows.shape[1]
    wg = w_cap * GPI
    parts = rows.reshape(w_cap, T2, FWD_CH, GPI) \
        .transpose(0, 3, 1, 2).reshape(wg, T2, FWD_CH)
    NTT = B * NT
    valid = (seg < NTT)[:, None]

    def sseg(x, op=jax.ops.segment_sum):
        # padding groups carry seg == NTT: OUT of range, dropped by the
        # scatter for free (an in-range dump slot would serialize all
        # colliding padding rows through one memory location)
        return op(x, seg, num_segments=NTT)

    # sum-combined channels ride ONE fused segment_sum (XLA scatter
    # launches are the cost, not the payload width)
    if p.alpha_func_id == 0:
        alpha_op, alpha_in = jax.ops.segment_max, 0.0
    elif p.alpha_func_id == 1:
        alpha_op, alpha_in = None, 0.0            # folded into the sum pack
    else:
        alpha_op, alpha_in = jax.ops.segment_prod, 1.0

    if p.rgb_func_id == 1:
        Mg = parts[..., 4]
        Mt = jnp.maximum(
            sseg(jnp.where(valid, Mg, -1e30), jax.ops.segment_max), p.eps)
        Mt_ext = jnp.concatenate([Mt, jnp.zeros((1, T2), jnp.float32)])
        scale = jnp.where(valid, jnp.exp((Mg - Mt_ext[seg]) / p.gamma_val),
                          0.0)
        pack = [parts[..., 0:3] * scale[..., None],
                (parts[..., 3] * scale)[..., None],
                jnp.where(valid, parts[..., 6], 0.0)[..., None]]
        if alpha_op is None:
            pack.append(jnp.where(valid, parts[..., 5], 0.0)[..., None])
        summed = sseg(jnp.concatenate(pack, axis=-1))
        cnt = summed[..., 4]
        if alpha_op is None:
            alpha = summed[..., 5] / F_total
        else:
            alpha = sseg(jnp.where(valid, parts[..., 5], alpha_in), alpha_op)
            if p.alpha_func_id == 2:
                alpha = 1.0 - alpha
        exp_bg = jnp.exp((p.eps - Mt) / p.gamma_val)
        S = exp_bg + summed[..., 3]
        bg = jnp.asarray(p.background_color, jnp.float32)
        num = exp_bg[..., None] * bg + summed[..., 0:3]
        rgb = num / S[..., None]
        out = jnp.concatenate([rgb, alpha[..., None]], axis=-1)
        aggrs = jnp.stack([S, Mt], axis=-1)
    else:
        cnt = sseg(jnp.where(valid, parts[..., 6], 0.0))
        if alpha_op is None:
            alpha = sseg(jnp.where(valid, parts[..., 5], 0.0)) / F_total
        else:
            alpha = sseg(jnp.where(valid, parts[..., 5], alpha_in), alpha_op)
            if p.alpha_func_id == 2:
                alpha = 1.0 - alpha
        if p.rgb_func_id == 0:
            dg = parts[..., 3]
            dmin = sseg(jnp.where(valid, dg, BIG_DEPTH), jax.ops.segment_min)
            dmin_ext = jnp.concatenate(
                [dmin, jnp.full((1, T2), BIG_DEPTH, jnp.float32)])
            on_min = valid & (dg <= dmin_ext[seg]) & (dg < BIG_DEPTH)
            idg = jnp.where(on_min, parts[..., 4], jnp.float32(2 ** 30))
            idw = sseg(idg, jax.ops.segment_min)
            idw_ext = jnp.concatenate(
                [idw, jnp.full((1, T2), 2.0 ** 30, jnp.float32)])
            pick = (on_min & (parts[..., 4] == idw_ext[seg]))[..., None]
            rgb = sseg(jnp.where(pick, parts[..., 0:3], 0.0))
            idw = jnp.where(idw > jnp.float32(2 ** 29), -1.0, idw)
            out = jnp.concatenate([rgb, alpha[..., None]], axis=-1)
            aggrs = jnp.stack([dmin, idw], axis=-1)
        else:
            bg = jnp.asarray(p.background_color, jnp.float32)
            out = jnp.concatenate(
                [jnp.broadcast_to(bg, (NTT, T2, 3)), alpha[..., None]],
                axis=-1)
            aggrs = jnp.zeros((NTT, T2, 2), jnp.float32)

    return out, aggrs, cnt


def _rows_to_image(rows, B, TY, TX, t):
    """[B*NT, T2, C] tile rows -> [B, C, H, W]."""
    C = rows.shape[-1]
    return rows.reshape(B, TY, TX, t, t, C) \
        .transpose(0, 5, 1, 3, 2, 4).reshape(B, C, TY * t, TX * t)


THR_ROWS = 18   # slab rows: covers cap=2048 faces (16 items) + misalign


def _make_thr_kernel_pxg(p: SoftRasParams, T2: int):
    """Per-OVERFULL-TILE top-K threshold: DMA the tile's candidate-depth
    rows (its groups are consecutive lanes of the forward's zk output)
    into a VMEM slab, then bisect the bitcast depth bits per pixel.

    This keeps the K-th-smallest selection entirely on-chip — the
    earlier pure-XLA bisection re-read the 360 MB pair-depth array and
    ran a scatter per round (~29 ms/frame on the 39k-face bench)."""
    kf = float(p.max_faces_id)

    def kernel(i0_s, nrow_s, l0_s, nlane_s, lim_s, zk_hbm, out_ref,
               slab, sem):
        i = pl.program_id(0)
        nr = jnp.minimum(nrow_s[i], THR_ROWS)
        i0 = i0_s[i]
        l0 = l0_s[i]
        l1 = l0 + nlane_s[i]

        def load(c, _):
            cp = pltpu.make_async_copy(zk_hbm.at[i0 + c], slab.at[c], sem)
            cp.start()
            cp.wait()
            return 0
        jax.lax.fori_loop(0, nr, load, 0)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, FB), 1)

        def lane_ok(c):
            gl = c * FB + lane
            return (gl >= l0) & (gl < l1)

        # per-pixel candidate bit range -> narrowed bisection bounds
        def mm(c, lh):
            lo, hi = lh
            v = slab[c]
            vm = jnp.where(lane_ok(c), v, THR_INT_MAX)
            lo = jnp.minimum(lo, jnp.min(vm, -1, keepdims=True))
            hi = jnp.maximum(
                hi, jnp.max(jnp.where(vm == THR_INT_MAX, 0, vm), -1,
                            keepdims=True))
            return lo, hi
        lo0 = jnp.full((T2, 1), THR_INT_MAX, jnp.int32)
        hi0 = jnp.zeros((T2, 1), jnp.int32)
        lo0, hi0 = jax.lax.fori_loop(0, nr, mm, (lo0, hi0))
        lo0 = jnp.minimum(lo0 - 1, hi0)

        def cond(lh):
            lo, hi = lh
            return jnp.any(lo < hi)

        def body(lh):
            lo, hi = lh
            mid = lo + ((hi - lo) >> 1)                    # [T2, 1]

            def cs(c, acc):
                # INTMAX-padded lanes never pass (mid < INTMAX)
                ok = lane_ok(c) & (slab[c] <= mid)
                return acc + jnp.sum(ok.astype(jnp.float32), -1,
                                     keepdims=True)
            cnt = jax.lax.fori_loop(0, nr, cs,
                                    jnp.zeros((T2, 1), jnp.float32))
            ge = cnt >= kf
            return (jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi))

        _, hi = jax.lax.while_loop(cond, body, (lo0, hi0))
        out_ref[0] = jax.lax.transpose(
            jax.lax.bitcast_convert_type(hi, jnp.float32), (1, 0))

    return kernel


def _thr_from_depths(zk, counts, cap, cnt_rows, p: SoftRasParams, NTT):
    """Exact per-pixel K-th smallest candidate depth (positive floats
    order like their bit patterns).  Runs the per-tile bisection kernel
    over ONLY the tiles where some pixel exceeds K candidates; all other
    pixels pass every valid face (thr = far)."""
    K = p.max_faces_id
    w_cap, T2 = zk.shape[0], zk.shape[1]

    ng = (jnp.minimum(counts.reshape(-1), cap) + G8 - 1) // G8   # [NTT]
    offs0 = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                             jnp.cumsum(ng)[:-1].astype(jnp.int32)])
    overfull = jnp.any(cnt_rows > jnp.float32(K), axis=1)        # [NTT]
    pos = jnp.cumsum(overfull.astype(jnp.int32)) - 1
    n_over = jnp.maximum(pos[-1] + 1, 0)
    dest = jnp.where(overfull, pos, NTT)
    tids = jnp.arange(NTT, dtype=jnp.int32)
    thr_tile = jnp.zeros((NTT,), jnp.int32).at[dest].set(tids, mode='drop')

    lstart = offs0[thr_tile] * G8
    nlane = ng[thr_tile] * G8
    i0 = lstart // FB
    l0 = lstart - i0 * FB
    nrow = (l0 + nlane + FB - 1) // FB
    lim = jnp.minimum(jnp.maximum(n_over, 1), NTT).reshape(1)

    kernel = _make_thr_kernel_pxg(p, T2)
    # [NTT, 1, T2] rows: pixels on lanes — a trailing dim of 1 would
    # be lane-padded 128x by the TPU layout engine (536 MB at 1024^2)
    out_spec = pl.BlockSpec(
        (1, 1, T2),
        lambda i, i0_s, nr_s, l0_s, nl_s, lim_s: (i, 0, 0),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(_grid_steps(lim, NTT),),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[out_spec],
        scratch_shapes=[pltpu.VMEM((THR_ROWS, T2, FB), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
    )
    (rows,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((NTT, 1, T2), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=not _is_tpu(),
    )(i0, nrow, l0, nlane, lim, zk)

    # scatter compacted rows back to their tiles
    thr_rows = jnp.zeros((NTT, T2), jnp.float32).at[
        jnp.where(jnp.arange(NTT) < n_over, thr_tile, NTT)].set(
        rows[:, 0, :], mode='drop')
    need = cnt_rows > jnp.float32(K)
    return jnp.where(need, thr_rows, p.far)


# ---------------------------------------------------------------------------
# forward entry
# ---------------------------------------------------------------------------

@_knob_jit((2, 3))
def soft_rasterize_fwd_pxg(face_vertices, textures, p: SoftRasParams,
                           with_thr: bool = False, prep=None):
    """Returns (out [B,4,H,W], aggrs [B,2,H,W], aux [B,2,H,W]).

    aux[:, 0] = per-pixel candidate count (reference q_size); aux[:, 1] =
    top-K gradient threshold when with_thr (far where under K)."""
    B, F = face_vertices.shape[:2]
    is_ = p.image_size
    t, cap, _ = _pxg_caps(F, is_)
    TY = TX = is_ // t
    NT = TY * TX
    T2 = t * t
    wg_cap = _wg_cap_pxg(F, NT, B)
    w_cap = wg_cap // GPI

    if prep is None:
        prep = prep_pxg(face_vertices, textures, p)
    (ids, g_face, g_inv, g_sym, g_obt, g_front, g_tex, xy, seg, counts,
     lim) = prep
    T = textures.shape[2] if p.texture_type_id == 0 else 3

    kernel = _make_fwd_kernel_pxg(p, T, emit_depth=with_thr)
    out_shapes = [jax.ShapeDtypeStruct((w_cap, T2, FB), jnp.float32)]
    out_specs = [pl.BlockSpec((1, T2, FB), lambda i, lim_s: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
    if with_thr:
        out_shapes.append(jax.ShapeDtypeStruct((w_cap, T2, FB), jnp.int32))
        out_specs.append(pl.BlockSpec((1, T2, FB),
                                      lambda i, lim_s: (i, 0, 0),
                                      memory_space=pltpu.VMEM))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(_grid_steps(lim, w_cap),),
        in_specs=_in_specs_pxg(T),
        out_specs=out_specs,
        scratch_shapes=[],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=not _is_tpu(),
    )(lim, ids, g_face, g_inv, g_sym, g_obt, g_front, g_tex, xy)

    rows = outs[0]
    out_t, aggrs_t, cnt_t = _combine_pxg(rows, seg, counts, p, B, NT, F)

    if with_thr:
        thr_t = _thr_from_depths(outs[1], counts, cap, cnt_t, p, B * NT)
    else:
        thr_t = jnp.full_like(cnt_t, BIG_DEPTH)

    out = _rows_to_image(out_t, B, TY, TX, t)
    aggrs = _rows_to_image(aggrs_t, B, TY, TX, t)
    aux = _rows_to_image(
        jnp.stack([cnt_t, thr_t], axis=-1), B, TY, TX, t)

    covered = (counts > 0).reshape(B, TY, TX)
    mask = jnp.repeat(jnp.repeat(covered, t, axis=1), t, axis=2)[:, None]
    bgc = jnp.asarray(p.background_color + (0.0,), jnp.float32)
    if p.alpha_func_id == 2:
        bgc = bgc.at[3].set(0.0)
    out = jnp.where(mask, out, bgc[None, :, None, None])
    if p.rgb_func_id == 1:
        ag_init = jnp.asarray([1.0, p.eps], jnp.float32)
    else:
        ag_init = jnp.asarray([BIG_DEPTH, -1.0], jnp.float32)
    aggrs = jnp.where(mask, aggrs, ag_init[None, :, None, None])
    aux = jnp.where(mask, aux,
                    jnp.asarray([0.0, BIG_DEPTH])[None, :, None, None])
    return out, aggrs, aux


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _make_bwd_kernel_pxg(p: SoftRasParams, T: int, F_total: int,
                         use_thr: bool):
    """Grouped-lane backward: per-pair gradient terms reduced over the
    tile's pixels (sublanes) per lane, written to per-item face/texture
    gradient slots (segment-summed by face id outside — deterministic).

    Mirrors the px_f backward math (same reference chains,
    soft_rasterize.py:523-1358) with per-tile pixel-map channels
    broadcast group->lane via an exact HIGHEST 0/1 expansion dot."""
    is_ = p.image_size
    t = _pxg_tile_for(is_)
    T2 = t * t

    def kernel(lim_s, ids_ref, face_ref, inv_ref, sym_ref, obt_ref,
               front_ref, tex_ref, xy_ref, px_ref, gface_ref, gtex_ref):
        face = face_ref[0]
        inv = inv_ref[0]
        sym = sym_ref[0]
        obt = obt_ref[0]
        tex = tex_ref[0]
        ids = ids_ref[0]                          # [1, FB]
        xb = xy_ref[0, 0:1, :]
        yb = xy_ref[0, 1:2, :]
        px = px_ref[0]                            # [T2, 11*GPI]
        em = _expand_mat()

        def pxe(c):
            # group channel -> per-lane [T2, FB] (exact expansion dot)
            return jax.lax.dot_general(
                px[:, c * GPI:(c + 1) * GPI], em, (((1,), (0,)), ((), ())),
                precision=HIP, preferred_element_type=jnp.float32)

        sofs = jax.lax.broadcasted_iota(jnp.int32, (T2, 1), 0)
        xp = xb + (2.0 * (sofs % t).astype(jnp.float32)) / is_
        yp = yb - (2.0 * (sofs // t).astype(jnp.float32)) / is_

        terms = _pair_terms_kernel(face, inv, sym, obt, xp, yp, p,
                                   layout='pxg', need_inside=False)
        sf_fwd = terms['sf']
        zp = terms['zp']
        wc = terms['wc']
        w = terms['w']

        sf = jnp.ones_like(sf_fwd) if p.dist_func_id == 0 else sf_fwd
        valid = (ids >= 0) & terms['tk_valid']
        if use_thr:
            valid = valid & (zp <= pxe(10))
        vf = valid.astype(jnp.float32)

        g3 = [pxe(6), pxe(7), pxe(8)]
        g_alpha = pxe(9)
        out_alpha = pxe(3)

        if p.alpha_func_id == 0:
            C_grad_xy = jnp.zeros_like(sf)
        elif p.alpha_func_id == 1:
            C_grad_xy = g_alpha / F_total
        else:
            C_grad_xy = g_alpha * (1.0 - out_alpha) / \
                jnp.maximum(1.0 - sf, 1e-6)

        gz = [None, None, None]
        if p.rgb_func_id == 1:
            softmax_sum = pxe(4)
            softmax_max = pxe(5)
            zpn = (p.far - zp) / (p.far - p.near)
            e_arg = jnp.where(valid, (zpn - softmax_max) / p.gamma_val,
                              -1e30)
            zp_softmax = sf * jnp.exp(e_arg) / softmax_sum

            if p.texture_type_id == 0:
                R = int(math.sqrt(T))
                idx = _surface_tex_idx(wc, R)
                gcoef = [g3[c] * zp_softmax for c in range(3)]
                S = jnp.zeros_like(sf)
                for ti in range(T):
                    m_ti = idx == ti
                    tr = [tex[ti * 3 + c:ti * 3 + c + 1, :] for c in range(3)]
                    S = S + jnp.where(
                        m_ti,
                        g3[0] * tr[0] + g3[1] * tr[1] + g3[2] * tr[2], 0.0)
                    for c in range(3):
                        gtex_ref[0, ti * 3 + c:ti * 3 + c + 1, :] = jnp.sum(
                            jnp.where(m_ti, gcoef[c], 0.0), axis=0,
                            keepdims=True)
            else:
                # the reference backward reconstructs vertex colors
                # WITHOUT perspective correction (clipped barycentrics
                # only — soft_rasterize.py grad chain; jax_impl
                # backward_single's einsum('pkv,pkvc->pkc', wc, f_tex))
                colors = _pair_colors(tex, terms, p, T, perspective=False,
                                      layout='pxg')
                S = g3[0] * colors[0] + g3[1] * colors[1] + g3[2] * colors[2]
            GO = g3[0] * pxe(0) + g3[1] * pxe(1) + g3[2] * pxe(2)
            C_grad_xyz = (S - GO) * zp_softmax
            C_grad_xy = C_grad_xy + C_grad_xyz / jnp.maximum(sf, 1e-30)

            C_grad_z = C_grad_xyz / p.gamma_val / (p.near - p.far) * zp * zp
            invz = terms['invz']
            for k in range(3):
                gz[k] = C_grad_z * wc[k] * (invz[k] * invz[k])
            tex_coef = None if p.texture_type_id == 0 else zp_softmax
        elif p.rgb_func_id == 0:
            fidx_min = pxe(5)
            is_win = vf * (jnp.abs(ids.astype(jnp.float32) - fidx_min) < 0.5)
            tex_coef = is_win
        else:
            tex_coef = jnp.zeros_like(sf)

        if tex_coef is not None:
            if p.texture_type_id == 0:
                R = int(math.sqrt(T))
                idx = _surface_tex_idx(wc, R)
                gcoef = [g3[c] * tex_coef for c in range(3)]
                for ti in range(T):
                    m_ti = idx == ti
                    for c in range(3):
                        gtex_ref[0, ti * 3 + c:ti * 3 + c + 1, :] = jnp.sum(
                            jnp.where(m_ti, gcoef[c], 0.0), axis=0,
                            keepdims=True)
            else:
                for ci in range(3):
                    w_ci = tex_coef * wc[ci]
                    for c in range(3):
                        gtex_ref[0, ci * 3 + c:ci * 3 + c + 1, :] = jnp.sum(
                            g3[c] * w_ci, axis=0, keepdims=True)

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

        for k in range(3):
            gzk = jnp.where(valid, gz[k], 0.0) if gz[k] is not None \
                else jnp.zeros_like(sf)
            gface_ref[0, 3 * k:3 * k + 1, :] = jnp.sum(
                gx[k], axis=0, keepdims=True)
            gface_ref[0, 3 * k + 1:3 * k + 2, :] = jnp.sum(
                gy[k], axis=0, keepdims=True)
            gface_ref[0, 3 * k + 2:3 * k + 3, :] = jnp.sum(
                gzk, axis=0, keepdims=True)

    return kernel


BWD_PC = 11   # out r/g/b/a | softmax sum/max | grad r/g/b/a | thr


@_knob_jit((6,))
def soft_rasterize_bwd_pxg(face_vertices, textures, soft_colors,
                           aggrs_info, aux, grad_soft_colors,
                           p: SoftRasParams, prep=None):
    B, F = face_vertices.shape[:2]
    is_ = p.image_size
    t, cap, _ = _pxg_caps(F, is_)
    TY = TX = is_ // t
    NT = TY * TX
    T2 = t * t
    wg_cap = _wg_cap_pxg(F, NT, B)
    w_cap = wg_cap // GPI

    if prep is None:
        prep = prep_pxg(face_vertices, textures, p)
    (ids, g_face, g_inv, g_sym, g_obt, g_front, g_tex, xy, seg, counts,
     lim) = prep
    T = textures.shape[2] if p.texture_type_id == 0 else 3
    use_thr = p.grad_mode == 'topk' and p.max_faces_id < F

    # per-tile pixel rows [B*NT, T2, 11], gathered per group and packed
    # as [W, T2, 11*GPI] (channel-major lane blocks for the kernel's
    # group->lane expansion dot)
    pximg = jnp.concatenate([soft_colors, aggrs_info, grad_soft_colors,
                             aux[:, 1:2]], axis=1)
    px_rows = pximg.reshape(B, BWD_PC, TY, t, TX, t) \
        .transpose(0, 2, 4, 3, 5, 1).reshape(B * NT, T2, BWD_PC)
    seg_safe = jnp.minimum(seg, B * NT - 1)
    px_items = px_rows[seg_safe].reshape(w_cap, GPI, T2, BWD_PC) \
        .transpose(0, 2, 3, 1).reshape(w_cap, T2, BWD_PC * GPI)

    kernel = _make_bwd_kernel_pxg(p, T, F, use_thr)
    out_specs = [
        pl.BlockSpec((1, 9, FB), lambda i, lim_s: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T * 3, FB), lambda i, lim_s: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((w_cap, 9, FB), jnp.float32),
        jax.ShapeDtypeStruct((w_cap, T * 3, FB), jnp.float32),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(_grid_steps(lim, w_cap),),
        in_specs=_in_specs_pxg(T, with_px=True, T2=T2),
        out_specs=out_specs,
        scratch_shapes=[],
    )
    gface_slots, gtex_slots = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=not _is_tpu(),
    )(lim, ids, g_face, g_inv, g_sym, g_obt, g_front, g_tex, xy, px_items)

    ids_w = ids[:, 0, :]                                      # [W, FB]
    b_lane = jnp.repeat((seg // NT).reshape(w_cap, GPI), G8, axis=1)
    segf = jnp.where(ids_w >= 0, b_lane * F + ids_w, B * F)
    gface_t = jnp.transpose(gface_slots, (0, 2, 1))
    gtex_t = jnp.transpose(gtex_slots, (0, 2, 1))
    act = (ids_w >= 0)[..., None]
    gface_t = jnp.where(act, gface_t, 0.0)
    gtex_t = jnp.where(act, gtex_t, 0.0)
    # padding rows carry segment B*F == num_segments: OOB, dropped by
    # the scatter without serializing through a shared dump slot
    gf = jax.ops.segment_sum(gface_t.reshape(-1, 9), segf.reshape(-1),
                             num_segments=B * F)
    gt = jax.ops.segment_sum(gtex_t.reshape(-1, T * 3), segf.reshape(-1),
                             num_segments=B * F)
    return (gf.reshape(face_vertices.shape), gt.reshape(textures.shape))
