"""Deterministic face->screen-tile binning (pure XLA).

TPU-native replacement for the reference's coarse-to-fine CUDA binning
(jrender/renderer/dr/softras/cuda/soft_rasterize_coarse_to_fine.py:32-273):
instead of a shared-memory bitmask + atomic compaction, we build per-tile
face lists with a cumsum + scatter — deterministic, jit-friendly, and the
list construction is a tiny fraction of rasterization time.

A face lands in every tile whose pixel-center range intersects its
screen bbox inflated by sqrt(threshold) (same predicate as the kernel's
check_border, soft_rasterize.py:29-34, so binning never changes results).
Overflowing faces beyond ``cap`` are dropped per tile (reference behavior:
c2f overflow warning :249-258); ``counts`` reports the true demand.
"""
from __future__ import annotations

import functools
import os
import warnings
from typing import NamedTuple

import jax
import jax.numpy as jnp

# Opt-in in-jit overflow reporting via jax.debug.print.  The axon TPU
# backend does not support host callbacks at all, so this must stay
# opt-in; on CPU (tests) it works.  Eager calls always warn on the host.
DEBUG_OVERFLOW = os.environ.get('JRENDER_DEBUG_BINNING', '0') not in ('0', '', 'false')


def overflow_stats(counts: jnp.ndarray, cap: int,
                   num_items: jnp.ndarray | None = None,
                   w_cap: int | None = None):
    """(dropped_faces, dropped_chunks): how much the static caps truncated.

    `counts` is TileLists.counts (true pre-cap demand); `num_items` is
    WorkList.num_items (true pre-cap work size).  Nonzero values mean the
    render silently dropped faces — the reference warned in this case
    (soft_rasterize_coarse_to_fine.py:249-258).
    """
    dropped_faces = jnp.sum(jnp.maximum(counts - cap, 0))
    dropped_chunks = (jnp.maximum(num_items - w_cap, 0)
                      if num_items is not None else jnp.int32(0))
    return dropped_faces, dropped_chunks


def report_overflow(counts: jnp.ndarray, cap: int,
                    num_items: jnp.ndarray | None = None,
                    w_cap: int | None = None, where: str = 'softras') -> None:
    """Surface binning-cap overflow instead of dropping silently.

    Eager (concrete) inputs: warns on the host with exact drop counts.
    Traced inputs (inside jit): emits a jax.debug.print when
    JRENDER_DEBUG_BINNING=1 (callback-capable backends only).
    """
    df, dc = overflow_stats(counts, cap, num_items, w_cap)
    if isinstance(df, jax.core.Tracer):
        if DEBUG_OVERFLOW:
            jax.lax.cond(
                (df > 0) | (dc > 0),
                lambda: jax.debug.print(
                    'WARNING [{w}]: binning overflow — {f} face slots past '
                    'per-tile cap {c}, {k} work chunks past cap {wc}; some '
                    'faces were dropped. Raise bin caps.',
                    w=where, f=df, c=cap, k=dc, wc=w_cap or 0),
                lambda: None)
        return
    df_i, dc_i = int(df), int(dc)
    if df_i > 0 or dc_i > 0:
        warnings.warn(
            f'[{where}] binning overflow: {df_i} face slots past per-tile '
            f'cap {cap}' +
            (f', {dc_i} work chunks past cap {w_cap}' if dc_i else '') +
            ' — some faces were dropped; raise the caps '
            '(reference warned too: soft_rasterize_coarse_to_fine.py:249-258)')


class TileLists(NamedTuple):
    ids: jnp.ndarray      # [B, TY*TX, cap] int32 face indices, -1 padded
    counts: jnp.ndarray   # [B, TY*TX] int32 true faces-per-tile (pre-cap)


class CompactLists(NamedTuple):
    """Sorted-pairs tile lists WITHOUT the [NT, cap] materialization.

    The round-1 design scattered every (tile, face) pair into a dense
    [n_tiles, cap] table — an XLA TPU scatter that serialized into ~90 ms
    at 39k faces and dominated the whole rasterizer.  The compact form
    keeps the sorted pair array and per-tile offsets; work-item face ids
    are then one small [W, FB] gather (gather_work_ids).

    Faces spanning more than ``mt`` tiles go to ``glist`` and are
    distributed EXACTLY to the tiles their inflated bbox overlaps via
    ``gt_cum`` (round-2 prepended them to every tile, which put a full
    128-lane work chunk on all NT tiles whenever one face was big —
    ~40% of all kernel work on the 39k bench mesh)."""
    faces_sorted: jnp.ndarray   # [B, F*MT] i32 face ids sorted by tile
    starts: jnp.ndarray         # [B, NT] i32 offset of each tile's run
    counts: jnp.ndarray         # [B, NT] i32 true per-tile counts (pre-cap)
    glist: jnp.ndarray          # [B, GBIG] i32 huge-face list
    gcount: jnp.ndarray         # [B] i32 number of valid glist entries
    gdrop: jnp.ndarray          # [B] i32 big faces DROPPED past the glist cap
    gt_cum: jnp.ndarray         # [B, NT, GBIG] i32 cumulative (over g) count
    #                             of glist faces overlapping each tile
    keys_sorted: jnp.ndarray | None = None
    #   [B, F*MT] i32 the sorted fused keys (tile * stride + face) when
    #   the single-key sort path ran, else None.  Keys are UNIQUE per
    #   (tile, face), so a pair's sorted position is one searchsorted —
    #   prep_pxt uses this to build the gather-based gradient reduction
    #   (the scatter-free inverse of the emission permutation).


CL_MT = 16     # bands/tiles a face may span before it goes global
# Cap on such global faces.  Capped at ONE face block (128): glist
# entries are prepended to EVERY tile's candidate list, so a non-empty
# glist puts at least one work chunk on every tile — the static work-list
# bound (_work_cap_pf) reserves exactly one extra chunk per tile for it.
# A larger cap would multiply that reserved floor (ceil(CL_GBIG/128)
# chunks per tile) in every compile, for a case (>128 faces on screen
# EACH spanning >mt tiles) that is pathological for any tiled
# rasterizer; entries past the cap are DROPPED (counted in gdrop,
# reported via report_overflow).
CL_GBIG = 128


def _tile_ranges(face, image_size, tile_h, tile_w, threshold):
    """Shared bbox -> tile-range computation.  Returns (ty/tx min/max,
    empty) per face."""
    is_ = image_size
    TY = is_ // tile_h
    TX = is_ // tile_w
    thr = jnp.sqrt(jnp.float32(threshold))
    xs = face[..., 0::3]
    ys = face[..., 1::3]
    xmin = jnp.min(xs, -1) - thr
    xmax = jnp.max(xs, -1) + thr
    ymin = jnp.min(ys, -1) - thr
    ymax = jnp.max(ys, -1) + thr
    c_min = jnp.ceil((xmin * is_ + is_ - 1) / 2).astype(jnp.int32)
    c_max = jnp.floor((xmax * is_ + is_ - 1) / 2).astype(jnp.int32)
    r_min = jnp.ceil((is_ - 1 - ymax * is_) / 2).astype(jnp.int32)
    r_max = jnp.floor((is_ - 1 - ymin * is_) / 2).astype(jnp.int32)
    empty = (c_min > c_max) | (c_max < 0) | (c_min > is_ - 1) \
        | (r_max < 0) | (r_min > is_ - 1)
    tx_min = jnp.clip(c_min // tile_w, 0, TX - 1)
    tx_max = jnp.clip(c_max // tile_w, 0, TX - 1)
    ty_min = jnp.clip(r_min // tile_h, 0, TY - 1)
    ty_max = jnp.clip(r_max // tile_h, 0, TY - 1)
    return ty_min, ty_max, tx_min, tx_max, empty, TY, TX


def emit_pairs(face, image_size: int, tile_h: int, tile_w: int,
               threshold: float, mt: int):
    """The (tile, face) pair emission shared by build_tile_lists_compact
    and prep_pxt's gather-map construction: each face emits <= mt pairs
    (row-major over its clipped tile range); faces spanning more than mt
    tiles are 'big' (glist).  Returns (pair_tile [B,F,mt] with invalid ->
    n_tiles, pair_ok [B,F,mt], big [B,F], stride, fused)."""
    B, F, _ = face.shape
    ty_min, ty_max, tx_min, tx_max, empty, TY, TX = _tile_ranges(
        face, image_size, tile_h, tile_w, threshold)
    n_tiles = TY * TX
    nty = ty_max - ty_min + 1
    ntx = tx_max - tx_min + 1
    ntl = nty * ntx
    big = (ntl > mt) & ~empty

    j = jnp.arange(mt, dtype=jnp.int32)
    dy = j[None, None, :] // jnp.maximum(ntx, 1)[..., None]
    dx = j[None, None, :] % jnp.maximum(ntx, 1)[..., None]
    pair_tile = (ty_min[..., None] + dy) * TX + (tx_min[..., None] + dx)
    pair_ok = (j[None, None, :] < jnp.minimum(ntl, mt)[..., None]) & \
        (~empty)[..., None] & (~big)[..., None]
    pair_tile = jnp.where(pair_ok, pair_tile, n_tiles)

    # single fused sort key: tile * stride + face keeps faces ascending
    # within each tile and sorts ONE int32 array instead of a two-operand
    # comparator sort (~2x cheaper on TPU); falls back to the pair sort
    # when (n_tiles+1) * stride would overflow int32
    stride = 1 << (F + 1).bit_length()
    fused = (n_tiles + 1) * stride < 2 ** 31
    return pair_tile, pair_ok, big, stride, fused


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 5))
def build_tile_lists_compact(face: jnp.ndarray, image_size: int, tile_h: int,
                             tile_w: int, threshold: float,
                             mt: int = CL_MT) -> CompactLists:
    """Scatter-free binning: emit <= mt (tile, face) pairs per face, sort
    by tile, keep the sorted run + per-tile offsets.  Faces spanning more
    than mt tiles are prepended to EVERY tile via glist (bounded CL_GBIG;
    the kernel's border check no-ops them where they don't overlap)."""
    B, F, _ = face.shape
    ty_min, ty_max, tx_min, tx_max, empty, TY, TX = _tile_ranges(
        face, image_size, tile_h, tile_w, threshold)
    n_tiles = TY * TX
    pair_tile, pair_ok, big, stride, fused = emit_pairs(
        face, image_size, tile_h, tile_w, threshold, mt)
    pair_face = jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32)[None, :, None],
                                 pair_tile.shape)

    def one(tiles_b, faces_b, big_b):
        gpos = jnp.cumsum(big_b.astype(jnp.int32)) - 1
        gtrue = jnp.sum(big_b.astype(jnp.int32))
        gcount = jnp.minimum(gtrue, CL_GBIG)
        gdest = jnp.where(big_b & (gpos < CL_GBIG), gpos, CL_GBIG)
        glist = jnp.full((CL_GBIG + 1,), -1, jnp.int32).at[gdest].set(
            jnp.arange(F, dtype=jnp.int32), mode='drop')[:CL_GBIG]
        if fused:
            key = tiles_b.reshape(-1) * stride + faces_b.reshape(-1)
            key_s = jax.lax.sort(key)
            tiles_s = key_s // stride
            faces_s = key_s - tiles_s * stride
        else:
            key_s = None
            tiles_s, faces_s = jax.lax.sort(
                (tiles_b.reshape(-1), faces_b.reshape(-1)), num_keys=1,
                is_stable=True)
        starts = jnp.searchsorted(
            tiles_s, jnp.arange(n_tiles, dtype=jnp.int32),
            side='left').astype(jnp.int32)
        ends = jnp.searchsorted(
            tiles_s, jnp.arange(1, n_tiles + 1, dtype=jnp.int32),
            side='left').astype(jnp.int32)
        return (faces_s, starts, ends - starts, glist, gcount,
                gtrue - gcount, key_s if fused else tiles_s)

    fs, st, run_cn, gl, gc, gd, ks = jax.vmap(one)(pair_tile, pair_face, big)

    # exact per-tile distribution of the glist: overlap each big face's
    # inflated-bbox tile range against the tile grid (cheap: GBIG x NT
    # bool), cumsum over the g axis so gather_work_ids can rank-select
    gsafe = jnp.maximum(gl, 0)                                    # [B, GBIG]

    def grng(a):
        return jnp.take_along_axis(a, gsafe, axis=1)

    gty0, gty1 = grng(ty_min), grng(ty_max)
    gtx0, gtx1 = grng(tx_min), grng(tx_max)
    gvalid = gl >= 0
    tys = jnp.arange(TY, dtype=jnp.int32)
    txs = jnp.arange(TX, dtype=jnp.int32)
    oy = ((tys[None, None, :] >= gty0[..., None]) &
          (tys[None, None, :] <= gty1[..., None]))                # [B,G,TY]
    ox = ((txs[None, None, :] >= gtx0[..., None]) &
          (txs[None, None, :] <= gtx1[..., None]))                # [B,G,TX]
    M = (oy[..., :, None] & ox[..., None, :]) & gvalid[..., None, None]
    M = M.reshape(B, CL_GBIG, TY * TX)
    gt_cum = jnp.cumsum(M.astype(jnp.int32), axis=1)              # over g
    counts = run_cn + gt_cum[:, -1, :]
    return CompactLists(faces_sorted=fs, starts=st,
                        counts=counts, glist=gl, gcount=gc, gdrop=gd,
                        gt_cum=jnp.swapaxes(gt_cum, 1, 2),
                        keys_sorted=ks if fused else None)


def gather_work_ids(cl: CompactLists, tile, chunk, fb: int, cap: int):
    """Face ids for work items: ids[w, j] = j-th face of tile[w]'s list
    (this tile's overlapping glist faces first, then the sorted run),
    -1 beyond the (capped) count.

    tile: [W] flat b*NT + t indices; chunk: [W] chunk-within-tile.
    One [W, fb] gather — replaces the dense [NT, cap] table."""
    B, NT = cl.counts.shape
    P = cl.faces_sorted.shape[1]
    b = tile // NT
    tloc = tile - b * NT
    idx = chunk[:, None] * fb + jnp.arange(fb, dtype=jnp.int32)[None, :]
    gcnt_w = cl.gt_cum[..., -1].reshape(B * NT)[tile][:, None]    # [W, 1]
    counts_w = jnp.minimum(cl.counts[b, tloc], cap)[:, None]
    in_g = idx < gcnt_w

    def with_glist(_):
        # rank-select: the j-th glist face overlapping this tile is the
        # first g with cum_t[g] == j+1, i.e. pos = #{g: cum_t[g] < j+1}.
        # The fused broadcast compare-sum vectorizes on TPU (a vmapped
        # searchsorted lowers to an XLA while loop, ~20 ms/frame here).
        cum_t = cl.gt_cum.reshape(B * NT, CL_GBIG)[tile]          # [W, G]
        pos = jnp.sum(
            (cum_t[:, :, None] <= idx[:, None, :]).astype(jnp.int32),
            axis=1)
        return cl.glist.reshape(-1)[
            b[:, None] * CL_GBIG + jnp.clip(pos, 0, CL_GBIG - 1)]

    # most meshes have an empty glist (every face fits the mt span);
    # the cond skips ~6 ms/frame of rank-select gathers in that case
    gval = jax.lax.cond(jnp.max(cl.gcount) > 0, with_glist,
                        lambda _: jnp.zeros_like(idx), 0)
    ssrc = cl.starts[b, tloc][:, None] + idx - gcnt_w
    if fb == 8 and P % 8 == 0:
        # a group's 8 sorted-run positions are consecutive: fetch the
        # TWO 8-wide rows they straddle (row gathers are ~4x cheaper
        # per byte than element gathers on TPU, measured r4) and shift-
        # select by the 0..7 misalignment
        fs2 = jnp.concatenate(
            [cl.faces_sorted.reshape(B, P // 8, 8),
             jnp.zeros((B, 1, 8), jnp.int32)], axis=1)
        # signed floor alignment: in a mixed glist/run group the first
        # lanes sit at NEGATIVE run positions (they take the glist
        # branch and never read sval); floor-division keeps the live
        # lanes' offsets right, and their row r0+1 lands on run row 0
        s0 = ssrc[:, 0]
        r0 = jnp.floor_divide(s0, 8)
        off = s0 - r0 * 8
        i0 = jnp.clip(r0, 0, P // 8)
        i1 = jnp.clip(r0 + 1, 0, P // 8)
        pair = jnp.concatenate([fs2[b, i0], fs2[b, i1]],
                               axis=1)                        # [W, 16]
        sval = jnp.zeros_like(ssrc)
        for k in range(8):
            sval = jnp.where((off == k)[:, None], pair[:, k:k + 8], sval)
    elif fb == 128 and P % 128 == 0:
        fs2 = jnp.concatenate(
            [cl.faces_sorted.reshape(B, P // 128, 128),
             jnp.zeros((B, 1, 128), jnp.int32)], axis=1)
        s0 = ssrc[:, 0]
        r0 = jnp.floor_divide(s0, 128)
        off = s0 - r0 * 128
        i0 = jnp.clip(r0, 0, P // 128)
        i1 = jnp.clip(r0 + 1, 0, P // 128)
        pair = jnp.concatenate([fs2[b, i0], fs2[b, i1]], axis=1)  # [W,256]
        sval = jnp.take_along_axis(
            pair, off[:, None] + jnp.arange(128, dtype=jnp.int32)[None, :],
            axis=1)
    else:
        # per-ELEMENT gather — fb-wide slice gathers (vmapped
        # dynamic_slice or lax.gather with slice_sizes=fb) lower to a
        # SEQUENTIAL while loop on TPU (~95 ms for 64k rows, measured)
        sval = cl.faces_sorted.reshape(-1)[
            b[:, None] * P + jnp.clip(ssrc, 0, P - 1)]
    ids = jnp.where(in_g, gval, sval)
    return jnp.where(idx < counts_w, ids, -1)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def build_tile_lists(face: jnp.ndarray, image_size: int, tile_h: int, tile_w: int,
                     cap: int, threshold: float) -> TileLists:
    """face: [B, F, 9] screen-space face vertices."""
    B, F, _ = face.shape
    is_ = image_size
    TY = is_ // tile_h
    TX = is_ // tile_w
    n_tiles = TY * TX
    thr = jnp.sqrt(jnp.float32(threshold))

    xs = face[..., 0::3]
    ys = face[..., 1::3]
    xmin = jnp.min(xs, -1) - thr
    xmax = jnp.max(xs, -1) + thr
    ymin = jnp.min(ys, -1) - thr
    ymax = jnp.max(ys, -1) + thr

    # pixel-center coords: xp_c = (2c+1-is)/is  (increasing in column c)
    #                      yp_r = (is-1-2r)/is  (decreasing in row r)
    # first/last column whose center is inside [xmin, xmax]:
    c_min = jnp.ceil((xmin * is_ + is_ - 1) / 2).astype(jnp.int32)
    c_max = jnp.floor((xmax * is_ + is_ - 1) / 2).astype(jnp.int32)
    r_min = jnp.ceil((is_ - 1 - ymax * is_) / 2).astype(jnp.int32)
    r_max = jnp.floor((is_ - 1 - ymin * is_) / 2).astype(jnp.int32)

    empty = (c_min > c_max) | (r_min > r_max) | (c_max < 0) | (c_min > is_ - 1) \
        | (r_max < 0) | (r_min > is_ - 1)

    tx_min = jnp.clip(c_min // tile_w, 0, TX - 1)
    tx_max = jnp.clip(c_max // tile_w, 0, TX - 1)
    ty_min = jnp.clip(r_min // tile_h, 0, TY - 1)
    ty_max = jnp.clip(r_max // tile_h, 0, TY - 1)

    # exact (mask+searchsorted) only when the tile grid is small: its cost
    # scales with n_tiles*cap binary searches; the sorted-pairs path is
    # cheaper whenever there are many tiles and handles faces spanning up
    # to MT tiles (huge backdrop faces need the exact path, which small
    # tile grids -- the legacy f_px layout -- provide).
    if n_tiles <= 64:
        # exact path: the [F, n_tiles] overlap mask is small enough; every
        # face lands in every overlapped tile regardless of bbox size.
        tys = jnp.arange(TY, dtype=jnp.int32)
        txs = jnp.arange(TX, dtype=jnp.int32)
        oy = (tys[None, None, :] >= ty_min[..., None]) & (tys[None, None, :] <= ty_max[..., None])
        ox = (txs[None, None, :] >= tx_min[..., None]) & (txs[None, None, :] <= tx_max[..., None])
        mask = (oy[..., :, None] & ox[..., None, :]) & (~empty)[..., None, None]
        mask = mask.reshape(B, F, n_tiles)
        cum = jnp.cumsum(mask.astype(jnp.int32), axis=1)          # [B,F,T]
        counts = cum[:, -1, :]

        def lists_one(cum_b):
            targets = jnp.arange(1, cap + 1, dtype=jnp.int32)

            def per_tile(cum_t):
                return jnp.searchsorted(cum_t, targets, side='left').astype(jnp.int32)

            idx = jax.vmap(per_tile, in_axes=1)(cum_b)            # [T, cap]
            return jnp.where(targets[None, :] <= cum_b[-1][:, None], idx, -1)

        ids = jax.vmap(lists_one)(cum)
        return TileLists(ids=ids, counts=counts)

    # Scatter-light compaction via bounded pair enumeration + sort:
    # each face emits at most MT (tile) candidates from its bbox range
    # (tiny faces span 1-4 tiles; MT=64 covers an 8x8-tile bbox; large
    # meshes are made of small faces, which is when this path is chosen).
    MT = 64
    GBIG = 128   # cap on faces spanning > MT tiles (go into every tile)
    nty = ty_max - ty_min + 1
    ntx = tx_max - tx_min + 1
    ntl = nty * ntx                                               # [B,F]
    big = (ntl > MT) & ~empty

    j = jnp.arange(MT, dtype=jnp.int32)                           # [MT]
    dy = j[None, None, :] // jnp.maximum(ntx, 1)[..., None]
    dx = j[None, None, :] % jnp.maximum(ntx, 1)[..., None]
    pair_tile = (ty_min[..., None] + dy) * TX + (tx_min[..., None] + dx)
    pair_ok = (j[None, None, :] < jnp.minimum(ntl, MT)[..., None]) & \
        (~empty)[..., None] & (~big)[..., None]
    pair_tile = jnp.where(pair_ok, pair_tile, n_tiles)            # sort-to-end key
    pair_face = jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32)[None, :, None],
                                 pair_tile.shape)

    def one(tiles_b, faces_b, big_b):
        # faces spanning > MT tiles (large backdrops) are prepended to
        # EVERY tile's list -- conservative (the kernel's border check
        # no-ops them where they don't overlap), bounded by GBIG
        gpos = jnp.cumsum(big_b.astype(jnp.int32)) - 1
        gcount = jnp.minimum(jnp.sum(big_b.astype(jnp.int32)), GBIG)
        gdest = jnp.where(big_b & (gpos < GBIG), gpos, GBIG)
        glist = jnp.full((GBIG + 1,), -1, jnp.int32).at[gdest].set(
            jnp.arange(F, dtype=jnp.int32), mode='drop')[:GBIG]

        tiles_f = tiles_b.reshape(-1)
        faces_f = faces_b.reshape(-1)
        # stable sort by tile keeps faces ascending within each tile
        tiles_s, faces_s = jax.lax.sort((tiles_f, faces_f), num_keys=1,
                                        is_stable=True)
        starts = jnp.searchsorted(tiles_s, jnp.arange(n_tiles, dtype=jnp.int32),
                                  side='left').astype(jnp.int32)
        ends = jnp.searchsorted(tiles_s, jnp.arange(1, n_tiles + 1, dtype=jnp.int32),
                                side='left').astype(jnp.int32)
        counts_b = ends - starts + gcount
        rank = jnp.arange(tiles_s.shape[0], dtype=jnp.int32)
        pos = rank - starts[jnp.minimum(tiles_s, n_tiles - 1)] + gcount
        dest = jnp.where((tiles_s < n_tiles) & (pos < cap),
                         tiles_s * cap + pos, n_tiles * cap)
        col = jnp.arange(cap, dtype=jnp.int32)
        init = jnp.where(col[None, :] < gcount,
                         glist[jnp.minimum(col, GBIG - 1)][None, :], -1)
        ids_b = jnp.broadcast_to(init, (n_tiles, cap)).reshape(-1)
        ids_b = ids_b.at[dest].set(faces_s, mode='drop')
        return ids_b.reshape(n_tiles, cap), counts_b

    ids, counts = jax.vmap(one)(pair_tile, pair_face, big)
    return TileLists(ids=ids, counts=counts)


class WorkList(NamedTuple):
    """Compacted (tile, face-chunk) work items for the fine kernel.

    Every tile contributes ceil(max(count,1)/FB) consecutive items, so the
    kernel's per-tile accumulators see all chunks of one tile back-to-back.
    Padding items (beyond `num_items`) carry first=last=0 and tile 0.
    """
    tile: jnp.ndarray     # [W] int32 flat tile index (b*NT + t)
    chunk: jnp.ndarray    # [W] int32 chunk index within the tile's list
    first: jnp.ndarray    # [W] int32 1 = first chunk of its tile
    last: jnp.ndarray     # [W] int32 1 = last chunk of its tile
    num_items: jnp.ndarray  # [] int32 true number of items


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def build_work_list(counts: jnp.ndarray, cap: int, fb: int, w_cap: int,
                    skip_empty: bool = False) -> WorkList:
    """counts: [B, NT] true faces per tile (pre-cap).  Returns WorkList with
    static size w_cap (overflow beyond w_cap drops whole chunks — size
    w_cap generously).  skip_empty: tiles with count==0 emit NO items
    (the caller must fill their pixels separately)."""
    B, NT = counts.shape
    c = jnp.minimum(counts.reshape(-1), cap)                     # [B*NT]
    nc = (c + fb - 1) // fb                                      # chunks per tile
    nc = nc if skip_empty else jnp.maximum(nc, 1)
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(nc)[:-1].astype(jnp.int32)])
    total = offs[-1] + nc[-1]

    max_chunks = cap // fb
    tile_ids = jnp.arange(B * NT, dtype=jnp.int32)
    # scatter each tile's chunk range into the flat work arrays
    chunk_iota = jnp.arange(max_chunks, dtype=jnp.int32)[None, :]          # [1,C]
    valid = chunk_iota < nc[:, None]                                       # [BT,C]
    dest = jnp.where(valid, offs[:, None] + chunk_iota, w_cap)             # OOB drop
    flat_dest = dest.reshape(-1)
    tile_src = jnp.broadcast_to(tile_ids[:, None], dest.shape).reshape(-1)
    chunk_src = jnp.broadcast_to(chunk_iota, dest.shape).reshape(-1)
    first_src = (chunk_src == 0).astype(jnp.int32)
    last_src = (chunk_src == jnp.broadcast_to((nc - 1)[:, None], dest.shape).reshape(-1))

    tile = jnp.zeros((w_cap,), jnp.int32).at[flat_dest].set(tile_src, mode='drop')
    chunk = jnp.zeros((w_cap,), jnp.int32).at[flat_dest].set(chunk_src, mode='drop')
    first = jnp.zeros((w_cap,), jnp.int32).at[flat_dest].set(first_src, mode='drop')
    last = jnp.zeros((w_cap,), jnp.int32).at[flat_dest].set(
        last_src.astype(jnp.int32), mode='drop')
    return WorkList(tile=tile, chunk=chunk, first=first, last=last,
                    num_items=total.astype(jnp.int32))


def gather_tile_data(arrs, ids, sentinel_face_index=None):
    """Gather per-face arrays [B,F,C] into per-tile lists [B,T,cap,C].

    Padded slots (-1) gather face 0; callers mask by id >= 0 or rely on
    sentinel face coordinates.
    """
    safe = jnp.maximum(ids, 0)

    def g(a):
        return jax.vmap(lambda ab, ib: ab[ib])(a, safe)

    return [g(a) for a in arrs]
