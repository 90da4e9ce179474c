"""SoftRas Pallas TPU kernels — tile-block-aligned ('pxt') layout.

The pxg layout (pxg_impl.py) packs 8-lane face groups of DIFFERENT tiles
into one 128-lane work item, which makes the kernels lane-efficient but
forces every per-tile combine through XLA glue sized by the STATIC work
cap: per-group partials ([w_cap, T2, 128] ~520 MB at 39k faces), a
segment-sum combine, a separate top-K-threshold kernel reading a second
520 MB depth array, and a backward that gathers per-tile pixel maps into
per-item copies (~716 MB + transpose).  Judge-measured (round 3): ~49 ms
of the 81.8 ms frame was this glue, against ~12 ms of actual kernels.

This layout restructures the work list so that ALL of that glue becomes
kernel-resident state:

  * the padded-compact covered tiles are grouped into BLOCKS of TPI
    consecutive tiles (TPI = 16/8/2 by mesh size — see _tpi_for — so
    block padding stays ~1.1-1.4x); every 128-lane work item belongs to
    exactly ONE block.
  * the forward's output BlockSpec index map (scalar-prefetched block id
    per item) REVISITS the same [TPI, T2, 8] block across the block's
    items: per-tile online-softmax merge happens in VMEM, and the
    per-group partial array + XLA segment combine disappear.
  * the top-K gradient threshold (reference soft_rasterize.py:369-385)
    is bisected IN the forward kernel from a ring slab of the last
    SLAB_R items' candidate-depth rows (a tile spans <= 17 items), with
    MXU-dot rank counting — the separate threshold kernel and its
    [w_cap, T2, 128] int32 depth array disappear.
  * the backward's per-tile pixel maps (colors, softmax stats, upstream
    grads) arrive through a revisited INPUT block [T2, 11*TPI]
    (channel-major lanes) and are expanded group->lane with one exact
    0/1 dot per channel — the 716 MB gather + transpose disappears.

Work that XLA still does: binning (sort + offsets), the per-lane face
data gather (true gather, inherent), the final gradient segment-sums,
and image assembly — all sized by true demand or by the image, not by
pair-slot worst cases.

Reference kernel semantics matched (same chains as pxg/px_f):
forward soft_rasterize.py:136-520, backward :523-1358, top-K threshold
:369-385.  Parity is tested against the jax_impl oracle on the same
sweep as the pxg suite.
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
from .binning import (CL_GBIG, _tile_ranges, build_tile_lists_compact,
                      emit_pairs, gather_work_ids, report_overflow)
from .params import SoftRasParams
from .pallas_impl import (BIG_DEPTH, SENTINEL, _is_tpu, _pair_colors,
                          _pair_terms_kernel, _surface_tex_idx)
from .pxg_impl import (FB, G8, GPI, HIP, THR_INT_MAX, _dot_g, _expand_mat,
                       _first_lane_extract, _group_allreduce, _group_mat,
                       _group_prefix_prod, _knob_jit, _lane_pos, _mt_pxg,
                       _pxg_tile_for)

FWD_CH = 8        # [c0,c1,c2, S|dmin, M|win, alpha, cnt, thr]
SLAB_R = 18       # ring-slab rows: a tile spans <= cap/FB + 1 = 17 items


def _tpi_for(F: int) -> int:
    """Tiles per block: small meshes have few groups per tile, so wider
    blocks keep item padding low (~1.2-1.4x measured on the bench
    meshes); large meshes fill items with 1-2 tiles."""
    env = os.environ.get('JR_PXT_TPI')
    if env:
        return int(env)
    if F <= 512:
        return 16
    if F <= 8192:
        return 8
    # blocks of 2 tiles: ~31 groups vs 32 slots on the bench mesh
    # (~1.1x padding, vs 1.42x at TPI=1 and narrower px/out blocks)
    return 2


def _pxt_caps(F: int, image_size: int, B: int):
    t = _pxg_tile_for(image_size)
    NT = (image_size // t) ** 2
    cap = max(G8, min(F, 2048))
    cap = (cap + G8 - 1) // G8 * G8
    TPI = max(1, min(_tpi_for(F), NT))
    NTP = -(-NT // TPI) * TPI      # per-batch padded-compact tile capacity
    mt = _mt_pxg(F)
    # Groups bound: sorted-path emission + per-tile ceil rounding + glist
    # slack, plus one partially-filled item per nonempty block.  For
    # small-face meshes the static cap assumes an average tile span of 6
    # (measured bench meshes average ~3.8; mt=12 is the worst case) —
    # overflowing items are dropped WITH a report_overflow warning, the
    # same contract as the reference's coarse-to-fine bin caps
    # (soft_rasterize_coarse_to_fine.py:249-258).
    from .pxg_impl import _glist_slack
    cap_mt = mt if F <= 512 else min(mt, 6)
    est_g = B * ((F * cap_mt) // G8 + NT + _glist_slack(F, NT))
    w_cap = (max(GPI, est_g) + GPI - 1) // GPI + B * NTP // TPI
    return t, NT, NTP, cap, TPI, w_cap


@_knob_jit((2, 4, 5))
def prep_pxt(face_vertices, textures, p: SoftRasParams, ty0=None,
             ty_band: int | None = None, ty_stride: int | None = None):
    """Binning + block-aligned work-list + per-lane gather shared by the
    pxt forward and backward.

    Returns a dict:
      ids     [W, 1, 128] i32  per-lane face ids (-1 = padding)
      face/inv/sym/obt/front/tex   [W, C, 128] f32 per-lane face rows
      xy      [W, 2, 128] f32  per-lane tile-base NDC coords
      lt      [W, 1, 128] i32  per-lane local tile (0..TPI-1; TPI = pad)
      blk     [W] i32          block id per item (out/px index maps)
      first   [W] i32          1 = first item of its block (out init)
      thr_nr/thr_l0/thr_l1 [W*TPI] i32  per-(item, lt) tile-end bisect
                               descriptors (nr==0: no tile ends here)
      rawj    [B*NT] i32       padded-compact j -> flat raw tile (B*NT = pad)
      bslot   [Wg] i32         batch index per group slot
      counts  [B, NT] i32      true per-tile demand
      lim     [1] i32          dynamic grid size (clamped to w_cap)
    """
    B, F = face_vertices.shape[:2]
    face = face_vertices.reshape(B, F, 9)
    T = textures.shape[2] if p.texture_type_id == 0 else 3
    tex = textures.reshape(B, F, T * 3)
    is_ = p.image_size
    t, NT, NTP, cap, TPI, w_cap = _pxt_caps(F, is_, B)
    TY = TX = is_ // t
    BNT = B * NT
    NCC = B * NTP
    ncb = NCC // TPI
    wg_cap = w_cap * GPI

    face_inv, face_sym, face_obt = G.face_info_preprocess(face)
    front = G.check_face_frontside(face).astype(jnp.float32)[..., None]

    lists = build_tile_lists_compact(face, is_, t, t, p.threshold,
                                     _mt_pxg(F))
    counts = lists.counts
    if ty_band is not None:
        # pixel-band restriction (sharded rendering): zero the demand of
        # tiles outside this device's band; everything downstream
        # (covered set, blocks, items, dynamic grid) follows.
        #   contiguous (ty_stride None): rows [ty0, ty0+ty_band)
        #   strided: every ty_stride-th row starting at ty0 (round-robin
        #   over devices — flattens band load imbalance, SCALING_ANALYSIS)
        tyv = (jnp.arange(BNT, dtype=jnp.int32) % NT) // TX
        if ty_stride is None:
            in_band = (tyv >= ty0) & (tyv < ty0 + ty_band)
        else:
            in_band = (tyv % ty_stride) == ty0
        counts = jnp.where(in_band.reshape(B, NT), counts, 0)
    c = jnp.minimum(counts.reshape(-1), cap)                     # [BNT]
    ng = (c + G8 - 1) // G8
    covered = ng > 0

    # ---- padded-compact tile order (per-batch padded to TPI) ----------
    rank = jnp.cumsum(covered.astype(jnp.int32)) - 1             # global
    nc_b = covered.reshape(B, NT).sum(axis=1).astype(jnp.int32)  # [B]
    ncp_b = (nc_b + TPI - 1) // TPI * TPI
    pad_off = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(ncp_b - nc_b)[:-1]
                               .astype(jnp.int32)])
    b_of_flat = jnp.arange(BNT, dtype=jnp.int32) // NT
    prank = jnp.where(covered, rank + pad_off[b_of_flat], NCC)   # pad: OOB

    ng_p = jnp.zeros((NCC,), jnp.int32).at[prank].set(ng, mode='drop')
    rawj = jnp.full((NCC,), BNT, jnp.int32).at[prank].set(
        jnp.arange(BNT, dtype=jnp.int32), mode='drop')

    # ---- blocks and items ---------------------------------------------
    Gb = ng_p.reshape(ncb, TPI).sum(axis=1)                      # [ncb]
    items_b = (Gb + GPI - 1) // GPI
    item_offs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                 jnp.cumsum(items_b)[:-1]
                                 .astype(jnp.int32)])
    W_true = (item_offs[-1] + items_b[-1]).astype(jnp.int32)
    lim = jnp.minimum(jnp.maximum(W_true, 1), w_cap).reshape(1)

    barange = jnp.arange(ncb, dtype=jnp.int32)
    seed_at = jnp.where(items_b > 0, item_offs, w_cap)
    blk_seed = jnp.zeros((w_cap,), jnp.int32).at[seed_at].max(
        barange, mode='drop')
    blk_real = jax.lax.cummax(blk_seed)
    iarange = jnp.arange(w_cap, dtype=jnp.int32)
    in_range_i = iarange < W_true
    first = (in_range_i & (iarange == item_offs[blk_real])) \
        .astype(jnp.int32)
    # padding items (only executed by the static CPU-interpret grid)
    # target a DUMP block: a pallas output buffer is flushed whenever the
    # block index changes, so routing pads back to block 0 would
    # overwrite real rows with stale buffer contents on a revisit
    blk = jnp.where(in_range_i, blk_real, ncb)

    # work-item overflow (W_true > w_cap, advisor r4): blocks whose FIRST
    # item lies past the clamped grid never execute, so their output rows
    # are uninitialized.  Route those padded-compact j's to the drop
    # index: the image scatter then leaves their tiles at the init vector
    # (clean dropped-faces degradation, the reference's bin-cap contract,
    # soft_rasterize_coarse_to_fine.py:249-258) instead of copying
    # garbage into covered pixels.  Partially-executed blocks (first item
    # < lim, later items clamped) are initialized by their first item and
    # merely miss face merges — already the intended degradation.
    j_blk = jnp.arange(NCC, dtype=jnp.int32) // TPI
    rawj = jnp.where(item_offs[j_blk] < lim[0], rawj, BNT)

    # ---- per-slot tile / chunk ----------------------------------------
    cs = jnp.cumsum(ng_p.reshape(ncb, TPI), axis=1)
    o_p = (cs - ng_p.reshape(ncb, TPI)).reshape(NCC)             # in-block
    s_j = item_offs[jnp.arange(NCC, dtype=jnp.int32) // TPI] * GPI + o_p

    jarange = jnp.arange(NCC, dtype=jnp.int32)
    slot_seed_at = jnp.where(ng_p > 0, s_j, wg_cap)
    j_seed = jnp.zeros((wg_cap,), jnp.int32).at[slot_seed_at].max(
        jarange, mode='drop')
    j_of_slot = jax.lax.cummax(j_seed)
    sarange = jnp.arange(wg_cap, dtype=jnp.int32)
    blk_s = blk_real[jnp.minimum(sarange // GPI, w_cap - 1)]
    q = sarange - item_offs[blk_s] * GPI
    valid_slot = (q >= 0) & (q < Gb[blk_s]) & (sarange < W_true * GPI)
    j_safe = jnp.minimum(j_of_slot, NCC - 1)
    chunk_g = jnp.where(valid_slot, q - o_p[j_safe], 0)
    raw_s = jnp.where(valid_slot, rawj[j_safe], 0)
    lt_slot = jnp.where(valid_slot, j_safe % TPI, TPI)

    ids_g = gather_work_ids(lists, raw_s, chunk_g, G8, cap)      # [Wg, 8]
    ids_g = jnp.where(valid_slot[:, None], ids_g, -1)

    b_of = raw_s // NT
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
    for jw, cw in enumerate(widths):
        part = gall[..., off:off + cw]
        if jw == 0:
            part = jnp.where((ids_lane < 0)[..., None], SENTINEL, part)
        gathered.append(jnp.swapaxes(part, 1, 2))                # [W,C,128]
        off += cw
    g_face, g_inv, g_sym, g_obt, g_front, g_tex = gathered

    # per-lane tile-base NDC coords.  The kernel adds 2*dx/is_ per
    # pixel; for power-of-two image sizes both terms are exact dyadic
    # values and match the oracle's single-expression (2c+1-is)/is
    # centers bit-for-bit.  For non-power-of-two sizes a 1-ulp shift
    # can flip knife-edge border/texel predicates (advisor r3) — the
    # parity suites' boundary-fraction tolerance covers exactly this.
    tloc = raw_s - b_of * NT
    gty = (tloc // TX).astype(jnp.float32)
    gtx = (tloc - (tloc // TX) * TX).astype(jnp.float32)
    xb = (2.0 * gtx * t + 1.0 - is_) / is_                       # [Wg]
    yb = (is_ - 1.0 - 2.0 * gty * t) / is_
    xy = jnp.stack([
        jnp.repeat(xb.reshape(w_cap, GPI), G8, axis=1),
        jnp.repeat(yb.reshape(w_cap, GPI), G8, axis=1)], axis=1)  # [W,2,128]
    lt_lane = jnp.repeat(lt_slot.reshape(w_cap, GPI), G8,
                         axis=1)[:, None, :].astype(jnp.int32)

    # ---- per-(item, lt) tile-end bisect descriptors -------------------
    fi = s_j // GPI
    li = (s_j + jnp.maximum(ng_p, 1) - 1) // GPI
    end_key = jnp.where((ng_p > 0) & (li < w_cap),
                        li * TPI + (jarange % TPI), w_cap * TPI)
    thr_nr = jnp.zeros((w_cap * TPI,), jnp.int32).at[end_key].set(
        (li - fi + 1), mode='drop')
    thr_l0 = jnp.zeros((w_cap * TPI,), jnp.int32).at[end_key].set(
        s_j * G8, mode='drop')
    thr_l1 = jnp.zeros((w_cap * TPI,), jnp.int32).at[end_key].set(
        (s_j + ng_p) * G8, mode='drop')

    # ---- scatter-free gradient reduction map --------------------------
    # The backward's deterministic atomicAdd replacement used to be ONE
    # segment_sum over all [W*FB] slot rows -- an XLA scatter measured at
    # 7.2 ms/frame on the 39k bench mesh (docs/STAGE_BREAKDOWN_r5.jsonl).
    # But the emission keys (tile * stride + face) are UNIQUE, so each
    # face's <= mt sorted-run rows are locatable by searchsorted into the
    # sorted key array, and the work-list packing (s_j / item_offs) turns
    # (tile, list position) into (item, lane): the scatter becomes a
    # [B, F, mt] gather + sum.  Big (glist) faces are handled in the
    # backward by one bounded 0/1 MXU dot over the glist-prefix lanes.
    mt = _mt_pxg(F)
    if lists.keys_sorted is not None:
        pair_tile, pair_okq, _bigq, stride, _f = emit_pairs(
            face, is_, t, t, p.threshold, mt)
        fidr = jnp.arange(F, dtype=jnp.int32)[None, :, None]
        keyq = pair_tile * stride + fidr                       # [B, F, mt]
        pos = jax.vmap(jnp.searchsorted)(
            lists.keys_sorted, keyq.reshape(B, F * mt))
        pos = pos.astype(jnp.int32).reshape(B, F, mt)
        barange_b = jnp.arange(B, dtype=jnp.int32)[:, None, None]
        flat_t = barange_b * NT + jnp.minimum(pair_tile, NT - 1)
        gt_last = lists.gt_cum[:, :, -1].reshape(BNT)
        q_pos = gt_last[flat_t] + (pos - lists.starts.reshape(BNT)[flat_t])
        jj = prank[flat_t]                                     # NCC if uncovered
        jj_s = jnp.minimum(jj, NCC - 1)
        okq = pair_okq & (q_pos < c[flat_t]) & (jj < NCC) \
            & (item_offs[jj_s // TPI] < lim[0])
        slot = s_j[jj_s] + q_pos // G8
        okq &= slot < lim[0] * GPI                 # rows past the clamped
        w_i = slot // GPI                          # grid are uninitialized
        lane = (slot % GPI) * G8 + (q_pos % G8)
        gsrc = jnp.where(okq, w_i * FB + lane, -1).reshape(B, F * mt)
        # glist-prefix lanes (list position < the tile's glist count)
        gt_s = gt_last[raw_s]                                  # [Wg]
        sub8 = jnp.arange(G8, dtype=jnp.int32)[None, :]
        gl_lane = ((chunk_g[:, None] * G8 + sub8) < gt_s[:, None]) \
            & valid_slot[:, None]
        gmask = gl_lane.reshape(w_cap, FB)
    else:
        gsrc = None
        gmask = None

    report_overflow(counts, cap, W_true, w_cap,
                    where=f'softras pxt {is_}px')
    report_overflow(lists.gdrop[:, None], 0,
                    where=f'softras pxt {is_}px glist')
    return dict(
        ids=ids_lane[:, None, :].astype(jnp.int32), face=g_face, inv=g_inv,
        sym=g_sym, obt=g_obt, front=g_front, tex=g_tex, xy=xy, lt=lt_lane,
        blk=blk, first=first, thr_nr=thr_nr, thr_l0=thr_l0, thr_l1=thr_l1,
        rawj=rawj, bslot=b_of, counts=counts, lim=lim,
        gsrc=gsrc, gmask=gmask, glist=lists.glist,
        gtot=lists.gcount.sum().reshape(1))


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _masked_max_per_lt(x, lt_g, TPI, fill):
    """[T2, GPI] group values -> [T2, TPI] per-local-tile max."""
    cols = []
    for lt in range(TPI):
        m = (lt_g == lt)
        cols.append(jnp.max(jnp.where(m, x, fill), axis=1, keepdims=True))
    return jnp.concatenate(cols, axis=1)


def _masked_min_per_lt(x, lt_g, TPI, fill):
    cols = []
    for lt in range(TPI):
        m = (lt_g == lt)
        cols.append(jnp.min(jnp.where(m, x, fill), axis=1, keepdims=True))
    return jnp.concatenate(cols, axis=1)


def _dot_lt(x, gselT, scale=None):
    """Exact per-local-tile sum: [T2, GPI] @ gselT[TPI, GPI] -> [T2, TPI].
    ``scale`` (per-group [T2, GPI]) is folded into the lhs."""
    if scale is not None:
        x = x * scale
    return jax.lax.dot_general(x, gselT, (((1,), (1,)), ((), ())),
                               precision=HIP,
                               preferred_element_type=jnp.float32)


def _make_fwd_kernel_pxt(p: SoftRasParams, T: int, TPI: int, w_cap: int,
                         with_thr: bool):
    """Accumulates per-tile aggregates directly into the revisited
    [FWD_CH, TPI, T2] output block (channels on sublanes: full-vreg
    rows, no partial-lane writes); optionally maintains a ring slab of
    candidate-depth rows and ternary-searches the top-K threshold at
    each tile's last item with PACKED 2-mid rank counting (both mids
    share one lane reduction per round)."""
    is_ = p.image_size
    t = _pxg_tile_for(is_)
    T2 = t * t
    kf = float(p.max_faces_id)

    def kernel(lim_s, blk_s, first_s, nr_s, l0_s, l1_s,
               ids_ref, face_ref, inv_ref, sym_ref, obt_ref,
               front_ref, tex_ref, xy_ref, lt_ref, out_ref, *scratch):
        i = pl.program_id(0)
        slab = scratch[0] if with_thr else None

        @pl.when(first_s[i] == 1)
        def _init():
            z = jnp.zeros((1, TPI, T2), jnp.float32)
            if p.rgb_func_id == 1:
                c3 = jnp.ones((1, TPI, T2), jnp.float32)   # S (bg candidate)
                c4 = jnp.full((1, TPI, T2), p.eps, jnp.float32)  # M
            else:
                c3 = jnp.full((1, TPI, T2), BIG_DEPTH, jnp.float32)
                c4 = jnp.full((1, TPI, T2), jnp.float32(2 ** 30), jnp.float32)
            c5 = jnp.ones((1, TPI, T2), jnp.float32) \
                if p.alpha_func_id == 2 else z
            out_ref[0] = jnp.concatenate(
                [z, z, z, c3, c4, c5, z,
                 jnp.full((1, TPI, T2), BIG_DEPTH, jnp.float32)], axis=0)

        face = face_ref[0]
        inv = inv_ref[0]
        sym = sym_ref[0]
        obt = obt_ref[0]
        front = front_ref[0]                     # [1, FB]
        tex = tex_ref[0]                         # [T*3, FB]
        ids = ids_ref[0]                         # [1, FB]
        xb = xy_ref[0, 0:1, :]
        yb = xy_ref[0, 1:2, :]
        lt_row = lt_ref[0]                       # [1, FB] i32

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

        # group -> local tile selector (exact 0/1 dot matrix)
        lt_g_f = _first_lane_extract(
            lt_row.astype(jnp.float32), gm)                     # [1, GPI]
        lt_g = lt_g_f.astype(jnp.int32)                         # [1, GPI]
        it = jax.lax.broadcasted_iota(jnp.int32, (TPI, GPI), 0)
        gselT = (it == lt_g).astype(jnp.float32)                # [TPI, GPI]

        cand = tk_valid & (ids >= 0)

        if with_thr:
            slab[i % SLAB_R] = jnp.where(
                cand, jax.lax.bitcast_convert_type(zp, jnp.int32),
                THR_INT_MAX)

        old = out_ref[0]                         # [FWD_CH, TPI, T2]

        # ---- alpha ----------------------------------------------------
        sf_a = jnp.where(alpha_valid, sf, 0.0)
        lt_gb = jnp.broadcast_to(lt_g, (T2, GPI))
        if p.alpha_func_id == 0:
            m = (alpha_valid & (sf > 0.5)).astype(jnp.float32)
            a16 = jnp.minimum(
                _dot_g(m, gm, precision=jax.lax.Precision.DEFAULT), 1.0)
            a_t = _masked_max_per_lt(a16, lt_gb, TPI, 0.0)
        elif p.alpha_func_id == 1:
            a16 = _dot_g(sf_a, gm)
            a_t = _dot_lt(a16, gselT)
        else:
            pos = _lane_pos()
            px_ = _group_prefix_prod(1.0 - sf_a)
            a16 = _dot_g(jnp.where(pos == G8 - 1, px_, 0.0), gm)
            # padding groups contribute factor 1
            prod = jnp.where(lt_gb < TPI, a16, 1.0)
            cols = []
            for lt in range(TPI):
                x = jnp.where(lt_gb == lt, prod, 1.0)
                r = x[:, 0:1]
                for g in range(1, GPI):
                    r = r * x[:, g:g + 1]
                cols.append(r)
            a_t = jnp.concatenate(cols, axis=1)

        side_ok = (front > 0.5) if not p.fill_back else None
        zcol = jnp.zeros((T2, TPI), jnp.float32)

        # ---- per-tile aggregate channels in [T2, TPI] ------------------
        if p.rgb_func_id == 1:
            rgb_valid = tk_valid if p.fill_back else (tk_valid & side_ok)
            zpn = (p.far - zp) / (p.far - p.near)
            zpn_m = jnp.where(rgb_valid, zpn, -1e30)
            M_lane = _group_allreduce(zpn_m, jnp.maximum, -1e30)
            expz = jnp.where(rgb_valid,
                             jnp.exp((zpn - M_lane) / p.gamma_val) * sf, 0.0)
            colors = _pair_colors(tex, terms, p, T, perspective=True,
                                  layout='pxg')
            Mg = _first_lane_extract(M_lane, gm)                # [T2, GPI]
            Mg = jnp.where(lt_gb < TPI, Mg, -1e30)

            M_oldT = jax.lax.transpose(old[4], (1, 0))          # [T2, TPI]
            M_new = _masked_max_per_lt(Mg, lt_gb, TPI, -1e30)
            M_cb = jnp.maximum(M_oldT, M_new)                   # [T2, TPI]
            # rescale each group's sums to the combined max
            M_cb_g = _dot_lt_gather(M_cb, gselT)                # [T2, GPI]
            scale_g = jnp.exp((Mg - M_cb_g) / p.gamma_val)
            # ONE group dot and ONE tile dot for all value channels
            # (pipeline fill/drain overheads dominate these small MXU
            # dots, so channels ride the sublane dimension together)
            packed_g = _dot_g(jnp.concatenate(
                [expz * colors[0], expz * colors[1], expz * colors[2],
                 expz, cand.astype(jnp.float32)], axis=0), gm)  # [5T2, GPI]
            sc5 = jnp.concatenate(
                [scale_g, scale_g, scale_g, scale_g,
                 (lt_gb < TPI).astype(jnp.float32)], axis=0)
            packed_t = _dot_lt(packed_g, gselT, sc5)            # [5T2, TPI]
            cnt_t = packed_t[4 * T2:]
            X = [packed_t[0:T2], packed_t[T2:2 * T2],
                 packed_t[2 * T2:3 * T2], packed_t[3 * T2:4 * T2],
                 M_cb, a_t, cnt_t, zcol]
        elif p.rgb_func_id == 0:
            cnt_t = _dot_lt(_dot_g(cand.astype(jnp.float32), gm), gselT)
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
            rgb_g = [_dot_g(onehot * colors[k], gm) for k in range(3)]
            dmin_g = _first_lane_extract(dmin_lane, gm)
            dmin_g = jnp.where(lt_gb < TPI, dmin_g, BIG_DEPTH)
            id_g = _first_lane_extract(idsel, gm)
            id_g = jnp.where(lt_gb < TPI, id_g, jnp.float32(2 ** 30))

            dmin_t = _masked_min_per_lt(dmin_g, lt_gb, TPI, BIG_DEPTH)
            id_cols, rgb_cols = [], [[], [], []]
            for lt in range(TPI):
                mlt = lt_gb == lt
                d_t = dmin_t[:, lt:lt + 1]
                on_min = mlt & (dmin_g == d_t) & (dmin_g < BIG_DEPTH)
                idk2 = jnp.where(on_min, id_g, jnp.float32(2 ** 30))
                id_t = jnp.min(idk2, axis=1, keepdims=True)
                pick = (on_min & (id_g == id_t)).astype(jnp.float32)
                id_cols.append(id_t)
                for k in range(3):
                    rgb_cols[k].append(
                        jnp.sum(rgb_g[k] * pick, axis=1, keepdims=True))
            X = [jnp.concatenate(rgb_cols[0], axis=1),
                 jnp.concatenate(rgb_cols[1], axis=1),
                 jnp.concatenate(rgb_cols[2], axis=1),
                 dmin_t, jnp.concatenate(id_cols, axis=1),
                 a_t, cnt_t, zcol]
        else:
            cnt_t = _dot_lt(_dot_g(cand.astype(jnp.float32), gm), gselT)
            X = [zcol, zcol, zcol, zcol, zcol, a_t, cnt_t, zcol]

        # one [T2, CH*TPI] -> [CH*TPI, T2] transpose puts every channel
        # into vreg-row orientation; all merges below are full-row ops
        Xt = jax.lax.transpose(
            jnp.concatenate(X, axis=1), (1, 0)).reshape(FWD_CH, TPI, T2)

        # ---- merge with the resident block (all [TPI, T2] rows) --------
        if p.rgb_func_id == 1:
            so = jnp.exp((old[4] - Xt[4]) / p.gamma_val)
            new = jnp.stack([
                old[0] * so + Xt[0],
                old[1] * so + Xt[1],
                old[2] * so + Xt[2],
                old[3] * so + Xt[3],
                Xt[4],
                _alpha_merge(p, old[5], Xt[5]),
                old[6] + Xt[6],
                old[7]], axis=0)
        elif p.rgb_func_id == 0:
            better = (Xt[3] < old[3]) | ((Xt[3] == old[3]) & (Xt[4] < old[4]))
            new = jnp.stack([
                jnp.where(better, Xt[0], old[0]),
                jnp.where(better, Xt[1], old[1]),
                jnp.where(better, Xt[2], old[2]),
                jnp.minimum(Xt[3], old[3]),
                jnp.where(better, Xt[4], old[4]),
                _alpha_merge(p, old[5], Xt[5]),
                old[6] + Xt[6],
                old[7]], axis=0)
        else:
            new = jnp.stack([
                old[0], old[1], old[2], old[3], old[4],
                _alpha_merge(p, old[5], Xt[5]),
                old[6] + Xt[6],
                old[7]], axis=0)
        out_ref[0] = new

        # ---- top-K threshold at each ending tile ----------------------
        if with_thr:
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, FB), 1)

            def _bisect_body(lt, nr, tslab):
                L0 = l0_s[i * TPI + lt]
                L1 = l1_s[i * TPI + lt]

                def lane_ok(r):
                    ie = i - nr + 1 + r
                    gl = ie * FB + lane
                    return (gl >= L0) & (gl < L1)

                # transpose the tile's candidate rows ONCE (pixels to
                # lanes): every bisection round then counts ranks with
                # plain sublane adds instead of a 7-step lane shuffle
                # tree (the round-dominant cost of the previous form)
                def put(r, _):
                    vm = jnp.where(lane_ok(r),
                                   slab[(i - nr + 1 + r) % SLAB_R],
                                   THR_INT_MAX)
                    tslab[pl.ds(r * FB, FB), :] = jax.lax.transpose(
                        vm, (1, 0))
                    return 0
                jax.lax.fori_loop(0, nr, put, 0)

                def mm(r, lh):
                    lo, hi = lh
                    vm = tslab[pl.ds(r * FB, FB), :]          # [FB, T2]
                    lo = jnp.minimum(lo, jnp.min(vm, 0, keepdims=True))
                    hi = jnp.maximum(
                        hi, jnp.max(jnp.where(vm == THR_INT_MAX, 0, vm),
                                    0, keepdims=True))
                    return lo, hi
                lo0 = jnp.full((1, T2), THR_INT_MAX, jnp.int32)
                hi0 = jnp.zeros((1, T2), jnp.int32)
                lo0, hi0 = jax.lax.fori_loop(0, nr, mm, (lo0, hi0))
                lo0 = jnp.minimum(lo0 - 1, hi0)

                def cond(lh):
                    lo, hi = lh
                    return jnp.any(lo < hi)

                def body(lh):
                    # ternary step, both rank counts packed into ONE
                    # f32 sublane reduction: fields c1 + 4096*c2 stay
                    # exact (<= SLAB_R*128 per field, sum < 2^24)
                    lo, hi = lh
                    d3 = (hi - lo) // 3
                    m1 = lo + d3                             # [1, T2]
                    m2 = hi - d3

                    def cs(r, acc):
                        v = tslab[pl.ds(r * FB, FB), :]
                        e = jnp.where(v <= m1, 1.0, 0.0) + \
                            jnp.where(v <= m2, 4096.0, 0.0)
                        return acc + jnp.sum(e, axis=0, keepdims=True)
                    sgm = jax.lax.fori_loop(
                        0, nr, cs, jnp.zeros((1, T2), jnp.float32))
                    c2 = jnp.floor(sgm * (1.0 / 4096.0))
                    c1 = sgm - c2 * 4096.0
                    ge1 = c1 >= kf
                    ge2 = c2 >= kf
                    nlo = jnp.where(ge1, lo,
                                    jnp.where(ge2, m1 + 1, m2 + 1))
                    nhi = jnp.where(ge1, m1, jnp.where(ge2, m2, hi))
                    return (nlo, nhi)

                _, hi = jax.lax.while_loop(cond, body, (lo0, hi0))
                need = new[6, lt:lt + 1, :] > kf             # [1, T2]
                thr = jnp.where(
                    need, jax.lax.bitcast_convert_type(hi, jnp.float32),
                    p.far)
                out_ref[0, 7, lt:lt + 1, :] = thr

            for lt in range(TPI):
                nr = nr_s[i * TPI + lt]

                @pl.when(nr > 0)
                def _bisect(lt=lt, nr=nr):
                    out_ref[0, 7, lt:lt + 1, :] = jnp.full(
                        (1, T2), p.far, jnp.float32)

                    # bisect ONLY overfull tiles: when every pixel has
                    # <= K candidates the threshold never binds (thr =
                    # far) — on sparse meshes this skips almost every
                    # tile (the role of the pxg thr kernel's n_over
                    # compaction)
                    @pl.when(jnp.max(new[6, lt:lt + 1, :]) > kf)
                    def _run(lt=lt, nr=nr):
                        _bisect_body(lt, nr, scratch[1])

    return kernel


def _alpha_merge(p: SoftRasParams, old, new):
    if p.alpha_func_id == 0:
        return jnp.maximum(old, new)
    if p.alpha_func_id == 1:
        return old + new
    return old * new


def _dot_lt_gather(x_t, gselT):
    """Per-group gather of a per-local-tile value: [T2, TPI] -> [T2, GPI]
    via the transposed exact 0/1 dot."""
    return jax.lax.dot_general(x_t, gselT, (((1,), (0,)), ((), ())),
                               precision=HIP,
                               preferred_element_type=jnp.float32)


def _in_specs_pxt(T: int):
    def spec(c, dtype_i32=False):
        return pl.BlockSpec((1, c, FB), lambda i, *s: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return [spec(1), spec(9), spec(9), spec(9), spec(3), spec(1),
            spec(T * 3), spec(2), spec(1)]


def _grid_steps(lim, w_cap):
    if _is_tpu() and os.environ.get('JR_DYN_GRID', '1') == '1':
        return lim[0]
    return w_cap


NUM_SCALARS = 6   # lim, blk, first, thr_nr, thr_l0, thr_l1


# ---------------------------------------------------------------------------
# forward entry
# ---------------------------------------------------------------------------

@_knob_jit((2, 3, 6, 7, 8))
def soft_rasterize_fwd_pxt(face_vertices, textures, p: SoftRasParams,
                           with_thr: bool = False, prep=None, ty0=None,
                           ty_band: int | None = None, vma=None,
                           ty_stride: int | None = None):
    """Returns (out [B,4,H,W], aggrs [B,2,H,W], aux [B,2,H,W]).

    aux[:, 0] = per-pixel candidate count (reference q_size); aux[:, 1] =
    top-K gradient threshold when with_thr (far where under K)."""
    B, F = face_vertices.shape[:2]
    is_ = p.image_size
    t, NT, NTP, cap, TPI, w_cap = _pxt_caps(F, is_, B)
    TY = TX = is_ // t
    T2 = t * t
    BNT = B * NT
    NCC = B * NTP
    ncb = NCC // TPI

    if prep is None:
        prep = prep_pxt(face_vertices, textures, p, ty0, ty_band, ty_stride)
    T = textures.shape[2] if p.texture_type_id == 0 else 3

    kernel = _make_fwd_kernel_pxt(p, T, TPI, w_cap, with_thr)
    T2_ = t * t
    out_specs = [pl.BlockSpec(
        (1, FWD_CH, TPI, T2),
        lambda i, lim_s, blk_s, *s: (blk_s[i], 0, 0, 0),
        memory_space=pltpu.VMEM)]
    # +1: dump block for padding items (static CPU-interpret grid only)
    out_shapes = [jax.ShapeDtypeStruct((ncb + 1, FWD_CH, TPI, T2),
                                       jnp.float32, vma=vma)]
    scratch = [pltpu.VMEM((SLAB_R, T2, FB), jnp.int32),
               pltpu.VMEM((SLAB_R * FB, T2_), jnp.int32)] if with_thr \
        else []

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=NUM_SCALARS,
        grid=(_grid_steps(prep['lim'], w_cap),),
        in_specs=_in_specs_pxt(T),
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    (rows,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=not _is_tpu(),
    )(prep['lim'], prep['blk'], prep['first'], prep['thr_nr'],
      prep['thr_l0'], prep['thr_l1'],
      prep['ids'], prep['face'], prep['inv'], prep['sym'], prep['obt'],
      prep['front'], prep['tex'], prep['xy'], prep['lt'])

    # ---- scatter padded-compact rows back to raw tiles + finalize -----
    rows = rows[:ncb].transpose(0, 2, 3, 1).reshape(NCC, T2, FWD_CH)
    if p.rgb_func_id == 1:
        init = jnp.zeros((FWD_CH,), jnp.float32).at[3].set(1.0) \
            .at[4].set(p.eps).at[7].set(BIG_DEPTH)
    else:
        init = jnp.zeros((FWD_CH,), jnp.float32).at[3].set(BIG_DEPTH) \
            .at[4].set(2.0 ** 30).at[7].set(BIG_DEPTH)
    if p.alpha_func_id == 2:
        init = init.at[5].set(1.0)
    raw = jnp.broadcast_to(init, (BNT, T2, FWD_CH)) \
        .at[jnp.minimum(prep['rawj'], BNT)].set(rows, mode='drop')

    counts = prep['counts']
    if ty_band is not None:
        # band-local outputs: slice the band's tile rows before assembly
        # (strided: gather rows ty0, ty0+stride, ... — the band image
        # stacks them in that order; parallel.render re-interleaves)
        if ty_stride is None:
            raw = jax.lax.dynamic_slice_in_dim(
                raw.reshape(B, NT, T2, FWD_CH), ty0 * TX, ty_band * TX,
                axis=1).reshape(B * ty_band * TX, T2, FWD_CH)
            counts = jax.lax.dynamic_slice_in_dim(counts, ty0 * TX,
                                                  ty_band * TX, axis=1)
        else:
            ridx = ty0 + ty_stride * jnp.arange(ty_band, dtype=jnp.int32)
            fidx = (ridx[:, None] * TX
                    + jnp.arange(TX, dtype=jnp.int32)[None, :]).reshape(-1)
            raw = jnp.take(raw.reshape(B, NT, T2, FWD_CH), fidx,
                           axis=1).reshape(B * ty_band * TX, T2, FWD_CH)
            counts = jnp.take(counts, fidx, axis=1)
        TY = ty_band
        BNT = B * ty_band * TX
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
        rgb = raw[..., 0:3]
        idw = jnp.where(raw[..., 4] > jnp.float32(2 ** 29), -1.0,
                        raw[..., 4])
        aggrs_t = jnp.stack([raw[..., 3], idw], axis=-1)
    else:
        bg = jnp.asarray(p.background_color, jnp.float32)
        rgb = jnp.broadcast_to(bg, (BNT, T2, 3))
        aggrs_t = jnp.zeros((BNT, T2, 2), jnp.float32)
    out_t = jnp.concatenate([rgb, alpha[..., None]], axis=-1)
    thr_t = raw[..., 7]

    from .pxg_impl import _rows_to_image
    out = _rows_to_image(out_t, B, TY, TX, t)
    aggrs = _rows_to_image(aggrs_t, B, TY, TX, t)
    aux = _rows_to_image(jnp.stack([cnt_t, thr_t], axis=-1), B, TY, TX, t)

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

BWD_PC = 11   # out r/g/b/a | softmax sum/max | grad r/g/b/a | thr


def _make_bwd_kernel_pxt(p: SoftRasParams, T: int, F_total: int, TPI: int,
                         use_thr: bool):
    """Grouped-lane backward with the per-tile pixel maps read from a
    revisited [T2, BWD_PC*TPI] input block (channel-major lanes) and
    expanded group->lane with one exact 0/1 dot per channel.

    Mirrors the pxg backward math (same reference chains,
    soft_rasterize.py:523-1358)."""
    is_ = p.image_size
    t = _pxg_tile_for(is_)
    T2 = t * t

    def kernel(lim_s, blk_s, first_s, nr_s, l0_s, l1_s,
               ids_ref, face_ref, inv_ref, sym_ref, obt_ref,
               front_ref, tex_ref, xy_ref, lt_ref, px_ref, gout_ref):
        tex_rows = [None] * (T * 3)
        face = face_ref[0]
        inv = inv_ref[0]
        sym = sym_ref[0]
        obt = obt_ref[0]
        tex = tex_ref[0]
        ids = ids_ref[0]                          # [1, FB]
        xb = xy_ref[0, 0:1, :]
        yb = xy_ref[0, 1:2, :]
        lt_row = lt_ref[0]                        # [1, FB] i32
        px = px_ref[0]                            # [T2, BWD_PC*TPI]

        it = jax.lax.broadcasted_iota(jnp.int32, (TPI, FB), 0)
        em = (it == lt_row).astype(jnp.float32)   # [TPI, FB]

        def pxe(c):
            # local-tile channel -> per-lane [T2, FB] (exact 0/1 dot;
            # padding lanes carry lt == TPI -> zero column).  NOTE: a
            # single channel-stacked [BWD_PC*T2, TPI] dot measured
            # SLOWER end-to-end: a TPI-wide HBM lane dim is padded to
            # 128 by the TPU layout engine (~3 GB phantom array)
            return jax.lax.dot_general(
                px[:, c * TPI:(c + 1) * TPI], em, (((1,), (0,)), ((), ())),
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
            # padding lanes read the zero px column: clamp S so the
            # 0-exp / 0-sum quotient stays 0 instead of NaN
            softmax_sum = jnp.maximum(pxe(4), 1e-30)
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
                    tr = [tex[ti * 3 + c:ti * 3 + c + 1, :]
                          for c in range(3)]
                    S = S + jnp.where(
                        m_ti,
                        g3[0] * tr[0] + g3[1] * tr[1] + g3[2] * tr[2], 0.0)
                    for c in range(3):
                        tex_rows[ti * 3 + c] = jnp.sum(
                            jnp.where(m_ti, gcoef[c], 0.0), axis=0,
                            keepdims=True)
            else:
                # the reference backward reconstructs vertex colors
                # WITHOUT perspective correction (clipped barycentrics
                # only — soft_rasterize.py grad chain)
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
                        tex_rows[ti * 3 + c] = jnp.sum(
                            jnp.where(m_ti, gcoef[c], 0.0), axis=0,
                            keepdims=True)
            else:
                for ci in range(3):
                    w_ci = tex_coef * wc[ci]
                    for c in range(3):
                        tex_rows[ci * 3 + c] = jnp.sum(
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

        # one [GC, FB] -> [FB, GC] transpose: slot rows land contiguous
        # for the face-major gather reduction (no unsorted scatter)
        gall = jnp.concatenate(face_rows + tex_rows, axis=0)
        gout_ref[0] = jax.lax.transpose(gall, (1, 0))

    return kernel


@_knob_jit((6, 9, 10, 11))
def soft_rasterize_bwd_pxt(face_vertices, textures, soft_colors,
                           aggrs_info, aux, grad_soft_colors,
                           p: SoftRasParams, prep=None, ty0=None,
                           ty_band: int | None = None, vma=None,
                           ty_stride: int | None = None):
    B, F = face_vertices.shape[:2]
    is_ = p.image_size
    t, NT, NTP, cap, TPI, w_cap = _pxt_caps(F, is_, B)
    TY = TX = is_ // t
    T2 = t * t
    BNT = B * NT
    NCC = B * NTP
    ncb = NCC // TPI

    if prep is None:
        prep = prep_pxt(face_vertices, textures, p, ty0, ty_band, ty_stride)
    T = textures.shape[2] if p.texture_type_id == 0 else 3
    use_thr = p.grad_mode == 'topk' and p.max_faces_id < F

    # per-tile pixel rows in padded-compact block order, channel-major
    # lanes: px_hbm[beta, s, c*TPI + lt].  In band mode the pixel maps
    # are band-local; padded-compact j's raw tile ids map into them by
    # subtracting the band origin.
    TYv = TY if ty_band is None else ty_band
    NTv = NT if ty_band is None else ty_band * TX
    pximg = jnp.concatenate([soft_colors, aggrs_info, grad_soft_colors,
                             aux[:, 1:2]], axis=1)
    px_rows = pximg.reshape(B, BWD_PC, TYv, t, TX, t) \
        .transpose(0, 2, 4, 3, 5, 1).reshape(B * NTv, T2, BWD_PC)
    rawj = prep['rawj']
    if ty_band is not None:
        b_of_j = jnp.minimum(rawj // NT, B - 1)
        tloc = rawj - b_of_j * NT
        if ty_stride is None:
            local = tloc - ty0 * TX
        else:
            # band-local row k of tile-row ty = (ty - ty0)/stride == ty//s
            tyv = tloc // TX
            local = (tyv // ty_stride) * TX + (tloc - tyv * TX)
        rawj = jnp.where(rawj < BNT, b_of_j * NTv + local, B * NTv)
    rawj_safe = jnp.clip(rawj, 0, B * NTv - 1)
    px_hbm = px_rows[rawj_safe].reshape(ncb, TPI, T2, BWD_PC) \
        .transpose(0, 2, 3, 1).reshape(ncb, T2, BWD_PC * TPI)
    # +1: dump row fetched by padding items (CPU-interpret static grid)
    px_hbm = jnp.concatenate(
        [px_hbm, jnp.zeros((1, T2, BWD_PC * TPI), jnp.float32)], axis=0)

    GC = 9 + T * 3
    kernel = _make_bwd_kernel_pxt(p, T, F, TPI, use_thr)
    in_specs = _in_specs_pxt(T) + [
        pl.BlockSpec((1, T2, BWD_PC * TPI),
                     lambda i, lim_s, blk_s, *s: (blk_s[i], 0, 0),
                     memory_space=pltpu.VMEM)]
    out_specs = [
        pl.BlockSpec((1, FB, GC), lambda i, *s: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((w_cap, FB, GC), jnp.float32, vma=vma),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=NUM_SCALARS,
        grid=(_grid_steps(prep['lim'], w_cap),),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[],
    )
    (gslots,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=not _is_tpu(),
    )(prep['lim'], prep['blk'], prep['first'], prep['thr_nr'],
      prep['thr_l0'], prep['thr_l1'],
      prep['ids'], prep['face'], prep['inv'], prep['sym'], prep['obt'],
      prep['front'], prep['tex'], prep['xy'], prep['lt'], px_hbm)

    # deterministic atomicAdd replacement (soft_rasterize.py:1349-1358).
    # Default path: gather-based -- each face SUMS its own <= mt slot
    # rows through prep['gsrc'] (the inverse of the binning emission,
    # see prep_pxt), so no scatter touches the [W*FB, GC] rows (the old
    # single segment_sum was a 7.2 ms/frame XLA scatter on the 39k bench
    # mesh).  Big (glist) faces' rows sit in the glist-prefix lanes of
    # every tile they overlap: one bounded exact 0/1 MXU dot reduces
    # them, executed only when a face actually went global (lax.cond).
    ids_w = prep['ids'][:, 0, :]                              # [W, FB]
    b_lane = jnp.repeat(prep['bslot'].reshape(w_cap, GPI), G8, axis=1)
    segf = jnp.where(ids_w >= 0, b_lane * F + ids_w, B * F)
    gsrc = prep.get('gsrc')
    if gsrc is not None:
        mt = _mt_pxg(F)
        rows_flat = gslots.reshape(w_cap * FB, GC)
        take = jnp.clip(gsrc, 0, w_cap * FB - 1)
        got = jnp.where((gsrc >= 0)[..., None], rows_flat[take], 0.0)
        g_fm = got.reshape(B, F, mt, GC).sum(axis=2)
        glist = prep['glist']                                 # [B, GBIG]
        targets = jnp.where(
            glist >= 0,
            jnp.arange(B, dtype=jnp.int32)[:, None] * F
            + jnp.maximum(glist, 0), B * F).reshape(-1)

        def _gl(_):
            sel = prep['gmask'] & (ids_w >= 0)
            rowsg = jnp.where(sel[..., None], gslots, 0.0).reshape(-1, GC)
            onehot = (segf.reshape(-1)[:, None] == targets[None, :]
                      ).astype(jnp.float32)
            return jax.lax.dot_general(
                onehot, rowsg, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)

        gl_sum = jax.lax.cond(
            prep['gtot'][0] > 0, _gl,
            lambda _: jnp.zeros((targets.shape[0], GC), jnp.float32), 0)
        g_fm = g_fm.reshape(B * F, GC).at[targets].add(
            gl_sum, mode='drop').reshape(B, F, GC)
    else:
        # non-fused-key fallback (huge F x tile products): the scatter
        act = (ids_w >= 0)[..., None]
        rows = jnp.where(act, gslots, 0.0)
        g_fm = jax.ops.segment_sum(rows.reshape(-1, GC), segf.reshape(-1),
                                   num_segments=B * F).reshape(B, F, GC)
    gf = g_fm[..., :9]
    gt = g_fm[..., 9:]
    return (gf.reshape(face_vertices.shape), gt.reshape(textures.shape))
