"""Shared geometric primitives of the SoftRas rasterizer (pure JAX).

These reproduce, in broadcast/vectorized form, the CUDA device functions of
the reference kernels (jrender/renderer/dr/softras/cuda/soft_rasterize.py):
  * face_info preprocess (face_inv/face_sym/face_obt) -- :176-236
  * barycentric_coordinate -- :21
  * check_border -- :29 / check_face_frontside -- :37
  * forward_barycentric_p2f_distance -- :150
  * euclidean_p2f_distance -- :57-147 (with obtuse-vertex casework)
  * barycentric_clip -- :50, perspective depth -- :364
  * forward_sample_texture -- :156-173

Everything works on arrays whose last axes are the face-local dims, with
arbitrary leading broadcast dims, so both the jnp oracle and the Pallas
kernels can call them.
"""
from __future__ import annotations

import jax.numpy as jnp


def _safe_div(a, b, eps=1e-30):
    """Division that never produces NaN/Inf from a zero denominator.

    The reference lets degenerate faces produce inf; we clamp so that the
    non-selected branch of a jnp.where cannot poison gradients.
    """
    b_safe = jnp.where(jnp.abs(b) < eps, jnp.where(b < 0, -eps, eps), b)
    return a / b_safe


def face_info_preprocess(face: jnp.ndarray):
    """Compute (face_inv [...,9], face_sym [...,9], face_obt [...,3]) from face [...,9].

    face layout: [x0,y0,z0, x1,y1,z1, x2,y2,z2].
    """
    x0, y0 = face[..., 0], face[..., 1]
    x1, y1 = face[..., 3], face[..., 4]
    x2, y2 = face[..., 6], face[..., 7]

    inv_star = jnp.stack([
        y1 - y2, x2 - x1, x1 * y2 - x2 * y1,
        y2 - y0, x0 - x2, x2 * y0 - x0 * y2,
        y0 - y1, x1 - x0, x0 * y1 - x1 * y0,
    ], axis=-1)
    det = x2 * (y0 - y1) + x0 * (y1 - y2) + x1 * (y2 - y0)
    det = jnp.where(det > 0, jnp.maximum(det, 1e-10), jnp.minimum(det, -1e-10))
    face_inv = inv_star / det[..., None]

    # F*F^T + 1 restricted to xy (9 values)
    px = jnp.stack([x0, x1, x2], axis=-1)
    py = jnp.stack([y0, y1, y2], axis=-1)
    face_sym = (px[..., :, None] * px[..., None, :] +
                py[..., :, None] * py[..., None, :] + 1.0)
    face_sym = face_sym.reshape(face_sym.shape[:-2] + (9,))

    # obtuse-corner flags; the CUDA loop breaks after the FIRST obtuse corner
    # (soft_rasterize.py:227-235) so at most one flag is set.
    p = jnp.stack([jnp.stack([x0, y0], -1), jnp.stack([x1, y1], -1),
                   jnp.stack([x2, y2], -1)], axis=-2)  # [...,3,2]
    obts = []
    for k in range(3):
        k1, k2 = (k + 1) % 3, (k + 2) % 3
        d = jnp.sum((p[..., k1, :] - p[..., k, :]) * (p[..., k2, :] - p[..., k, :]), axis=-1)
        obts.append(d < 0)
    obt = jnp.stack(obts, axis=-1)
    first = jnp.cumsum(obt.astype(jnp.int32), axis=-1) <= 1
    face_obt = jnp.where(obt & first, 1.0, 0.0)
    return face_inv, face_sym, face_obt


def barycentric_coordinate(face_inv, xp, yp):
    """w_k = inv[3k]*x + inv[3k+1]*y + inv[3k+2]; face_inv [...,9] -> w [...,3]."""
    inv = face_inv.reshape(face_inv.shape[:-1] + (3, 3))
    return inv[..., 0] * xp[..., None] + inv[..., 1] * yp[..., None] + inv[..., 2]


def check_border_outside(xp, yp, face, threshold):
    """True when the pixel is farther than ``threshold`` outside the face bbox."""
    xs = face[..., 0::3]
    ys = face[..., 1::3]
    return ((xp > jnp.max(xs, -1) + threshold) | (xp < jnp.min(xs, -1) - threshold) |
            (yp > jnp.max(ys, -1) + threshold) | (yp < jnp.min(ys, -1) - threshold))


def check_face_frontside(face):
    return ((face[..., 7] - face[..., 1]) * (face[..., 3] - face[..., 0]) <
            (face[..., 4] - face[..., 1]) * (face[..., 6] - face[..., 0]))


def check_pixel_inside(w):
    return jnp.all((w <= 1) & (w >= 0), axis=-1)


def barycentric_clip(w):
    wc = jnp.clip(w, 0.0, 1.0)
    w_sum = jnp.maximum(jnp.sum(wc, -1, keepdims=True), 1e-5)
    return wc / w_sum


def perspective_depth(w_clip, face):
    """zp = 1 / sum(w_i / z_i)  (perspective-correct depth)."""
    zs = face[..., 2::3]
    return 1.0 / jnp.sum(w_clip / zs, axis=-1)


def barycentric_distance(w):
    """Signed squared distance proxy: min(w) squared, sign by inside/outside."""
    dis = jnp.min(w, axis=-1)
    return jnp.where(dis > 0, dis * dis, -dis * dis)


def _edge_projection(w, face_sym, v0: int, clamp: bool):
    """Project barycentric point onto edge (v0, v0+1); returns offset t [...,3].

    Implements the shared t-computation of euclidean_p2f_distance for a
    static corner choice v0 (soft_rasterize.py:73-101 and :123-140).
    """
    v1 = (v0 + 1) % 3
    v2 = (v0 + 2) % 3
    sym = face_sym.reshape(face_sym.shape[:-1] + (3, 3))
    a0 = sym[..., v0, :] - sym[..., v1, :]  # [...,3]
    num = jnp.sum(w * a0, axis=-1) - a0[..., v1]
    den = a0[..., v0] - a0[..., v1]
    t_v0 = _safe_div(num, den)
    if clamp:
        t_v0 = jnp.clip(t_v0, 0.0, 1.0)
        t_v1 = jnp.clip(1.0 - t_v0, 0.0, 1.0)
    else:
        t_v1 = 1.0 - t_v0
    zeros = jnp.zeros_like(t_v0)
    comps = [None, None, None]
    comps[v0] = t_v0
    comps[v1] = t_v1
    comps[v2] = zeros
    t = jnp.stack(comps, axis=-1)
    return t - w


def euclidean_p2f_distance(w, face, face_sym, face_obt, xp, yp):
    """Vectorized euclidean point-to-face distance.

    Returns (sign, dis_x, dis_y, t) with the same semantics as the CUDA
    device function soft_rasterize.py:57-147.
    """
    fx = face[..., 0::3]
    fy = face[..., 1::3]

    inside = jnp.all((w > 0) & (w < 1), axis=-1)

    # -- inside branch: closest of the three edge projections ---------------
    ts, diss, dxs, dys = [], [], [], []
    for k in range(3):
        t_k = _edge_projection(w, face_sym, k, clamp=False)
        dx = jnp.sum(t_k * fx, -1)
        dy = jnp.sum(t_k * fy, -1)
        ts.append(t_k)
        dxs.append(dx)
        dys.append(dy)
        diss.append(dx * dx + dy * dy)
    dis_stack = jnp.stack(diss, -1)
    kmin = jnp.argmin(dis_stack, axis=-1)
    t_in = jnp.take_along_axis(jnp.stack(ts, -2), kmin[..., None, None], axis=-2)[..., 0, :]
    dx_in = jnp.take_along_axis(jnp.stack(dxs, -1), kmin[..., None], axis=-1)[..., 0]
    dy_in = jnp.take_along_axis(jnp.stack(dys, -1), kmin[..., None], axis=-1)[..., 0]

    # -- outside branch: corner-region casework -----------------------------
    w0n = w[..., 0] <= 0
    w1n = w[..., 1] <= 0
    w2n = w[..., 2] <= 0

    def corner_shift(base, other):
        # obtuse-corner redirection: (p - p_base) . (p_other - p_base) > 0
        bx = fx[..., base]
        by = fy[..., base]
        ox = fx[..., other]
        oy = fy[..., other]
        return (xp - bx) * (ox - bx) + (yp - by) * (oy - by) > 0

    # default corner picks per the cascade (soft_rasterize.py:109-121)
    v0_sel = jnp.full(w.shape[:-1], 0, jnp.int32)
    c1 = w1n & w2n
    c2 = w2n & w0n & ~c1
    c3 = w0n & w1n & ~c1 & ~c2
    rest = ~(c1 | c2 | c3)
    e1 = rest & w0n
    e2 = rest & ~w0n & w1n
    e3 = rest & ~w0n & ~w1n & w2n

    v0_sel = jnp.where(c1, jnp.where((face_obt[..., 0] == 1) & corner_shift(0, 2), 2, 0), v0_sel)
    v0_sel = jnp.where(c2, jnp.where((face_obt[..., 1] == 1) & corner_shift(1, 0), 0, 1), v0_sel)
    v0_sel = jnp.where(c3, jnp.where((face_obt[..., 2] == 1) & corner_shift(2, 1), 1, 2), v0_sel)
    v0_sel = jnp.where(e1, 1, v0_sel)
    v0_sel = jnp.where(e2, 2, v0_sel)
    v0_sel = jnp.where(e3, 0, v0_sel)

    t_out_opts = jnp.stack([_edge_projection(w, face_sym, k, clamp=True) for k in range(3)], axis=-2)
    t_out = jnp.take_along_axis(t_out_opts, v0_sel[..., None, None], axis=-2)[..., 0, :]
    dx_out = jnp.sum(t_out * fx, -1)
    dy_out = jnp.sum(t_out * fy, -1)

    sign = jnp.where(inside, 1.0, -1.0)
    dis_x = jnp.where(inside, dx_in, dx_out)
    dis_y = jnp.where(inside, dy_in, dy_out)
    t = jnp.where(inside[..., None], t_in, t_out)
    return sign, dis_x, dis_y, t


def sample_texture_surface_idx(w_clip, texture_res: int):
    """Texel index for surface sampling (forward_sample_texture :156-166)."""
    R = texture_res
    w_x = jnp.minimum(w_clip[..., 0] * R, float(R - 1)).astype(jnp.int32)
    w_y = jnp.minimum(w_clip[..., 1] * R, float(R - 1)).astype(jnp.int32)
    low = (w_clip[..., 0] + w_clip[..., 1]) * R - w_x - w_y <= 1
    idx = jnp.where(low, w_y * R + w_x, (R - 1 - w_y) * R + (R - 1 - w_x))
    return idx
