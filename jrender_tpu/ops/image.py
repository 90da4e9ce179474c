"""Screen-space image ops for the deferred pipeline (pure JAX).

Replaces the reference render2 CUDA kernels with vectorized XLA programs
(every op is per-pixel parallel; marches use bounded lax loops):
  * sample2D            -- jrender/Scene/textures/utils/sample2D.py:4-100
  * conv_for_image      -- jrender/render2/utils/cuda/conv.py:5-21
  * gaussian_blur (SSS) -- jrender/renderer/utils/gaussian_blur.py:29-
  * compute_stretch_map -- jrender/renderer/utils/ToStretchMap.py:5-13
  * generate_SAT        -- Scene/textures/texture.py:115-139 (numba ->
                           jnp.cumsum, f32 on TPU)
  * VSSM                -- render2/utils/cuda/VSSM_cuda.py:23-118
  * SSAO / SSDO         -- SSAO_cuda.py:109-171 / SSDO_cuda.py
  * SSR                 -- SSR_cuda.py:7-262 (naive2 DDA march)
  * SSSR                -- SSSR_cuda.py (GGX importance-sampled march)
  * FXAA                -- FXAA_cuda.py:3-260
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.math import normalize


# -- sampling / convolution -------------------------------------------------

def sample2D(texture, pos, default=999999.0):
    """Bilinear sample texture [H,W(,C)] at uv pos [...,2] in [0,1]."""
    texture = jnp.asarray(texture, jnp.float32)
    squeeze = texture.ndim == 2
    if squeeze:
        texture = texture[..., None]
    H, W, C = texture.shape
    px = pos[..., 0] * (W - 1)
    py = pos[..., 1] * (H - 1)
    oob = (px < 0) | (px > W - 1) | (py < 0) | (py > H - 1)
    x0 = jnp.clip(px.astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(py.astype(jnp.int32), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    wx1 = px - x0
    wx0 = 1 - wx1
    wy1 = py - y0
    wy0 = 1 - wy1
    val = (texture[y0, x0] * (wx0 * wy0)[..., None] +
           texture[y1, x0] * (wx0 * wy1)[..., None] +
           texture[y0, x1] * (wx1 * wy0)[..., None] +
           texture[y1, x1] * (wx1 * wy1)[..., None])
    val = jnp.where(oob[..., None], default, val)
    return val[..., 0] if squeeze else val


def conv_for_image(x, w, overflow=0.0):
    """Dense 2-D correlation with overflow-value padding (conv.py:5-21)."""
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    Kh, Kw = w.shape
    # reference uses offsets i - 1 regardless of kernel size (3x3-centred);
    # generalize to centred kernels like its reindex pattern intends
    ph, pw = Kh // 2, Kw // 2
    xp = jnp.pad(x, ((ph, Kh - 1 - ph), (pw, Kw - 1 - pw), (0, 0)),
                 constant_values=overflow)
    out = jax.lax.conv_general_dilated(
        xp.transpose(2, 0, 1)[:, None], jnp.asarray(w)[None, None],
        (1, 1), 'VALID')[:, 0].transpose(1, 2, 0)
    return out[..., 0] if squeeze else out


def gaussian_blur(image, tap_num, v, modulate_map, dim=0):
    """Stretch-modulated separable blur used by SSS (gaussian_blur.py).

    dim=1 blurs along x, dim=0 along y (matching the reference call sites).
    """
    squeeze = image.ndim == 2
    img = image[..., None] if squeeze else image
    H, W, C = img.shape
    gw = math.sqrt(v)
    taps = jnp.asarray([gw * (math.exp(-(-gw * ((tap_num - 1) / 2 - i)) ** 2 / (2 * v))
                              / math.sqrt(2 * math.pi * v))
                        for i in range(tap_num)], jnp.float32)

    mod = modulate_map if modulate_map.ndim == 2 else modulate_map[..., 0]
    nfw = gw * mod                                        # [H,W]

    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing='ij')
    base = (xs if dim == 1 else ys) - nfw * (tap_num - 1) / 2

    center = img
    nonzero = jnp.any(center > 0, axis=-1, keepdims=True)

    acc = jnp.zeros_like(img)
    pos = base
    for k in range(tap_num):
        if dim == 1:
            i1 = jnp.clip(pos.astype(jnp.int32), 0, W - 1)
            i2 = jnp.clip(pos.astype(jnp.int32) + 1, 0, W - 1)
            v1 = img[ys.astype(jnp.int32), i1]
            v2 = img[ys.astype(jnp.int32), i2]
        else:
            i1 = jnp.clip(pos.astype(jnp.int32), 0, H - 1)
            i2 = jnp.clip(pos.astype(jnp.int32) + 1, 0, H - 1)
            v1 = img[i1, xs.astype(jnp.int32)]
            v2 = img[i2, xs.astype(jnp.int32)]
        v1 = jnp.where(v1 > 1e-6, v1, center)
        v2 = jnp.where(v2 > 1e-6, v2, center)
        interp = (pos - i1.astype(jnp.float32))[..., None] * v2 + \
                 (i2.astype(jnp.float32) - pos)[..., None] * v1
        acc = acc + interp * taps[k]
        pos = pos + nfw
    out = jnp.where(nonzero, acc, 0.0)
    return out[..., 0] if squeeze else out


def compute_stretch_map(world_map, padding_method='replicate'):
    """SSS stretch maps from world-coord derivatives (ToStretchMap.py:5-13)."""
    wx = jnp.concatenate([world_map, world_map[:, -1:, :]], axis=1)
    wy = jnp.concatenate([world_map, world_map[-1:, :, :]], axis=0)
    stretchU = 1.0 / jnp.sqrt(jnp.sum((world_map - wx[:, 1:]) ** 2, -1))
    stretchV = 1.0 / jnp.sqrt(jnp.sum((world_map - wy[1:]) ** 2, -1))
    return stretchU, stretchV


# -- shadows ----------------------------------------------------------------

def generate_SAT(image):
    """Summed-area table with a leading zero row/col (texture.py:115-139).

    jnp.cumsum replaces the numba CPU prefix scan; the reference computes
    in float64 — on TPU we use f32 (documented deviation; VSSM regions
    are small enough for f32 at shadow-map sizes)."""
    img = jnp.asarray(image)
    sat = jnp.cumsum(jnp.cumsum(img, axis=0), axis=1)
    return sat


def _region_mean(SAT, x, y, offset, is_):
    xp1 = jnp.maximum(x - offset - 1, 0)
    yp1 = jnp.maximum(y - offset - 1, 0)
    xp2 = jnp.minimum(x + offset, is_ - 1)
    yp2 = jnp.minimum(y + offset, is_ - 1)
    s = SAT[yp2, xp2] - SAT[yp1, xp2] - SAT[yp2, xp1] + SAT[yp1, xp1]
    return s / jnp.maximum((xp2 - xp1) * (yp2 - yp1), 1).astype(s.dtype)


def _chebyshev(mean, variance, upper):
    a = upper - mean
    denom = jnp.maximum(a * a, 1e-5)
    return jnp.clip(variance / (variance + denom), 0.0, 1.0)


def VSSM(eyeDepth, SAT, SAT2, uv, light, side_length=0.08):
    """Variance soft shadow mapping (VSSM_cuda.py:23-118)."""
    is_ = eyeDepth.shape[0]
    near, far = light.near, light.far
    sm_sl = math.tan(light.viewing_angle / 180.0 * math.pi)

    u = uv[..., 0]
    v = uv[..., 1]
    upper = 1 - 1 / is_
    in_map = (u >= 0) & (u <= upper) & (v >= 0) & (v <= upper)
    z = eyeDepth
    z_ok = (z >= near) & (z <= far)

    xp = (u * is_).astype(jnp.int32)
    yp = (v * is_).astype(jnp.int32)

    bs_sl = jnp.minimum(side_length / z * jnp.abs(z - 1), sm_sl)
    s_off = jnp.clip(bs_sl / sm_sl / 2 * is_, 0.0, is_ / 2).astype(jnp.int32)
    z_avg = _region_mean(SAT, xp, yp, s_off, is_)
    z2_avg = _region_mean(SAT2, xp, yp, s_off, is_)
    fully_lit = z < z_avg + 0.01
    occlusion = 1.0 - _chebyshev(z_avg, z2_avg - z_avg * z_avg, z)
    occ_z = (z_avg - (1 - occlusion) * z) / jnp.maximum(occlusion, 1e-6)
    occ_z = jnp.clip(occ_z, near, far)
    filt = (z - occ_z) / occ_z * side_length
    f_off = jnp.clip(filt / sm_sl / 2 * is_, 0.0, is_ / 2).astype(jnp.int32)
    fz = _region_mean(SAT, xp, yp, f_off, is_)
    fz2 = _region_mean(SAT2, xp, yp, f_off, is_)
    lit2 = z < fz + 0.005
    vis = jnp.clip(_chebyshev(fz, fz2 - fz * fz, z), 0.0, 1.0)
    out = jnp.where(lit2, 1.0, vis)
    out = jnp.where(fully_lit, 1.0, out)
    return jnp.where(in_map & z_ok, out, 1.0)


# -- ambient occlusion ------------------------------------------------------

def _pixel_tbn(N):
    """Per-pixel tangent frame (SSAO_cuda.py:126-139)."""
    big = (jnp.abs(N[..., 0]) > 0.5) | (jnp.abs(N[..., 1]) > 0.5)
    T1 = jnp.stack([-N[..., 1], N[..., 0], jnp.zeros_like(N[..., 0])], -1)
    T2 = jnp.stack([N[..., 2], jnp.zeros_like(N[..., 0]), -N[..., 0]], -1)
    T = jnp.where(big[..., None], T1, T2)
    T = normalize(T, axis=-1)
    B = jnp.cross(T, N)
    return T, B


def SSAO(depth, faces_ind, normals, width, sample_num=256, sample_range_r=0.25,
         key=None):
    """Screen-space ambient occlusion (SSAO_cuda.py:109-171).

    Returns per-pixel occlusion in [0,1]."""
    if key is None:
        key = jax.random.PRNGKey(0)
    is_ = depth.shape[0]
    ys, xs = jnp.meshgrid(jnp.arange(is_), jnp.arange(is_), indexing='ij')
    xi = (2 * xs.astype(jnp.float32) + 1 - is_) / is_
    yi = (2 * (is_ - 1 - ys.astype(jnp.float32)) + 1 - is_) / is_

    N = normals
    wc = jnp.stack([xi * width * depth, yi * width * depth, depth], -1)
    T, B = _pixel_tbn(N)

    r = jax.random.uniform(key, (sample_num, 3))
    randr = jnp.sqrt(r[:, 2] / 3)
    px = randr * r[:, 1] * jnp.cos(2 * jnp.pi * r[:, 0])
    py = randr * jnp.sqrt(1 - r[:, 1] ** 2)
    pz = randr * r[:, 1] * jnp.sin(2 * jnp.pi * r[:, 0])

    def one_sample(k):
        p = (px[k] * T + py[k] * N + pz[k] * B) * sample_range_r + wc
        sx = jnp.round(is_ * (p[..., 0] / p[..., 2] / width + 1) / 2).astype(jnp.int32)
        sy = is_ - jnp.round(is_ * (p[..., 1] / p[..., 2] / width + 1) / 2).astype(jnp.int32)
        inb = (sx >= 0) & (sx < is_) & (sy >= 0) & (sy < is_)
        d = depth[jnp.clip(sy, 0, is_ - 1), jnp.clip(sx, 0, is_ - 1)]
        return (inb & (d < p[..., 2])).astype(jnp.float32)

    occ = jax.lax.fori_loop(
        0, sample_num, lambda k, acc: acc + one_sample(k),
        jnp.zeros((is_, is_))) / sample_num
    return jnp.where(faces_ind >= 0, occ, 0.0)


def SSDO(color, depth, faces_ind, normals, width, sample_num=1024,
         sample_range_r=0.3, key=None):
    """Directional-occlusion variant: gathers bounce color (SSDO_cuda.py)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    is_ = depth.shape[0]
    ys, xs = jnp.meshgrid(jnp.arange(is_), jnp.arange(is_), indexing='ij')
    xi = (2 * xs.astype(jnp.float32) + 1 - is_) / is_
    yi = (2 * (is_ - 1 - ys.astype(jnp.float32)) + 1 - is_) / is_
    N = normals
    wc = jnp.stack([xi * width * depth, yi * width * depth, depth], -1)
    T, B = _pixel_tbn(N)

    r = jax.random.uniform(key, (sample_num, 3))
    randr = jnp.sqrt(r[:, 2] / 3)
    px = randr * r[:, 1] * jnp.cos(2 * jnp.pi * r[:, 0])
    py = randr * jnp.sqrt(1 - r[:, 1] ** 2)
    pz = randr * r[:, 1] * jnp.sin(2 * jnp.pi * r[:, 0])

    def one_sample(k, acc):
        p = (px[k] * T + py[k] * N + pz[k] * B) * sample_range_r + wc
        sx = jnp.round(is_ * (p[..., 0] / p[..., 2] / width + 1) / 2).astype(jnp.int32)
        sy = is_ - jnp.round(is_ * (p[..., 1] / p[..., 2] / width + 1) / 2).astype(jnp.int32)
        inb = (sx >= 0) & (sx < is_) & (sy >= 0) & (sy < is_)
        syc = jnp.clip(sy, 0, is_ - 1)
        sxc = jnp.clip(sx, 0, is_ - 1)
        d = depth[syc, sxc]
        occluded = inb & (d < p[..., 2])
        bounce = color[syc, sxc] * occluded[..., None]
        return acc + bounce

    bounce = jax.lax.fori_loop(0, sample_num, one_sample,
                               jnp.zeros_like(color)) / sample_num
    return color + jnp.where((faces_ind >= 0)[..., None], bounce, 0.0)


# -- screen-space reflections ----------------------------------------------

def _ssr_mask(faces_ind, ssr_faces):
    """Pixel belongs to a reflective object: faces_ind in any [lo, hi)."""
    m = jnp.zeros(faces_ind.shape, bool)
    n = ssr_faces.shape[0] // 2
    for j in range(n):
        m = m | ((faces_ind >= ssr_faces[2 * j]) & (faces_ind < ssr_faces[2 * j + 1]))
    return m


def SSR(color, world_buffer, normal_buffer, faces_ind_buffer, ssr_faces,
        width, far, step=1, max_steps=256, world_thickness=0.1,
        reflect_strength=0.6):
    """Screen-space mirror reflections (SSR_cuda.py naive2 :7-262).

    DDA-marches the projected reflection ray; on a depth-interval hit adds
    0.6x the hit pixel color.  max_steps bounds the march (the CUDA loop
    runs to the screen edge; 256 covers it at the demo resolutions)."""
    is_ = color.shape[0]
    depth = world_buffer[..., 2]
    ys, xs = jnp.meshgrid(jnp.arange(is_), jnp.arange(is_), indexing='ij')
    xi = (2 * xs.astype(jnp.float32) + 1 - is_) / is_
    yi = (2 * (is_ - 1 - ys.astype(jnp.float32)) + 1 - is_) / is_

    mask = _ssr_mask(faces_ind_buffer, jnp.asarray(ssr_faces))

    wcoord = jnp.stack([xi * depth * width, yi * depth * width, depth], -1)
    indir = normalize(wcoord, axis=-1)
    N = normal_buffer
    outdir = indir - 2 * jnp.sum(indir * N, -1, keepdims=True) * N
    outdir = normalize(outdir, axis=-1)

    w0 = wcoord + world_thickness * outdir
    w0p = jnp.stack([w0[..., 0] / w0[..., 2] / width,
                     w0[..., 1] / w0[..., 2] / width], -1)
    stepdir = w0p - jnp.stack([xi, yi], -1)
    stepdir = stepdir / jnp.maximum(
        jnp.linalg.norm(stepdir, axis=-1, keepdims=True), 1e-12)

    sx, sy = stepdir[..., 0], stepdir[..., 1]
    step_axis = jnp.abs(sy) > jnp.abs(sx)               # True: walk y
    step_k = jnp.where(step_axis, sx / jnp.where(sy == 0, 1e-6, sy),
                       sy / jnp.where(sx == 0, 1e-6, sx))
    step_pos = jnp.where(step_axis, sy > 0, sx > 0)

    ox, oy = outdir[..., 0], outdir[..., 1]
    k_axis = jnp.abs(oy) > jnp.abs(ox)
    oy_s = jnp.where(oy > 0, jnp.maximum(oy, 1e-6), jnp.minimum(oy, -1e-6))
    ox_s = jnp.where(ox > 0, jnp.maximum(ox, 1e-6), jnp.minimum(ox, -1e-6))
    ray_k = jnp.where(k_axis, ox / oy_s, oy / ox_s)
    numer = jnp.where(k_axis, yi * ray_k - xi, xi * ray_k - yi) * wcoord[..., 2]

    state = dict(
        ray_x=xs.astype(jnp.float32),
        ray_y=(is_ - 1 - ys).astype(jnp.float32),
        done=~mask,
        hit=jnp.zeros(mask.shape, bool),
        hit_ind=jnp.zeros(mask.shape, jnp.int32),
        ray_depth=wcoord[..., 2],
    )

    def body(_, st):
        # next pixel crossing along the dominant axis
        def walk(r0, r1, k):
            p0 = jnp.where(step_pos, jnp.floor((r0 + 1) / step),
                           jnp.floor((r0 - 1) / step))
            n0 = jnp.where(step_pos, (p0 + 1) * step - 0.5, p0 * step + 0.5)
            n1 = (n0 - r0) * k + r1
            return n0, n1

        nx_y, ny_y = walk(st['ray_y'], st['ray_x'], step_k)   # step in y
        nx_x, ny_x = walk(st['ray_x'], st['ray_y'], step_k)   # step in x
        nxt_x = jnp.where(step_axis, ny_y, nx_x)
        nxt_y = jnp.where(step_axis, nx_y, ny_x)

        off = (nxt_y > is_ - 1) | (nxt_y < 0) | (nxt_x > is_ - 1) | (nxt_x < 0) \
            | (st['ray_depth'] > far)
        nxc = jnp.clip(nxt_x, 0, is_ - 1)
        nyc = jnp.clip(nxt_y, 0, is_ - 1)
        row = (is_ - nyc.astype(jnp.int32) - 1)
        col = nxc.astype(jnp.int32)
        z = depth[row, col]
        rxi = (2 * nxt_x + 1 - is_) / is_
        ryi = (2 * nxt_y + 1 - is_) / is_
        den = jnp.where(k_axis, ryi * ray_k - rxi, rxi * ray_k - ryi)
        den = jnp.where(den > 0, jnp.maximum(den, 1e-5), jnp.minimum(den, -1e-5))
        rd = numer / den

        hit_now = (rd > z) & (rd <= far) & (rd < z + world_thickness) & ~st['done'] & ~off
        done = st['done'] | off | hit_now
        return dict(
            ray_x=jnp.where(st['done'], st['ray_x'], nxt_x),
            ray_y=jnp.where(st['done'], st['ray_y'], nxt_y),
            done=done,
            hit=st['hit'] | hit_now,
            hit_ind=jnp.where(hit_now, row * is_ + col, st['hit_ind']),
            ray_depth=jnp.where(st['done'], st['ray_depth'], rd),
        )

    st = jax.lax.fori_loop(0, max_steps, body, state)
    flat = color.reshape(-1, 3)
    hit_col = flat[st['hit_ind']]
    # (the reference adds colors[i*3+0] -- the red channel -- to every
    # channel, an apparent typo at SSR_cuda.py:211-213; we add the proper
    # per-channel base color)
    out = jnp.where(st['hit'][..., None], color + reflect_strength * hit_col,
                    color)
    return out


def _min_depth_pyramid(depth):
    """Min-pooled Hi-Z pyramid flattened into one 1-D buffer.

    Returns (flat, offsets, sizes): level l occupies flat[offsets[l]:...]
    as a row-major (sizes[l], sizes[l]) image; level 0 is `depth` itself,
    each next level 2x2-min-pools the previous (SSR_cuda.py:261-286)."""
    s = depth.shape[0]
    levels = [depth]
    while s > 1:
        d = levels[-1].reshape(s // 2, 2, s // 2, 2).min(axis=(1, 3))
        levels.append(d)
        s //= 2
    flat = jnp.concatenate([l.reshape(-1) for l in levels])
    sizes = np.array([l.shape[0] for l in levels], np.int32)
    offsets = np.concatenate([[0], np.cumsum([l.size for l in levels])[:-1]]
                             ).astype(np.int32)
    return flat, jnp.asarray(offsets), jnp.asarray(sizes)


def SSR_hiz(color, world_buffer, normal_buffer, faces_ind_buffer, ssr_faces,
            width, far, level_intersect=0, max_steps=128,
            world_thickness=0.1, pixel_bias=0.04, reflect_strength=0.4):
    """Mipmap-accelerated (Hi-Z) screen-space reflections
    (SSR_cuda.py:260-540, the `SSR_cuda` variant).

    Marches the projected reflection ray against a min-pooled depth
    pyramid: each step jumps to the next cell boundary of the current
    level; a pass-below-depth event descends a level, a clear step
    ascends one, and intersections are only accepted at
    ``level <= level_intersect``.  O(log) steps on empty stretches vs the
    naive per-pixel DDA.  Requires a power-of-two image size.

    Deviations from the reference kernel (documented):
      * hit blend is per-channel ``(1-s)*base + s*hit`` (the reference
        mixes its red channel into all three, SSR_cuda.py:515-517 — same
        apparent typo as the naive2 variant);
      * non-mirror pixels return the input color (the reference writes
        into a zeros image, leaving them black — debug-oriented);
      * the march is bounded by ``max_steps`` (unfinished rays = miss).
    """
    is_ = color.shape[0]
    assert is_ & (is_ - 1) == 0, 'Hi-Z SSR needs a power-of-two image size'
    depth = world_buffer[..., 2]
    flat_z, offsets, sizes = _min_depth_pyramid(depth)
    n_levels = sizes.shape[0]
    intervals = jnp.asarray(2.0 ** np.arange(n_levels, dtype=np.float32))

    ys, xs = jnp.meshgrid(jnp.arange(is_), jnp.arange(is_), indexing='ij')
    xi = (2 * xs.astype(jnp.float32) + 1 - is_) / is_
    yi = (2 * (is_ - 1 - ys.astype(jnp.float32)) + 1 - is_) / is_
    mask = _ssr_mask(faces_ind_buffer, jnp.asarray(ssr_faces))

    wcoord = jnp.stack([xi * depth * width, yi * depth * width, depth], -1)
    indir = normalize(wcoord, axis=-1)
    N = normal_buffer
    outdir = indir - 2 * jnp.sum(indir * N, -1, keepdims=True) * N
    outdir = normalize(outdir, axis=-1)

    w0 = wcoord + world_thickness * outdir
    w0p = jnp.stack([w0[..., 0] / w0[..., 2] / width,
                     w0[..., 1] / w0[..., 2] / width], -1)
    stepdir = w0p - jnp.stack([xi, yi], -1)
    stepdir = stepdir / jnp.maximum(
        jnp.linalg.norm(stepdir, axis=-1, keepdims=True), 1e-12)

    sx, sy = stepdir[..., 0], stepdir[..., 1]
    step_axis = jnp.abs(sy) > jnp.abs(sx)               # True: walk y
    sy_c = jnp.where(sy > 0, jnp.maximum(sy, 1e-5), jnp.minimum(sy, -1e-5))
    sx_c = jnp.where(sx > 0, jnp.maximum(sx, 1e-5), jnp.minimum(sx, -1e-5))
    step_k = jnp.where(step_axis, sx / sy_c, sy / sx_c)
    step_pos = jnp.where(step_axis, sy > 0, sx > 0)

    ox, oy = outdir[..., 0], outdir[..., 1]
    k_axis = jnp.abs(oy) > jnp.abs(ox)
    oy_s = jnp.where(oy > 0, jnp.maximum(oy, 1e-5), jnp.minimum(oy, -1e-5))
    ox_s = jnp.where(ox > 0, jnp.maximum(ox, 1e-5), jnp.minimum(ox, -1e-5))
    ray_k = jnp.where(k_axis, ox / oy_s, oy / ox_s)
    numer = jnp.where(k_axis, yi * ray_k - xi, xi * ray_k - yi) * wcoord[..., 2]

    state = dict(
        ray_x=xs.astype(jnp.float32),
        ray_y=(is_ - 1 - ys).astype(jnp.float32),
        level=jnp.zeros(mask.shape, jnp.int32),
        ray_depth=wcoord[..., 2],
        done=~mask,
        hit=jnp.zeros(mask.shape, bool),
        hit_ind=jnp.zeros(mask.shape, jnp.int32),
    )

    def body(_, st):
        interval = intervals[st['level']]
        dsize = sizes[st['level']]
        dead = (st['ray_depth'] > far) | (st['ray_depth'] < 0)
        active = ~st['done'] & ~dead

        # next cell boundary of this level along the dominant axis
        def walk(r0, r1):
            p0 = jnp.where(step_pos, jnp.floor((r0 + 1) / interval),
                           jnp.floor((r0 - 1) / interval))
            n0 = jnp.where(step_pos, (p0 + 1) * interval - 0.5,
                           p0 * interval + 0.5)
            n1 = (n0 - r0) * step_k + r1
            return n0, n1
        ny_w, nx_w = walk(st['ray_y'], st['ray_x'])     # walked in y
        nx_v, ny_v = walk(st['ray_x'], st['ray_y'])     # walked in x
        nxt_x = jnp.where(step_axis, nx_w, nx_v)
        nxt_y = jnp.where(step_axis, ny_w, ny_v)
        hz_x = jnp.floor(nxt_x / interval).astype(jnp.int32)
        hz_y = jnp.floor(nxt_y / interval).astype(jnp.int32)

        off = (hz_x < 0) | (hz_x >= dsize) | (hz_y < 0) | (hz_y >= dsize)
        ind = offsets[st['level']] + \
            (dsize - jnp.clip(hz_y, 0, dsize - 1) - 1) * dsize + \
            jnp.clip(hz_x, 0, dsize - 1)
        z = flat_z[ind]
        rxi = (2 * nxt_x + 1 - is_) / is_
        ryi = (2 * nxt_y + 1 - is_) / is_
        den = jnp.where(k_axis, ryi * ray_k - rxi, rxi * ray_k - ryi)
        den = jnp.where(den > 0, jnp.maximum(den, 1e-5),
                        jnp.minimum(den, -1e-5))
        rd = numer / den

        at_base = st['level'] <= level_intersect
        probe = active & ~off
        below = probe & (rd > z + pixel_bias)
        advance = probe & ~below
        miss_off = active & off & at_base
        finer = (active & off & ~at_base) | (below & ~(at_base & (rd <= far)))
        hit_try = below & at_base & (rd <= far)
        hit_now = hit_try & (rd <= z + world_thickness)
        coarser = advance & (dsize != 1)

        row = is_ - 1 - jnp.clip(nxt_y.astype(jnp.int32), 0, is_ - 1)
        col = jnp.clip(nxt_x.astype(jnp.int32), 0, is_ - 1)
        return dict(
            ray_x=jnp.where(advance, nxt_x, st['ray_x']),
            ray_y=jnp.where(advance, nxt_y, st['ray_y']),
            level=st['level'] - finer.astype(jnp.int32)
                  + coarser.astype(jnp.int32),
            ray_depth=jnp.where(probe, rd, st['ray_depth']),
            done=st['done'] | dead | miss_off | hit_try,
            hit=st['hit'] | hit_now,
            hit_ind=jnp.where(hit_now, row * is_ + col, st['hit_ind']),
        )

    st = jax.lax.fori_loop(0, max_steps, body, state)
    flat_c = color.reshape(-1, 3)
    hit_col = flat_c[st['hit_ind']]
    out = jnp.where(st['hit'][..., None],
                    (1 - reflect_strength) * color + reflect_strength * hit_col,
                    color)
    return out


def SSSR(color, world_buffer, normal_buffer, roughness_buffer, faces_ind_buffer,
         ssr_faces, width, far, step=1, spp=32, key=None, max_steps=128):
    """Stochastic glossy reflections (SSSR_cuda.py): GGX importance-sampled
    half-vectors, each reflected ray marched like SSR, averaged."""
    if key is None:
        key = jax.random.PRNGKey(0)
    is_ = color.shape[0]
    mask = _ssr_mask(faces_ind_buffer, jnp.asarray(ssr_faces))
    N = normal_buffer
    rough = roughness_buffer[..., 0] if roughness_buffer.ndim == 3 else roughness_buffer

    depth = world_buffer[..., 2]
    ys, xs = jnp.meshgrid(jnp.arange(is_), jnp.arange(is_), indexing='ij')
    xi = (2 * xs.astype(jnp.float32) + 1 - is_) / is_
    yi = (2 * (is_ - 1 - ys.astype(jnp.float32)) + 1 - is_) / is_
    wcoord = jnp.stack([xi * depth * width, yi * depth * width, depth], -1)
    V = -normalize(wcoord, axis=-1)
    T, B = _pixel_tbn(N)

    def one_sample(k, acc):
        ku = jax.random.fold_in(key, k)
        u1, u2 = jax.random.uniform(ku, (2,) + rough.shape)
        a = rough * rough
        # GGX half-vector sampling
        cos_t = jnp.sqrt((1 - u1) / (1 + (a * a - 1) * u1 + 1e-9))
        sin_t = jnp.sqrt(jnp.maximum(1 - cos_t ** 2, 0))
        phi = 2 * jnp.pi * u2
        H = (sin_t * jnp.cos(phi))[..., None] * T + cos_t[..., None] * N + \
            (sin_t * jnp.sin(phi))[..., None] * B
        H = normalize(H, axis=-1)
        L = 2 * jnp.sum(V * H, -1, keepdims=True) * H - V
        L = normalize(L, axis=-1)
        # march along L: reuse SSR with this direction by faking normals
        # such that reflect(indir) == L:  n = normalize(L - indir)
        indir = -V
        n_fake = normalize(L - indir, axis=-1)
        refl = SSR(color, world_buffer, n_fake, faces_ind_buffer, ssr_faces,
                   width, far, step=step, max_steps=max_steps,
                   reflect_strength=1.0)
        return acc + (refl - color)

    bounce = jax.lax.fori_loop(0, spp, one_sample, jnp.zeros_like(color)) / spp
    bounce = jnp.where(mask[..., None], bounce, 0.0)
    # bilateral smoothing (reference uses cv2.bilateralFilter post-pass)
    return bounce


def bilateral_filter(img, d=5, sigma_color=20 / 255.0, sigma_space=10.0):
    """Small separate bilateral filter (replaces the cv2 post-pass)."""
    r = d // 2
    H, W, C = img.shape
    acc = jnp.zeros_like(img)
    wsum = jnp.zeros((H, W, 1))
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifted = jnp.roll(img, (dy, dx), axis=(0, 1))
            sw = math.exp(-(dx * dx + dy * dy) / (2 * sigma_space ** 2))
            cw = jnp.exp(-jnp.sum((shifted - img) ** 2, -1, keepdims=True) /
                         (2 * sigma_color ** 2))
            w = sw * cw
            acc = acc + shifted * w
            wsum = wsum + w
    return acc / jnp.maximum(wsum, 1e-9)


# -- FXAA -------------------------------------------------------------------

EDGE_THRESHOLD_MIN = 0.0312
EDGE_THRESHOLD_MAX = 0.125
FXAA_ITERATIONS = 12
SUBPIXEL_QUALITY = 0.75
_QUALITY = [1.0, 1.0, 1.0, 1.0, 1.0, 1.5, 2.0, 2.0, 2.0, 2.0, 4.0, 8.0]


def FXAA(texture):
    """FXAA 3.11 post-AA (FXAA_cuda.py:3-260); texture [H,W,3] with the
    reference's flipped-y sampling convention."""
    is_ = texture.shape[0]

    def tex(x, y):
        x = jnp.clip(x, 0.0, is_ - 1.0)
        y = jnp.clip(y, 0.0, is_ - 1.0)
        yy = is_ - 1 - y
        x0 = x.astype(jnp.int32)
        y0 = yy.astype(jnp.int32)
        x1 = jnp.clip(x0 + 1, 0, is_ - 1)
        y1 = jnp.clip(y0 + 1, 0, is_ - 1)
        wx1 = (x - x0)[..., None]
        wy1 = (yy - y0)[..., None]
        return (texture[y0, x0] * (1 - wx1) * (1 - wy1) +
                texture[y1, x0] * (1 - wx1) * wy1 +
                texture[y0, x1] * wx1 * (1 - wy1) +
                texture[y1, x1] * wx1 * wy1)

    def luma(rgb):
        return jnp.sqrt(rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114)

    ys, xs = jnp.meshgrid(jnp.arange(is_, dtype=jnp.float32),
                          jnp.arange(is_, dtype=jnp.float32), indexing='ij')
    ux = xs
    uy = is_ - 1 - ys

    cC = tex(ux, uy)
    lC = luma(cC)
    lL = luma(tex(ux - 1, uy))
    lR = luma(tex(ux + 1, uy))
    lU = luma(tex(ux, uy + 1))
    lD = luma(tex(ux, uy - 1))
    lmin = jnp.minimum(lC, jnp.minimum(jnp.minimum(lD, lU), jnp.minimum(lL, lR)))
    lmax = jnp.maximum(lC, jnp.maximum(jnp.maximum(lD, lU), jnp.maximum(lL, lR)))
    lrange = lmax - lmin
    no_aa = lrange < jnp.maximum(EDGE_THRESHOLD_MIN, lmax * EDGE_THRESHOLD_MAX)

    lUL = luma(tex(ux - 1, uy + 1))
    lUR = luma(tex(ux + 1, uy + 1))
    lDL = luma(tex(ux - 1, uy - 1))
    lDR = luma(tex(ux + 1, uy - 1))

    lDU = lD + lU
    lLR = lL + lR
    lLC = lDL + lUL
    lDC = lDL + lDR
    lRC = lDR + lUR
    lUC = lUR + lUL

    edge_h = jnp.abs(-2 * lL + lLC) + jnp.abs(-2 * lC + lDU) * 2 + \
        jnp.abs(-2 * lR + lRC)
    edge_v = jnp.abs(-2 * lU + lUC) + jnp.abs(-2 * lC + lLR) * 2 + \
        jnp.abs(-2 * lD + lDC)
    is_horizontal = edge_h >= edge_v

    l1 = jnp.where(is_horizontal, lD, lL)
    l2 = jnp.where(is_horizontal, lU, lR)
    g1 = jnp.abs(l1 - lC)
    g2 = jnp.abs(l2 - lC)
    steepest1 = g1 >= g2
    grad_scaled = 0.25 * jnp.maximum(g1, g2)
    step_len = jnp.where(steepest1, -1.0, 1.0)
    lavg_local = jnp.where(steepest1, 0.5 * (l1 + lC), 0.5 * (l2 + lC))

    cx = ux + jnp.where(is_horizontal, 0.0, step_len * 0.5)
    cy = uy + jnp.where(is_horizontal, step_len * 0.5, 0.0)
    offx = jnp.where(is_horizontal, 1.0, 0.0)
    offy = jnp.where(is_horizontal, 0.0, 1.0)

    ux1 = cx - offx
    uy1 = cy - offy
    ux2 = cx + offx
    uy2 = cy + offy
    le1 = luma(tex(ux1, uy1)) - lavg_local
    le2 = luma(tex(ux2, uy2)) - lavg_local
    reached1 = jnp.abs(le1) >= grad_scaled
    reached2 = jnp.abs(le2) >= grad_scaled
    for it in range(1, FXAA_ITERATIONS):
        q = _QUALITY[it]
        ux1 = jnp.where(reached1, ux1, ux1 - offx * q)
        uy1 = jnp.where(reached1, uy1, uy1 - offy * q)
        ux2 = jnp.where(reached2, ux2, ux2 + offx * q)
        uy2 = jnp.where(reached2, uy2, uy2 + offy * q)
        le1 = jnp.where(reached1, le1, luma(tex(ux1, uy1)) - lavg_local)
        le2 = jnp.where(reached2, le2, luma(tex(ux2, uy2)) - lavg_local)
        reached1 = reached1 | (jnp.abs(le1) >= grad_scaled)
        reached2 = reached2 | (jnp.abs(le2) >= grad_scaled)

    d1 = jnp.where(is_horizontal, ux - ux1, uy - uy1)
    d2 = jnp.where(is_horizontal, ux2 - ux, uy2 - uy)
    dir1 = d1 < d2
    dist_final = jnp.minimum(d1, d2)
    edge_len = d1 + d2
    pixel_off = -dist_final / jnp.maximum(edge_len, 1e-6) + 0.5

    is_center_smaller = lC < lavg_local
    correct_var = jnp.where(dir1, (le1 < 0) != is_center_smaller,
                            (le2 < 0) != is_center_smaller)
    final_off = jnp.where(correct_var, pixel_off, 0.0)

    # subpixel
    lavg = (1.0 / 12.0) * (2 * (lDU + lLR) + lLC + lRC)
    sub1 = jnp.clip(jnp.abs(lavg - lC) / jnp.maximum(lrange, 1e-6), 0, 1)
    sub2 = (-2 * sub1 + 3) * sub1 * sub1
    sub_off = sub2 * sub2 * SUBPIXEL_QUALITY
    final_off = jnp.maximum(final_off, sub_off)

    fx = ux + jnp.where(is_horizontal, 0.0, final_off * step_len)
    fy = uy + jnp.where(is_horizontal, final_off * step_len, 0.0)
    out = tex(fx, fy)
    return jnp.where(no_aa[..., None], cC, out)
