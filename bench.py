"""Driver benchmark: SoftRas + N3MR fwd+bwd rows and a NeRF train step.

Mirrors the reference's README performance tables:
  * SoftRas (README.md:63-69): 7.3 / 11.5 / 35.5 ms fwd+bwd at 1024^2
    for 280 / 3.3k / 39k-tri meshes (BASELINE.md).
  * NMR (README.md:78-84): 32.1 / 95.7 / 114.7 ms, same meshes.
  * NeRF (README.md:436): 1.4x official NeRF (no absolute ms published;
    the row reports rays/s through the real jitted train step).

Prints one JSON line per row, FLUSHED THE MOMENT IT IS COMPUTED, so a
timeout / crash / tunnel RPC failure mid-run loses at most the rows not
yet reached — never the whole artifact.  Ordering is headline-first:
the SoftRas large (39k-face) row is computed and printed before anything
else, then the other SoftRas rows, then N3MR, then NeRF.  The headline
row is RE-printed as the final line (the driver parses the last line).
Each row runs under its own try/except; a failure prints a ROW_ERROR
line and the run continues.  A wall-clock budget (JR_BENCH_BUDGET_S,
default 1500 s) gates the optional back rows so a cold compile cache
cannot push the run past the driver's window.

Timed step: grad(sum(img)) wrt vertices AND textures (same fwd+bwd the
reference times), chained on-device via lax.scan with a carry
perturbation below f32 resolution so XLA cannot hoist the body;
two-point timing (T(n2)-T(n1))/(n2-n1) cancels dispatch/tunnel latency.
"""
import json
import os
import sys
import time
import functools

import numpy as np

BASELINE_MS = 35.5
IMAGE_SIZE = 1024
RINGS = 130
SEGS = 153  # 2*SEGS*(RINGS-1) = 39,474 faces

T_START = time.time()
BUDGET_S = float(os.environ.get('JR_BENCH_BUDGET_S', '1500'))

# reference README.md:63-69 — all three mesh rows; the large row is the
# headline, computed FIRST and re-printed LAST (driver parses final line).
ROWS = [
    ('large', RINGS, SEGS, BASELINE_MS),
    ('middle', 38, 45, 11.5),   # 3,330 tris
    ('small', 13, 12, 7.3),     # 288 tris
    ('spot', None, None, None),  # real scanned mesh (subdivided), no ref row
]

SPOT_OBJ = '/root/reference/data/obj/spot/spot_triangulated.obj'


def emit(row):
    print(json.dumps(row), flush=True)
    return row


def remaining():
    return BUDGET_S - (time.time() - T_START)


def subdivide(verts, faces):
    """One midpoint (1:4) subdivision — turns spot's 5,856 tris into a
    23.4k-tri real-geometry benchmark mesh (non-uniform face sizes, real
    curvature: the honest counterpart to the synthetic UV sphere)."""
    edges = {}
    vs = [v for v in verts]

    def mid(a, b):
        k = (min(a, b), max(a, b))
        if k not in edges:
            edges[k] = len(vs)
            vs.append((verts[a] + verts[b]) * 0.5)
        return edges[k]

    out = []
    for a, b, c in faces:
        ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
        out += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
    return (np.asarray(vs, np.float32),
            np.asarray(out, np.int32))


def spot_mesh():
    from jrender_tpu.io import load_obj
    v, f = load_obj(SPOT_OBJ, load_texture=False)[:2]
    v = np.asarray(v, np.float32)
    f = np.asarray(f, np.int32)
    v = (v - v.mean(0)) / np.abs(v - v.mean(0)).max() * 0.85
    return subdivide(v, f)


def uv_sphere(rings=RINGS, segs=SEGS, radius=0.85):
    """UV sphere triangulation: [V,3], [F,3] (realistic small faces)."""
    vs = []
    for r in range(rings + 1):
        phi = np.pi * r / rings
        for s in range(segs):
            th = 2 * np.pi * s / segs
            vs.append([np.sin(phi) * np.cos(th) * radius,
                       np.cos(phi) * radius,
                       np.sin(phi) * np.sin(th) * radius])
    vs = np.asarray(vs, np.float32)
    fs = []
    for r in range(rings):
        for s in range(segs):
            a = r * segs + s
            b = r * segs + (s + 1) % segs
            c = (r + 1) * segs + s
            d = (r + 1) * segs + (s + 1) % segs
            if r > 0:
                fs.append([a, b, c])
            if r < rings - 1:
                fs.append([b, d, c])
    return vs, np.asarray(fs, np.int32)


def _probe_backend(timeout=240, tries=3, backoff=120):
    """Fail fast if the device claim would hang (e.g. TPU tunnel down).

    A dead tunnel makes jax.devices() block forever with no error;
    probing in a subprocess with a timeout turns that into a clean
    failure.  The axon tunnel has been observed to flap mid-round, so
    the probe retries with a backoff before giving up, and the final
    failure is emitted as a parseable JSON row (an empty artifact tells
    the driver nothing; an ERROR row at least tells it why)."""
    import subprocess
    for attempt in range(tries):
        try:
            subprocess.run(
                [sys.executable, '-c', 'import jax; jax.devices()'],
                timeout=timeout, check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            return
        except subprocess.TimeoutExpired:
            print(f'bench.py: device claim hung for {timeout}s '
                  f'(attempt {attempt + 1}/{tries})', file=sys.stderr)
            if attempt + 1 < tries:
                time.sleep(backoff)
        except subprocess.CalledProcessError:
            return  # claim errored quickly; let the real import surface it
    emit({'metric': 'ERROR_TPU_TUNNEL_DOWN', 'value': 0, 'unit': 'error',
          'note': f'device claim hung {tries}x{timeout}s; committed rows '
                  'from this round are in BENCH_LOCAL_r4.jsonl'})
    sys.exit(1)


def _timed_grad_frames(grad_probe, args, n1=2, n2=12, reps=3):
    """Best per-frame ms over reps: lax.scan-chained on-device steps,
    two-point timing (cancels dispatch/tunnel latency).  grad_probe must
    return a scalar depending on the timed work and accept a carry-scaled
    first argument (defeats loop-invariant hoisting)."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=(len(args),))
    def many(*a):
        *xs, n = a

        def body(c, _):
            r = grad_probe(xs[0] * (1.0 + c), *xs[1:])
            return c + r * 1e-32, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return c

    v = float(many(*args, n1))
    assert np.isfinite(v), 'non-finite timed result'
    float(many(*args, n2))
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        float(many(*args, n1))
        t1 = time.time()
        float(many(*args, n2))
        t2 = time.time()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3)
    return best


def softras_row(name, rings, segs, baseline):
    import jax
    import jax.numpy as jnp
    from jrender_tpu.transform import look_at, perspective
    from jrender_tpu.structures import Mesh
    from jrender_tpu.ops.softras import soft_rasterize

    if name == 'spot':
        if not os.path.exists(SPOT_OBJ):
            return None
        verts, faces = spot_mesh()
    else:
        verts, faces = uv_sphere(rings=rings, segs=segs)
    mesh = Mesh(verts, faces, texture_res=5, texture_type='surface')
    v = perspective(look_at(mesh.vertices, eye=[0, 0, -2.732]), angle=30)
    fv = Mesh(v, mesh.faces).face_vertices.reshape(1, -1, 9)
    tex = jax.random.uniform(jax.random.PRNGKey(0),
                             (1, fv.shape[1], 25, 3))
    F = fv.shape[1]

    def one(x, t):
        img = soft_rasterize(x, t, image_size=IMAGE_SIZE, sigma_val=1e-5,
                             gamma_val=1e-4)
        return jnp.sum(img)

    grad_fn = jax.grad(one, argnums=(0, 1))

    def probe(x, t):
        gf, gt = grad_fn(x, t)
        return gf[0, 0, 0] + gt[0, 0, 0, 0]

    best = _timed_grad_frames(probe, (fv, tex))
    row = {
        'metric': f'softras_fwd_bwd_{IMAGE_SIZE}px_{F}faces'
                  + ('_spot' if name == 'spot' else ''),
        'value': round(best, 2),
        'unit': 'ms/frame',
    }
    # the spot row is a real-geometry honesty check with no
    # reference number (the reference's meshes are unspecified)
    if baseline is not None:
        row['vs_baseline'] = round(baseline / best, 3)
    return row


# reference README.md:78-84 — NMR fwd+bwd rows (same meshes).
# COMPARABILITY (r4 verdict #4): the reference's rasterize defaults to
# anti_aliasing=True (n3mr/n3mr.py:7), which renders internally at
# 2048^2 and mean-pools; its README does not state which setting the
# table used.  We report BOTH: the plain rows time AA=False at 1024^2
# (1x pixels — the conservative reading if the reference table was
# AA=False), and the *_aa rows time AA=True (4x pixels — the
# conservative reading if the table used the library default).  A row
# is only claimed as beating the reference if it holds under its own
# reading; STATUS.md carries the same caveat.
N3MR_ROWS = [('large', RINGS, SEGS, 114.7), ('middle', 38, 45, 95.7),
             ('small', 13, 12, 32.1)]


def n3mr_row(name, rings, segs, baseline, aa=False):
    import jax
    import jax.numpy as jnp
    from jrender_tpu.transform import look_at, perspective
    from jrender_tpu.structures import Mesh
    from jrender_tpu.ops.n3mr import rasterize

    verts, faces = uv_sphere(rings=rings, segs=segs)
    mesh = Mesh(verts, faces)
    v = perspective(look_at(mesh.vertices, eye=[0, 0, -2.732]), angle=30)
    fv = Mesh(v, mesh.faces).face_vertices.reshape(1, -1, 9)
    F = fv.shape[1]
    tex = jax.random.uniform(jax.random.PRNGKey(0),
                             (1, F, 2, 2, 2, 3), jnp.float32)

    def one(x, t):
        img = rasterize(x.reshape(1, F, 3, 3), t,
                        image_size=IMAGE_SIZE, anti_aliasing=aa)
        return jnp.sum(img)

    grad_fn = jax.grad(one, argnums=(0, 1))

    def probe(x, t):
        gf, gt = grad_fn(x, t)
        return gf[0, 0, 0] + gt[0, 0, 0, 0, 0, 0]

    best = _timed_grad_frames(probe, (fv, tex))
    return {
        'metric': f'n3mr_fwd_bwd_{IMAGE_SIZE}px_{F}faces'
                  + ('_aa' if aa else ''),
        'value': round(best, 2),
        'unit': 'ms/frame',
        'vs_baseline': round(baseline / best, 3),
    }


def nerf_rows():
    """Lego-config NeRF train step (netdepth 8 x 256, N_rand 1024,
    N_samples 64 + N_importance 128, viewdirs) through the REAL jitted
    make_train_step/make_scan_train path on a synthetic 400x400 image.
    The reference publishes only a 1.4x-vs-official claim (README.md:436),
    so the row reports ms/step and rays/s without a vs_baseline."""
    from types import SimpleNamespace
    import jax
    import jax.numpy as jnp
    from jrender_tpu.nerf.trainer import (create_nerf, make_train_step,
                                          make_scan_train)

    args = SimpleNamespace(
        netdepth=8, netwidth=256, netdepth_fine=8, netwidth_fine=256,
        N_rand=1024, lrate=5e-4, lrate_decay=500, chunk=32768,
        netchunk=65536, no_batching=True, no_reload=True, ft_path=None,
        N_iters=10, N_samples=64, N_importance=128, perturb=1.0,
        use_viewdirs=True, i_embed=0, multires=10, multires_views=4,
        raw_noise_std=0.0, precrop_iters=0, precrop_frac=0.5,
        dataset_type='blender', white_bkgd=True, lindisp=False,
        no_ndc=True, seed=0, basedir='/tmp/bench_nerf', expname='bench',
        steps_per_dispatch=10)
    H = W = 400
    focal = 555.5
    (rk_train, _, _, params, optimizer, opt_state) = create_nerf(args)
    rk_train.pop('ndc', None)
    rk_train['lindisp'] = False
    step_fn = make_train_step(optimizer, rk_train, H, W, focal, 2.0, 6.0,
                              args.N_rand, 0, 0.5, ndc=False)
    scan_train = make_scan_train(step_fn, args.steps_per_dispatch)

    key = jax.random.PRNGKey(0)
    # deterministic LEARNABLE target (r4 verdict: the old random-noise
    # image gave throughput but could never show learning): a smooth
    # color field + two discs.  No real scene ships with the reference
    # (configs point at ./data/nerf_synthetic, absent), so the PSNR row
    # below is the committed-synthetic alternative — PSNR must RISE.
    yy, xx = np.meshgrid(np.linspace(0, 1, H), np.linspace(0, 1, W),
                         indexing='ij')
    img = np.stack([xx, yy, 0.5 + 0.5 * np.sin(6 * xx) * np.cos(4 * yy)],
                   -1)
    for (cy, cx, rad, ch) in ((0.35, 0.6, 0.18, 0), (0.7, 0.3, 0.12, 2)):
        m = (yy - cy) ** 2 + (xx - cx) ** 2 < rad ** 2
        img[m, ch] = 0.9
        img[m, (ch + 1) % 3] = 0.1
    images = jnp.asarray(img, jnp.float32)[None]
    poses = jnp.eye(4, dtype=jnp.float32)[None, :3, :4].at[:, 2, 3].set(-4.0)
    img_idx = jnp.zeros((args.steps_per_dispatch,), jnp.int32)

    def run(it):
        nonlocal params, opt_state
        params, opt_state, losses, psnrs = scan_train(
            params, opt_state, images, poses, img_idx, it, key)
        jax.block_until_ready(losses)
        return losses, psnrs

    _, psnr0 = run(0)  # compile
    best = np.inf
    steps_done = args.steps_per_dispatch
    psnr_last = psnr0
    for r in range(3):
        t0 = time.time()
        _, psnr_last = run(steps_done)
        steps_done += args.steps_per_dispatch
        best = min(best, (time.time() - t0) / args.steps_per_dispatch * 1e3)
    # learning evidence: ~10 more dispatches, PSNR on the committed
    # synthetic target must rise over the run (~2 s at 30 ms/step)
    for _ in range(10):
        _, psnr_last = run(steps_done)
        steps_done += args.steps_per_dispatch
    return [{
        'metric': 'nerf_lego_train_step',
        'value': round(best, 2),
        'unit': 'ms/step',
    }, {
        'metric': 'nerf_lego_rays_per_s',
        'value': round(args.N_rand / best * 1e3),
        'unit': 'rays/s',
    }, {
        'metric': 'nerf_synthetic_psnr_trajectory',
        'value': round(float(np.asarray(psnr_last)[-1]), 2),
        'unit': 'dB',
        'start_db': round(float(np.asarray(psnr0)[0]), 2),
        'steps': int(steps_done),
        'learned': bool(float(np.asarray(psnr_last)[-1])
                        > float(np.asarray(psnr0)[0]) + 3.0),
    }]


def main():
    _probe_backend()
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    rows = []
    headline = None

    def try_row(label, fn, *a, min_budget=0.0):
        """Run one row; print+flush immediately; never raise."""
        if remaining() < min_budget:
            emit({'metric': 'ROW_SKIPPED', 'value': round(remaining(), 1),
                  'unit': 's_remaining', 'row': label})
            return None
        try:
            r = fn(*a)
        except Exception as e:  # noqa: BLE001 — one bad row must not kill all
            emit({'metric': 'ROW_ERROR', 'value': 0, 'unit': 'error',
                  'row': label, 'error': f'{type(e).__name__}: {e}'[:300]})
            return None
        for one in (r if isinstance(r, list) else [r] if r else []):
            rows.append(emit(one))
        return r

    # HEADLINE FIRST: SoftRas large — printed now, re-printed last.
    for name, rings, segs, baseline in ROWS:
        r = try_row(f'softras_{name}', softras_row, name, rings, segs,
                    baseline)
        if name == 'large' and r is not None:
            headline = r

    if os.environ.get('JR_BENCH_N3MR', '1') == '1':
        for name, rings, segs, baseline in N3MR_ROWS:
            try_row(f'n3mr_{name}', n3mr_row, name, rings, segs, baseline,
                    min_budget=120.0)
        # AA=True variants (reference library default; see N3MR_ROWS note)
        for name, rings, segs, baseline in N3MR_ROWS:
            try_row(f'n3mr_{name}_aa', n3mr_row, name, rings, segs,
                    baseline, True, min_budget=180.0)
    if os.environ.get('JR_BENCH_NERF', '1') == '1':
        try_row('nerf', nerf_rows, min_budget=240.0)

    regressed = [r['metric'] for r in rows
                 if r.get('vs_baseline', 1.0) < 1.0]
    if regressed:
        emit({'metric': 'REGRESSION_WARNING', 'value': len(regressed),
              'unit': 'rows_below_baseline', 'rows': regressed})
    if headline is not None:
        emit(headline)  # final line = headline (driver parses last line)
    else:
        emit({'metric': 'HEADLINE_MISSING', 'value': 0, 'unit': 'error'})


if __name__ == '__main__':
    main()
